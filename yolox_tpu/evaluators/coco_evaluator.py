"""COCO mAP evaluator — re-design of
`/root/reference/yolox/evaluators/coco_evaluator.py`.

Batched inference with on-device NMS (one jitted graph per input size),
results converted to COCO json format (rescale by 1/letterbox-ratio,
xyxy -> xywh, class index -> COCO category id), evaluated with the
self-contained COCOeval (`yolox_tpu/evaluators/cocoeval.py`). Multi-host
runs gather per-host detection lists via jax multihost utils.
"""

from __future__ import annotations

import io
import itertools
import time
from collections import ChainMap, defaultdict
from contextlib import redirect_stdout

import numpy as np

from yolox_tpu.data.datasets import COCO_CLASSES
from yolox_tpu.ops.preproc import letterbox_ratio
from yolox_tpu.utils.logger import logger


def _format_table(rows, headers, columns=6):
    """Markdown-ish per-class table (tabulate-free)."""
    result_pair = [x for pair in rows for x in pair]
    num_cols = min(columns, len(rows) * len(headers))
    row_pair = itertools.zip_longest(
        *[result_pair[i::num_cols] for i in range(num_cols)], fillvalue="")
    table_headers = headers * (num_cols // len(headers))
    lines = ["| " + " | ".join(table_headers) + " |",
             "|" + "---|" * num_cols]
    for row in row_pair:
        cells = [f"{c:.3f}" if isinstance(c, float) else str(c)
                 for c in row]
        lines.append("| " + " | ".join(cells) + " |")
    return "\n".join(lines)


def per_class_AP_table(coco_eval, class_names=COCO_CLASSES,  # noqa: N802
                       headers=("class", "AP"), columns=6):
    per_class_AP = {}
    precisions = coco_eval.eval["precision"]
    assert len(class_names) == precisions.shape[2]
    for idx, name in enumerate(class_names):
        precision = precisions[:, :, idx, 0, -1]
        precision = precision[precision > -1]
        ap = np.mean(precision) if precision.size else float("nan")
        per_class_AP[name] = float(ap * 100)
    return _format_table(
        list(per_class_AP.items()), list(headers), columns)


def per_class_AR_table(coco_eval, class_names=COCO_CLASSES,  # noqa: N802
                       headers=("class", "AR"), columns=6):
    per_class_AR = {}
    recalls = coco_eval.eval["recall"]
    assert len(class_names) == recalls.shape[1]
    for idx, name in enumerate(class_names):
        recall = recalls[:, idx, 0, -1]
        recall = recall[recall > -1]
        ar = np.mean(recall) if recall.size else float("nan")
        per_class_AR[name] = float(ar * 100)
    return _format_table(
        list(per_class_AR.items()), list(headers), columns)


def xyxy2xywh_np(bboxes):
    bboxes = bboxes.copy()
    bboxes[:, 2] = bboxes[:, 2] - bboxes[:, 0]
    bboxes[:, 3] = bboxes[:, 3] - bboxes[:, 1]
    return bboxes


class CocoEvaluator:
    def __init__(self, dataloader, img_size, confthre, nmsthre,
                 num_classes, testdev=False, per_class_AP=True,  # noqa: N803
                 per_class_AR=True, max_det=1024):  # noqa: N803
        self.dataloader = dataloader
        self.img_size = img_size
        self.confthre = confthre
        self.nmsthre = nmsthre
        self.num_classes = num_classes
        self.testdev = testdev
        self.per_class_AP = per_class_AP
        self.per_class_AR = per_class_AR
        self.max_det = max_det

    def evaluate(self, model, distributed=False, half=False,
                 return_outputs=False, decoder=None, test_size=None):
        """Returns (ap50_95, ap50, summary_str)[, image-wise outputs].

        half=True runs the forward in bfloat16 (input cast to bf16, decode
        output cast back to f32 so postprocess/NMS stay full-precision) —
        the reference's fp16 eval flag.
        """
        import jax
        import jax.numpy as jnp

        from yolox_tpu.ops.nms import postprocess_device

        def infer(x):
            xin = jnp.asarray(x)
            if half:
                xin = xin.astype(jnp.bfloat16)
            out = jnp.asarray(model(xin), jnp.float32)
            return postprocess_device(
                out, self.num_classes, conf_thre=self.confthre,
                nms_thre=self.nmsthre, class_agnostic=False,
                max_det=self.max_det)

        ids = []
        data_list = []       # dict path (return_outputs) | columnar dicts
        output_data = defaultdict(dict)
        inference_time = 0.0
        n_samples = max(len(self.dataloader) - 1, 1)

        # software pipelining: dispatch batch k+1 before fetching batch k's
        # results, so host-side COCO conversion overlaps device compute
        # (JAX async dispatch; the reference is fully synchronous per batch)
        pending = None  # (device_dets, device_valid, info_imgs, ids, timed)

        def drain(p):
            nonlocal inference_time
            dev_dets, dev_valid, p_info, p_ids, timed = p
            t0 = time.time()
            dets = np.asarray(dev_dets)   # fetch = sync point
            valid = np.asarray(dev_valid)
            if timed:
                inference_time += time.time() - t0
            # only materialize the per-image output dicts when the caller
            # asked for them: at scale they double the conversion's host
            # RAM (5M-detection synthetic run, docs/eval_at_scale.md)
            if return_outputs:
                data_list_elem, image_wise_data = (
                    self.convert_to_coco_format(
                        dets, valid, p_info, p_ids, return_outputs=True))
                output_data.update(image_wise_data)
                data_list.extend(data_list_elem)
            else:
                # columnar per-batch arrays: no per-detection dicts on
                # the default eval path (at-scale memory; see
                # convert_to_coco_columnar)
                data_list.append(self.convert_to_coco_columnar(
                    dets, valid, p_info, p_ids))

        for cur_iter, (imgs, _, info_imgs, ids) in enumerate(
                self.dataloader):
            is_time_record = cur_iter < len(self.dataloader) - 1
            if is_time_record:
                start = time.time()
            dets, valid = infer(imgs)    # async dispatch
            if is_time_record:
                inference_time += time.time() - start
            prev, pending = pending, (dets, valid, info_imgs, ids,
                                      is_time_record)
            if prev is not None:
                drain(prev)
        if pending is not None:
            drain(pending)

        statistics = np.array(
            [inference_time, 0.0, float(n_samples)], np.float64)
        if distributed and jax.process_count() > 1:
            from yolox_tpu.parallel.mesh import all_gather_objects

            data_list = list(itertools.chain(
                *all_gather_objects(data_list)))
            output_data = dict(
                ChainMap(*all_gather_objects(dict(output_data))))

        if not return_outputs:
            # concatenate the per-batch columnar chunks (possibly from
            # all hosts) into one flat columnar dict
            data_list = {
                k: (np.concatenate([c[k] for c in data_list])
                    if data_list else np.zeros(
                        (0, 4) if k == "bbox" else 0,
                        np.float64 if k in ("bbox", "score") else np.int64))
                for k in ("image_id", "category_id", "bbox", "score")
            }
        eval_results = self.evaluate_prediction(data_list, statistics)
        if return_outputs:
            return eval_results, dict(output_data)
        return eval_results

    def convert_to_coco_format(self, dets, valid, info_imgs, ids,
                               return_outputs=False):
        """dets: (B, K, 7) rows (x1,y1,x2,y2,obj,cls_conf,cls); valid (B,K)."""
        data_list = []
        image_wise_data = defaultdict(dict)
        class_ids = self.dataloader.dataset.class_ids
        for i, (img_info, img_id) in enumerate(zip(info_imgs, ids)):
            img_h, img_w = img_info
            rows = dets[i][valid[i]]
            if rows.shape[0] == 0:
                continue
            scale = letterbox_ratio(
                (float(img_h), float(img_w)), self.img_size)
            bboxes = rows[:, 0:4] / scale
            cls = rows[:, 6]
            scores = rows[:, 4] * rows[:, 5]

            img_id_int = int(np.asarray(img_id).reshape(-1)[0])
            image_wise_data[img_id_int] = {
                "bboxes": [b.tolist() for b in bboxes],
                "scores": [float(s) for s in scores],
                "categories": [class_ids[int(c)] for c in cls],
            }
            bboxes_xywh = xyxy2xywh_np(bboxes)
            for ind in range(bboxes_xywh.shape[0]):
                data_list.append({
                    "image_id": img_id_int,
                    "category_id": class_ids[int(cls[ind])],
                    "bbox": bboxes_xywh[ind].tolist(),
                    "score": float(scores[ind]),
                    "segmentation": [],
                })
        if return_outputs:
            return data_list, image_wise_data
        return data_list

    def convert_to_coco_columnar(self, dets, valid, info_imgs, ids):
        """Columnar variant of `convert_to_coco_format`: flat numpy arrays
        {image_id, category_id, bbox (xywh), score} — no per-detection
        python dicts. Same values as the dict path (f32 -> f64 casts);
        consumed by `coco_json.COCO.loadRes` / `cocoeval._dt_columnar`.
        TPU-first at-scale memory fix for the COCO-protocol dict blowup
        shared with the reference (28.9 GB peak host RSS at 5.12M
        synthetic dets, docs/eval_at_scale.md)."""
        class_ids = np.asarray(self.dataloader.dataset.class_ids, np.int64)
        img_col, cat_col, box_col, score_col = [], [], [], []
        for i, (img_info, img_id) in enumerate(zip(info_imgs, ids)):
            img_h, img_w = img_info
            rows = dets[i][valid[i]]
            if rows.shape[0] == 0:
                continue
            scale = letterbox_ratio(
                (float(img_h), float(img_w)), self.img_size)
            # xywh computed in f32 then widened — bit-identical to the
            # dict path's tolist() of the f32 xyxy2xywh result
            bboxes = xyxy2xywh_np(rows[:, 0:4] / scale).astype(np.float64)
            img_id_int = int(np.asarray(img_id).reshape(-1)[0])
            img_col.append(np.full(rows.shape[0], img_id_int, np.int64))
            cat_col.append(class_ids[rows[:, 6].astype(np.int64)])
            box_col.append(bboxes)
            score_col.append(
                (rows[:, 4] * rows[:, 5]).astype(np.float64))
        if not img_col:
            return {
                "image_id": np.zeros(0, np.int64),
                "category_id": np.zeros(0, np.int64),
                "bbox": np.zeros((0, 4), np.float64),
                "score": np.zeros(0, np.float64),
            }
        return {
            "image_id": np.concatenate(img_col),
            "category_id": np.concatenate(cat_col),
            "bbox": np.concatenate(box_col),
            "score": np.concatenate(score_col),
        }

    def evaluate_prediction(self, data_dict, statistics):
        """`data_dict`: per-ann dict list OR a columnar dict of arrays
        (both accepted by `coco_json.COCO.loadRes`)."""
        import jax

        if jax.process_index() != 0:
            return 0, 0, None
        n_dets = (len(data_dict["score"]) if isinstance(data_dict, dict)
                  else len(data_dict))
        logger.info(f"Evaluate in main process... ({n_dets} detections)")

        inference_time = statistics[0]
        n_samples = statistics[2]
        batch_size = getattr(self.dataloader.batch_sampler, "batch_size", 1)
        a_infer_time = 1000 * inference_time / (n_samples * batch_size)
        # NOTE: pipelined measurement — async dispatch time plus the fetch
        # of the previous batch, partially overlapped by host-side COCO
        # conversion. It is end-to-end eval wall time per image, NOT pure
        # forward latency (bench.py --mode serve measures that).
        info = (f"Average pipelined inference time (fwd+NMS, overlapped): "
                f"{a_infer_time:.2f} ms\n")

        if n_dets > 0:
            from yolox_tpu.evaluators.cocoeval import COCOeval

            cocoGt = self.dataloader.dataset.coco
            cocoDt = cocoGt.loadRes(data_dict)
            cocoEval = COCOeval(cocoGt, cocoDt, "bbox")
            cocoEval.evaluate()
            cocoEval.accumulate()
            redirect_string = io.StringIO()
            with redirect_stdout(redirect_string):
                cocoEval.summarize()
            info += redirect_string.getvalue()
            cat_ids = list(cocoGt.cats.keys())
            cat_names = [cocoGt.cats[c]["name"] for c in sorted(cat_ids)]
            if self.per_class_AP:
                info += "per class AP:\n" + per_class_AP_table(
                    cocoEval, class_names=cat_names) + "\n"
            if self.per_class_AR:
                info += "per class AR:\n" + per_class_AR_table(
                    cocoEval, class_names=cat_names) + "\n"
            return cocoEval.stats[0], cocoEval.stats[1], info
        return 0, 0, info

