"""COCO detection evaluation (bbox) — pycocotools-compatible, self-contained.

The reference uses pycocotools' COCOeval with an optional C++-accelerated
matching/accumulate kernel (`/root/reference/yolox/layers/cocoeval/`,
`yolox/layers/fast_coco_eval_api.py`). Neither is available here, so this
module implements the full algorithm (same matching semantics, PR-curve
accumulation, and 12-stat summary) in vectorized numpy, with an optional
C++ matching kernel (`yolox_tpu/native`) for large evaluations.

Semantics follow the canonical COCO evaluation protocol exactly:
  - IoU with crowd handling (intersection over dt area for iscrowd gts),
  - per-(image, category, area-range, maxDets) greedy matching in score
    order, preferring higher IoU, never re-matching non-crowd gts, ignored
    gts matched only when no valid gt qualifies,
  - precision envelope + 101-point recall interpolation,
  - stats: AP, AP50, AP75, AP-S/M/L, AR@1/10/100, AR-S/M/L.
"""

from __future__ import annotations

import copy
import datetime
import time
from collections import defaultdict

import numpy as np

from yolox_tpu.utils.logger import logger


class Params:
    def __init__(self, iouType="bbox"):
        assert iouType == "bbox", "only bbox evaluation is supported"
        self.imgIds = []
        self.catIds = []
        self.iouThrs = np.linspace(
            0.5, 0.95, int(np.round((0.95 - 0.5) / 0.05)) + 1, endpoint=True)
        self.recThrs = np.linspace(
            0.0, 1.00, int(np.round((1.00 - 0.0) / 0.01)) + 1, endpoint=True)
        self.maxDets = [1, 10, 100]
        self.areaRng = [
            [0 ** 2, 1e5 ** 2], [0 ** 2, 32 ** 2],
            [32 ** 2, 96 ** 2], [96 ** 2, 1e5 ** 2],
        ]
        self.areaRngLbl = ["all", "small", "medium", "large"]
        self.useCats = 1
        self.iouType = iouType


def bbox_iou_crowd(dt_boxes, gt_boxes, iscrowd):
    """IoU of dt (D,4 xywh) x gt (G,4 xywh); crowd gts use dt-area union."""
    d = np.asarray(dt_boxes, np.float64)
    g = np.asarray(gt_boxes, np.float64)
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    dx1, dy1 = d[:, 0], d[:, 1]
    dx2, dy2 = d[:, 0] + d[:, 2], d[:, 1] + d[:, 3]
    gx1, gy1 = g[:, 0], g[:, 1]
    gx2, gy2 = g[:, 0] + g[:, 2], g[:, 1] + g[:, 3]
    iw = np.clip(np.minimum(dx2[:, None], gx2[None, :])
                 - np.maximum(dx1[:, None], gx1[None, :]), 0, None)
    ih = np.clip(np.minimum(dy2[:, None], gy2[None, :])
                 - np.maximum(dy1[:, None], gy1[None, :]), 0, None)
    inter = iw * ih
    d_area = (d[:, 2] * d[:, 3])[:, None]
    g_area = (g[:, 2] * g[:, 3])[None, :]
    union = np.where(np.asarray(iscrowd, bool)[None, :],
                     d_area, d_area + g_area - inter)
    return np.where(union > 0, inter / union, 0.0)


class COCOeval:
    """Drop-in for pycocotools.cocoeval.COCOeval (bbox)."""

    def __init__(self, cocoGt=None, cocoDt=None, iouType="bbox"):
        self.cocoGt = cocoGt
        self.cocoDt = cocoDt
        self.params = Params(iouType)
        self.evalImgs = defaultdict(list)
        self.eval = {}
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        self.stats = []
        self.ious = {}
        if cocoGt is not None:
            self.params.imgIds = sorted(cocoGt.getImgIds())
            self.params.catIds = sorted(cocoGt.getCatIds())

    def _prepare(self):
        p = self.params
        gts = self.cocoGt.loadAnns(
            self.cocoGt.getAnnIds(imgIds=p.imgIds, catIds=p.catIds))
        dts = self.cocoDt.loadAnns(
            self.cocoDt.getAnnIds(imgIds=p.imgIds, catIds=p.catIds))
        for gt in gts:
            gt["ignore"] = gt.get("ignore", 0) or gt.get("iscrowd", 0)
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for gt in gts:
            self._gts[gt["image_id"], gt["category_id"]].append(gt)
        for dt in dts:
            self._dts[dt["image_id"], dt["category_id"]].append(dt)
        self.evalImgs = defaultdict(list)
        self.eval = {}

    def computeIoU(self, imgId, catId):  # noqa: N802,N803
        p = self.params
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 and len(dt) == 0:
            return []
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > p.maxDets[-1]:
            dt = dt[: p.maxDets[-1]]
        g = [g_["bbox"] for g_ in gt]
        d = [d_["bbox"] for d_ in dt]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        return bbox_iou_crowd(d, g, iscrowd)

    def evaluateImg(self, imgId, catId, aRng, maxDet):  # noqa: N802,N803
        p = self.params
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 and len(dt) == 0:
            return None

        for g in gt:
            g["_ignore"] = 1 if (g["ignore"] or g["area"] < aRng[0]
                                 or g["area"] > aRng[1]) else 0

        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0:maxDet]]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        ious = (self.ious[imgId, catId][:, gtind]
                if len(self.ious[imgId, catId]) > 0
                else self.ious[imgId, catId])

        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious) != 0:
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array([d["area"] < aRng[0] or d["area"] > aRng[1]
                      for d in dt]).reshape((1, len(dt)))
        dtIg = np.logical_or(
            dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "image_id": imgId,
            "category_id": catId,
            "aRng": aRng,
            "maxDet": maxDet,
            "dtIds": [d["id"] for d in dt],
            "gtIds": [g["id"] for g in gt],
            "dtMatches": dtm,
            "gtMatches": gtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    def evaluate(self, use_native: bool = True):
        tic = time.time()
        p = self.params
        p.imgIds = list(np.unique(p.imgIds))
        if p.useCats:
            p.catIds = list(np.unique(p.catIds))
        p.maxDets = sorted(p.maxDets)
        self._prepare()
        cat_ids = p.catIds if p.useCats else [-1]
        self.ious = {
            (imgId, catId): self.computeIoU(imgId, catId)
            for imgId in p.imgIds for catId in cat_ids
        }
        maxDet = p.maxDets[-1]
        native = None
        if use_native:
            from yolox_tpu.native import load_cocoeval_lib

            native = load_cocoeval_lib()
        if native is not None:
            self.evalImgs = self._evaluate_native(cat_ids, maxDet)
        else:
            self.evalImgs = [
                self.evaluateImg(imgId, catId, areaRng, maxDet)
                for catId in cat_ids
                for areaRng in p.areaRng
                for imgId in p.imgIds
            ]
        self._paramsEval = copy.deepcopy(self.params)
        logger.info(f"COCOeval evaluate done (t={time.time() - tic:.2f}s, "
                    f"native={'yes' if native else 'no'})")

    def _evaluate_native(self, cat_ids, maxDet):  # noqa: N803
        """Run matching in the C++ kernel (yolox_tpu/native/cocoeval.cpp);
        returns evalImgs dicts identical to the python path's."""
        from yolox_tpu.native import cocoeval_evaluate_native

        p = self.params
        groups = []      # (imgId, catId, dts_sorted, gts) for non-empty
        group_of = {}    # (catId, imgId) -> group idx or None
        dt_off = [0]
        gt_off = [0]
        iou_off = []
        dt_areas, dt_scores_all, dt_ids_all = [], [], []
        gt_areas, gt_iscrowd, gt_ignore_base, gt_ids_all = [], [], [], []
        iou_flat = []
        iou_pos = 0
        for catId in cat_ids:
            for imgId in p.imgIds:
                gt = self._gts[imgId, catId]
                dt = self._dts[imgId, catId]
                if len(gt) == 0 and len(dt) == 0:
                    group_of[catId, imgId] = None
                    continue
                inds = np.argsort([-d["score"] for d in dt],
                                  kind="mergesort")
                dt = [dt[i] for i in inds][: p.maxDets[-1]]
                group_of[catId, imgId] = len(groups)
                groups.append((imgId, catId, dt, gt))
                dt_off.append(dt_off[-1] + len(dt))
                gt_off.append(gt_off[-1] + len(gt))
                dt_areas.extend(d["area"] for d in dt)
                dt_scores_all.append([d["score"] for d in dt])
                dt_ids_all.append([d["id"] for d in dt])
                gt_areas.extend(g["area"] for g in gt)
                gt_iscrowd.extend(int(g.get("iscrowd", 0)) for g in gt)
                gt_ignore_base.extend(int(g["ignore"]) for g in gt)
                gt_ids_all.append([g["id"] for g in gt])
                ious = np.asarray(self.ious[imgId, catId], np.float64)
                iou_off.append(iou_pos)
                iou_flat.append(ious.reshape(-1))
                iou_pos += ious.size

        if not groups:
            return [None] * (len(cat_ids) * len(p.areaRng) * len(p.imgIds))

        dt_matched, dt_ignored, gt_ignored, out_dt_off, out_gt_off = \
            cocoeval_evaluate_native(
                np.asarray(dt_off), np.asarray(gt_off),
                np.asarray(iou_off, np.int64),
                np.asarray(dt_areas, np.float64),
                np.asarray(gt_areas, np.float64),
                np.asarray(gt_iscrowd, np.uint8),
                np.asarray(gt_ignore_base, np.uint8),
                (np.concatenate(iou_flat) if iou_flat
                 else np.zeros(0, np.float64)),
                np.asarray(p.iouThrs, np.float64),
                np.asarray(p.areaRng, np.float64),
                maxDet)

        T = len(p.iouThrs)
        n_area = len(p.areaRng)
        evalImgs = []
        for k, catId in enumerate(cat_ids):
            for a, aRng in enumerate(p.areaRng):
                for imgId in p.imgIds:
                    gidx = group_of[catId, imgId]
                    if gidx is None:
                        evalImgs.append(None)
                        continue
                    r = gidx * n_area + a
                    D = int(out_dt_off[r + 1] - out_dt_off[r])
                    G = int(out_gt_off[r + 1] - out_gt_off[r])
                    dm = dt_matched[
                        out_dt_off[r] * T: out_dt_off[r] * T + T * D
                    ].reshape(T, D).astype(np.float64)
                    dig = dt_ignored[
                        out_dt_off[r] * T: out_dt_off[r] * T + T * D
                    ].reshape(T, D).astype(bool)
                    gig = gt_ignored[
                        out_gt_off[r]: out_gt_off[r] + G
                    ].astype(np.int64)
                    evalImgs.append({
                        "image_id": imgId,
                        "category_id": catId,
                        "aRng": aRng,
                        "maxDet": maxDet,
                        "dtIds": dt_ids_all[gidx],
                        "gtIds": gt_ids_all[gidx],
                        "dtMatches": dm,
                        "gtMatches": None,
                        "dtScores": dt_scores_all[gidx],
                        "gtIgnore": gig,
                        "dtIgnore": dig,
                    })
        return evalImgs

    def accumulate(self, p=None):
        tic = time.time()
        if not self.evalImgs:
            logger.warning("Please run evaluate() first")
        if p is None:
            p = self.params
        p.catIds = p.catIds if p.useCats == 1 else [-1]
        T = len(p.iouThrs)
        R = len(p.recThrs)
        K = len(p.catIds) if p.useCats else 1
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores = -np.ones((T, R, K, A, M))

        _pe = self._paramsEval
        catIds = _pe.catIds if _pe.useCats else [-1]
        setK = set(catIds)
        setA = set(map(tuple, _pe.areaRng))
        setM = set(_pe.maxDets)
        setI = set(_pe.imgIds)
        k_list = [n for n, k in enumerate(p.catIds) if k in setK]
        m_list = [m for n, m in enumerate(p.maxDets) if m in setM]
        a_list = [n for n, a in enumerate(
            map(lambda x: tuple(x), p.areaRng)) if a in setA]
        i_list = [n for n, i in enumerate(p.imgIds) if i in setI]
        I0 = len(_pe.imgIds)
        A0 = len(_pe.areaRng)
        for k, k0 in enumerate(k_list):
            Nk = k0 * A0 * I0
            for a, a0 in enumerate(a_list):
                Na = a0 * I0
                for m, maxDet in enumerate(m_list):
                    E = [self.evalImgs[Nk + Na + i] for i in i_list]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate(
                        [e["dtScores"][0:maxDet] for e in E])
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtScoresSorted = dtScores[inds]

                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    dtIg = np.concatenate(
                        [e["dtIgnore"][:, 0:maxDet] for e in E],
                        axis=1)[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(
                        np.logical_not(dtm), np.logical_not(dtIg))

                    tp_sum = np.cumsum(tps, axis=1).astype(dtype=float)
                    fp_sum = np.cumsum(fps, axis=1).astype(dtype=float)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        tp = np.array(tp)
                        fp = np.array(fp)
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        ss = np.zeros((R,))
                        if nd:
                            recall[t, k, a, m] = rc[-1]
                        else:
                            recall[t, k, a, m] = 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds_r = np.searchsorted(rc, p.recThrs, side="left")
                        try:
                            for ri, pi in enumerate(inds_r):
                                q[ri] = pr[pi]
                                ss[ri] = dtScoresSorted[pi]
                        except Exception:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
                        scores[t, :, k, a, m] = np.array(ss)
        self.eval = {
            "params": p,
            "counts": [T, R, K, A, M],
            "date": datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
            "precision": precision,
            "recall": recall,
            "scores": scores,
        }
        logger.info(f"COCOeval accumulate done (t={time.time() - tic:.2f}s)")

    def summarize(self):
        def _summarize(ap=1, iouThr=None, areaRng="all", maxDets=100):
            p = self.params
            iStr = (" {:<18} {} @[ IoU={:<9} | area={:>6s} | "
                    "maxDets={:>3d} ] = {:0.3f}")
            titleStr = "Average Precision" if ap == 1 else "Average Recall"
            typeStr = "(AP)" if ap == 1 else "(AR)"
            iouStr = ("{:0.2f}:{:0.2f}".format(p.iouThrs[0], p.iouThrs[-1])
                      if iouThr is None else "{:0.2f}".format(iouThr))
            aind = [i for i, a in enumerate(p.areaRngLbl) if a == areaRng]
            mind = [i for i, m in enumerate(p.maxDets) if m == maxDets]
            if ap == 1:
                s = self.eval["precision"]
                if iouThr is not None:
                    t = np.where(iouThr == p.iouThrs)[0]
                    s = s[t]
                s = s[:, :, :, aind, mind]
            else:
                s = self.eval["recall"]
                if iouThr is not None:
                    t = np.where(iouThr == p.iouThrs)[0]
                    s = s[t]
                s = s[:, :, aind, mind]
            if len(s[s > -1]) == 0:
                mean_s = -1
            else:
                mean_s = np.mean(s[s > -1])
            print(iStr.format(titleStr, typeStr, iouStr, areaRng, maxDets,
                              mean_s))
            return mean_s

        if not self.eval:
            raise Exception("Please run accumulate() first")
        stats = np.zeros((12,))
        stats[0] = _summarize(1)
        stats[1] = _summarize(1, iouThr=0.5, maxDets=self.params.maxDets[2])
        stats[2] = _summarize(1, iouThr=0.75, maxDets=self.params.maxDets[2])
        stats[3] = _summarize(1, areaRng="small",
                              maxDets=self.params.maxDets[2])
        stats[4] = _summarize(1, areaRng="medium",
                              maxDets=self.params.maxDets[2])
        stats[5] = _summarize(1, areaRng="large",
                              maxDets=self.params.maxDets[2])
        stats[6] = _summarize(0, maxDets=self.params.maxDets[0])
        stats[7] = _summarize(0, maxDets=self.params.maxDets[1])
        stats[8] = _summarize(0, maxDets=self.params.maxDets[2])
        stats[9] = _summarize(0, areaRng="small",
                              maxDets=self.params.maxDets[2])
        stats[10] = _summarize(0, areaRng="medium",
                               maxDets=self.params.maxDets[2])
        stats[11] = _summarize(0, areaRng="large",
                               maxDets=self.params.maxDets[2])
        self.stats = stats
