#!/usr/bin/env python
"""Quantify int8 PTQ accuracy without pretrained weights.

`ops/quant.py` used to promise "typically well under 1 mAP" with no
datum. This harness produces data: it overfits yolox-nano on a few
synthetic images until the model emits real, confident detections (the
same recipe as the e2e oracle
`tests/test_train_step.py::test_overfit_two_images_yields_correct_detection`),
then measures detection agreement of every int8 serving mode against the
f32 forward on those images:

  - match rate: fraction of f32 detections reproduced by the quantized
    model with IoU > 0.5 and the same class (and vice versa — misses and
    hallucinations both count against it);
  - score MAD over matched pairs; box MAD in pixels.

Variants measured: the per-block ladder mode (`int8_qtab`) and the
int8-activations-in-HBM mode (`int8_hbm_qtab`), each at abs-max and
99.9-percentile calibration. One JSON line per variant; the pretrained
gate (`verify_pretrained.py --int8`) supersedes this with real mAP once
weights exist.

Usage:  python scripts/quant_accuracy.py [--steps 800] [--images 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_overfit(steps: int = 800, n_images: int = 4, size: int = 128,
                  seed: int = 0, model: str = "yolox_nano"):
    """Overfit `model` on `n_images` noise images with fixed gt boxes;
    returns (module_with_trained_params, images_f32, gt_list)."""
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.core import full_params, init_train_state, make_train_step

    cfg = YoloxConfig.get_named_config(model)
    module = YoloxModule.from_config(cfg, rng_seed=seed)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 255, (n_images, size, size, 3)),
                    jnp.float32)
    labels = np.zeros((n_images, 5, 5), np.float32)
    gts = []
    for b in range(n_images):
        n = 2
        per = []
        for j in range(n):
            cls = int(rng.integers(0, 10))
            w, h = float(rng.uniform(30, 56)), float(rng.uniform(28, 52))
            cx = float(rng.uniform(w / 2 + 4, size - w / 2 - 4))
            cy = float(rng.uniform(h / 2 + 4, size - h / 2 - 4))
            labels[b, j] = (cls, cx, cy, w, h)
            per.append((cls, cx, cy, w, h))
        gts.append(per)
    labels = jnp.asarray(labels)

    import jax

    step = make_train_step(module, cfg.num_classes, use_ema=False,
                           _jit=False)
    state = init_train_state(module.params, use_ema=False)

    # whole schedule in ONE jitted program (a per-step host dispatch over
    # a tunneled TPU costs more than the step itself)
    @jax.jit
    def run_all(state):
        def body(i, s):
            lr = jnp.where(i > 50, 0.02, 0.02 * (i / 50.0) ** 2)
            s, _ = step(s, x, labels, lr.astype(jnp.float32))
            return s

        return jax.lax.fori_loop(0, steps, body, state)

    state = run_all(state)
    trained = YoloxModule.from_config(cfg)
    trained.params = full_params(state)
    return trained, x, gts, cfg


def _detections(module, cfg, x, conf, qtab=None, hbm=False):
    import jax

    fn = jax.jit(lambda p, xx: module.serve(
        p, xx, conf_thre=conf, nms_thre=cfg.nmsthre, max_det=32,
        int8_qtab=None if hbm else qtab,
        int8_hbm_qtab=qtab if hbm else None))
    dets, valid = fn(module.params, x)
    dets, valid = np.asarray(dets), np.asarray(valid)
    out = []
    for b in range(dets.shape[0]):
        rows = dets[b][valid[b].astype(bool)]
        out.append(rows)  # (x1, y1, x2, y2, obj, cls_conf, cls)
    return out


def _iou(a, b):
    x1 = np.maximum(a[0], b[0]); y1 = np.maximum(a[1], b[1])
    x2 = np.minimum(a[2], b[2]); y2 = np.minimum(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / max(ua, 1e-9)


def agreement(base, other):
    """Symmetric detection agreement between two per-image det lists."""
    matched = 0
    n_base = sum(len(r) for r in base)
    n_other = sum(len(r) for r in other)
    score_mad, box_mad = [], []
    for rb, ro in zip(base, other):
        used = set()
        for det in rb:
            best, best_iou = None, 0.5
            for j, cand in enumerate(ro):
                if j in used or int(cand[6]) != int(det[6]):
                    continue
                iou = _iou(det[:4], cand[:4])
                if iou > best_iou:
                    best, best_iou = j, iou
            if best is not None:
                used.add(best)
                matched += 1
                cand = ro[best]
                score_mad.append(abs(det[4] * det[5] - cand[4] * cand[5]))
                box_mad.append(np.abs(det[:4] - cand[:4]).mean())
    denom = max(n_base + n_other - matched, 1)  # IoU-style set agreement
    return {
        "n_float": int(n_base),
        "n_quant": int(n_other),
        "matched": int(matched),
        "agreement": round(matched / denom, 4),
        "score_mad": round(float(np.mean(score_mad)), 5) if score_mad else None,
        "box_mad_px": round(float(np.mean(box_mad)), 3) if box_mad else None,
    }


def run(steps=800, n_images=4, conf=0.2, seed=0, model="yolox_nano"):
    module, x, gts, cfg = train_overfit(steps, n_images, seed=seed,
                                        model=model)
    base = _detections(module, cfg, x, conf)
    results = {"model": model,
               "n_float_dets": sum(len(r) for r in base)}
    variants = []
    for pct in (None, 99.9):
        qtab = module.calibrate_int8(module.params, x, percentile=pct)
        tag = "amax" if pct is None else f"p{pct}"
        variants.append((f"ladder-{tag}", qtab, False))
        variants.append((f"hbm-{tag}", qtab, True))
    for name, qtab, hbm in variants:
        dq = _detections(module, cfg, x, conf, qtab=qtab, hbm=hbm)
        results[name] = agreement(base, dq)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--conf", type=float, default=0.2)
    ap.add_argument("--model", default="yolox_nano",
                    help="named config (e.g. yolox_nano, yolox_s, yolov3)")
    args = ap.parse_args()
    res = run(args.steps, args.images, args.conf, model=args.model)
    print("QUANT_ACCURACY " + json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
