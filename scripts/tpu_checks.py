#!/usr/bin/env python
"""On-TPU kernel checks — run on a real chip (pytest forces a CPU mesh,
so Pallas TPU code paths are NOT covered by `pytest tests/`; this script
is the TPU lane). Exits nonzero on any failure.

    python scripts/tpu_checks.py

Covers: Pallas NMS vs the XLA fixpoint formulation, the Pallas shear
kernel vs its scan reference across lane widths (tpu.dynamic_rotate is
only sound on power-of-two windows — regression for a real bug), the
fused serving path, and the device-augmentation engine TPU-vs-CPU.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def check_pallas_nms():
    from yolox_tpu.ops.nms import nms_fixed
    from yolox_tpu.ops.pallas_nms import nms_pallas

    rng = np.random.default_rng(0)
    for k in (128, 256):
        for thr in (0.3, 0.65):
            cx, cy = rng.uniform(50, 500, (2, k))
            w, h = rng.uniform(20, 120, (2, k))
            boxes = np.stack(
                [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                1).astype(np.float32)
            scores = rng.random(k).astype(np.float32)
            valid = rng.random(k) > 0.15
            ref = np.asarray(nms_fixed(
                jnp.asarray(boxes), jnp.asarray(scores), thr,
                jnp.asarray(valid)))
            got = np.asarray(nms_pallas(
                jnp.asarray(boxes), jnp.asarray(scores), thr,
                jnp.asarray(valid)))
            assert np.array_equal(ref, got), (k, thr)
    print("pallas NMS == XLA fixpoint: OK")


def check_pallas_shear():
    from yolox_tpu.ops.pallas_warp import shear_x, shear_x_reference

    rng = np.random.default_rng(1)
    for (b, h, w, out, px) in [(2, 1024, 1024, 640, 3), (4, 640, 1024, 640, 3),
                               (1, 8, 256, 128, 1), (1, 16, 2048, 640, 1),
                               (2, 128, 1024, 640, 3)]:
        img = jnp.asarray(
            rng.uniform(0, 255, (b, h, w * px)).astype(np.float32))
        # affine-form shifts (shear_x's contract: integer shifts span
        # <= _MAX_DK inside each 8-row group — slope-bounded, as the
        # warp engine produces); random base per image, random slope up
        # to 0.42/row of either sign, clipped to the legal range
        base = rng.uniform(0.0, w - out - 2, (b, 1))
        slope = rng.uniform(-0.42, 0.42, (b, 1))
        rows = np.arange(h, dtype=np.float32)[None, :]
        shifts = jnp.asarray(np.clip(
            base + slope * rows, 0.0, w - out - 2).astype(np.float32))
        a = np.asarray(shear_x(img, shifts, out, px=px))
        ref = np.asarray(shear_x_reference(img, shifts, out, px=px))
        err = np.abs(a - ref).max()
        assert err < 1e-2, (b, h, w, px, err)
        # bf16 window path (dynamic_rotate on packed bf16 tiles — guard
        # against silent corruption like the non-pow-2 lane-width bug)
        a16 = np.asarray(
            shear_x(img.astype(jnp.bfloat16), shifts, out, px=px)
        ).astype(np.float32)
        err16 = np.abs(a16 - ref).max()
        assert err16 < 2.0, (b, h, w, px, "bf16", err16)
    print("pallas shear == scan reference (widths 256..2048, px 1/3, "
          "f32+bf16): OK")


def check_fused_serving():
    from yolox_tpu import YoloxConfig, YoloxModule

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = YoloxModule.from_config(cfg)
    x = jnp.asarray(np.random.default_rng(2).uniform(
        0, 255, (2, 416, 416, 3)), jnp.float32)
    dets, valid = module.serve(module.params, x, conf_thre=1e-5)
    assert np.asarray(valid).sum() > 0
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()
    print("fused serving path on TPU: OK")


def check_int8_serving():
    """int8 PTQ path on real silicon: the int8 conv must compile to the
    MXU int8 path and track the float forward (machinery exactness is
    pinned by tests/test_quant.py on CPU; this guards the TPU lowering
    of int8 conv_general_dilated + int32 accumulate)."""
    from yolox_tpu import YoloxConfig, YoloxModule

    cfg = YoloxConfig.get_named_config("yolox_s")
    module = YoloxModule.from_config(cfg, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(4).uniform(
        0, 255, (2, 640, 640, 3)), jnp.float32)
    qtab = module.calibrate_int8(module.params, x)
    d_q, v_q = jax.jit(lambda p, xx: module.serve(
        p, xx, conf_thre=1e-5, max_det=64, int8_qtab=qtab))(
            module.params, x)
    d_f, v_f = jax.jit(lambda p, xx: module.serve(
        p, xx, conf_thre=1e-5, max_det=64))(module.params, x)
    assert np.isfinite(np.asarray(d_q)[np.asarray(v_q)]).all()
    assert np.asarray(v_q).sum() > 0
    # same detection count ballpark as the bf16 forward on random weights
    ratio = (np.asarray(v_q).sum() + 1.0) / (np.asarray(v_f).sum() + 1.0)
    assert 0.2 < ratio < 5.0, ratio
    print(f"int8 PTQ serving on TPU: OK (valid dets int8/bf16 = {ratio:.2f})")


def check_device_augment():
    import yolox_tpu.ops.pallas_warp as pw
    from yolox_tpu.data.device_augment import device_augment_batch

    s = 128
    rng = np.random.default_rng(3)
    tiles = rng.integers(0, 255, (4, 5, s, s, 3), dtype=np.uint8)
    hw = rng.integers(64, s + 1, (4, 5, 2)).astype(np.float32)
    labels = np.zeros((4, 5, 8, 5), np.float32)
    labels[..., 0, :] = [8, 8, 60, 60, 2]
    args = (jnp.asarray(tiles), jnp.asarray(hw), jnp.asarray(labels))

    imgs_t, labs_t = device_augment_batch(
        *args, jax.random.PRNGKey(0), out_size=(s, s), max_labels=16)
    with jax.default_device(jax.devices("cpu")[0]):
        orig = pw._use_pallas
        pw._use_pallas = lambda: False
        try:
            imgs_c, labs_c = device_augment_batch(
                *args, jax.random.PRNGKey(0), out_size=(s, s), max_labels=16)
        finally:
            pw._use_pallas = orig
    img_err = np.abs(np.asarray(imgs_t) - np.asarray(imgs_c)).max()
    lab_err = np.abs(np.asarray(labs_t) - np.asarray(labs_c)).max()
    # TPU matmuls take bf16 inputs by default: ~1 intensity level of noise
    assert img_err < 2.0, img_err
    assert lab_err < 1e-3, lab_err
    print(f"device augment TPU vs CPU engine: OK "
          f"(img err {img_err:.3f}, label err {lab_err:.2e})")


def main():
    if jax.default_backend() not in ("tpu", "axon"):
        print(f"WARNING: backend is {jax.default_backend()!r}, not a TPU — "
              "these checks only exercise the Pallas paths on real silicon")
    check_pallas_nms()
    check_pallas_shear()
    check_fused_serving()
    check_int8_serving()
    check_device_augment()
    print("ALL TPU CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
