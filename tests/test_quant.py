"""int8 PTQ serving path (yolox_tpu/ops/quant.py).

No reference analog (the reference serves fp16,
`/root/reference/docs/model_zoo.md:28-31`); these tests pin the
quantization machinery itself: exactness of the int8 kernel against a
float oracle, calibration coverage, and closeness of the quantized
forward/serve to the bf16/f32 path on random weights.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolox_tpu import YoloxConfig, YoloxModule
from yolox_tpu.models.blocks import EVAL_CTX, BaseConv, silu
from yolox_tpu.ops import quant


def test_quantize_roundtrip_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-3, 3, (4, 8, 8, 16)), jnp.float32)
    amax = jnp.max(jnp.abs(x))
    s = quant.act_scale(amax)
    xq = quant.quantize(x, s)
    assert xq.dtype == jnp.int8
    assert int(jnp.max(jnp.abs(xq.astype(jnp.int32)))) <= 127
    # dequantized error bounded by half a quantization step
    err = jnp.max(jnp.abs(xq.astype(jnp.float32) * s - x))
    assert float(err) <= float(s) * 0.5 + 1e-7


def test_fold_bn_matches_batch_norm():
    """fold_bn(w, bn) reproduces conv2d -> eval-mode batch_norm exactly
    (same algebra as utils/model_utils.fuse)."""
    from yolox_tpu.models.blocks import batch_norm, conv2d

    rng = np.random.default_rng(1)
    conv = BaseConv(8, 16, 3, 1)
    p = conv.init(rng)
    p["bn"]["running_mean"] = rng.normal(size=16).astype(np.float32)
    p["bn"]["running_var"] = rng.uniform(0.5, 2, 16).astype(np.float32)
    p["bn"]["weight"] = rng.normal(size=16).astype(np.float32)
    p["bn"]["bias"] = rng.normal(size=16).astype(np.float32)
    p = jax.tree.map(jnp.asarray, p)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)), jnp.float32)

    ref = batch_norm(p["bn"], conv2d(x, p["conv"]["weight"]), EVAL_CTX, ".bn")
    w_fused, bias = quant.fold_bn(p["conv"]["weight"], p["bn"])
    got = conv2d(x, w_fused) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_int8_conv_exact_vs_integer_oracle():
    """The int8 conv accumulates exactly: conv(xq, wq) in int32 equals the
    same integers convolved in float (values stay < 2^24)."""
    rng = np.random.default_rng(2)
    conv = BaseConv(8, 12, 3, 1)
    p = jax.tree.map(jnp.asarray, conv.init(rng))
    x = jnp.asarray(rng.uniform(-2, 2, (2, 6, 6, 8)), jnp.float32)
    amax = jnp.max(jnp.abs(x))

    got = quant.conv_bn_act(x, p, amax, 1, 1, silu)

    # float-side oracle of the identical quantized computation
    from yolox_tpu.models.blocks import conv2d

    w_fused, bias = quant.fold_bn(p["conv"]["weight"], p["bn"])
    wq, sw = quant.weight_qparams(w_fused)
    sx = quant.act_scale(amax)
    xq = quant.quantize(x, sx)
    acc = conv2d(xq.astype(jnp.float32), wq.astype(jnp.float32))
    ref = silu(acc * (sx * sw) + bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.fixture(scope="module")
def small_module():
    cfg = YoloxConfig.get_named_config("yolox_nano")  # depthwise path
    return YoloxModule.from_config(cfg), cfg


def _raw_outputs(m, params, x, qtab=None):
    ctx = (EVAL_CTX if qtab is None
           else dataclasses.replace(EVAL_CTX, int8_qtab=qtab))
    fpn = m.backbone(params["backbone"], x, ctx, "backbone")
    outs, _, _ = m.head.forward_raw_levels(params["head"], fpn, ctx, "head")
    return outs


def test_calibrate_and_serve_int8(small_module):
    m, cfg = small_module
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 255, (2, 128, 128, 3)), jnp.float32)

    qtab = m.calibrate_int8(m.params, x)
    # every BaseConv path calibrated; all finite and positive. Scalar
    # entries are the ladder-mode input amaxes; ".out"/".addout" entries
    # are per-channel producer amaxes for the int8-in-HBM mode.
    assert len(qtab) > 50
    assert all(k.startswith(("backbone", "head")) for k in qtab)
    vals = np.concatenate([np.ravel(v) for v in qtab.values()])
    assert np.isfinite(vals).all() and (vals > 0).all()

    # multi-batch merge takes the elementwise max
    qtab2 = m.calibrate_int8(m.params, [x, x * 2.0])
    key = "backbone.backbone.dark2.0.dconv"
    assert float(qtab2[key]) >= float(qtab[key]) * 1.99

    # quantized raw forward tracks the float forward on random weights
    o_f = _raw_outputs(m, m.params, x)
    o_q = _raw_outputs(m, m.params, x, qtab)
    for a, b in zip(o_f, o_q):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rms_rel = float(np.sqrt(((a - b) ** 2).mean()) / (a.std() + 1e-9))
        assert rms_rel < 0.15, rms_rel

    # fused serving graph runs under jit and yields the same contract
    d, v = jax.jit(lambda p, xx: m.serve(p, xx, conf_thre=0.05, max_det=16,
                                         int8_qtab=qtab))(m.params, x)
    assert d.shape == (2, 16, 7) and v.shape == (2, 16)
    assert np.isfinite(np.asarray(d)).all()


def test_enable_int8_eval_forward(small_module):
    """`enable_int8` swaps the decoded eval forward (`module(x)`, the
    evaluator/CLI path) to the quantized graph: output stays decoded
    (B, A, 5+C) f32 and tracks the float forward; NCHW input handling
    and calibration auto-transpose are preserved."""
    m, cfg = small_module
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 255, (2, 128, 128, 3)), jnp.float32)

    o_f = np.asarray(m(x))
    # calibration accepts NCHW (evaluator dataloader layout) too
    qtab = m.calibrate_int8(m.params, jnp.transpose(x, (0, 3, 1, 2)))
    qtab_nhwc = m.calibrate_int8(m.params, x)
    key = "backbone.backbone.dark2.0.dconv"
    np.testing.assert_allclose(np.asarray(qtab[key]),
                               np.asarray(qtab_nhwc[key]))

    m.enable_int8(qtab)
    try:
        o_q = np.asarray(m(x))
    finally:  # restore the float forward for other tests (module-scoped)
        m._forward_eval = jax.jit(
            lambda p, xx: m.head(p["head"], m.backbone(p["backbone"], xx)))
    assert o_q.shape == o_f.shape and o_q.dtype == np.float32
    rms_rel = float(np.sqrt(((o_f - o_q) ** 2).mean()) / (o_f.std() + 1e-9))
    assert rms_rel < 0.15, rms_rel


def test_percentile_calibration(small_module):
    """Percentile calibration clips outliers: every scale basis is <= the
    abs-max table's, strictly less where the input has a heavy tail, and
    the resulting table still serves."""
    m, cfg = small_module
    rng = np.random.default_rng(6)
    x = np.asarray(rng.uniform(0, 255, (2, 128, 128, 3)), np.float32)
    x[0, 0, 0] = 1e4  # inject an outlier into the stem input
    x = jnp.asarray(x)

    qmax = m.calibrate_int8(m.params, x)
    qpct = m.calibrate_int8(m.params, x, percentile=99.9)
    le = sum(bool(np.all(np.asarray(qpct[k]) <= np.asarray(qmax[k]) + 1e-6))
             for k in qmax)
    assert le == len(qmax)
    stem = "backbone.backbone.stem.conv"  # sees the raw-image outlier
    assert float(qpct[stem]) < float(qmax[stem]) * 0.5

    d, v = jax.jit(lambda p, xx: m.serve(p, xx, conf_thre=0.05, max_det=16,
                                         int8_qtab=qpct))(m.params, x)
    assert np.isfinite(np.asarray(d)).all()


def test_int8_composes_with_mesh_serving(small_module):
    """make_serving_fn(int8_qtab=...) over a (data, space) mesh equals the
    single-device int8 serve — quantization is pointwise per block, so
    GSPMD spatial partitioning must not change the numbers."""
    from yolox_tpu.parallel.mesh import serving_mesh

    m, cfg = small_module
    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 255, (2, 128, 128, 3)), jnp.float32)
    qtab = m.calibrate_int8(m.params, x)

    single = m.make_serving_fn(conf_thre=1e-5, max_det=32, int8_qtab=qtab)
    d1, v1 = single(m.params, x)
    mesh = serving_mesh(2, 2)
    sharded = m.make_serving_fn(mesh=mesh, conf_thre=1e-5, max_det=32,
                                int8_qtab=qtab)
    dn, vn = sharded(m.params, x)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(vn))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(dn),
                               rtol=1e-6, atol=1e-5)


def test_int8_hbm_composes_with_mesh_serving(small_module):
    """make_serving_fn(int8_hbm_qtab=...) over a (data, space) mesh equals
    the single-device int8-hbm serve: QTensor codes shard like any NHWC
    activation (halo exchanges on int8 codes), per-channel scales
    replicate — GSPMD must not change the numbers."""
    from yolox_tpu.parallel.mesh import serving_mesh

    m, cfg = small_module
    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 255, (2, 128, 128, 3)), jnp.float32)
    qtab = m.calibrate_int8(m.params, x)

    single = m.make_serving_fn(conf_thre=1e-5, max_det=32,
                               int8_hbm_qtab=qtab)
    d1, v1 = single(m.params, x)
    mesh = serving_mesh(2, 2)
    sharded = m.make_serving_fn(mesh=mesh, conf_thre=1e-5, max_det=32,
                                int8_hbm_qtab=qtab)
    dn, vn = sharded(m.params, x)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(vn))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(dn),
                               rtol=1e-6, atol=1e-5)


def test_int8_rejected_in_train_mode(small_module):
    m, _ = small_module
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    qtab = m.calibrate_int8(m.params, x)
    ctx = dataclasses.replace(EVAL_CTX, train=True, int8_qtab=qtab)
    with pytest.raises(AssertionError):
        m.backbone(m.params["backbone"], x, ctx, "backbone")


# ---------------------------------------------------------------------------
# int8-in-HBM mode (QTensor block interface; quant.py "hbm" section)
# ---------------------------------------------------------------------------

def test_requant_error_bound():
    """Per-channel requant error is bounded by half a step per channel."""
    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.normal(size=(2, 8, 8, 16)) * 3, jnp.float32)
    amax = jnp.max(jnp.abs(y), axis=(0, 1, 2))
    qt = quant.requant(y, amax)
    assert qt.codes.dtype == jnp.int8 and qt.scale.shape == (16,)
    err = np.abs(np.asarray(quant.dequant(qt)) - np.asarray(y))
    bound = np.asarray(qt.scale) * 0.5 + 1e-7
    assert (err <= bound[None, None, None, :]).all()


def test_fold_in_scale_exact():
    """conv(codes, w * scale) == conv(codes * scale, w) for groups=1 and
    depthwise — the weight-side scale fold is algebraically lossless."""
    from yolox_tpu.models.blocks import conv2d

    rng = np.random.default_rng(8)
    codes = jnp.asarray(rng.integers(-127, 128, (2, 8, 8, 16)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.01, 2.0, (16,)), jnp.float32)
    for groups, cout in ((1, 24), (16, 16)):
        w = jnp.asarray(
            rng.normal(size=(3, 3, 16 // groups, cout)) * 0.1, jnp.float32)
        ref = conv2d(codes * scale, w, 1, groups)
        got = conv2d(codes, quant.fold_in_scale(w, scale, groups), 1, groups)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_q_concat_and_maxpool_semantics():
    rng = np.random.default_rng(9)
    a = quant.requant(jnp.asarray(rng.normal(size=(1, 4, 4, 8)), jnp.float32),
                      jnp.full((8,), 3.0))
    b = quant.requant(jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32),
                      jnp.full((4,), 1.0))
    cat = quant.q_concat([a, b])
    assert cat.codes.shape == (1, 4, 4, 12) and cat.scale.shape == (12,)
    np.testing.assert_allclose(
        np.asarray(quant.dequant(cat)),
        np.concatenate([np.asarray(quant.dequant(a)),
                        np.asarray(quant.dequant(b))], -1))
    # max pool on codes == pool of dequantized values (positive scales)
    pooled = quant.q_max_pool_same(a, 3)
    from yolox_tpu.models.blocks import max_pool_same

    np.testing.assert_allclose(
        np.asarray(quant.dequant(pooled)),
        np.asarray(max_pool_same(quant.dequant(a), 3)))


@pytest.fixture(scope="module")
def small_s_module():
    cfg = YoloxConfig.get_named_config("yolox_s")  # plain-conv path
    return YoloxModule.from_config(cfg), cfg


@pytest.fixture
def small_v3_module():
    cfg = YoloxConfig.get_named_config("yolov3")  # YoloFpn/Darknet, lrelu
    return YoloxModule.from_config(cfg), cfg


@pytest.mark.parametrize("fixture", ["small_module", "small_s_module",
                                     "small_v3_module"])
def test_int8_hbm_serve_tracks_float(fixture, request):
    """The int8-in-HBM serve path (activations cross blocks as int8 codes)
    tracks the float forward far tighter than the ladder mode (per-channel
    scales): rms_rel < 2% on random weights, and the serve contract holds.
    Covers the depthwise (nano), plain-conv (s), and legacy
    YoloFpn/Darknet-53 lrelu (yolov3) block zoos."""
    m, cfg = request.getfixturevalue(fixture)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.uniform(0, 255, (2, 128, 128, 3)), jnp.float32)
    qtab = m.calibrate_int8(m.params, x)
    out_keys = [k for k in qtab if k.endswith(".out")]
    add_keys = [k for k in qtab if k.endswith(".addout")]
    assert out_keys and np.asarray(qtab[out_keys[0]]).ndim == 1
    assert add_keys  # Bottleneck residual adds calibrated

    o_f = _raw_outputs(m, m.params, x)
    ctx = dataclasses.replace(EVAL_CTX, int8_hbm_qtab=qtab)
    fpn = m.backbone(m.params["backbone"], x, ctx, "backbone")
    o_q, _, _ = m.head.forward_raw_levels(m.params["head"], fpn, ctx, "head")
    for a, b in zip(o_f, o_q):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rms_rel = float(np.sqrt(((a - b) ** 2).mean()) / (a.std() + 1e-9))
        assert rms_rel < 0.02, rms_rel

    d, v = jax.jit(lambda p, xx: m.serve(p, xx, conf_thre=0.05, max_det=16,
                                         int8_hbm_qtab=qtab))(m.params, x)
    assert d.shape == (2, 16, 7) and v.shape == (2, 16)
    assert np.isfinite(np.asarray(d)).all()


def test_int8_hbm_rejected_in_train_mode(small_module):
    m, _ = small_module
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    qtab = m.calibrate_int8(m.params, x)
    ctx = dataclasses.replace(EVAL_CTX, train=True, int8_hbm_qtab=qtab)
    with pytest.raises(AssertionError):
        m.backbone(m.params["backbone"], x, ctx, "backbone")


@pytest.mark.slow
def test_int8_accuracy_on_overfit_model():
    """PTQ accuracy floor on a REAL (overfit-trained) model, not random
    weights: at abs-max calibration, both int8 modes must reproduce the
    f32 model's detections (IoU>0.5, same class, symmetric set agreement)
    nearly perfectly. Full table: `scripts/quant_accuracy.py` (measured
    on-chip: agreement 1.0 both modes, score MAD ~0.022, box MAD <0.5px
    at 600 steps / 4 images)."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "scripts"))
    try:
        import quant_accuracy as qa
    finally:
        sys.path.pop(0)

    res = qa.run(steps=300, n_images=2, conf=0.2)
    assert res["n_float_dets"] >= 2, res   # non-vacuous comparison
    for mode in ("ladder-amax", "hbm-amax"):
        r = res[mode]
        assert r["agreement"] >= 0.8, (mode, r)
        assert r["score_mad"] is not None and r["score_mad"] <= 0.08, (mode, r)
