"""Lane folding (yolox_tpu/ops/lane_fold.py) exactness vs logical ops.

The folded representation is exact — fold -> fold_conv -> unfold must
equal the logical conv bit-for-tolerance in f32 across kernel sizes,
strides, folds and grouping, including the fold-halving downsample chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolox_tpu.models import blocks
from yolox_tpu.ops import lane_fold as lf


def test_fold_unfold_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 24, 7)), jnp.float32)
    for k in (1, 2, 4, 8):
        f = lf.fold(x, k)
        assert f.shape == (2, 5, 24 // k, 7 * k)
        np.testing.assert_array_equal(lf.unfold(f, k), x)


CASES = [
    # (kh=kw, stride, ci, co, k_in, k_out, w)
    (3, 1, 8, 16, 4, 4, 32),
    (1, 1, 16, 8, 2, 2, 32),
    (3, 2, 8, 16, 4, 2, 32),
    (3, 2, 16, 32, 2, 1, 32),
    (5, 1, 4, 4, 8, 8, 64),
    (3, 1, 4, 12, 8, 16, 64),   # fold increase at stride 1 (sigma=2)
]


@pytest.mark.parametrize("k,s,ci,co,kin,kout,w", CASES)
def test_fold_conv_matches_logical(k, s, ci, co, kin, kout, w):
    rng = np.random.default_rng(k * 100 + s)
    x = jnp.asarray(rng.normal(size=(2, 9, w, ci)), jnp.float32)
    ker = jnp.asarray(rng.normal(size=(k, k, ci, co)) * 0.1, jnp.float32)
    ref = blocks.conv2d(x, ker, stride=s)
    out = lf.unfold(
        lf.fold_conv(lf.fold(x, kin), ker, s, ((k - 1) // 2, (k - 1) // 2),
                     kin, kout), kout)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_fold_conv_depthwise_matches_logical():
    rng = np.random.default_rng(3)
    c = 8
    x = jnp.asarray(rng.normal(size=(2, 9, 32, c)), jnp.float32)
    ker = jnp.asarray(rng.normal(size=(3, 3, 1, c)) * 0.2, jnp.float32)
    ref = blocks.conv2d(x, ker, stride=1, groups=c)
    out = lf.unfold(
        lf.fold_conv(lf.fold(x, 4), ker, 1, (1, 1), 4, 4, groups=c), 4)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    # stride-2 depthwise (nano/tiny downsample convs)
    ref2 = blocks.conv2d(x, ker, stride=2, groups=c)
    out2 = lf.unfold(
        lf.fold_conv(lf.fold(x, 4), ker, 2, (1, 1), 4, 2, groups=c), 2)
    np.testing.assert_allclose(out2, ref2, rtol=1e-5, atol=1e-5)


def test_focus_style_even_kernel():
    """Focus lowers to a 2k x 2k stride-2 conv with pad k-1 on the raw
    image; the folded path must reproduce it (k_in = 2*k_out)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 16, 64, 3)), jnp.float32)
    ker = jnp.asarray(rng.normal(size=(6, 6, 3, 8)) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, ker, (2, 2), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = lf.unfold(
        lf.fold_conv(lf.fold(x, 8), ker, 2, (2, 2), 8, 4), 4)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_downsample_chain():
    """Fold-halving chain: three stride-2 convs from k=8 to k=1 equal the
    logical chain."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 8, 64, 4)), jnp.float32)
    kers = [jnp.asarray(rng.normal(size=(3, 3, c, 2 * c)) * 0.2, jnp.float32)
            for c in (4, 8, 16)]
    ref = x
    for ker in kers:
        ref = blocks.conv2d(ref, ker, stride=2)
    out = lf.fold(x, 8)
    for ker, (kin, kout) in zip(kers, [(8, 4), (4, 2), (2, 1)]):
        out = lf.fold_conv(out, ker, 2, (1, 1), kin, kout)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_stage_folds():
    assert lf.stage_folds(32) == (8, 4, 2, 1, 1)
    assert lf.stage_folds(16) == (16, 8, 4, 2, 1)
    assert lf.stage_folds(64) == (4, 2, 1, 1, 1)
    assert lf.stage_folds(80) == (4, 2, 1, 1, 1)
    assert lf.stage_folds(256) == (1, 1, 1, 1, 1)
    # config.lane_fold_target knob: shallower folds at target=128
    assert lf.stage_folds(16, target=128) == (8, 4, 2, 1, 1)
    assert lf.stage_folds(32, target=128) == (4, 2, 1, 1, 1)


def test_lane_fold_target_config_knob():
    """config.lane_fold_target reaches stage_folds and stays exact."""
    import numpy as np

    from yolox_tpu import YoloxConfig, YoloxModule

    cfg = YoloxConfig.get_named_config("yolox_nano")
    cfg.lane_fold_target = 128
    module = YoloxModule.from_config(cfg)
    assert module.backbone.backbone.folds == (8, 4, 2, 1, 1)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)
    d0, v0 = module.serve(module.params, x, conf_thre=1e-6,
                          max_det=16, lane_fold=False)
    d1, v1 = module.serve(module.params, x, conf_thre=1e-6,
                          max_det=16, lane_fold=True)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=2e-5, atol=2e-5)


def test_grad_flows_through_folded_kernel():
    """Weight gradients through the fold scatter equal logical-conv grads."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 6, 16, 4)), jnp.float32)
    ker = jnp.asarray(rng.normal(size=(3, 3, 4, 8)) * 0.2, jnp.float32)
    ct = jnp.asarray(rng.normal(size=(1, 6, 16, 8)), jnp.float32)

    def loss_ref(k):
        return jnp.sum(blocks.conv2d(x, k) * ct)

    def loss_fold(k):
        y = lf.unfold(lf.fold_conv(lf.fold(x, 4), k, 1, (1, 1), 4, 4), 4)
        return jnp.sum(y * ct)

    g0 = jax.grad(loss_ref)(ker)
    g1 = jax.grad(loss_fold)(ker)
    np.testing.assert_allclose(g1, g0, rtol=1e-5, atol=1e-5)


def _ctx(train=False, collector=None, fold=True):
    return blocks.Ctx(train=train, collector=collector, lane_fold=fold)


@pytest.mark.parametrize("depthwise", [False, True])
def test_cspdarknet_folded_equals_plain(depthwise):
    """Whole backbone, eval + train mode: folded == plain (same params)."""
    from yolox_tpu.models.darknet import CspDarknet

    net = CspDarknet(0.33, 0.25, out_features=("dark3", "dark4", "dark5"),
                     depthwise=depthwise)
    assert net.folds[0] > 1
    rng = np.random.default_rng(0)
    p = jax.tree.map(jnp.asarray, net.init(rng))
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)

    y0 = net(p, x, _ctx(fold=False))
    y1 = net(p, x, _ctx(fold=True))
    assert set(y0) == set(y1)
    for k in y0:
        assert y1[k].shape == y0[k].shape
        np.testing.assert_allclose(y1[k], y0[k], rtol=2e-4, atol=2e-4,
                                   err_msg=k)

    # train mode: BN batch stats identical (slot pooling is exact)
    c0, c1 = blocks.BNCollector(), blocks.BNCollector()
    t0 = net(p, x, _ctx(train=True, collector=c0, fold=False))
    t1 = net(p, x, _ctx(train=True, collector=c1, fold=True))
    assert set(c0.updates) == set(c1.updates)
    for k in c0.updates:
        np.testing.assert_allclose(c1.updates[k], c0.updates[k],
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    for k in t0:
        np.testing.assert_allclose(t1[k], t0[k], rtol=2e-3, atol=2e-3,
                                   err_msg=k)


def test_indivisible_width_falls_back():
    """W=48 does not divide the fold chain (2*stem_fold=32): the backbone
    must transparently run every stage plain."""
    from yolox_tpu.models.darknet import CspDarknet

    net = CspDarknet(0.33, 0.25)
    assert net.fold_divisor == 32
    rng = np.random.default_rng(1)
    p = jax.tree.map(jnp.asarray, net.init(rng))
    x = jnp.asarray(rng.normal(size=(1, 48, 48, 3)), jnp.float32)
    y0 = net(p, x, _ctx(fold=False))
    y1 = net(p, x, _ctx(fold=True))   # silently plain
    for k in y0:
        np.testing.assert_array_equal(y1[k], y0[k])


def test_full_model_folded_grads_close():
    """yolox-nano-ish module end to end: folded apply_train gradients match
    the plain graph (f64 exactness statement, as in test_fused_conv_bwd)."""
    from yolox_tpu.config import YoloxConfig
    from yolox_tpu.models.weights import merge_params, split_train_state
    from yolox_tpu.models.yolox import YoloxModule

    with jax.enable_x64(True):
        cfg = YoloxConfig.get_named_config("yolox-nano")
        cfg.num_classes = 4
        module = YoloxModule.from_config(cfg, rng_seed=0)
        trainable, stats = split_train_state(module.params)
        trainable = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float64), trainable)
        stats = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float64)
            if a.dtype == jnp.float32 else jnp.asarray(a), stats)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float64)

        def loss(trainable, fold):
            params = merge_params(trainable, stats)
            col = blocks.BNCollector()
            out = module.apply_train(params, x, col, lane_fold=fold)
            return jnp.sum(out["outputs"] ** 2) * 1e-3

        g0 = jax.grad(lambda p: loss(p, False))(trainable)
        g1 = jax.grad(lambda p: loss(p, True))(trainable)
        flat0 = jax.tree_util.tree_leaves_with_path(g0)
        flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
        for path, v0 in flat0:
            scale = float(jnp.max(jnp.abs(v0))) + 1e-12
            np.testing.assert_allclose(
                np.asarray(flat1[path]) / scale, np.asarray(v0) / scale,
                rtol=0, atol=1e-7, err_msg=str(path))


def test_serve_lane_fold_matches_plain():
    """Full serving path (forward + decode + NMS) with the folded
    backbone == plain, for a depthwise (nano-style) model."""
    import numpy as np

    from yolox_tpu import YoloxConfig, YoloxModule

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = YoloxModule.from_config(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)

    d0, v0 = module.serve(module.params, x, conf_thre=1e-6,
                          max_det=32, lane_fold=False)
    d1, v1 = module.serve(module.params, x, conf_thre=1e-6,
                          max_det=32, lane_fold=True)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=2e-5, atol=2e-5)
