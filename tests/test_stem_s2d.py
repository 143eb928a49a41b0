"""Transpose-free space-to-depth stem (yolox_tpu/ops/stem_s2d.py).

No reference analog — the reference runs the Focus slices + 3-channel
conv directly (`/root/reference/yolox/models/network_blocks.py:186-208`);
this fold is TPU-first (XLA VPU-lowers small-C_in convs, see
docs/serving_performance.md "Batch-1 latency"). These tests pin:
exactness of both kernel folds against the plain modules, legality
fallbacks, and the full serve path with the fold on vs off.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolox_tpu import YoloxConfig, YoloxModule
from yolox_tpu.models.blocks import EVAL_CTX, BaseConv, Focus, batch_norm
from yolox_tpu.models.darknet import CspDarknet
from yolox_tpu.ops import stem_s2d as s2d

S2D_CTX = dataclasses.replace(EVAL_CTX, stem_s2d=True)


def _randomized_bn(rng, bn):
    c = bn["weight"].shape[0]
    bn["running_mean"] = rng.normal(size=c).astype(np.float32)
    bn["running_var"] = rng.uniform(0.5, 2, c).astype(np.float32)
    bn["weight"] = rng.normal(size=c).astype(np.float32)
    bn["bias"] = rng.normal(size=c).astype(np.float32)
    return bn


def test_region_fold_exact():
    """stem_conv_blocked + tiled BN/act + next_conv_blocked reproduces
    Focus -> BaseConv(3, stride 2) to reassociation precision."""
    rng = np.random.default_rng(0)
    c = 16
    focus = Focus(3, c, ksize=3)
    nxt = BaseConv(c, 2 * c, 3, 2)
    pf = focus.init(rng)
    pn = nxt.init(rng)
    _randomized_bn(rng, pf["conv"]["bn"])
    _randomized_bn(rng, pn["bn"])
    pf = jax.tree.map(jnp.asarray, pf)
    pn = jax.tree.map(jnp.asarray, pn)
    x = jnp.asarray(rng.normal(size=(2, 64, 48, 3)), jnp.float32)

    ref = nxt(pn, focus(pf, x, EVAL_CTX, "stem"), EVAL_CTX, "d2")

    a = s2d.stem_conv_blocked(pf["conv"]["conv"]["weight"], x)
    a = batch_norm(s2d.tile4(pf["conv"]["bn"]), a, EVAL_CTX, "stem.conv.bn")
    a = focus.conv.act(a)
    z = s2d.next_conv_blocked(pn["conv"]["weight"], a)
    got = nxt.act(batch_norm(pn["bn"], z, EVAL_CTX, "d2.bn"))

    assert got.shape == ref.shape == (2, 16, 12, 2 * c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_backbone_s2d_matches_plain():
    """CspDarknet with ctx.stem_s2d returns the same features as the
    plain path (all three pyramid levels)."""
    rng = np.random.default_rng(1)
    bb = CspDarknet(0.33, 0.25, lane_fold=False)
    p = jax.tree.map(jnp.asarray, bb.init(rng))
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)

    ref = bb(p, x, EVAL_CTX)
    got = bb(p, x, S2D_CTX)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_fallback_when_illegal():
    """Depthwise stems, non-divisible spatial dims, lane-folded
    execution, calibration, and a requested 'stem' feature all fall back
    to the plain path."""
    rng = np.random.default_rng(2)
    x_ok = jnp.zeros((1, 64, 64, 3), jnp.float32)

    dw = CspDarknet(0.33, 0.25, depthwise=True, lane_fold=False)
    assert not dw._use_stem_s2d(S2D_CTX, x_ok, folded=False)

    bb = CspDarknet(0.33, 0.25, lane_fold=False)
    assert bb._use_stem_s2d(S2D_CTX, x_ok, folded=False)
    assert not bb._use_stem_s2d(S2D_CTX, jnp.zeros((1, 66, 64, 3)), False)
    assert not bb._use_stem_s2d(S2D_CTX, x_ok, folded=True)
    # round-5: the TRAIN step composes (config.train_stem_s2d; fused_bwd
    # keeps its own BaseConv custom-vjp path) ...
    assert bb._use_stem_s2d(
        dataclasses.replace(S2D_CTX, train=True), x_ok, False)
    assert not bb._use_stem_s2d(
        dataclasses.replace(S2D_CTX, train=True, fused_bwd=True), x_ok,
        False)
    # ... and so do the int8 modes (ops/stem_s2d.py int8 section) —
    # only calibration still runs the plain path (canonical qtab keys)
    assert bb._use_stem_s2d(
        dataclasses.replace(S2D_CTX, int8_hbm_qtab={}), x_ok, False)
    assert not bb._use_stem_s2d(
        dataclasses.replace(S2D_CTX, calib_sink={}), x_ok, False)

    st = CspDarknet(0.33, 0.25, lane_fold=False,
                    out_features=("stem", "dark3"))
    assert not st._use_stem_s2d(S2D_CTX, x_ok, False)
    # ... and the fallback actually runs (odd width exercises the guard)
    out = bb(jax.tree.map(jnp.asarray, bb.init(rng)),
             jnp.zeros((1, 66, 66, 3), jnp.float32), S2D_CTX)
    assert out["dark3"].shape[1] == 9  # ceil semantics of strided convs


def test_serve_s2d_matches_plain():
    """Full fused serve with the s2d stem on equals serve with it off."""
    cfg = YoloxConfig("s2d-test", num_classes=7, depth=0.33, width=0.25,
                      input_size=(64, 64), lane_fold=False)
    module = YoloxModule.from_config(cfg, rng_seed=3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)

    on = jax.jit(lambda p, xx: module.serve(p, xx, conf_thre=0.01,
                                            max_det=32, stem_s2d=True))
    off = jax.jit(lambda p, xx: module.serve(p, xx, conf_thre=0.01,
                                             max_det=32, stem_s2d=False))
    dets_on, valid_on = on(module.params, x)
    dets_off, valid_off = off(module.params, x)
    np.testing.assert_array_equal(np.asarray(valid_on),
                                  np.asarray(valid_off))
    np.testing.assert_allclose(np.asarray(dets_on), np.asarray(dets_off),
                               rtol=1e-3, atol=1e-3)


def test_fold_kernels_preserve_tap_values():
    """Every original tap appears exactly once in each folded kernel and
    everything else is a structural zero."""
    rng = np.random.default_rng(5)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 12, 8)), jnp.float32)
    wa = np.asarray(s2d.fold_stem_kernel(w1))
    assert wa.shape == (8, 3, 12, 32)
    # 9 taps * 12 channels per output channel, once each
    nz_per_out = (wa != 0).reshape(-1, 32).sum(axis=0)
    np.testing.assert_array_equal(nz_per_out, 108)
    assert np.isclose(np.abs(wa).sum(), 4 * np.abs(np.asarray(w1)).sum())

    wd = jnp.asarray(rng.normal(size=(3, 3, 8, 16)), jnp.float32)
    wb = np.asarray(s2d.fold_next_kernel(wd))
    assert wb.shape == (2, 2, 32, 16)
    nz_per_out = (wb != 0).reshape(-1, 16).sum(axis=0)
    np.testing.assert_array_equal(nz_per_out, 9 * 8)
    assert np.isclose(np.abs(wb).sum(), np.abs(np.asarray(wd)).sum())


@pytest.mark.parametrize("mode", ["ladder", "hbm"])
def test_serve_s2d_composes_with_int8(mode):
    """int8 serving with the s2d stem equals the plain int8 path: the
    calibrated scales transfer through the folds (per-tensor scales are
    reshape-invariant, per-channel scales tile), so codes and int32
    accumulations match bitwise modulo spatial layout."""
    cfg = YoloxConfig("s2d-int8-test", num_classes=7, depth=0.33,
                      width=0.25, input_size=(64, 64), lane_fold=False)
    module = YoloxModule.from_config(cfg, rng_seed=6)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)
    qtab = module.calibrate_int8(module.params, x)
    kw = {"int8_qtab": qtab} if mode == "ladder" else {"int8_hbm_qtab": qtab}

    on = jax.jit(lambda p, xx: module.serve(p, xx, conf_thre=0.01,
                                            max_det=32, stem_s2d=True, **kw))
    off = jax.jit(lambda p, xx: module.serve(p, xx, conf_thre=0.01,
                                             max_det=32, stem_s2d=False,
                                             **kw))
    dets_on, valid_on = on(module.params, x)
    dets_off, valid_off = off(module.params, x)
    np.testing.assert_array_equal(np.asarray(valid_on),
                                  np.asarray(valid_off))
    np.testing.assert_allclose(np.asarray(dets_on), np.asarray(dets_off),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("mode", ["ladder", "hbm"])
def test_backbone_s2d_int8_region_exact(mode):
    """Backbone-level check at tighter tolerance: the s2d int8 stem
    region reproduces the plain int8 path's features (f32 epilogues,
    identical int8 codes -> only conv-order reassociation drift)."""
    import dataclasses as dc

    from yolox_tpu.models.pafpn import YoloPafpn

    bb = YoloPafpn(0.33, 0.25, lane_fold=False)
    rng = np.random.default_rng(8)
    p = jax.tree.map(jnp.asarray, {"backbone": bb.init(rng)})
    x = jnp.asarray(rng.uniform(0, 255, (1, 64, 64, 3)), jnp.float32)

    sink = {}
    calib_ctx = dc.replace(EVAL_CTX, calib_sink=sink)
    bb(p["backbone"], x, calib_ctx, "backbone")
    qtab = jax.tree.map(jnp.asarray, sink)

    key = "int8_qtab" if mode == "ladder" else "int8_hbm_qtab"
    ctx_off = dc.replace(EVAL_CTX, **{key: qtab})
    ctx_on = dc.replace(ctx_off, stem_s2d=True)
    from yolox_tpu.ops.quant import QTensor, dequant

    def arr(t):
        return np.asarray(dequant(t) if isinstance(t, QTensor) else t)

    ref = bb(p["backbone"], x, ctx_off, "backbone")
    got = bb(p["backbone"], x, ctx_on, "backbone")
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(arr(g), arr(r), rtol=1e-4, atol=1e-4,
                                   err_msg=f"level {i} ({mode})")


def test_train_step_s2d_matches_plain():
    """One full train step (fwd + SimOTA + bwd + SGD + BN stats) with the
    s2d stem equals the plain step: losses, updated params, and the stem
    BN running stats (logical (C,), pooled over block slots)."""
    from yolox_tpu.core import init_train_state, make_train_step
    from yolox_tpu.models.weights import nested_to_flat

    cfg = YoloxConfig("s2d-train-test", num_classes=5, depth=0.33,
                      width=0.25, input_size=(64, 64), lane_fold=False)
    module = YoloxModule.from_config(cfg, rng_seed=9)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.uniform(0, 255, (2, 64, 64, 3)), jnp.float32)
    labels = np.zeros((2, 6, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 20, 20]
    labels[:, 1] = [3, 16, 16, 12, 10]
    labels = jnp.asarray(labels)

    # the fold must actually be IN the train graph (guards the
    # folded-veto regression where apply_train's default lane_fold=True
    # silently disabled s2d even on lane_fold=False backbones): the
    # (8, 3, 12, 4C) conv-A kernel is jaxpr-observable
    c4 = module.backbone.backbone.stem.conv.cout * 4
    sig = f"8,3,12,{c4}"
    results = {}
    for flag in (False, True):
        step = make_train_step(module, 5, stem_s2d=flag, use_ema=False,
                               _jit=False)
        jaxpr = str(jax.make_jaxpr(step)(
            init_train_state(module.params), x, labels,
            jnp.float32(0.01))).replace(" ", "")
        assert (sig in jaxpr) == flag, f"fold in train graph != {flag}"
        step = make_train_step(module, 5, stem_s2d=flag, use_ema=False)
        state = init_train_state(module.params)
        state, metrics = step(state, x, labels, jnp.float32(0.01))
        results[flag] = (jax.tree.map(np.asarray, state),
                         jax.tree.map(np.asarray, metrics))

    (s_off, m_off), (s_on, m_on) = results[False], results[True]
    np.testing.assert_allclose(m_on["total_loss"], m_off["total_loss"],
                               rtol=1e-4, atol=1e-4)
    flat_off = nested_to_flat(s_off["params"])
    flat_on = nested_to_flat(s_on["params"])
    assert set(flat_off) == set(flat_on)
    for k in flat_off:
        np.testing.assert_allclose(
            flat_on[k], flat_off[k], rtol=5e-3, atol=5e-4, err_msg=k)
    # the stem BN running stats must stay logical (C,) and match
    stats_off = nested_to_flat(s_off["stats"])
    stats_on = nested_to_flat(s_on["stats"])
    for k in stats_off:
        if "stem" in k:
            assert stats_on[k].shape == stats_off[k].shape, k
            np.testing.assert_allclose(
                stats_on[k], stats_off[k], rtol=1e-4, atol=1e-5,
                err_msg=k)


def test_auto_policy_picks_fold_by_traced_batch():
    """serve()'s "auto" default applies the fold iff the traced batch is
    <= serve_stem_s2d_max_batch — observable in the jaxpr as the folded
    (8, 3, 12, 4C) conv-A kernel."""
    cfg = YoloxConfig("s2d-auto-test", num_classes=3, depth=0.33,
                      width=0.25, input_size=(64, 64), lane_fold=False)
    assert cfg.serve_stem_s2d == "auto"
    cfg.serve_stem_s2d_max_batch = 4
    module = YoloxModule.from_config(cfg, rng_seed=11)

    def jaxpr_for(batch):
        x = jnp.zeros((batch, 64, 64, 3), jnp.float32)
        return str(jax.make_jaxpr(
            lambda p, xx: module.serve(p, xx, max_det=8))(
                module.params, x))

    c4 = module.backbone.backbone.stem.conv.cout * 4
    folded_sig = f"8,3,12,{c4}"
    assert folded_sig in jaxpr_for(4).replace(" ", "")
    assert folded_sig not in jaxpr_for(8).replace(" ", "")
    # explicit override beats the policy
    x = jnp.zeros((8, 64, 64, 3), jnp.float32)
    forced = str(jax.make_jaxpr(
        lambda p, xx: module.serve(p, xx, max_det=8, stem_s2d=True))(
            module.params, x))
    assert folded_sig in forced.replace(" ", "")
