"""Fused Conv+BN+act backward (yolox_tpu/ops/pallas_conv_bwd.py) vs XLA
autodiff of the unfused composite.

The fused path must be a drop-in: same forward values, same batch
statistics, and gradients matching autodiff of the reference composite
(conv2d -> batch_norm(train) -> act, `blocks.py`; semantics owner
/root/reference/yolox/models/network_blocks.py:27-52) to f32 tolerance.
The Pallas 1x1 kernels are exercised on CPU via interpreter mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolox_tpu.models import blocks
from yolox_tpu.models.blocks import BNCollector, Ctx
from yolox_tpu.ops import pallas_conv_bwd as pcb


def _ref_composite(x, w, gamma, beta, *, stride, groups, act):
    """The unfused train-mode composite exactly as BaseConv runs it."""
    z = blocks.conv2d(x, w, stride, groups)
    mean = jnp.mean(z, axis=(0, 1, 2), dtype=jnp.float32)
    diff = z.astype(jnp.float32) - mean
    var = jnp.mean(diff * diff, axis=(0, 1, 2))
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + pcb.BN_EPS)
    scale = (gamma * inv).astype(z.dtype)
    bias = (beta - mean * gamma * inv).astype(z.dtype)
    y = blocks.get_activation(act)(z * scale + bias)
    return y, mean, var


CASES = [
    # (ksize, stride, groups, act, cin, cout)
    (1, 1, 1, "silu", 16, 32),
    (3, 1, 1, "silu", 16, 24),
    (3, 2, 1, "silu", 16, 32),
    (3, 1, 16, "silu", 16, 16),   # depthwise
    (1, 1, 1, "lrelu", 8, 16),
    (5, 2, 1, "silu", 8, 8),
]


def _make_inputs(key, cin, cout, ksize, groups, h=12, b=2):
    kx, kw, kg, kb, kc = jax.random.split(key, 5)
    x = jax.random.normal(kx, (b, h, h, cin), jnp.float32)
    w = jax.random.normal(
        kw, (ksize, ksize, cin // groups, cout), jnp.float32) * 0.2
    gamma = 1.0 + 0.3 * jax.random.normal(kg, (cout,), jnp.float32)
    beta = 0.1 * jax.random.normal(kb, (cout,), jnp.float32)
    ct = jax.random.normal(kc, (b, h, h, cout), jnp.float32)
    return x, w, gamma, beta, ct


@pytest.mark.parametrize("ksize,stride,groups,act,cin,cout", CASES)
def test_forward_and_grads_match_autodiff(ksize, stride, groups, act,
                                          cin, cout):
    key = jax.random.PRNGKey(hash((ksize, stride, groups, act)) % 2**31)
    x, w, gamma, beta, ct = _make_inputs(key, cin, cout, ksize, groups)
    if stride > 1:
        ct = ct[:, ::stride, ::stride]

    def loss_ref(x, w, gamma, beta):
        y, _, _ = _ref_composite(
            x, w, gamma, beta, stride=stride, groups=groups, act=act)
        return jnp.sum(y * ct)

    def loss_fused(x, w, gamma, beta):
        y, _, _ = pcb.fused_conv_bn_act(
            ksize, stride, groups, act, x, w, gamma, beta)
        return jnp.sum(y * ct)

    y_ref, mean_ref, var_ref = _ref_composite(
        x, w, gamma, beta, stride=stride, groups=groups, act=act)
    y_f, mean_f, var_f = pcb.fused_conv_bn_act(
        ksize, stride, groups, act, x, w, gamma, beta)
    np.testing.assert_allclose(y_f, y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(mean_f, mean_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(var_f, var_ref, rtol=1e-6, atol=1e-6)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    for a, b_, name in zip(g_f, g_ref, ["x", "w", "gamma", "beta"]):
        np.testing.assert_allclose(
            a, b_, rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name} ({ksize=},{stride=})")


def test_pallas_1x1_interpret_matches_general(monkeypatch):
    """The Pallas fully-fused 1x1 kernels (interpreter mode on CPU) must
    equal the generic jnp/vjp backward bit-for-tolerance."""
    key = jax.random.PRNGKey(7)
    cin, cout = 16, 32
    x, w, gamma, beta, ct = _make_inputs(key, cin, cout, 1, 1, h=8, b=4)

    def grads():
        def loss(x, w, gamma, beta):
            y, _, _ = pcb.fused_conv_bn_act(1, 1, 1, "silu", x, w, gamma,
                                            beta)
            return jnp.sum(y * ct)
        return jax.grad(loss, argnums=(0, 1, 2, 3))(x, w, gamma, beta)

    g_general = grads()
    monkeypatch.setattr(pcb, "_INTERPRET", True)
    assert pcb._use_pallas_1x1(1, 1, 1, "silu", x[..., 0].size, cin, cout)
    g_pallas = grads()
    for a, b_, name in zip(g_pallas, g_general, ["x", "w", "gamma", "beta"]):
        np.testing.assert_allclose(
            a, b_, rtol=1e-4, atol=1e-4,
            err_msg=f"pallas-vs-general grad mismatch for {name}")


def test_baseconv_fused_ctx_path():
    """BaseConv with Ctx.fused_bwd: same outputs, same collector stats,
    same gradients as the unfused path."""
    rng = np.random.default_rng(3)
    conv = blocks.BaseConv(8, 16, 3, 1)
    p = jax.tree.map(jnp.asarray, conv.init(rng))
    x = jnp.asarray(rng.normal(size=(2, 10, 10, 8)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(2, 10, 10, 16)), jnp.float32)

    def run(fused):
        def loss(w, gamma, beta):
            q = {"conv": {"weight": w},
                 "bn": {**p["bn"], "weight": gamma, "bias": beta}}
            col = BNCollector()
            ctx = Ctx(train=True, collector=col, fused_bwd=fused)
            y = conv(q, x, ctx, "c")
            return jnp.sum(y * ct), (y, col.updates)
        (l, (y, upd)), g = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(
                p["conv"]["weight"], p["bn"]["weight"], p["bn"]["bias"])
        return l, y, upd, g

    l0, y0, upd0, g0 = run(False)
    l1, y1, upd1, g1 = run(True)
    np.testing.assert_allclose(y1, y0, rtol=1e-5, atol=1e-5)
    assert set(upd0) == set(upd1)
    for k in upd0:
        np.testing.assert_allclose(upd1[k], upd0[k], rtol=1e-5, atol=1e-6,
                                    err_msg=k)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    for path, v0 in flat0:
        np.testing.assert_allclose(
            flat1[path], v0, rtol=2e-4, atol=2e-4, err_msg=str(path))


def test_frozen_prefix_keeps_eval_bn():
    """Ctx.fused_bwd must not engage for frozen (eval-mode BN) paths."""
    rng = np.random.default_rng(5)
    conv = blocks.BaseConv(8, 8, 1, 1)
    p = jax.tree.map(jnp.asarray, conv.init(rng))
    p["bn"]["running_mean"] = jnp.asarray(
        rng.normal(size=(8,)), jnp.float32)
    p["bn"]["running_var"] = jnp.asarray(
        1.0 + rng.uniform(size=(8,)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 8)), jnp.float32)

    ctx_frozen = Ctx(train=True, collector=BNCollector(),
                     eval_prefix="c", fused_bwd=True)
    y_frozen = conv(p, x, ctx_frozen, "c")
    y_eval = conv(p, x, Ctx(train=False), "c")
    np.testing.assert_allclose(y_frozen, y_eval, rtol=1e-6, atol=1e-6)


def test_whole_model_fused_grads_match():
    """yolox-nano-scale module: apply_train(fused_bwd=True) gradients ==
    autodiff of the unfused graph.

    Run in float64: at f32, the 1-ulp rounding-order differences between
    the two (mathematically identical) composites are amplified ~1e3-1e4x
    through ~40 random-init BN layers (each BN renormalizes, so forward
    perturbations grow multiplicatively), producing ~1% grad differences
    that say nothing about correctness. In f64 the same chaos amplifies
    1e-16 roundings only to ~1e-10 — a tight exactness statement.
    """
    from yolox_tpu.config import YoloxConfig
    from yolox_tpu.models.yolox import YoloxModule

    from yolox_tpu.models.weights import merge_params, split_train_state

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
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float64)

        def loss(trainable, fused):
            params = merge_params(trainable, stats)
            col = BNCollector()
            out = module.apply_train(params, x, col, fused_bwd=fused)
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
