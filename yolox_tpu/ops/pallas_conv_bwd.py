"""Fused Conv+BN+act backward: the train step's byte diet.

Motivation (measured on a v5e, yolox-s 640px b64, see
docs/train_step_performance.md): the backward pass of the Conv->BN->SiLU
blocks (`/root/reference/yolox/models/network_blocks.py:27-52` semantics)
is ~57 ms of the ~136 ms step, and XLA's autodiff executes it as 3-5
separate passes over the layer-sized tensors per block — a dgrad-rooted
fusion, a wgrad-rooted fusion, and per-channel BN-backward reduce
fusions, each re-reading the saved activation and the incoming
cotangent, plus async relayout copies between them.

Two stages of fusion, both behind one `custom_vjp`:

**Stage 1 — graph restructure (pure XLA, every conv shape).**
The forward saves z_hat (the *normalized* conv output) instead of the
raw conv output — same byte count, but the backward then needs no
mean/var re-derivation. The backward is exactly three passes:

  pass 1 (reduce):  read z_hat, g_y     -> S1 = sum(g_a), S2 = sum(g_a*z_hat)
                    (one sibling-fused multi-output reduction)
  pass 2 (gz):      read z_hat, g_y     -> g_z written once
  pass 3 (convs):   dgrad/wgrad of the raw conv via jax.vjp, reading g_z
                    and x (x is the previous layer's output — saved anyway)

where a = gamma*z_hat + beta is recomputed in-register (exact — same f32
ops as the forward), g_a = g_y * act'(a), and

  g_z = gamma*inv * (g_a - S1/N - z_hat*S2/N)     (train-mode BN bwd)
  g_gamma = S2,  g_beta = S1.

The returned (mean, var) feed the BNCollector running-stat update only;
their cotangents are structurally zero in the training loss (nothing
differentiable depends on running statistics), so the backward ignores
them — exact, not an approximation.

**Stage 2 — Pallas full fusion (1x1 stride-1 groups-1 SiLU).**
For the pointwise convs (CSP conv1/conv2/conv3, bottleneck conv1, SPP
convs, PAFPN laterals, head stems — the densest family in the model),
passes 2+3 collapse into ONE Pallas pass: g_z is computed in-register
and immediately contracted — dgrad `g_z @ w^T` and wgrad `x^T @ g_z`
share the same read of the tile, and g_z never touches HBM.

Engaged from `yolox_tpu/models/blocks.py::BaseConv` via `Ctx.fused_bwd`
(config knob `fused_conv_bwd`); the forward is ordinary XLA with the
exact batch-statistics formulas of `blocks.batch_norm`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from yolox_tpu.models.blocks import BN_EPS  # single source (ref yolox/config.py:162)

# Flip to True (tests) to run the Pallas kernels in interpreter mode on CPU.
_INTERPRET = False

_ROW_CAP = 4096          # max rows per grid step (VMEM budget)
_MIN_ROWS = 16           # bf16 sublane multiple

_ACT_FWD = {
    "silu": lambda a: a * jax.nn.sigmoid(a),
    "lrelu": lambda a: jnp.where(a >= 0, a, 0.1 * a),
    "relu": lambda a: jnp.maximum(a, 0.0),
}


def _act_grad(name, a):
    if name == "silu":
        s = jax.nn.sigmoid(a)
        return s * (1.0 + a * (1.0 - s))
    if name == "lrelu":
        return jnp.where(a >= 0, 1.0, 0.1)
    return jnp.where(a >= 0, 1.0, 0.0)


def supports(ksize: int, stride: int, groups: int, act: str) -> bool:
    """Whether the fused-backward composite covers this BaseConv config
    (any shape the generic stage-1 path handles)."""
    return act in _ACT_FWD


def _use_pallas_1x1(ksize, stride, groups, act, n, ci, co) -> bool:
    if not (ksize == 1 and stride == 1 and groups == 1 and act == "silu"):
        return False
    if n < 2 * _MIN_ROWS or n % _MIN_ROWS != 0:
        return False
    if not _INTERPRET and jax.default_backend() != "tpu":
        return False
    # weight block + wgrad accumulator must fit VMEM comfortably
    return ci * co * 6 < (8 << 20)


def _conv(x, w, stride, groups, pad):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def _row_tile(n: int, c_in: int, c_out: int) -> int:
    """Largest power-of-two divisor of n that fits the VMEM row budget."""
    bytes_per_row = 2 * (c_in + 3 * c_out) * 2  # bf16 blocks, double-buffered
    cap = max(_MIN_ROWS, min(_ROW_CAP, (6 << 20) // max(bytes_per_row, 1)))
    t = 1
    while t * 2 <= cap and n % (t * 2) == 0:
        t *= 2
    return t


# ---------------------------------------------------------------------------
# Pallas pass 1: per-channel reduces  S1 = sum(g_a), S2 = sum(g_a * z_hat)
# ---------------------------------------------------------------------------

def _silu_grad(a):
    s = jax.nn.sigmoid(a)
    return s * (1.0 + a * (1.0 - s))


def _reduce_kernel(z_ref, gy_ref, gb_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    gamma = gb_ref[0:1, :]
    beta = gb_ref[1:2, :]
    mean = gb_ref[2:3, :]
    inv = gb_ref[3:4, :]
    zh = (z_ref[...].astype(jnp.float32) - mean) * inv
    ga = gy_ref[...].astype(jnp.float32) * _silu_grad(zh * gamma + beta)
    out_ref[0:1, :] += jnp.sum(ga, axis=0, keepdims=True)
    out_ref[1:2, :] += jnp.sum(ga * zh, axis=0, keepdims=True)


def _reduce_sums(z2, gy2, gamma, beta, mean, inv):
    n, c = z2.shape
    tn = _row_tile(n, 0, c)
    gb = jnp.stack([gamma, beta, mean, inv]).astype(jnp.float32)  # (4, C)
    return pl.pallas_call(
        _reduce_kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, c), lambda i: (i, 0)),
            pl.BlockSpec((tn, c), lambda i: (i, 0)),
            pl.BlockSpec((4, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        interpret=_INTERPRET,
    )(z2, gy2, gb)


# ---------------------------------------------------------------------------
# Pallas pass 2 (1x1): g_z in-register -> dgrad + wgrad share one read
# ---------------------------------------------------------------------------

def _main_kernel_1x1(x_ref, z_ref, gy_ref, w_ref, co_ref, gx_ref, gw_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        gw_ref[...] = jnp.zeros_like(gw_ref)

    gamma = co_ref[0:1, :]
    beta = co_ref[1:2, :]
    ginv = co_ref[2:3, :]
    s1n = co_ref[3:4, :]
    s2n = co_ref[4:5, :]
    mean = co_ref[5:6, :]
    inv = co_ref[6:7, :]
    zh = (z_ref[...].astype(jnp.float32) - mean) * inv
    ga = gy_ref[...].astype(jnp.float32) * _silu_grad(zh * gamma + beta)
    gz = (ginv * (ga - s1n - zh * s2n)).astype(z_ref.dtype)

    # dgrad: (TN, Co) x (Ci, Co)^T -> (TN, Ci) on the MXU
    gx_ref[...] = jax.lax.dot_general(
        gz, w_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(gx_ref.dtype)

    # wgrad: (TN, Ci)^T x (TN, Co) -> (Ci, Co), f32 accumulation in the
    # VMEM-resident output block (constant index map: flushed once)
    gw_ref[...] += jax.lax.dot_general(
        x_ref[...], gz,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _main_1x1(x2, z2, gy2, wb, coeff):
    n, ci = x2.shape
    c = z2.shape[1]
    tn = _row_tile(n, ci, c)
    gx2, gw = pl.pallas_call(
        _main_kernel_1x1,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, ci), lambda i: (i, 0)),
            pl.BlockSpec((tn, c), lambda i: (i, 0)),
            pl.BlockSpec((tn, c), lambda i: (i, 0)),
            pl.BlockSpec((ci, c), lambda i: (0, 0)),
            pl.BlockSpec((8, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tn, ci), lambda i: (i, 0)),
            pl.BlockSpec((ci, c), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ci), x2.dtype),
            jax.ShapeDtypeStruct((ci, c), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(x2, z2, gy2, wb, coeff)
    return gx2, gw


# ---------------------------------------------------------------------------
# The custom-vjp composite
# ---------------------------------------------------------------------------

def _fwd_impl(x, w, gamma, beta, *, ksize, stride, groups, act):
    """XLA forward with the exact batch_norm statistics formulas of
    yolox_tpu/models/blocks.py::batch_norm (biased batch variance, f32
    stats from bf16 activations without materializing an f32 copy)."""
    pad = (ksize - 1) // 2
    z = _conv(x, w.astype(x.dtype), stride, groups, pad)
    # f32 statistics for f32/bf16 compute (torch-autocast semantics, same
    # as blocks.batch_norm); f64 under jax_enable_x64 so exactness proofs
    # against the unfused composite are not contaminated by f32 rounding.
    sdt = jnp.promote_types(z.dtype, jnp.float32)
    mean = jnp.mean(z, axis=(0, 1, 2), dtype=sdt)
    diff = z.astype(sdt) - mean
    var = jnp.mean(diff * diff, axis=(0, 1, 2))
    inv = jax.lax.rsqrt(var + BN_EPS)
    # z_hat stays an in-register intermediate of the fused elementwise
    # pass producing y: the residual saved for the backward is z itself
    # (the conv output, which HAS to be written anyway), so the fused
    # forward moves exactly the same bytes as the unfused composite.
    z_hat = diff * inv
    a = z_hat * gamma + beta
    y = _ACT_FWD[act](a).astype(z.dtype)
    return y, mean, var, z, inv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_conv_bn_act(ksize: int, stride: int, groups: int, act: str,
                      x, w, gamma, beta):
    """conv -> train-mode BN -> activation with the fused backward.

    Returns (y, mean, var); mean/var are the biased batch statistics for
    the caller's running-stat update. Their cotangents are ignored by the
    backward — exact for the training loss, where nothing differentiable
    depends on running statistics. Semantics owner:
    `/root/reference/yolox/models/network_blocks.py:27-52` (Conv2d ->
    BatchNorm2d -> SiLU with torch train-mode statistics).
    """
    y, mean, var, _, _ = _fwd_impl(
        x, w, gamma, beta, ksize=ksize, stride=stride, groups=groups, act=act)
    return y, mean, var


def _fused_fwd(ksize, stride, groups, act, x, w, gamma, beta):
    y, mean, var, z, inv = _fwd_impl(
        x, w, gamma, beta, ksize=ksize, stride=stride, groups=groups, act=act)
    return (y, mean, var), (x, w, gamma, beta, z, mean, inv)


def _fused_bwd(ksize, stride, groups, act, res, cts):
    g_y = cts[0]  # (mean, var) cotangents are zero — see fused_conv_bn_act
    x, w, gamma, beta, z, mean, inv = res
    b, oh, ow, co = z.shape
    ci = x.shape[-1]
    n = b * oh * ow

    z2 = z.reshape(n, co)
    gy2 = g_y.reshape(n, co)
    sdt = jnp.promote_types(z.dtype, jnp.float32)
    gamma32 = gamma.astype(sdt)
    beta32 = beta.astype(sdt)

    pallas = _use_pallas_1x1(ksize, stride, groups, act, n, ci, co)
    if pallas:
        s = _reduce_sums(z2, gy2, gamma32, beta32, mean, inv)  # (2, Co) f32
        s1, s2 = s[0], s[1]
    else:
        zh32 = (z2.astype(sdt) - mean) * inv
        ga = gy2.astype(sdt) * _act_grad(act, zh32 * gamma32 + beta32)
        s1 = jnp.sum(ga, axis=0)
        s2 = jnp.sum(ga * zh32, axis=0)

    ginv = gamma32 * inv

    if pallas:
        coeff = jnp.concatenate([
            jnp.stack([gamma32, beta32, ginv, s1 / n, s2 / n,
                       mean.astype(jnp.float32), inv.astype(jnp.float32)]),
            jnp.zeros((1, co), jnp.float32),
        ])                                            # (8, Co) sublane pad
        x2 = x.reshape(n, ci)
        wb = w.reshape(ci, co).astype(x.dtype)
        gx2, gw2 = _main_1x1(x2, z2, gy2, wb, coeff)
        g_x = gx2.reshape(b, oh, ow, ci)
        g_w = gw2.reshape(1, 1, ci, co).astype(w.dtype)
    else:
        g_z = (ginv * (ga - s1 / n - zh32 * (s2 / n))).astype(x.dtype)
        g_z = g_z.reshape(b, oh, ow, co)
        pad = (ksize - 1) // 2
        _, conv_vjp = jax.vjp(
            lambda xx, wc: _conv(xx, wc, stride, groups, pad),
            x, w.astype(x.dtype))
        g_x, g_wc = conv_vjp(g_z)
        g_w = g_wc.astype(w.dtype)

    g_gamma = s2.astype(gamma.dtype)
    g_beta = s1.astype(beta.dtype)
    return g_x, g_w, g_gamma, g_beta


fused_conv_bn_act.defvjp(_fused_fwd, _fused_bwd)
