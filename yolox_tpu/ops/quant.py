"""Post-training int8 quantization for the serving path.

TPU-native serving lever with no reference analog (the reference serves
fp16 via TensorRT/torch, `/root/reference/docs/model_zoo.md:28-31`): the
v5e MXU runs int8×int8→int32 at 394 TOPS — 2× its bf16 peak — and the
heavy models' serving step is MXU-bound (docs/serving_performance.md), so
weight+activation int8 is a direct throughput lever. For the
bandwidth-bound light models the win depends on XLA fusing the
quantize into the conv's operand read (the block interface stays bf16
in HBM); the per-model A/B lives in docs/serving_performance.md.

Scheme (standard symmetric PTQ):
- Weights: BatchNorm is folded into the conv (eval-mode running stats,
  same fold as `utils/model_utils.fuse`), then quantized per OUTPUT
  channel: ``wq[..., c] = round(w_fused[..., c] / sw[c])``,
  ``sw[c] = amax_c / 127``. Per-channel weight scales are lossless enough
  that weight-only quantization error is ~1e-3 relative.
- Activations: per-tensor symmetric with a static calibrated absolute
  max: ``xq = round(clip(x / sx, ±127))``, ``sx = amax / 127``. The amax
  table ("qtab", keyed by BaseConv parameter path) comes from running
  `YoloxModule.calibrate_int8` on representative batches; serving then
  executes every BaseConv as quantize → int8 conv (int32 accumulate on
  the MXU) → dequant·(sx·sw) + bias → activation, with the block
  interface staying bf16/f32 (concats, SPP pools, upsamples and the
  un-normalized head prediction convs are unchanged).

The quantize/fold math runs in-trace from the ordinary f32 params — the
params pytree, checkpoints, and state-dict layout are untouched, and the
weight-side work is loop-invariant (hoisted/amortized; weights are MBs
against GBs of activations).

Accuracy: machinery is tested exactly (int8 conv == f64 oracle) and
end-to-end against the bf16 path on random weights; MEASURED on an
overfit-trained model (`scripts/quant_accuracy.py`, on-chip): at abs-max
calibration both the ladder and the int8-in-HBM modes reproduce 100% of
the f32 model's detections (IoU>0.5 + class match, symmetric set
agreement) with score MAD ~0.022 and box MAD <0.5 px; percentile
calibration (99.9) HURTS on small calibration sets (agreement 0.3-0.67)
because the clipped top-0.1% of activations is exactly the detection
signal — use percentiles only with large calibration batches. The mAP
cost on pretrained checkpoints gates through
`scripts/verify_pretrained.py` (`yolox-tpu eval --int8`) once weights
are available.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

INT8_MAX = 127.0
_EPS = 1e-12


class QTensor(NamedTuple):
    """int8 activation living in HBM: codes + per-channel dequant scale.

    The int8-in-HBM serving mode ("hbm", vs the per-block "ladder" mode
    above) keeps the BLOCK INTERFACE itself int8: a producer's epilogue
    requantizes (fused into the conv's output elementwise chain — no extra
    HBM pass) and each consumer folds the incoming per-channel scale into
    its BN-folded f32 weights BEFORE weight quantization (lossless,
    loop-invariant, hoisted by XLA). Inter-block activations move half the
    bf16 bytes — the lever the ladder mode lacks on the bandwidth-bound
    light models (docs/serving_performance.md round-3 A/B: nano 0.74x).

    `scale` is (C,) f32; dequantized value = codes * scale[channel].
    Registered as a NamedTuple so it is a pytree and traces through jit.
    """

    codes: jnp.ndarray   # int8 (B, H, W, C)
    scale: jnp.ndarray   # f32 (C,)


def act_scale(amax):
    """Per-tensor activation scale sx with a floor against empty ranges."""
    return jnp.maximum(jnp.asarray(amax, jnp.float32), _EPS) / INT8_MAX


def quantize(x, scale):
    """Symmetric int8 quantization of `x` at precomputed `scale`."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -INT8_MAX, INT8_MAX).astype(jnp.int8)


def fold_bn(w, bn):
    """Fold eval-mode BatchNorm into the conv: returns (w_fused, bias).

    Same algebra as `utils/model_utils.fuse` (reference semantics
    `/root/reference/yolox/utils/model_utils.py:60-88`), computed
    in-trace in f32: y = (w*x)·a + b with a = γ/√(σ²+ε).
    """
    from yolox_tpu.models.blocks import BN_EPS

    gamma = bn["weight"].astype(jnp.float32)
    beta = bn["bias"].astype(jnp.float32)
    mean = bn["running_mean"].astype(jnp.float32)
    var = bn["running_var"].astype(jnp.float32)
    a = gamma * jax.lax.rsqrt(var + BN_EPS)
    w_fused = w.astype(jnp.float32) * a  # HWIO: broadcast over out channel
    bias = beta - mean * a
    return w_fused, bias


def weight_qparams(w_fused):
    """Per-output-channel symmetric int8 weights: (wq, sw[c])."""
    amax_c = jnp.max(jnp.abs(w_fused), axis=(0, 1, 2))
    sw = jnp.maximum(amax_c, _EPS) / INT8_MAX
    wq = jnp.clip(jnp.round(w_fused / sw), -INT8_MAX, INT8_MAX)
    return wq.astype(jnp.int8), sw


def conv_bn_act(x, p, amax, stride: int, groups: int, act, out_dtype=None):
    """Quantized BaseConv body: int8 conv (MXU int32 accumulate) of the
    BN-folded weights, dequant + bias in f32, activation, cast back to
    the block interface dtype. Exactly 'same'-padded like
    `blocks.conv2d`."""
    out_dtype = out_dtype or x.dtype
    w_fused, bias = fold_bn(p["conv"]["weight"], p["bn"])
    wq, sw = weight_qparams(w_fused)
    sx = act_scale(amax)
    xq = quantize(x, sx)
    k = wq.shape[0]
    pad = (k - 1) // 2
    acc = jax.lax.conv_general_dilated(
        xq, wq,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * sw) + bias
    return act(y).astype(out_dtype)


def merge_amax(tables: Dict[str, jnp.ndarray], new: Dict[str, jnp.ndarray]):
    """Elementwise-max merge of calibration sinks across batches."""
    if not tables:
        return dict(new)
    return {k: jnp.maximum(tables[k], v) for k, v in new.items()}


# ---------------------------------------------------------------------------
# int8-in-HBM mode (QTensor block interface)
# ---------------------------------------------------------------------------

def channel_scale(amax):
    """Per-channel activation scale (C,) with a floor against dead units."""
    return jnp.maximum(jnp.asarray(amax, jnp.float32), _EPS) / INT8_MAX


def requant(y, amax) -> QTensor:
    """f32/bf16 activation -> QTensor at the calibrated per-channel amax.

    The round/clip/cast chain is pure elementwise: when `y` is a conv
    epilogue output, XLA fuses this into the conv's output fusion, so the
    only HBM write is the int8 codes themselves.
    """
    s = channel_scale(amax)
    q = jnp.round(y.astype(jnp.float32) / s)
    return QTensor(jnp.clip(q, -INT8_MAX, INT8_MAX).astype(jnp.int8), s)


def dequant(qt: QTensor, dtype=jnp.float32):
    return qt.codes.astype(dtype) * qt.scale.astype(dtype)


def q_concat(qts, axis: int = -1) -> QTensor:
    """Channel concat: codes concat + scale concat (both per-channel)."""
    return QTensor(jnp.concatenate([q.codes for q in qts], axis=axis),
                   jnp.concatenate([q.scale for q in qts], axis=0))


def q_add(a: QTensor, b: QTensor, out_amax) -> QTensor:
    """Residual add: dequant both operands, add in f32, requant at the
    calibrated post-add amax. All elementwise — fuses into the producing
    conv's epilogue; only int8 codes touch HBM."""
    return requant(dequant(a) + dequant(b), out_amax)


def q_upsample_nearest_2x(qt: QTensor) -> QTensor:
    from yolox_tpu.models.blocks import upsample_nearest_2x

    return QTensor(upsample_nearest_2x(qt.codes), qt.scale)


def q_max_pool_same(qt: QTensor, ksize: int) -> QTensor:
    """Max pool on int8 codes directly: scales are per-channel and
    positive, and pooling is spatial-only, so max over codes == codes of
    max over dequantized values."""
    from yolox_tpu.models.blocks import max_pool_same

    return QTensor(max_pool_same(qt.codes, ksize), qt.scale)


def fold_in_scale(w_fused, scale, groups: int):
    """Fold a consumer input's per-channel dequant scale into the BN-folded
    f32 weights (HWIO): conv(codes * scale[c], w) == conv(codes, w * scale).

    groups == 1: scale broadcasts over the input-channel axis. Depthwise
    (groups == cin, I == 1): input channel c feeds output channel c, so the
    scale folds over the output axis. Other group counts are unused in the
    model zoo.
    """
    if groups == 1:
        return w_fused * scale[None, None, :, None]
    if w_fused.shape[2] == 1 and groups == w_fused.shape[3]:
        return w_fused * scale[None, None, None, :]
    raise NotImplementedError(f"grouped conv with groups={groups}")


def conv_bn_act_hbm(qt: QTensor, p, out_amax, stride: int, groups: int,
                    act, requant_out: bool = True):
    """BaseConv body in int8-in-HBM mode.

    int8 codes in -> int8 conv (int32 MXU accumulate; the input's
    per-channel scale is pre-folded into the f32 weights, so dequant is
    just acc * sw) -> +bias -> activation -> requantize to the producer's
    calibrated output amax. With `requant_out=False`, returns the f32
    activation instead (deferred requant, e.g. before a residual add).
    """
    w_fused, bias = fold_bn(p["conv"]["weight"], p["bn"])
    w_eff = fold_in_scale(w_fused, qt.scale, groups)
    wq, sw = weight_qparams(w_eff)
    k = wq.shape[0]
    pad = (k - 1) // 2
    acc = jax.lax.conv_general_dilated(
        qt.codes, wq,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    y = act(acc.astype(jnp.float32) * sw + bias)
    return requant(y, out_amax) if requant_out else y


def pred_conv_hbm(qt: QTensor, weight, bias, compute_dtype=jnp.bfloat16):
    """1x1 prediction conv consuming a QTensor: the input scale folds into
    the f32 weight (exact), then the conv runs in `compute_dtype` on the
    raw codes — the head preds stay un-quantized (no BN, decode-sensitive)
    but still read int8 bytes from HBM."""
    w_eff = (weight.astype(jnp.float32)
             * qt.scale[None, None, :, None]).astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        qt.codes.astype(compute_dtype), w_eff, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(y.dtype)
