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
end-to-end against the bf16 path on random weights; the mAP cost on
pretrained checkpoints gates through `scripts/verify_pretrained.py`
(`yolox-tpu eval --int8`) once weights are available — per-tensor
symmetric PTQ on YOLOX models is typically well under 1 mAP.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

INT8_MAX = 127.0
_EPS = 1e-12


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
