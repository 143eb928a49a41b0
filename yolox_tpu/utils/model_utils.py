"""Model utilities — re-design of `/root/reference/yolox/utils/model_utils.py`.

`get_model_info` computes params from the pytree and GFLOPs from XLA's own
cost analysis (instead of thop); `fuse_conv_and_bn`/`fuse_model` fold eval
BatchNorm into conv kernels (the classic inference fusion; on TPU XLA
already fuses the affine into the conv epilogue, so this mainly reduces
parameter count and arithmetic for export); `freeze_module` returns an
optax-style mask; `adjust_status` is unnecessary in a functional design and
kept as a no-op context manager for API familiarity.
"""

from __future__ import annotations

import contextlib
from typing import Tuple

import numpy as np

from yolox_tpu.models.blocks import BN_EPS
from yolox_tpu.models.weights import flat_to_nested, nested_to_flat


def count_params(params) -> int:
    """Trainable parameter count (excludes BN running stats/counters,
    matching torch's `sum(p.numel() for p in model.parameters())`)."""
    flat = nested_to_flat(params)
    skip = ("running_mean", "running_var", "num_batches_tracked")
    return int(sum(
        np.prod(np.shape(p)) for k, p in flat.items()
        if np.ndim(p) > 0 and not k.endswith(skip)
    ))


def get_model_info(module, tsize: Tuple[int, int]) -> str:
    """'%.2fM parameters, %.2f GFLOPs' for a (1, h, w, 3) forward."""
    import jax
    import jax.numpy as jnp

    n_params = count_params(module.params) / 1e6

    def fwd(p, x):
        fpn = module.backbone(p["backbone"], x)
        return module.head(p["head"], fpn)

    x = jnp.zeros((1, tsize[0], tsize[1], 3), jnp.float32)
    try:
        compiled = jax.jit(fwd).lower(module.params, x).compile()
        flops = compiled.cost_analysis().get("flops", 0.0) / 1e9
        # XLA counts multiply and add separately for some fusions; report
        # the conventional MAC-based number like thop (flops / 2).
        return f"Params: {n_params:.2f}M, Gflops: {flops / 2:.2f}"
    except Exception:
        return f"Params: {n_params:.2f}M"


def fuse_conv_and_bn(conv_weight, bn: dict):
    """Fold BN (eval stats) into conv: returns (weight, bias)."""
    gamma = np.asarray(bn["weight"], np.float64)
    beta = np.asarray(bn["bias"], np.float64)
    mean = np.asarray(bn["running_mean"], np.float64)
    var = np.asarray(bn["running_var"], np.float64)
    scale = gamma / np.sqrt(var + BN_EPS)
    w = np.asarray(conv_weight, np.float64) * scale[None, None, None, :]
    b = beta - mean * scale
    return w.astype(np.float32), b.astype(np.float32)


def fuse_model_params(params: dict) -> dict:
    """Return a pytree where every conv+bn pair is fused: bn becomes an
    exact identity (gamma=1, beta=bias, stats=0/1-eps so the normalization
    is a no-op) and the conv kernel absorbs the scale. Output is numerically
    identical to the unfused model in eval mode."""
    import jax.numpy as jnp

    flat = nested_to_flat(params)
    out = dict(flat)
    for key in list(flat.keys()):
        if key.endswith(".bn.weight"):
            prefix = key[: -len(".bn.weight")]
            conv_key = prefix + ".conv.weight"
            if conv_key not in flat:
                continue
            bn = {
                "weight": flat[prefix + ".bn.weight"],
                "bias": flat[prefix + ".bn.bias"],
                "running_mean": flat[prefix + ".bn.running_mean"],
                "running_var": flat[prefix + ".bn.running_var"],
            }
            w, b = fuse_conv_and_bn(flat[conv_key], bn)
            out[conv_key] = jnp.asarray(w)
            out[prefix + ".bn.weight"] = jnp.ones_like(bn["weight"])
            out[prefix + ".bn.bias"] = jnp.asarray(b)
            out[prefix + ".bn.running_mean"] = jnp.zeros_like(
                bn["running_mean"])
            out[prefix + ".bn.running_var"] = jnp.full_like(
                bn["running_var"], 1.0 - BN_EPS)
    return flat_to_nested(out)


def freeze_mask(params: dict, prefix: str = "") -> dict:
    """0.0 for leaves under `prefix` (frozen), 1.0 elsewhere — multiply
    into gradients to emulate `freeze_module` (`model_utils.py:129`)."""
    flat = nested_to_flat(params)
    return flat_to_nested({
        k: 0.0 if k.startswith(prefix) else 1.0 for k in flat
    })


@contextlib.contextmanager
def adjust_status(module, training: bool = False):
    """No-op in the functional design (train/eval is explicit per call);
    kept for API familiarity with `model_utils.py:157-184`."""
    yield module
