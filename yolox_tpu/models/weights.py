"""Upstream `.pth` checkpoint <-> JAX pytree conversion.

The parameter pytree mirrors the torch state-dict key hierarchy exactly
(keys like `backbone.backbone.dark2.0.conv.weight`, `head.cls_preds.0.bias`
— see `/root/reference/yolox/models/yolox.py:118-119` for the expected
`weights['model']` layout), so conversion is a pure key-preserving
transform: conv kernels transpose torch OIHW -> JAX HWIO, everything else
passes through. Works for both regular and depthwise convs (torch depthwise
(C,1,k,k) -> HWIO (k,k,1,C) under feature_group_count=C).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

Pytree = Dict[str, Any]

_STAT_KEYS = ("num_batches_tracked",)


def flat_to_nested(flat: Dict[str, np.ndarray]) -> Pytree:
    tree: Pytree = {}
    for key, value in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def nested_to_flat(tree: Pytree, prefix: str = "") -> Dict[str, Any]:
    flat: Dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(nested_to_flat(v, key))
        else:
            flat[key] = v
    return flat


def state_dict_to_pytree(state_dict: Dict[str, Any]) -> Pytree:
    """torch state dict (tensors or ndarrays) -> nested jnp pytree."""
    import jax.numpy as jnp

    flat: Dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        if arr.ndim == 4:  # conv kernel OIHW -> HWIO
            arr = arr.transpose(2, 3, 1, 0)
        if key.endswith(_STAT_KEYS):
            # normalize to the torch-native 0-dim shape (older checkpoints
            # may carry (1,) from a numpy contiguity quirk)
            arr = arr.astype(np.int32).reshape(())
        else:
            arr = arr.astype(np.float32)
        flat[key] = jnp.asarray(arr)
    return flat_to_nested(flat)


def pytree_to_state_dict(tree: Pytree) -> Dict[str, np.ndarray]:
    """Nested pytree -> flat torch-layout state dict (numpy arrays, OIHW)."""
    out: Dict[str, np.ndarray] = {}
    for key, value in nested_to_flat(tree).items():
        arr = np.asarray(value)
        if arr.ndim == 4:  # HWIO -> OIHW
            arr = arr.transpose(3, 2, 0, 1)
        if key.endswith(_STAT_KEYS):
            arr = arr.astype(np.int64)
        out[key] = arr
    return out


def load_pth_params(path: str | os.PathLike) -> Pytree:
    """Load an upstream `.pth` checkpoint into a parameter pytree.

    Accepts both the `{'model': state_dict, ...}` training-checkpoint layout
    and a bare state dict.
    """
    import torch

    try:
        weights = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        weights = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = weights.get("model", weights) if isinstance(weights, dict) \
        else weights
    return state_dict_to_pytree(state_dict)


def save_pth_params(tree: Pytree, path: str | os.PathLike, **extra) -> None:
    """Save parameters as an upstream-compatible `.pth` (`{'model': ...}`)."""
    import torch

    sd = {
        k: torch.from_numpy(np.asarray(v).copy())
        for k, v in pytree_to_state_dict(tree).items()
    }
    torch.save({"model": sd, **extra}, str(path))


def param_census(tree: Pytree) -> Dict[str, tuple]:
    """Flat {torch-layout key: shape} census for parity checks vs torch."""
    out = {}
    for key, value in nested_to_flat(tree).items():
        shape = tuple(np.asarray(value).shape)
        if len(shape) == 4:
            shape = (shape[3], shape[2], shape[0], shape[1])  # back to OIHW
        out[key] = shape
    return out


# ---------------------------------------------------------------------------
# Train-state partitioning: trainable floats vs BatchNorm statistics
# ---------------------------------------------------------------------------

STAT_LEAF_KEYS = ("running_mean", "running_var", "num_batches_tracked")


def _partition(tree: Pytree, pick_stats: bool) -> Pytree:
    out: Pytree = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            sub = _partition(v, pick_stats)
            if sub:
                out[k] = sub
        elif (k in STAT_LEAF_KEYS) == pick_stats:
            out[k] = v
    return out


def split_train_state(params: Pytree):
    """params -> (trainable, stats). Both keep the nested key structure."""
    return _partition(params, False), _partition(params, True)


def merge_params(trainable: Pytree, stats: Pytree) -> Pytree:
    """Inverse of split_train_state."""
    out: Pytree = {}
    for k in set(trainable) | set(stats):
        a, b = trainable.get(k), stats.get(k)
        if isinstance(a, dict) or isinstance(b, dict):
            out[k] = merge_params(a or {}, b or {})
        else:
            out[k] = a if a is not None else b
    return out


def apply_flat_updates(params: Pytree, updates: dict) -> Pytree:
    """Merge {dotted-path: value} updates (e.g. BNCollector output) into a
    nested tree, returning a new tree."""
    flat = nested_to_flat(params)
    for k, v in updates.items():
        assert k in flat, f"unknown update path: {k}"
        flat[k] = v
    return flat_to_nested(flat)


def weight_decay_mask(trainable: Pytree) -> Pytree:
    """1.0 where weight decay applies, 0.0 elsewhere.

    Mirrors the reference's three optimizer groups (`config.py:307-331`):
    conv weights (ndim == 4) decay; BN gammas (1-D 'weight') and all biases
    don't.
    """
    def leaf(path_key, value):
        # value may be a traced array — use .ndim, never np.asarray
        return 1.0 if (path_key == "weight" and value.ndim == 4) else 0.0

    def rec(tree):
        return {
            k: rec(v) if isinstance(v, dict) else leaf(k, v)
            for k, v in tree.items()
        }

    return rec(trainable)
