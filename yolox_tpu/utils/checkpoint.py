"""Checkpoint I/O — re-design of `/root/reference/yolox/utils/checkpoint.py`.

Checkpoints are upstream-compatible `.pth` files: the `model` entry is a
torch-layout state dict (OIHW conv kernels), so our checkpoints load in the
reference and vice versa. Trainer state (optimizer momentum, EMA, counters)
is stored alongside as numpy pytrees in the same pickle.

File naming mirrors the reference: `<name>_ckpt.pth` + `best_ckpt.pth` copy.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict

import numpy as np

from yolox_tpu.models.weights import (
    nested_to_flat,
    pytree_to_state_dict,
    state_dict_to_pytree,
)
from yolox_tpu.utils.logger import logger


def _to_numpy_tree(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(state: Dict[str, Any], is_best: bool, save_dir: str,
                    model_name: str = ""):
    """state['model'] must be a parameter pytree; saved in torch layout."""
    import torch

    os.makedirs(save_dir, exist_ok=True)
    out = dict(state)
    # NB: np.ascontiguousarray promotes 0-dim arrays to (1,); .copy()
    # preserves shape and is contiguous.
    out["model"] = {
        k: torch.from_numpy(np.asarray(v).copy())
        for k, v in pytree_to_state_dict(state["model"]).items()
    }
    for key in ("optimizer", "ema"):
        if key in out and isinstance(out[key], dict):
            out[key] = _to_numpy_tree(out[key])
    filename = os.path.join(save_dir, model_name + "_ckpt.pth")
    torch.save(out, filename)
    if is_best:
        shutil.copyfile(filename, os.path.join(save_dir, "best_ckpt.pth"))


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint saved by us or by the reference; 'model' is
    returned as a JAX pytree."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in ckpt:
        ckpt["model"] = state_dict_to_pytree(ckpt["model"])
    return ckpt


def load_ckpt(params: dict, ckpt_params: dict) -> dict:
    """Shape-tolerant partial load (`checkpoint.py:9-31`): keys missing from
    the checkpoint or with mismatched shapes keep the model's values."""
    import jax.numpy as jnp

    flat_model = nested_to_flat(params)
    flat_ckpt = nested_to_flat(ckpt_params)
    out = {}
    for key, model_v in flat_model.items():
        if key not in flat_ckpt:
            logger.warning(f"{key} is not in the ckpt. Please double check "
                           "and see if this is desired.")
            out[key] = model_v
            continue
        ckpt_v = flat_ckpt[key]
        if tuple(np.shape(model_v)) != tuple(np.shape(ckpt_v)):
            logger.warning(
                f"Shape of {key} in checkpoint is {np.shape(ckpt_v)}, while "
                f"shape of {key} in model is {np.shape(model_v)}.")
            out[key] = model_v
        else:
            out[key] = jnp.asarray(ckpt_v)
    from yolox_tpu.models.weights import flat_to_nested

    return flat_to_nested(out)
