"""Orbax checkpointing — the TPU-native production checkpoint path.

The default checkpoint format stays upstream-compatible `.pth`
(`yolox_tpu/utils/checkpoint.py`, required for reference interop); orbax is
the opt-in format for large-scale training: zarr-sharded array storage,
atomic directory commits, async saves that overlap the next train steps,
and step-managed retention. Select with `-D ckpt_format=orbax`.

Reference analog: none (torch pickles only) — this is one of the
TPU-first upgrades.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from yolox_tpu.utils.logger import logger

_MANAGERS: Dict[str, Any] = {}


def _manager(directory: str):
    """One CheckpointManager per directory (orbax requires exclusivity)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    if directory not in _MANAGERS:
        _MANAGERS[directory] = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=None, enable_async_checkpointing=True),
        )
    return _MANAGERS[directory]


def save_orbax(state: Dict[str, Any], save_dir: str, step: int,
               metadata: Optional[dict] = None) -> None:
    """Async-save a training-state pytree under save_dir/<step>/.

    Returns immediately; the write overlaps subsequent computation and is
    committed atomically. Call `wait_orbax(save_dir)` (or save again) to
    block on completion.
    """
    import orbax.checkpoint as ocp

    mgr = _manager(save_dir)
    args = ocp.args.Composite(
        state=ocp.args.StandardSave(state),
        **({"metadata": ocp.args.JsonSave(metadata)} if metadata else {}),
    )
    mgr.save(step, args=args)
    logger.info(f"orbax: async save of step {step} -> {save_dir}")


def wait_orbax(save_dir: str) -> None:
    if os.path.abspath(save_dir) in _MANAGERS:
        _MANAGERS[os.path.abspath(save_dir)].wait_until_finished()


def load_orbax(save_dir: str, step: Optional[int] = None,
               template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Restore {'state': pytree, 'metadata': dict|None} from save_dir.

    step=None restores the latest committed step. A `template` pytree of
    like-shaped arrays restores with exact dtypes/shardings.
    """
    import orbax.checkpoint as ocp

    mgr = _manager(save_dir)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoint under {save_dir}")
    restore_args = {}
    if template is not None:
        restore_args["state"] = ocp.args.StandardRestore(template)
    else:
        restore_args["state"] = ocp.args.StandardRestore()
    try:
        result = mgr.restore(step, args=ocp.args.Composite(
            metadata=ocp.args.JsonRestore(), **restore_args))
        metadata = result.get("metadata")
    except Exception:
        result = mgr.restore(step, args=ocp.args.Composite(**restore_args))
        metadata = None
    out = {"state": result["state"], "metadata": metadata, "step": step}
    return out


def latest_orbax_step(save_dir: str) -> Optional[int]:
    if not os.path.isdir(save_dir):
        return None
    return _manager(save_dir).latest_step()


def best_orbax_step(save_dir: str) -> Optional[int]:
    """Step of the best-AP checkpoint (the trainer records it in
    best.json, since the best flag can arrive after the step's save)."""
    path = os.path.join(save_dir, "best.json")
    if not os.path.exists(path):
        return None
    import json

    with open(path) as f:
        return int(json.load(f)["step"])
