"""Model EMA — re-design of `/root/reference/yolox/utils/ema.py:20-58`.

Keeps a float32 moving average of every float leaf of the parameter tree
(weights AND BatchNorm statistics, like the reference which averages the
full state dict). Decay ramps as d = decay * (1 - exp(-updates / 2000)).
Pure functions over pytrees; the trainer threads (ema_params, updates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_ema(params):
    """fp32 copy of all float leaves (true copies — the train state donates
    buffers, so EMA must not alias the live parameters)."""

    def cp(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.array(x, jnp.float32, copy=True)
        return jnp.array(x, copy=True)

    return jax.tree.map(cp, params)


def ema_update(ema_params, params, updates, decay: float = 0.9998):
    """One EMA step. `updates` is the post-increment counter (traced ok)."""
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))

    def upd(e, p):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return e * d + (1.0 - d) * p.astype(jnp.float32)
        return p

    return jax.tree.map(upd, ema_params, params)
