"""SGD optimizer with torch-exact semantics.

Reproduces the reference's torch.optim.SGD(momentum=0.9, nesterov=True)
with three parameter groups (`/root/reference/yolox/config.py:307-331`):
BN gammas and biases without weight decay, conv weights with weight decay.
Groups are expressed as a weight-decay mask tree instead of parameter lists.

torch SGD (nesterov, dampening 0):
    g = g + wd * p
    buf = mu * buf + g          (buf starts as g on the first step)
    g = g + mu * buf
    p = p - lr * g
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolox_tpu.models.weights import weight_decay_mask


def init_momentum(trainable):
    return jax.tree.map(jnp.zeros_like, trainable)


def sgd_update(trainable, grads, momentum_buf, wd_mask, *, lr, momentum,
               weight_decay, nesterov=True):
    """One SGD step; returns (new_trainable, new_momentum)."""

    def upd(p, g, buf, m):
        g = g + weight_decay * m * p
        buf = momentum * buf + g
        step = g + momentum * buf if nesterov else buf
        return p - lr * step, buf

    flat_p, treedef = jax.tree.flatten(trainable)
    flat_g = treedef.flatten_up_to(grads)
    flat_b = treedef.flatten_up_to(momentum_buf)
    flat_m = treedef.flatten_up_to(wd_mask)
    new_p, new_b = zip(*[upd(p, g, b, m) for p, g, b, m in
                         zip(flat_p, flat_g, flat_b, flat_m)])
    return treedef.unflatten(new_p), treedef.unflatten(new_b)


def build_optimizer(*, lr, momentum, weight_decay):
    """Factory returning optimizer config (lr is per-step via scheduler)."""
    return {"lr": lr, "momentum": momentum, "weight_decay": weight_decay}


__all__ = ["init_momentum", "sgd_update", "build_optimizer",
           "weight_decay_mask"]
