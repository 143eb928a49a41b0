"""The jitted training step: forward + SimOTA loss + SGD + EMA + BN stats.

Data parallelism is expressed with `jax.shard_map` over a 1-D 'data' mesh
(ICI-routed collectives), reproducing the reference's DDP semantics
(SURVEY.md §2.9):

  - per-replica BatchNorm batch statistics (the reference does NOT sync BN
    in the forward; each GPU normalizes with its local batch),
  - gradient mean over replicas (DDP allreduce),
  - per-replica loss normalized by the local num_fg (DDP averages grads of
    per-rank-normalized losses),
  - BN running stats pmean'd every step — mathematically identical to the
    reference's lazy `all_reduce_norm` before eval, because the EMA update
    is linear in the per-step batch statistics.

The whole step (model fwd/bwd, assignment, optimizer, EMA) is ONE compiled
XLA program; the host only feeds batches and the LR scalar.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from yolox_tpu.core.optimizer import init_momentum, sgd_update
from yolox_tpu.models.assign import compute_losses
from yolox_tpu.models.blocks import BNCollector
from yolox_tpu.models.weights import (
    apply_flat_updates,
    merge_params,
    split_train_state,
    weight_decay_mask,
)
from yolox_tpu.parallel.mesh import DATA_AXIS
from yolox_tpu.utils.ema import ema_update, init_ema

TrainState = Dict[str, Any]


def init_train_state(params, use_ema: bool = True) -> TrainState:
    """Build the training state pytree from a full parameter tree.

    Copies every leaf: the train step donates its input state, so the state
    must never alias the caller's (module's) parameter arrays.
    """
    params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    trainable, stats = split_train_state(params)
    state: TrainState = {
        "params": trainable,
        "stats": stats,
        "momentum": init_momentum(trainable),
        "step": jnp.zeros((), jnp.int32),
    }
    if use_ema:
        state["ema"] = init_ema(params)
        state["ema_updates"] = jnp.zeros((), jnp.int32)
    return state


def full_params(state: TrainState):
    return merge_params(state["params"], state["stats"])


def make_train_step(
    module,
    num_classes: int,
    *,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    ema_decay: float = 0.9998,
    use_ema: bool = True,
    mesh: Optional[Mesh] = None,
    compute_dtype=jnp.float32,
    use_l1: bool = False,
    freeze_prefix: Optional[str] = None,
    remat: bool = False,
    num_candidates: Optional[int] = None,
    fused_bwd: bool = False,
    stem_s2d: bool = False,
    _jit: bool = True,
):
    """Returns step(state, x, labels, lr) -> (state, metrics).

    x: (B, H, W, 3) f32; labels: (B, M, 5); lr: scalar. use_l1 is baked in
    (the trainer builds a second step when the no-aug phase enables L1).
    With a mesh, x/labels must be sharded along the batch axis and the state
    replicated (`yolox_tpu/parallel/mesh.py` helpers).

    freeze_prefix pins every parameter leaf whose flat dotted key starts
    with the prefix (e.g. "backbone.backbone" = the CSPDarknet): neither
    SGD, weight decay, nor momentum touches it, and BatchNorm layers under
    the prefix run in eval mode (normalize with running stats, no stat
    updates) — matching the reference `freeze_module`, which both detaches
    parameters and puts frozen submodules in eval()
    (`model_utils.py:129-150`).
    """
    distributed = mesh is not None

    def pmean_floats(tree):
        return jax.tree.map(
            lambda t: jax.lax.pmean(t, DATA_AXIS)
            if jnp.issubdtype(t.dtype, jnp.inexact) else t,
            tree,
        )

    def step_local(state, x, labels, lr):
        wd_mask = weight_decay_mask(state["params"])

        def forward(params, xin):
            collector = BNCollector()
            head_out = module.apply_train(
                params, xin, collector, freeze_prefix=freeze_prefix,
                fused_bwd=fused_bwd, stem_s2d=stem_s2d)
            return head_out, collector.updates

        if remat:
            # rematerialize the forward in the backward pass: activation
            # memory ~O(1 layer) at the cost of one extra forward — lets
            # yolox-l/x train at large batch on a single chip
            # (`jax.checkpoint`; reference has no analog, it just OOMs).
            forward = jax.checkpoint(forward)

        def loss_fn(trainable):
            params = merge_params(trainable, state["stats"])
            xin = x.astype(compute_dtype)
            head_out, bn_updates = forward(params, xin)
            losses = compute_losses(
                head_out, labels, num_classes, use_l1,
                num_candidates=num_candidates)
            return losses["total_loss"], (losses, bn_updates)

        (_, (losses, bn_updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])

        if distributed:
            grads = pmean_floats(grads)
            bn_updates = pmean_floats(bn_updates)
            losses = pmean_floats(losses)

        new_params, new_momentum = sgd_update(
            state["params"], grads, state["momentum"], wd_mask,
            lr=lr, momentum=momentum, weight_decay=weight_decay)
        if freeze_prefix:
            from yolox_tpu.utils.model_utils import freeze_mask

            fmask = freeze_mask(state["params"], freeze_prefix)
            keep = lambda old, new, m: jnp.where(m > 0, new, old)  # noqa: E731
            new_params = jax.tree.map(
                keep, state["params"], new_params, fmask)
            new_momentum = jax.tree.map(
                keep, state["momentum"], new_momentum, fmask)
        new_stats = apply_flat_updates(state["stats"], bn_updates)

        new_state = dict(state)
        new_state["params"] = new_params
        new_state["stats"] = new_stats
        new_state["momentum"] = new_momentum
        new_state["step"] = state["step"] + 1
        if use_ema:
            updates = state["ema_updates"] + 1
            new_state["ema"] = ema_update(
                state["ema"], merge_params(new_params, new_stats),
                updates, ema_decay)
            new_state["ema_updates"] = updates
        return new_state, losses

    if distributed:
        step_local = jax.shard_map(
            step_local,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )

    if not _jit:  # composed into a larger program (make_augmented_train_step)
        return step_local
    return jax.jit(step_local, donate_argnums=(0,))


def make_augmented_train_step(module, num_classes: int, *,
                              augment_kwargs: Optional[dict] = None,
                              **step_kwargs):
    """Fused on-device augmentation (+ multiscale resize) + train step:
    ONE compiled program.

    Returns step(state, tiles, hw, labels, key, lr, out_size, train_size)
    where tiles/hw/labels/key are `device_augment_batch` inputs and
    out_size/train_size are STATIC (h, w) (one compile per multiscale
    bucket, like the plain step). The augmentation geometry always runs
    at `out_size` (the config input size — geometry is size-relative);
    when `train_size` differs, the batch is bilinearly resized on device
    with label rescaling, matching the trainer's `_multiscale_resize`.

    Fusing the programs removes the inter-program boundary (measured
    ~6 ms/iter of launch/sync overhead on the tunneled v5e: separate
    programs time 119.9 + 43.9 ms while their device op totals are
    119.9 + 37.9) and lets XLA fuse the engine's final f32 image passes
    into the step's bf16 input cast instead of materializing the f32
    batch in HBM.

    `augment_kwargs`: static `device_augment_batch` settings (degrees,
    translate, scales, mixup_scale, shear, enable_mixup, *_prob,
    max_labels). `step_kwargs` go to `make_train_step` (mesh etc. —
    under a mesh the augmentation runs GSPMD-sharded along the batch
    before the shard_map'd step).
    """
    from yolox_tpu.data.device_augment import device_augment_batch

    aug = dict(augment_kwargs or {})
    # run the engine's inter-stage image buffers in the step's compute
    # dtype: pixels land there anyway, the buffers halve
    aug.setdefault("image_dtype", step_kwargs.get("compute_dtype",
                                                  jnp.float32))
    step = make_train_step(module, num_classes, _jit=False, **step_kwargs)

    def step_aug(state, tiles, hw, labels, key, lr, out_size,
                 train_size=None):
        imgs, packed = device_augment_batch(
            tiles, hw, labels, key, out_size=out_size, **aug)
        imgs, packed = _multiscale_resize(imgs, packed, out_size,
                                          train_size)
        return step(state, imgs, packed, lr)

    return jax.jit(step_aug, donate_argnums=(0,), static_argnums=(6, 7))


def _multiscale_resize(imgs, packed, out_size, train_size):
    """Resize an augmented batch from its canonical `out_size` to the
    current multiscale `train_size`, rescaling the packed
    (cls, cx, cy, w, h) labels to match. No-op when sizes agree."""
    if train_size is None or tuple(train_size) == tuple(out_size):
        return imgs, packed
    b, _, _, c = imgs.shape
    imgs = jax.image.resize(
        imgs, (b, train_size[0], train_size[1], c),
        method="bilinear", antialias=False)
    sy = train_size[0] / out_size[0]
    sx = train_size[1] / out_size[1]
    packed = packed * jnp.asarray([1.0, sx, sy, sx, sy], packed.dtype)
    return imgs, packed


def make_pipelined_train_step(module, num_classes: int, *,
                              augment_kwargs: Optional[dict] = None,
                              **step_kwargs):
    """Software-pipelined augment + step: ONE program runs the train step
    on batch n and the augmentation of batch n+1.

    The two computations are independent, so XLA's scheduler is free to
    interleave the augmentation's MXU-heavy work (interpolation matmuls,
    shear kernels) with the step's HBM-bound stretches — the step has
    FLOP slack to burn (docs/train_step_performance.md), the augmentation
    is the opposite. Whether the scheduler actually exploits that is an
    empirical question: `bench.py --mode train-aug --pipelined` is the
    A/B against `make_augmented_train_step` (the serial fusion).

    Returns (prime, step):
      prime(tiles, hw, labels, key, out_size) -> (imgs, packed)
        augmentation only — produces the first carried batch.
      step(state, imgs, packed, tiles, hw, labels, key, lr, out_size,
           train_size) -> (state, metrics, next_imgs, next_packed)
        consumes the carried batch (multiscale-resizing it from out_size
        to train_size in-program, label rescale included) and augments
        the next one. imgs/packed are donated — the carried batch is
        replaced by an identically-shaped successor every call.

    The carried batch always lives at `out_size` (the size-invariant
    augmentation geometry), so its shape is stable across multiscale
    bucket switches; only `train_size` changes trigger a recompile, same
    as the serial variant.
    """
    from yolox_tpu.data.device_augment import device_augment_batch

    aug = dict(augment_kwargs or {})
    aug.setdefault("image_dtype", step_kwargs.get("compute_dtype",
                                                  jnp.float32))
    step = make_train_step(module, num_classes, _jit=False, **step_kwargs)

    def prime(tiles, hw, labels, key, out_size):
        return device_augment_batch(
            tiles, hw, labels, key, out_size=out_size, **aug)

    def step_pipe(state, imgs, packed, tiles, hw, labels, key, lr,
                  out_size, train_size=None):
        imgs, packed = _multiscale_resize(imgs, packed, out_size,
                                          train_size)
        new_state, metrics = step(state, imgs, packed, lr)
        next_imgs, next_packed = device_augment_batch(
            tiles, hw, labels, key, out_size=out_size, **aug)
        return new_state, metrics, next_imgs, next_packed

    return (jax.jit(prime, static_argnums=(4,)),
            jax.jit(step_pipe, donate_argnums=(0, 1, 2),
                    static_argnums=(8, 9)))
