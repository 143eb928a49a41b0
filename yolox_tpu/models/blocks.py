"""Convolutional building blocks, TPU-native (NHWC / HWIO layouts).

Functional re-design of the reference block zoo
(`/root/reference/yolox/models/network_blocks.py`): each block is a small
Python object holding *static* configuration; parameters live in a nested
dict pytree whose structure mirrors the upstream torch state-dict key
hierarchy 1:1 (e.g. params["conv"]["weight"], params["bn"]["running_mean"]),
so upstream `.pth` checkpoints convert with a pure key-preserving transpose
(torch OIHW -> HWIO, see yolox_tpu/models/weights.py).

Design notes (TPU-first):
- NHWC activations and HWIO kernels: the native layouts for TPU conv.
- All shapes static; blocks are pure functions of (params, x) and jit/vmap
  cleanly.
- BatchNorm train-mode statistics are *returned* via a `BNCollector`
  (functional state threading), never mutated in place. Torch semantics are
  reproduced exactly: normalization uses biased batch variance, the running
  variance update uses the unbiased estimate, momentum 0.03 / eps 1e-3 as
  set by the reference config factory (`yolox/config.py:159-166`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

_CONV_DN = ("NHWC", "HWIO", "NHWC")

# BatchNorm hyperparameters: the reference resets every BN to eps=1e-3,
# momentum=0.03 at model build time (`yolox/config.py:162-166`), and the
# pretrained checkpoints were trained with those values.
BN_EPS = 1e-3
BN_MOMENTUM = 0.03


# ---------------------------------------------------------------------------
# Activations (`yolox/models/network_blocks.py:15-24`)
# ---------------------------------------------------------------------------

def silu(x):
    return x * jax.nn.sigmoid(x)


def lrelu(x):
    return jnp.where(x >= 0, x, 0.1 * x)


_ACTS = {
    "silu": silu,
    "relu": jax.nn.relu,
    "lrelu": lrelu,
}


def get_activation(name: str):
    if name not in _ACTS:
        raise AttributeError(f"Unsupported act type: {name}")
    return _ACTS[name]


# ---------------------------------------------------------------------------
# Functional primitives
# ---------------------------------------------------------------------------

def conv2d(x, w, stride: int = 1, groups: int = 1):
    """'Same'-padded conv matching torch Conv2d(padding=(k-1)//2).

    Mixed precision: the kernel is cast to the activation dtype (AMP
    semantics — f32 master weights, bf16 compute; the cast is a no-op
    when dtypes already agree, and gradients flow back to f32).
    """
    k = w.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_CONV_DN,
        feature_group_count=groups,
    )


def max_pool_same(x, ksize: int):
    """MaxPool2d(kernel_size=k, stride=1, padding=k//2), torch semantics."""
    pad = ksize // 2
    # init must be a dtype-typed scalar: a plain python int weakly types to
    # int32 (breaks int8 code pooling), a jnp array breaks the
    # select_and_scatter transpose in reverse-mode autodiff
    init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else x.dtype.type(jnp.iinfo(x.dtype).min))
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        window_dimensions=(1, ksize, ksize, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


class BNCollector:
    """Collects train-mode BatchNorm statistic updates, keyed by param path.

    Functional replacement for torch's in-place running-stat mutation: the
    training step merges `collector.updates` back into the state pytree.
    """

    def __init__(self):
        self.updates: Dict[str, jnp.ndarray] = {}

    def put(self, path: str, mean, var, num_batches):
        self.updates[f"{path}.running_mean"] = mean
        self.updates[f"{path}.running_var"] = var
        self.updates[f"{path}.num_batches_tracked"] = num_batches


@dataclass
class Ctx:
    """Per-call context: train-mode flag + BN statistic collector.

    `eval_prefix`: parameter paths under this prefix run their BatchNorm in
    eval mode even when `train` is set — the reference's `freeze_module`
    puts frozen submodules in eval() (`model_utils.py:148-150`), so a
    frozen backbone normalizes with running stats and stops updating them.
    """

    train: bool = False
    collector: Optional[BNCollector] = None
    eval_prefix: Optional[str] = None
    # Route BaseConv's train-mode conv->BN->act composite through the
    # fused-backward custom_vjp (yolox_tpu/ops/pallas_conv_bwd.py):
    # identical forward semantics, ~3-pass backward instead of XLA
    # autodiff's 4-5 re-reads per block. Config knob `fused_conv_bwd`.
    fused_bwd: bool = False
    # Execute blocks constructed with fold factors > 1 on the lane-dense
    # folded representation (yolox_tpu/ops/lane_fold.py). Default False:
    # folding trades k x folded-conv FLOPs for lane-dense HBM traffic,
    # which pays off in the bandwidth-bound TRAIN step (apply_train sets
    # this) but regresses the compute-bound serving path. CspDarknet
    # clears it per-call when the input width does not divide the fold
    # chain, so every block under it consistently runs plain.
    lane_fold: bool = False
    # int8 PTQ serving (yolox_tpu/ops/quant.py). `int8_qtab` maps each
    # BaseConv's parameter path to its calibrated input abs-max; when set
    # (eval only), every BaseConv runs quantize -> int8 conv -> dequant.
    # `calib_sink`: when set, BaseConv records the input's abs-max (or the
    # `calib_q` percentile of |input| when set — the standard outlier-
    # clipping PTQ knob) per path into the dict while running the ordinary
    # float path — jit a forward and return the sink to collect a
    # calibration table (YoloxModule.calibrate_int8).
    int8_qtab: Optional[Dict[str, Any]] = None
    calib_sink: Optional[Dict[str, Any]] = None
    calib_q: Optional[float] = None
    # Run the CspDarknet stem through the transpose-free space-to-depth
    # fold (yolox_tpu/ops/stem_s2d.py): XLA VPU-lowers the 3-channel Focus
    # conv at ~0.6% MFU (65% of batch-1 device time); the fold runs the
    # same math MXU-shaped. Composes with the train step (differentiable
    # gathers + slot-pooled BN) and both int8 modes; CspDarknet checks
    # legality (non-depthwise, not calibrating, not lane-folded, not
    # fused_bwd, H and W divisible by 4) and falls back to the plain stem
    # otherwise. Config knobs serve_stem_s2d (batch-conditional "auto")
    # and train_stem_s2d.
    stem_s2d: bool = False
    # int8-in-HBM serving (quant.QTensor block interface): activations move
    # between blocks as int8 codes + per-channel scale; producers requantize
    # in their conv epilogue, consumers fold the incoming scale into their
    # BN-folded weights. Table keys: "<path>.out" per BaseConv (post-act,
    # per-channel amax), "<path>.addout" per residual add. Eval only.
    int8_hbm_qtab: Optional[Dict[str, Any]] = None


EVAL_CTX = Ctx(train=False, collector=None)


def batch_norm(p: Params, x, ctx: Ctx, path: str, fold: int = 1):
    """BatchNorm2d over NHWC, torch-exact semantics (see module docstring).

    `fold` > 1: `x` is a channel-major lane-folded tensor (C*fold lanes,
    yolox_tpu/ops/lane_fold.py) — batch statistics pool the fold slots
    back to the C logical channels (same value set, same formulas), and
    scale/bias are repeated per slot. Running stats stay logical (C,).
    """
    gamma = p["weight"]
    beta = p["bias"]
    frozen = ctx.eval_prefix is not None and path.startswith(ctx.eval_prefix)
    if ctx.train and not frozen:
        # Normalize with biased batch statistics (torch train mode).
        # Stats in f32 regardless of compute dtype (torch autocast runs
        # batch_norm in f32) — but WITHOUT materializing an f32 copy of
        # the activation: `x.astype(f32)` with two reduce consumers makes
        # XLA write the converted tensor to HBM (measured ~16 GB/step of
        # the yolox-s b64 train step's traffic). Keeping each convert
        # chain single-consumer fuses it into its reduce, so both stat
        # passes read the bf16 tensor directly with f32 accumulation —
        # same two-pass mean/E[(x-mean)^2] formulas, same numerics.
        sdt = jnp.promote_types(x.dtype, jnp.float32)
        if fold == 1:
            mean = jnp.mean(x, axis=(0, 1, 2), dtype=sdt)
            diff = x.astype(sdt) - mean
            var = jnp.mean(diff * diff, axis=(0, 1, 2))
        else:
            mean_f = jnp.mean(x, axis=(0, 1, 2), dtype=sdt)
            mean = jnp.mean(mean_f.reshape(-1, fold), axis=1)
            diff = x.astype(sdt) - jnp.repeat(mean, fold)
            var_f = jnp.mean(diff * diff, axis=(0, 1, 2))
            var = jnp.mean(var_f.reshape(-1, fold), axis=1)
        if ctx.collector is not None:
            n = x.shape[0] * x.shape[1] * x.shape[2] * fold
            unbiased = var * (n / max(n - 1, 1))
            m = BN_MOMENTUM
            new_mean = (1 - m) * p["running_mean"] + m * mean
            new_var = (1 - m) * p["running_var"] + m * unbiased
            ctx.collector.put(
                path, new_mean, new_var, p["num_batches_tracked"] + 1
            )
    else:
        mean = p["running_mean"]
        var = p["running_var"]
    inv = jax.lax.rsqrt(var.astype(jnp.promote_types(x.dtype, jnp.float32))
                        + BN_EPS)
    scale = (gamma * inv).astype(x.dtype)
    bias = (beta - mean * gamma * inv).astype(x.dtype)
    if fold > 1:
        scale = jnp.repeat(scale, fold)
        bias = jnp.repeat(bias, fold)
    return x * scale + bias


def init_bn(cout: int) -> Params:
    # Init builds host numpy arrays; the module root does one device_put.
    return {
        "weight": np.ones((cout,), np.float32),
        "bias": np.zeros((cout,), np.float32),
        "running_mean": np.zeros((cout,), np.float32),
        "running_var": np.ones((cout,), np.float32),
        "num_batches_tracked": np.zeros((), np.int32),
    }


def init_conv_kernel(rng, k: int, cin: int, cout: int, groups: int = 1):
    """Torch Conv2d default init (kaiming_uniform_(a=sqrt(5))) in HWIO.

    `rng` is a host-side numpy Generator consumed sequentially (init happens
    once on host; device RNG would pay a dispatch per parameter).
    """
    fan_in = (cin // groups) * k * k
    bound = math.sqrt(1.0 / fan_in)
    return rng.uniform(
        -bound, bound, (k, k, cin // groups, cout)).astype(np.float32)


def init_conv_bias(rng, k: int, cin: int, cout: int, groups: int = 1):
    fan_in = (cin // groups) * k * k
    bound = math.sqrt(1.0 / fan_in)
    return rng.uniform(-bound, bound, (cout,)).astype(np.float32)


# ---------------------------------------------------------------------------
# Blocks (reference: yolox/models/network_blocks.py)
# ---------------------------------------------------------------------------

class Module:
    """Minimal static-module base: subclasses define children + forward."""

    def init(self, rng) -> Params:
        raise NotImplementedError

    def __call__(self, p: Params, x, ctx: Ctx = EVAL_CTX, path: str = ""):
        raise NotImplementedError


class Sequential(Module):
    """Children keyed '0', '1', ... to mirror torch nn.Sequential keys."""

    def __init__(self, *mods: Module):
        self.mods = list(mods)

    def init(self, rng) -> Params:
        return {str(i): m.init(rng) for i, m in enumerate(self.mods)}

    def __call__(self, p, x, ctx=EVAL_CTX, path=""):
        for i, m in enumerate(self.mods):
            x = m(p[str(i)], x, ctx, f"{path}.{i}")
        return x


class BaseConv(Module):
    """Conv2d -> BatchNorm -> activation (`network_blocks.py:27-52`).

    `fold_in`/`fold_out` > 1: operate on the channel-major lane-folded
    representation (yolox_tpu/ops/lane_fold.py) when `ctx.lane_fold` —
    same math, lane-dense HBM traffic. Parameter shapes are unchanged.
    """

    def __init__(self, cin, cout, ksize, stride, groups=1, act="silu",
                 fold_in=1, fold_out=1):
        self.cin, self.cout = cin, cout
        self.ksize, self.stride, self.groups = ksize, stride, groups
        self.fold_in, self.fold_out = fold_in, fold_out
        self.act_name = act
        self.act = get_activation(act)

    def init(self, rng) -> Params:
        return {
            "conv": {
                "weight": init_conv_kernel(
                    rng, self.ksize, self.cin, self.cout, self.groups
                )
            },
            "bn": init_bn(self.cout),
        }

    def __call__(self, p, x, ctx=EVAL_CTX, path=""):
        bn_path = f"{path}.bn"
        if ctx.calib_sink is not None:
            ax = jnp.abs(x).astype(jnp.float32)
            ctx.calib_sink[path] = (
                jnp.percentile(ax, ctx.calib_q) if ctx.calib_q is not None
                else jnp.max(ax))
        if ctx.int8_qtab is not None:
            from yolox_tpu.ops import quant
            assert not ctx.train, "int8 PTQ is a serving/eval-only path"
            return quant.conv_bn_act(x, p, ctx.int8_qtab[path], self.stride,
                                     self.groups, self.act)
        if ctx.int8_hbm_qtab is not None:
            from yolox_tpu.ops import quant
            assert not ctx.train, "int8 PTQ is a serving/eval-only path"
            # A producer whose output feeds a residual add defers its
            # requant to the add site (set by Bottleneck/ResLayer).
            requant_out = not getattr(self, "defer_requant_hbm", False)
            if isinstance(x, quant.QTensor):
                return quant.conv_bn_act_hbm(
                    x, p, ctx.int8_hbm_qtab.get(f"{path}.out"), self.stride,
                    self.groups, self.act, requant_out=requant_out)
            # entry conv (raw float input, e.g. a 3-channel stem): run the
            # ordinary float block, then requantize the output
            y = conv2d(x, p["conv"]["weight"], self.stride, self.groups)
            y = self.act(batch_norm(p["bn"], y, ctx, bn_path))
            if not requant_out:
                return y
            return quant.requant(y, ctx.int8_hbm_qtab[f"{path}.out"])
        if ctx.lane_fold and (self.fold_in > 1 or self.fold_out > 1):
            from yolox_tpu.ops import lane_fold as lf
            pad = (self.ksize - 1) // 2
            y = lf.fold_conv(x, p["conv"]["weight"], self.stride,
                             (pad, pad), self.fold_in, self.fold_out,
                             groups=self.groups)
            y = batch_norm(p["bn"], y, ctx, bn_path, fold=self.fold_out)
            return self.act(y)
        frozen = (ctx.eval_prefix is not None
                  and bn_path.startswith(ctx.eval_prefix))
        if ctx.train and not frozen and ctx.fused_bwd:
            from yolox_tpu.ops import pallas_conv_bwd as pcb
            if pcb.supports(self.ksize, self.stride, self.groups,
                            self.act_name):
                bn = p["bn"]
                y, mean, var = pcb.fused_conv_bn_act(
                    self.ksize, self.stride, self.groups, self.act_name,
                    x, p["conv"]["weight"], bn["weight"], bn["bias"])
                if ctx.collector is not None:
                    n = y.shape[0] * y.shape[1] * y.shape[2]
                    unbiased = var * (n / max(n - 1, 1))
                    m = BN_MOMENTUM
                    ctx.collector.put(
                        bn_path,
                        (1 - m) * bn["running_mean"] + m * mean,
                        (1 - m) * bn["running_var"] + m * unbiased,
                        bn["num_batches_tracked"] + 1,
                    )
                return y
        y = conv2d(x, p["conv"]["weight"], self.stride, self.groups)
        y = batch_norm(p["bn"], y, ctx, bn_path)
        y = self.act(y)
        if ctx.calib_sink is not None:
            # per-channel post-act amax for the int8-in-HBM mode (the
            # producer-side requant scale; Ctx.int8_hbm_qtab docstring)
            ctx.calib_sink[f"{path}.out"] = _calib_channel_amax(y, ctx)
        return y


def _calib_channel_amax(y, ctx: Ctx):
    ay = jnp.abs(y).astype(jnp.float32)
    if ctx.calib_q is not None:
        return jnp.percentile(ay, ctx.calib_q, axis=(0, 1, 2))
    return jnp.max(ay, axis=(0, 1, 2))


class DWConv(Module):
    """Depthwise conv + pointwise conv (`network_blocks.py:55-74`)."""

    def __init__(self, cin, cout, ksize, stride=1, act="silu",
                 fold_in=1, fold_out=1):
        self.dconv = BaseConv(cin, cin, ksize, stride, groups=cin, act=act,
                              fold_in=fold_in, fold_out=fold_out)
        self.pconv = BaseConv(cin, cout, 1, 1, groups=1, act=act,
                              fold_in=fold_out, fold_out=fold_out)

    def init(self, rng) -> Params:
        return {"dconv": self.dconv.init(rng), "pconv": self.pconv.init(rng)}

    def __call__(self, p, x, ctx=EVAL_CTX, path=""):
        x = self.dconv(p["dconv"], x, ctx, f"{path}.dconv")
        return self.pconv(p["pconv"], x, ctx, f"{path}.pconv")


class Bottleneck(Module):
    """Standard bottleneck (`network_blocks.py:77-99`)."""

    def __init__(self, cin, cout, shortcut=True, expansion=0.5,
                 depthwise=False, act="silu", fold=1):
        hidden = int(cout * expansion)
        Conv = DWConv if depthwise else BaseConv
        self.conv1 = BaseConv(cin, hidden, 1, 1, act=act,
                              fold_in=fold, fold_out=fold)
        self.conv2 = Conv(hidden, cout, 3, stride=1, act=act,
                          fold_in=fold, fold_out=fold)
        self.use_add = shortcut and cin == cout
        if self.use_add:
            # int8-in-HBM: conv2 defers its requant to the post-add site
            # (single rounding at the calibrated "<path>.addout" amax)
            (self.conv2.pconv if depthwise else self.conv2
             ).defer_requant_hbm = True

    def init(self, rng) -> Params:
        return {"conv1": self.conv1.init(rng), "conv2": self.conv2.init(rng)}

    def __call__(self, p, x, ctx=EVAL_CTX, path=""):
        y = self.conv1(p["conv1"], x, ctx, f"{path}.conv1")
        y = self.conv2(p["conv2"], y, ctx, f"{path}.conv2")
        if not self.use_add:
            return y
        if ctx.int8_hbm_qtab is not None:
            from yolox_tpu.ops import quant
            # y is the deferred f32 activation; x is the block input QTensor
            return quant.requant(y + quant.dequant(x),
                                 ctx.int8_hbm_qtab[f"{path}.addout"])
        out = y + x
        if ctx.calib_sink is not None:
            ctx.calib_sink[f"{path}.addout"] = _calib_channel_amax(out, ctx)
        return out


class ResLayer(Module):
    """YOLOv3 residual layer (`network_blocks.py:102-117`)."""

    def __init__(self, cin: int):
        mid = cin // 2
        self.layer1 = BaseConv(cin, mid, 1, 1, act="lrelu")
        self.layer2 = BaseConv(mid, cin, 3, 1, act="lrelu")
        self.layer2.defer_requant_hbm = True  # requant at the add site

    def init(self, rng) -> Params:
        return {"layer1": self.layer1.init(rng), "layer2": self.layer2.init(rng)}

    def __call__(self, p, x, ctx=EVAL_CTX, path=""):
        out = self.layer1(p["layer1"], x, ctx, f"{path}.layer1")
        out = self.layer2(p["layer2"], out, ctx, f"{path}.layer2")
        if ctx.int8_hbm_qtab is not None:
            from yolox_tpu.ops import quant
            return quant.requant(out + quant.dequant(x),
                                 ctx.int8_hbm_qtab[f"{path}.addout"])
        out = x + out
        if ctx.calib_sink is not None:
            ctx.calib_sink[f"{path}.addout"] = _calib_channel_amax(out, ctx)
        return out


class SPPBottleneck(Module):
    """Spatial pyramid pooling, kernels (5, 9, 13) (`network_blocks.py:120-142`).

    TPU-first execution: when the kernel set is an arithmetic chain
    k, 2k-1, 3k-2, ... (the default (5, 9, 13) is), the pools are computed
    as a CASCADE of k-pools (the SPPF identity): pool9 = pool5(pool5),
    pool13 = pool5(pool5(pool5)). Bit-exact for max (same effective window,
    -inf padding is neutral), but each window is 25 taps instead of up to
    169, and — the real win — the backward lowers to three cheap k=5
    `select_and_scatter`s instead of one k=13: measured 19.6 ms/step of
    select_and_scatter on a yolox-s b64 train step before, ~6 ms after.
    """

    def __init__(self, cin, cout, kernel_sizes=(5, 9, 13), activation="silu"):
        hidden = cin // 2
        self.kernel_sizes = kernel_sizes
        k0 = kernel_sizes[0]
        self.cascade = all(
            ks == k0 + i * (k0 - 1) for i, ks in enumerate(kernel_sizes))
        self.conv1 = BaseConv(cin, hidden, 1, 1, act=activation)
        self.conv2 = BaseConv(hidden * (len(kernel_sizes) + 1), cout, 1, 1,
                              act=activation)

    def init(self, rng) -> Params:
        return {"conv1": self.conv1.init(rng), "conv2": self.conv2.init(rng)}

    def __call__(self, p, x, ctx=EVAL_CTX, path=""):
        x = self.conv1(p["conv1"], x, ctx, f"{path}.conv1")
        if ctx.int8_hbm_qtab is not None:
            # pool int8 codes directly (scale-preserving; quant.py) and
            # concat codes+scales — conv2 folds the per-channel scales in
            from yolox_tpu.ops import quant
            pool = lambda v, ks: quant.q_max_pool_same(v, ks)  # noqa: E731
            cat = quant.q_concat
        else:
            pool, cat = max_pool_same, lambda xs: jnp.concatenate(xs, -1)
        if self.cascade:
            pools, y = [], x
            for _ in self.kernel_sizes:
                y = pool(y, self.kernel_sizes[0])
                pools.append(y)
        else:
            pools = [pool(x, ks) for ks in self.kernel_sizes]
        x = cat([x] + pools)
        return self.conv2(p["conv2"], x, ctx, f"{path}.conv2")


class CspLayer(Module):
    """C3: CSP bottleneck with 3 convs (`network_blocks.py:145-183`)."""

    def __init__(self, cin, cout, n=1, shortcut=True, expansion=0.5,
                 depthwise=False, act="silu", fold=1):
        hidden = int(cout * expansion)
        self.conv1 = BaseConv(cin, hidden, 1, 1, act=act,
                              fold_in=fold, fold_out=fold)
        self.conv2 = BaseConv(cin, hidden, 1, 1, act=act,
                              fold_in=fold, fold_out=fold)
        self.conv3 = BaseConv(2 * hidden, cout, 1, 1, act=act,
                              fold_in=fold, fold_out=fold)
        self.m = Sequential(
            *[
                Bottleneck(hidden, hidden, shortcut, 1.0, depthwise, act=act,
                           fold=fold)
                for _ in range(n)
            ]
        )

    def init(self, rng) -> Params:
        return {
            "conv1": self.conv1.init(rng),
            "conv2": self.conv2.init(rng),
            "conv3": self.conv3.init(rng),
            "m": self.m.init(rng),
        }

    def __call__(self, p, x, ctx=EVAL_CTX, path=""):
        x1 = self.conv1(p["conv1"], x, ctx, f"{path}.conv1")
        x2 = self.conv2(p["conv2"], x, ctx, f"{path}.conv2")
        x1 = self.m(p["m"], x1, ctx, f"{path}.m")
        if ctx.int8_hbm_qtab is not None:
            from yolox_tpu.ops import quant
            x = quant.q_concat([x1, x2])
        else:
            x = jnp.concatenate([x1, x2], axis=-1)
        return self.conv3(p["conv3"], x, ctx, f"{path}.conv3")


class Focus(Module):
    """Space-to-depth 2x2 then conv (`network_blocks.py:186-208`).

    Channel concat order (TL, BL, TR, BR) matches the reference so upstream
    checkpoints' first-conv input channels line up.

    TPU-first execution: instead of materializing four strided slices of a
    3-channel NHWC tensor (pathological lane utilization + relayouts —
    measured 25% of the whole yolox-s forward), the kxk conv on the
    space-to-depth image is folded into ONE 2k x 2k stride-2 conv on the
    raw input with a remapped kernel. Mathematically identical
    (w_big[dy+2u, dx+2v, c, o] = w[u, v, g(dy,dx)*C + c, o]); the remap is
    loop-invariant and hoisted by XLA. The checkpoint layout is untouched.
    """

    def __init__(self, cin, cout, ksize=1, stride=1, act="silu", fold_out=1):
        assert stride == 1, "reference Focus always uses stride 1"
        self.cin = cin
        self.ksize = ksize
        self.fold_out = fold_out
        self.conv = BaseConv(cin * 4, cout, ksize, stride, act=act)

    def init(self, rng) -> Params:
        return {"conv": self.conv.init(rng)}

    def _space_to_depth_kernel(self, w):
        """(k, k, 4*cin, cout) -> equivalent (2k, 2k, cin, cout)."""
        k, cin = self.ksize, self.cin
        wb = jnp.zeros((2 * k, 2 * k, cin, w.shape[3]), w.dtype)
        # group order (TL, BL, TR, BR) = (dy, dx) of the reference concat
        for g, (dy, dx) in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)]):
            for u in range(k):
                for v in range(k):
                    wb = wb.at[dy + 2 * u, dx + 2 * v].set(
                        w[u, v, g * cin:(g + 1) * cin, :])
        return wb

    def __call__(self, p, x, ctx=EVAL_CTX, path=""):
        k = self.ksize
        wb = self._space_to_depth_kernel(p["conv"]["conv"]["weight"])
        if ctx.calib_sink is not None:
            ax = jnp.abs(x).astype(jnp.float32)
            ctx.calib_sink[f"{path}.conv"] = (
                jnp.percentile(ax, ctx.calib_q) if ctx.calib_q is not None
                else jnp.max(ax))
        if ctx.int8_qtab is not None:
            # quantize the folded 2k x 2k stride-2 stem conv like any
            # BaseConv ((2k-1)//2 == k-1, the same 'same' padding)
            from yolox_tpu.ops import quant
            return quant.conv_bn_act(
                x, {"conv": {"weight": wb}, "bn": p["conv"]["bn"]},
                ctx.int8_qtab[f"{path}.conv"], 2, 1, self.conv.act)
        if ctx.lane_fold and self.fold_out > 1:
            # image folded by 2*fold_out (stride 2, folded stride 1): the
            # raw (B, H, W, 3) input goes lane-dense before the first conv
            from yolox_tpu.ops import lane_fold as lf
            k_img = 2 * self.fold_out
            y = lf.fold_conv(lf.fold(x, k_img), wb, 2, (k - 1, k - 1),
                             k_img, self.fold_out)
            y = batch_norm(p["conv"]["bn"], y, ctx, f"{path}.conv.bn",
                           fold=self.fold_out)
            return self.conv.act(y)
        y = jax.lax.conv_general_dilated(
            x, wb.astype(x.dtype), (2, 2),
            ((k - 1, k - 1), (k - 1, k - 1)),
            dimension_numbers=_CONV_DN)
        y = batch_norm(p["conv"]["bn"], y, ctx, f"{path}.conv.bn")
        y = self.conv.act(y)
        if ctx.calib_sink is not None:
            ctx.calib_sink[f"{path}.conv.out"] = _calib_channel_amax(y, ctx)
        if ctx.int8_hbm_qtab is not None:
            # the 3-channel stem conv stays float; its output enters the
            # int8-in-HBM domain here
            from yolox_tpu.ops import quant
            return quant.requant(y, ctx.int8_hbm_qtab[f"{path}.conv.out"])
        return y


def upsample_nearest_2x(x):
    """nn.Upsample(scale_factor=2, mode='nearest') over NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
