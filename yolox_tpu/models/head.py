"""YOLOX decoupled head (NHWC) — re-design of `/root/reference/yolox/models/yolo_head.py:16-251`.

Per pyramid level: 1x1 stem -> two branches of 2x(3x3 conv) -> 1x1 preds for
cls (num_classes) / reg (4) / obj (1). Inference decode:
(xy + grid) * stride, exp(wh) * stride (`yolo_head.py:229-230, 246-250`).

The training forward returns a dict of decoded reg + raw obj/cls logits plus
the grid metadata SimOTA needs (see yolox_tpu/models/assign.py) instead of
running the per-image python assignment loop of the reference — assignment
is fully batched/vmapped on TPU.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolox_tpu.models.blocks import (
    BaseConv,
    DWConv,
    EVAL_CTX,
    Module,
    Params,
    Sequential,
    init_conv_bias,
    init_conv_kernel,
)


def exact_int_bound(dtype) -> int:
    """Largest N such that every integer in [0, N] is exactly representable
    in `dtype` (mantissa bits + 1 implied bit; 2**24 for f32)."""
    return 2 ** (jnp.finfo(dtype).nmant + 1)


def level_grid(hsize: int, wsize: int, dtype=jnp.float32):
    """Anchor-center grid for one level: (h*w, 2) of (x=col, y=row), row-major.

    Cell coordinates must stay exact integers: if the requested dtype
    cannot represent max(h, w) - 1 exactly (bf16 rounds integers above
    256, i.e. inputs beyond 2048 px at stride 8), the grid is kept in
    f32 instead — downstream decode/payload math promotes.
    """
    xv, yv = np.meshgrid(np.arange(wsize), np.arange(hsize))  # indexing='xy'
    grid = np.stack((xv, yv), axis=2).reshape(hsize * wsize, 2)
    if max(hsize, wsize) - 1 > exact_int_bound(dtype):
        dtype = jnp.float32
    return jnp.asarray(grid, dtype=dtype)


class _PredConv(Module):
    """Plain 1x1 Conv2d with bias (torch nn.Conv2d default init)."""

    def __init__(self, cin, cout, bias_fill: Optional[float] = None):
        self.cin, self.cout = cin, cout
        self.bias_fill = bias_fill

    def init(self, rng) -> Params:
        w = init_conv_kernel(rng, 1, self.cin, self.cout)
        if self.bias_fill is not None:
            # Reference bias prior: -log((1 - p) / p), p = 1e-2
            # (`yolo_head.py:129-138`, applied from `config.py:175`).
            b = np.full((self.cout,), float(self.bias_fill), np.float32)
        else:
            b = init_conv_bias(rng, 1, self.cin, self.cout)
        return {"weight": w, "bias": b}

    def __call__(self, p, x, ctx=EVAL_CTX, path=""):
        if ctx.int8_hbm_qtab is not None:
            # preds stay un-quantized (no BN, decode-sensitive) but read
            # the int8 codes directly: the input's per-channel scale folds
            # into the f32 weight (exact), conv runs in bf16 as usual
            from yolox_tpu.ops import quant
            if isinstance(x, quant.QTensor):
                return quant.pred_conv_hbm(x, p["weight"], p["bias"])
        # kernel cast = AMP semantics (f32 master weights, bf16 compute)
        y = jax.lax.conv_general_dilated(
            x, p["weight"].astype(x.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + p["bias"].astype(y.dtype)


class YoloxHead(Module):
    def __init__(
        self,
        num_classes: int,
        width: float = 1.0,
        strides: Sequence[int] = (8, 16, 32),
        in_channels: Sequence[int] = (256, 512, 1024),
        act: str = "silu",
        depthwise: bool = False,
        prior_prob: float = 1e-2,
    ):
        self.num_classes = num_classes
        self.strides = list(strides)
        self.decode_in_inference = True
        Conv = DWConv if depthwise else BaseConv
        mid = int(256 * width)
        bias_prior = -math.log((1 - prior_prob) / prior_prob)

        self.stems, self.cls_convs, self.reg_convs = [], [], []
        self.cls_preds, self.reg_preds, self.obj_preds = [], [], []
        for i in range(len(in_channels)):
            self.stems.append(
                BaseConv(int(in_channels[i] * width), mid, 1, 1, act=act))
            self.cls_convs.append(Sequential(
                Conv(mid, mid, 3, 1, act=act), Conv(mid, mid, 3, 1, act=act)))
            self.reg_convs.append(Sequential(
                Conv(mid, mid, 3, 1, act=act), Conv(mid, mid, 3, 1, act=act)))
            self.cls_preds.append(_PredConv(mid, num_classes, bias_prior))
            self.reg_preds.append(_PredConv(mid, 4))
            self.obj_preds.append(_PredConv(mid, 1, bias_prior))

    def init(self, rng) -> Params:
        n = len(self.stems)
        groups = {
            "stems": self.stems,
            "cls_convs": self.cls_convs,
            "reg_convs": self.reg_convs,
            "cls_preds": self.cls_preds,
            "reg_preds": self.reg_preds,
            "obj_preds": self.obj_preds,
        }
        out: Params = {}
        idx = 0
        for name, mods in groups.items():
            out[name] = {}
            for i, m in enumerate(mods):
                out[name][str(i)] = m.init(rng)
                idx += 1
        return out

    def _level_outputs(self, p, xin, ctx, path):
        """Run stems/branches/preds per level; returns per-level NHWC maps."""
        levels = []
        for k, x in enumerate(xin):
            sk = str(k)
            x = self.stems[k](p["stems"][sk], x, ctx, f"{path}.stems.{k}")
            cls_feat = self.cls_convs[k](
                p["cls_convs"][sk], x, ctx, f"{path}.cls_convs.{k}")
            cls_out = self.cls_preds[k](
                p["cls_preds"][sk], cls_feat, ctx, f"{path}.cls_preds.{k}")
            reg_feat = self.reg_convs[k](
                p["reg_convs"][sk], x, ctx, f"{path}.reg_convs.{k}")
            reg_out = self.reg_preds[k](
                p["reg_preds"][sk], reg_feat, ctx, f"{path}.reg_preds.{k}")
            obj_out = self.obj_preds[k](
                p["obj_preds"][sk], reg_feat, ctx, f"{path}.obj_preds.{k}")
            levels.append((reg_out, obj_out, cls_out))
        return levels

    def forward_raw(self, p, xin, ctx=EVAL_CTX, path=""):
        """Pre-decode inference outputs + decode tables.

        Returns (outputs, grid, stride): outputs (B, A, 5+C) rows
        (tx, ty, tw, th, sigmoid(obj), sigmoid(cls)...), grid (A, 2),
        stride (A, 1). Decode = ((txy + grid) * stride, exp(twh) * stride).
        Used by the fused serving path, which decodes only the top-k
        candidates (`yolox_tpu/ops/nms.py:postprocess_fused`).
        """
        outs, grids, strides = self.forward_raw_levels(p, xin, ctx, path)
        return (jnp.concatenate(outs, axis=1),
                jnp.concatenate(grids, axis=0),
                jnp.concatenate(strides, axis=0))

    def forward_raw_levels(self, p, xin, ctx=EVAL_CTX, path=""):
        """Per-level `forward_raw`: ([outputs_l], [grid_l], [stride_l]).

        Same rows as `forward_raw` split at level boundaries, NOT
        concatenated — the fused serving postprocess reduces each level to
        its per-anchor score + 10-column candidate payload first and only
        concatenates those, so the full (B, A, 5+C) tensor (~154 MB for
        nano b256, ~365 MB for s) is never written to HBM.
        """
        levels = self._level_outputs(p, xin, ctx, path)
        outs, grids, strides = [], [], []
        for (reg, obj, cls), stride in zip(levels, self.strides):
            b, h, w, _ = reg.shape
            out = jnp.concatenate(
                [reg, jax.nn.sigmoid(obj), jax.nn.sigmoid(cls)], axis=-1)
            outs.append(out.reshape(b, h * w, -1))
            grids.append(level_grid(h, w, out.dtype))
            strides.append(
                jnp.full((h * w, 1), stride, out.dtype))
        return outs, grids, strides

    def __call__(self, p, xin, ctx=EVAL_CTX, path=""):
        """Inference forward: decoded (B, n_anchors_all, 5 + num_classes).

        Row layout matches the reference exactly:
        (cx, cy, w, h, sigmoid(obj), sigmoid(cls)...), anchors concatenated
        over levels in stride order (8, 16, 32), each level row-major.
        """
        outputs, grid, stride = self.forward_raw(p, xin, ctx, path)
        if not self.decode_in_inference:
            return outputs
        grid = grid[None]        # (1, A, 2)
        stride = stride[None]    # (1, A, 1)
        return jnp.concatenate(
            [
                (outputs[..., 0:2] + grid) * stride,
                jnp.exp(outputs[..., 2:4]) * stride,
                outputs[..., 4:],
            ],
            axis=-1,
        )

    def forward_train(self, p, xin, ctx, path=""):
        """Training forward.

        Returns a dict:
          outputs: (B, A, 5+C) — xy/wh decoded to image space
                   (`yolo_head.py:229-230`), obj/cls raw logits.
          origin_reg: (B, A, 4) raw reg predictions (grid space) for L1 loss.
          x_shifts, y_shifts: (A,) grid coordinates.
          expanded_strides: (A,) per-anchor stride.
        """
        levels = self._level_outputs(p, xin, ctx, path)
        outs, origin, xs, ys, es = [], [], [], [], []
        for (reg, obj, cls), stride in zip(levels, self.strides):
            b, h, w, _ = reg.shape
            out = jnp.concatenate([reg, obj, cls], axis=-1).reshape(
                b, h * w, -1)
            grid = level_grid(h, w, out.dtype)
            xy = (out[..., 0:2] + grid[None]) * stride
            wh = jnp.exp(out[..., 2:4]) * stride
            outs.append(jnp.concatenate([xy, wh, out[..., 4:]], axis=-1))
            origin.append(reg.reshape(b, h * w, 4))
            xs.append(grid[:, 0])
            ys.append(grid[:, 1])
            es.append(jnp.full((h * w,), stride, out.dtype))
        return {
            "outputs": jnp.concatenate(outs, axis=1),
            "origin_reg": jnp.concatenate(origin, axis=1),
            "x_shifts": jnp.concatenate(xs, axis=0),
            "y_shifts": jnp.concatenate(ys, axis=0),
            "expanded_strides": jnp.concatenate(es, axis=0),
        }
