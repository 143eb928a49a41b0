"""PAFPN neck (NHWC) — re-design of `/root/reference/yolox/models/yolo_pafpn.py`.

Top-down FPN + bottom-up PAN over (dark3, dark4, dark5); nearest 2x
upsampling; outputs three pyramid levels at strides (8, 16, 32).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from yolox_tpu.models.blocks import (
    BaseConv,
    CspLayer,
    DWConv,
    EVAL_CTX,
    Module,
    Params,
    upsample_nearest_2x,
)
from yolox_tpu.models.darknet import CspDarknet


class YoloPafpn(Module):
    def __init__(
        self,
        depth: float = 1.0,
        width: float = 1.0,
        in_features: Sequence[str] = ("dark3", "dark4", "dark5"),
        in_channels: Sequence[int] = (256, 512, 1024),
        depthwise: bool = False,
        act: str = "silu",
        lane_fold: bool = True,
        lane_fold_target: int = 256,
    ):
        self.backbone = CspDarknet(depth, width, depthwise=depthwise, act=act,
                                   lane_fold=lane_fold,
                                   lane_fold_target=lane_fold_target)
        self.in_features = in_features
        self.in_channels = in_channels
        Conv = DWConv if depthwise else BaseConv

        self.lateral_conv0 = BaseConv(
            int(in_channels[2] * width), int(in_channels[1] * width), 1, 1,
            act=act)
        self.C3_p4 = CspLayer(
            int(2 * in_channels[1] * width), int(in_channels[1] * width),
            round(3 * depth), False, depthwise=depthwise, act=act)
        self.reduce_conv1 = BaseConv(
            int(in_channels[1] * width), int(in_channels[0] * width), 1, 1,
            act=act)
        self.C3_p3 = CspLayer(
            int(2 * in_channels[0] * width), int(in_channels[0] * width),
            round(3 * depth), False, depthwise=depthwise, act=act)
        self.bu_conv2 = Conv(
            int(in_channels[0] * width), int(in_channels[0] * width), 3, 2,
            act=act)
        self.C3_n3 = CspLayer(
            int(2 * in_channels[0] * width), int(in_channels[1] * width),
            round(3 * depth), False, depthwise=depthwise, act=act)
        self.bu_conv1 = Conv(
            int(in_channels[1] * width), int(in_channels[1] * width), 3, 2,
            act=act)
        self.C3_n4 = CspLayer(
            int(2 * in_channels[1] * width), int(in_channels[2] * width),
            round(3 * depth), False, depthwise=depthwise, act=act)

    def init(self, rng) -> Params:
        return {
            "backbone": self.backbone.init(rng),
            "lateral_conv0": self.lateral_conv0.init(rng),
            "C3_p4": self.C3_p4.init(rng),
            "reduce_conv1": self.reduce_conv1.init(rng),
            "C3_p3": self.C3_p3.init(rng),
            "bu_conv2": self.bu_conv2.init(rng),
            "C3_n3": self.C3_n3.init(rng),
            "bu_conv1": self.bu_conv1.init(rng),
            "C3_n4": self.C3_n4.init(rng),
        }

    def __call__(self, p, x, ctx=EVAL_CTX, path=""):
        out_features = self.backbone(p["backbone"], x, ctx, f"{path}.backbone")
        x2, x1, x0 = [out_features[f] for f in self.in_features]

        if ctx.int8_hbm_qtab is not None:
            # int8-in-HBM: upsample/concat act on QTensor codes+scales
            from yolox_tpu.ops.quant import q_concat, q_upsample_nearest_2x
            upsample, cat = q_upsample_nearest_2x, q_concat
        else:
            upsample = upsample_nearest_2x
            cat = lambda xs: jnp.concatenate(xs, axis=-1)  # noqa: E731

        fpn_out0 = self.lateral_conv0(p["lateral_conv0"], x0, ctx,
                                      f"{path}.lateral_conv0")
        f_out0 = upsample(fpn_out0)
        f_out0 = cat([f_out0, x1])
        f_out0 = self.C3_p4(p["C3_p4"], f_out0, ctx, f"{path}.C3_p4")

        fpn_out1 = self.reduce_conv1(p["reduce_conv1"], f_out0, ctx,
                                     f"{path}.reduce_conv1")
        f_out1 = upsample(fpn_out1)
        f_out1 = cat([f_out1, x2])
        pan_out2 = self.C3_p3(p["C3_p3"], f_out1, ctx, f"{path}.C3_p3")

        p_out1 = self.bu_conv2(p["bu_conv2"], pan_out2, ctx,
                               f"{path}.bu_conv2")
        p_out1 = cat([p_out1, fpn_out1])
        pan_out1 = self.C3_n3(p["C3_n3"], p_out1, ctx, f"{path}.C3_n3")

        p_out0 = self.bu_conv1(p["bu_conv1"], pan_out1, ctx,
                               f"{path}.bu_conv1")
        p_out0 = cat([p_out0, fpn_out0])
        pan_out0 = self.C3_n4(p["C3_n4"], p_out0, ctx, f"{path}.C3_n4")

        return (pan_out2, pan_out1, pan_out0)
