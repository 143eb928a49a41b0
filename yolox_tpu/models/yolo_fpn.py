"""Legacy YOLOv3-style FPN — re-design of `/root/reference/yolox/models/yolo_fpn.py`."""

from __future__ import annotations

import jax.numpy as jnp

from yolox_tpu.models.blocks import (
    BaseConv,
    EVAL_CTX,
    Module,
    Params,
    Sequential,
    upsample_nearest_2x,
)
from yolox_tpu.models.darknet import Darknet


class YoloFpn(Module):
    """YOLOv3 FPN over a Darknet-53 backbone, lrelu embedding blocks."""

    def __init__(self, depth=53, in_features=("dark3", "dark4", "dark5")):
        self.backbone = Darknet(depth)
        self.in_features = in_features
        self.out1_cbl = self._cbl(512, 256, 1)
        self.out1 = self._embedding([256, 512], 512 + 256)
        self.out2_cbl = self._cbl(256, 128, 1)
        self.out2 = self._embedding([128, 256], 256 + 128)

    @staticmethod
    def _cbl(cin, cout, ks):
        return BaseConv(cin, cout, ks, stride=1, act="lrelu")

    def _embedding(self, filters_list, in_filters):
        return Sequential(
            self._cbl(in_filters, filters_list[0], 1),
            self._cbl(filters_list[0], filters_list[1], 3),
            self._cbl(filters_list[1], filters_list[0], 1),
            self._cbl(filters_list[0], filters_list[1], 3),
            self._cbl(filters_list[1], filters_list[0], 1),
        )

    def init(self, rng) -> Params:
        return {
            "backbone": self.backbone.init(rng),
            "out1_cbl": self.out1_cbl.init(rng),
            "out1": self.out1.init(rng),
            "out2_cbl": self.out2_cbl.init(rng),
            "out2": self.out2.init(rng),
        }

    def __call__(self, p, x, ctx=EVAL_CTX, path=""):
        out_features = self.backbone(p["backbone"], x, ctx, f"{path}.backbone")
        x2, x1, x0 = [out_features[f] for f in self.in_features]

        if ctx.int8_hbm_qtab is not None:
            # int8-in-HBM: upsample/concat act on QTensor codes+scales
            # (same dispatch as pafpn.py)
            from yolox_tpu.ops.quant import q_concat, q_upsample_nearest_2x
            upsample, cat = q_upsample_nearest_2x, q_concat
        else:
            upsample = upsample_nearest_2x
            cat = lambda xs: jnp.concatenate(xs, axis=-1)  # noqa: E731

        x1_in = self.out1_cbl(p["out1_cbl"], x0, ctx, f"{path}.out1_cbl")
        x1_in = upsample(x1_in)
        x1_in = cat([x1_in, x1])
        out_dark4 = self.out1(p["out1"], x1_in, ctx, f"{path}.out1")

        x2_in = self.out2_cbl(p["out2_cbl"], out_dark4, ctx,
                              f"{path}.out2_cbl")
        x2_in = upsample(x2_in)
        x2_in = cat([x2_in, x2])
        out_dark3 = self.out2(p["out2"], x2_in, ctx, f"{path}.out2")

        return (out_dark3, out_dark4, x0)
