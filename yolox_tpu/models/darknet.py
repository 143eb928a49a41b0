"""CSPDarknet and legacy Darknet-53 backbones (NHWC).

Re-design of `/root/reference/yolox/models/darknet.py` — identical topology
and parameter-tree keys, functional JAX execution.
"""

from __future__ import annotations

from yolox_tpu.models.blocks import (
    BaseConv,
    CspLayer,
    DWConv,
    EVAL_CTX,
    Focus,
    Module,
    Params,
    ResLayer,
    Sequential,
    SPPBottleneck,
)


class CspDarknet(Module):
    """CSPDarknet backbone (`darknet.py:95-177`): Focus stem, dark2..dark5.

    Widths 64*w*{1,2,4,8,16}; depths round(3*d)*{1,3,3,1}; SPP in dark5.
    Returns a dict of the requested feature maps.
    """

    def __init__(self, dep_mul, wid_mul,
                 out_features=("dark3", "dark4", "dark5"),
                 depthwise=False, act="silu", lane_fold=True,
                 lane_fold_target=256):
        assert out_features, "please provide output features of Darknet"
        self.out_features = out_features
        self.depthwise = depthwise
        Conv = DWConv if depthwise else BaseConv

        base_channels = int(wid_mul * 64)
        base_depth = max(round(dep_mul * 3), 1)

        # Lane-dense folds for the small-channel stages
        # (yolox_tpu/ops/lane_fold.py): fs halves per downsample, so the
        # folded stride is 1 everywhere and k*C stays ~256 lanes.
        from yolox_tpu.ops.lane_fold import stage_folds
        fs, f2, f3, f4, f5 = (
            stage_folds(base_channels, target=lane_fold_target)
            if lane_fold else (1, 1, 1, 1, 1))
        assert f5 == 1, "SPP stage must be unfolded"
        self.folds = (fs, f2, f3, f4, f5)
        # the image itself is folded by 2*fs inside Focus
        self.fold_divisor = 2 * fs

        self.stem = Focus(3, base_channels, ksize=3, act=act, fold_out=fs)
        self.dark2 = Sequential(
            Conv(base_channels, base_channels * 2, 3, 2, act=act,
                 fold_in=fs, fold_out=f2),
            CspLayer(base_channels * 2, base_channels * 2, n=base_depth,
                     depthwise=depthwise, act=act, fold=f2),
        )
        self.dark3 = Sequential(
            Conv(base_channels * 2, base_channels * 4, 3, 2, act=act,
                 fold_in=f2, fold_out=f3),
            CspLayer(base_channels * 4, base_channels * 4, n=base_depth * 3,
                     depthwise=depthwise, act=act, fold=f3),
        )
        self.dark4 = Sequential(
            Conv(base_channels * 4, base_channels * 8, 3, 2, act=act,
                 fold_in=f3, fold_out=f4),
            CspLayer(base_channels * 8, base_channels * 8, n=base_depth * 3,
                     depthwise=depthwise, act=act, fold=f4),
        )
        self.dark5 = Sequential(
            Conv(base_channels * 8, base_channels * 16, 3, 2, act=act,
                 fold_in=f4, fold_out=f5),
            SPPBottleneck(base_channels * 16, base_channels * 16,
                          activation=act),
            CspLayer(base_channels * 16, base_channels * 16, n=base_depth,
                     shortcut=False, depthwise=depthwise, act=act),
        )

    def init(self, rng) -> Params:
        return {
            "stem": self.stem.init(rng),
            "dark2": self.dark2.init(rng),
            "dark3": self.dark3.init(rng),
            "dark4": self.dark4.init(rng),
            "dark5": self.dark5.init(rng),
        }

    def _use_stem_s2d(self, ctx, x, folded) -> bool:
        """Legality of the space-to-depth stem fold for this call: plain
        BaseConv stem chain, not calibrating (calibration runs the plain
        path so the qtab gets the canonical keys), spatial dims foldable
        by 4, and nobody downstream asking for the unblocked stem
        feature map. The int8 ladder and int8-in-HBM modes compose
        (ops/stem_s2d.py int8 section); the TRAIN step composes too
        (folds are differentiable gathers, train-mode BN pools the block
        slots — `stem_s2d.blocked_batch_norm_train`; knob
        config.train_stem_s2d via apply_train)."""
        return (ctx.stem_s2d and not folded
                and not self.depthwise
                and ctx.calib_sink is None
                and ctx.fused_bwd is False
                and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
                and "stem" not in self.out_features)

    def __call__(self, p, x, ctx=EVAL_CTX, path=""):
        from yolox_tpu.ops.lane_fold import unfold

        # Fold only when this backbone HAS folds (a lane_fold=False
        # build has folds=(1,..) and must not count as folded — it
        # would spuriously veto the s2d stem under the train ctx's
        # default lane_fold=True) and the input width divides the whole
        # fold chain; otherwise run every stage plain (consistently,
        # via the ctx flag).
        folded = (ctx.lane_fold and any(f > 1 for f in self.folds)
                  and x.shape[2] % self.fold_divisor == 0)
        if ctx.lane_fold != folded:
            import dataclasses
            ctx = dataclasses.replace(ctx, lane_fold=folded)
        folds = self.folds if folded else (1, 1, 1, 1, 1)

        outputs = {}
        if self._use_stem_s2d(ctx, x, folded):
            # Transpose-free space-to-depth stem (ops/stem_s2d.py): the
            # stem + dark2's first conv run as two MXU-shaped convs over
            # blocked channels; the output is layout-identical to the
            # plain path, so dark2's CSP layer onward is untouched. The
            # int8 serving modes run the same folds quantized (exact
            # composition: the calibrated scales transfer, see the int8
            # section of ops/stem_s2d.py).
            from yolox_tpu.models.blocks import batch_norm
            from yolox_tpu.ops import stem_s2d as s2d

            act_s = self.stem.conv.act
            act_n = self.dark2.mods[0].act
            if ctx.int8_hbm_qtab is not None:
                x = s2d.stem_blocked_hbm(
                    p["stem"], p["dark2"]["0"], x,
                    ctx.int8_hbm_qtab[f"{path}.stem.conv.out"],
                    ctx.int8_hbm_qtab[f"{path}.dark2.0.out"],
                    act_s, act_n)
            elif ctx.int8_qtab is not None:
                x = s2d.stem_blocked_ladder(
                    p["stem"], p["dark2"]["0"], x,
                    ctx.int8_qtab[f"{path}.stem.conv"],
                    ctx.int8_qtab[f"{path}.dark2.0"],
                    act_s, act_n, x.dtype)
            else:
                a = s2d.stem_conv_blocked(
                    p["stem"]["conv"]["conv"]["weight"], x)
                bn_path = f"{path}.stem.conv.bn"
                frozen = (ctx.eval_prefix is not None
                          and bn_path.startswith(ctx.eval_prefix))
                if ctx.train and not frozen:
                    a = s2d.blocked_batch_norm_train(
                        p["stem"]["conv"]["bn"], a, ctx, bn_path)
                else:
                    a = batch_norm(s2d.tile4(p["stem"]["conv"]["bn"]), a,
                                   ctx, bn_path)
                a = act_s(a)
                z = s2d.next_conv_blocked(
                    p["dark2"]["0"]["conv"]["weight"], a)
                x = act_n(batch_norm(p["dark2"]["0"]["bn"], z, ctx,
                                     f"{path}.dark2.0.bn"))
            x = self.dark2.mods[1](
                p["dark2"]["1"], x, ctx, f"{path}.dark2.1")
            outputs["dark2"] = x
        else:
            x = self.stem(p["stem"], x, ctx, f"{path}.stem")
            outputs["stem"] = unfold(x, folds[0])
            x = self.dark2(p["dark2"], x, ctx, f"{path}.dark2")
            outputs["dark2"] = unfold(x, folds[1])
        x = self.dark3(p["dark3"], x, ctx, f"{path}.dark3")
        outputs["dark3"] = unfold(x, folds[2])
        x = self.dark4(p["dark4"], x, ctx, f"{path}.dark4")
        outputs["dark4"] = unfold(x, folds[3])
        x = self.dark5(p["dark5"], x, ctx, f"{path}.dark5")
        outputs["dark5"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


class Darknet(Module):
    """Legacy Darknet-21/53 backbone (`darknet.py:8-92`), lrelu activations."""

    depth2blocks = {21: [1, 2, 2, 1], 53: [2, 8, 8, 4]}

    def __init__(self, depth, in_channels=3, stem_out_channels=32,
                 out_features=("dark3", "dark4", "dark5")):
        assert out_features, "please provide output features of Darknet"
        self.out_features = out_features
        self.stem = Sequential(
            BaseConv(in_channels, stem_out_channels, ksize=3, stride=1,
                     act="lrelu"),
            *self._group_layer(stem_out_channels, num_blocks=1, stride=2),
        )
        in_ch = stem_out_channels * 2

        num_blocks = Darknet.depth2blocks[depth]
        self.dark2 = Sequential(*self._group_layer(in_ch, num_blocks[0], 2))
        in_ch *= 2
        self.dark3 = Sequential(*self._group_layer(in_ch, num_blocks[1], 2))
        in_ch *= 2
        self.dark4 = Sequential(*self._group_layer(in_ch, num_blocks[2], 2))
        in_ch *= 2
        self.dark5 = Sequential(
            *self._group_layer(in_ch, num_blocks[3], 2),
            *self._spp_block([in_ch, in_ch * 2], in_ch * 2),
        )

    @staticmethod
    def _group_layer(in_channels: int, num_blocks: int, stride: int = 1):
        return [
            BaseConv(in_channels, in_channels * 2, ksize=3, stride=stride,
                     act="lrelu"),
            *[ResLayer(in_channels * 2) for _ in range(num_blocks)],
        ]

    @staticmethod
    def _spp_block(filters_list, in_filters):
        return [
            BaseConv(in_filters, filters_list[0], 1, stride=1, act="lrelu"),
            BaseConv(filters_list[0], filters_list[1], 3, stride=1,
                     act="lrelu"),
            SPPBottleneck(filters_list[1], filters_list[0],
                          activation="lrelu"),
            BaseConv(filters_list[0], filters_list[1], 3, stride=1,
                     act="lrelu"),
            BaseConv(filters_list[1], filters_list[0], 1, stride=1,
                     act="lrelu"),
        ]

    def init(self, rng) -> Params:
        return {
            "stem": self.stem.init(rng),
            "dark2": self.dark2.init(rng),
            "dark3": self.dark3.init(rng),
            "dark4": self.dark4.init(rng),
            "dark5": self.dark5.init(rng),
        }

    def __call__(self, p, x, ctx=EVAL_CTX, path=""):
        outputs = {}
        x = self.stem(p["stem"], x, ctx, f"{path}.stem")
        outputs["stem"] = x
        x = self.dark2(p["dark2"], x, ctx, f"{path}.dark2")
        outputs["dark2"] = x
        x = self.dark3(p["dark3"], x, ctx, f"{path}.dark3")
        outputs["dark3"] = x
        x = self.dark4(p["dark4"], x, ctx, f"{path}.dark4")
        outputs["dark4"] = x
        x = self.dark5(p["dark5"], x, ctx, f"{path}.dark5")
        outputs["dark5"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}
