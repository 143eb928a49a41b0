"""Top-level Yolox API — re-design of `/root/reference/yolox/models/yolox.py`.

`Yolox.from_pretrained("yolox_s")` + calling on PIL images / file paths
returns `Detections` dicts, exactly like the reference. The module body is a
jitted XLA graph over NHWC inputs; postprocessing (confidence filter + NMS)
runs on device (`yolox_tpu/ops/nms.py`).
"""

from __future__ import annotations

import os
import urllib.request
from pathlib import Path
from typing import Any, Iterable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from yolox_tpu.config import YoloxConfig
from yolox_tpu.models.blocks import BNCollector, Ctx
from yolox_tpu.models.head import YoloxHead
from yolox_tpu.models.pafpn import YoloPafpn
from yolox_tpu.models.processor import Detections, YoloxProcessor
from yolox_tpu.models.weights import load_pth_params

HOME = Path(os.environ.get("YOLOX_HOME", str(Path.home() / ".cache" / "yolox")))

_WEIGHTS_URL = (
    "https://github.com/Megvii-BaseDetection/YOLOX/releases/download/"
    "0.1.1rc0/{model_id}.pth"
)
# upstream file-name aliases (`yolox/models/build.py:18-26`)
_WEIGHTS_ALIAS = {"yolov3": "yolox_darknet"}


class Yolox:
    """module + processor wrapper (`yolox.py:22-52`)."""

    module: "YoloxModule"
    processor: YoloxProcessor

    def __init__(self, module: "YoloxModule", processor: YoloxProcessor):
        self.module = module
        self.processor = processor
        # set to a `YoloxModule.calibrate_int8` table to serve int8 PTQ:
        # `int8_qtab` = per-block ladder mode, `int8_hbm_qtab` = the
        # int8-activations-in-HBM mode (the same calibration table feeds
        # both; see YoloxModule.serve)
        self.int8_qtab: Optional[dict] = None
        self.int8_hbm_qtab: Optional[dict] = None

    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path: Union[str, os.PathLike],
        config: Optional[YoloxConfig] = None,
        device: Optional[str] = None,
        dtype: Any = jnp.float32,
    ) -> "Yolox":
        module = YoloxModule.from_pretrained(
            pretrained_model_name_or_path, config, device, dtype=dtype)
        processor = YoloxProcessor(
            config or str(pretrained_model_name_or_path))
        return cls(module, processor)

    @staticmethod
    def _to_image(image) -> Image.Image:
        if isinstance(image, Image.Image):
            return image
        if isinstance(image, np.ndarray):  # HWC RGB uint8 frame
            return Image.fromarray(image)
        return Image.open(image)

    def _dispatch(self, images: List[Image.Image], threshold: float):
        """Preprocess + async-dispatch one fused-serving batch.

        The batch is zero-padded to the next power of two so variable
        request sizes hit a bounded set of compiled graphs (XLA compiles
        per static shape); padded rows' detections are dropped by the
        `[:n]` slice at fetch time. Returns `(images, dets, valid, n)`
        with `dets`/`valid` still in flight (JAX async dispatch).
        """
        batch = self.processor(images)
        n = len(images)
        padded = 1 << (n - 1).bit_length() if n > 1 else 1
        if padded != n:
            arr = np.asarray(batch)
            batch = np.concatenate(
                [arr, np.zeros((padded - n,) + arr.shape[1:], arr.dtype)])
        dets, valid = self.module.serve_jit(
            batch, conf_thre=threshold,
            nms_thre=self.processor.config.nmsthre, max_det=1024,
            int8_qtab=self.int8_qtab, int8_hbm_qtab=self.int8_hbm_qtab)
        return images, dets, valid, n

    def _fetch(self, pending) -> List[Detections]:
        images, dets, valid, n = pending
        return self.processor.postprocess_dets(
            images, np.asarray(dets)[:n], np.asarray(valid)[:n])

    def __call__(
        self,
        inputs: Iterable[Union[Image.Image, str, os.PathLike]],
        threshold: float = 0.5,
    ) -> List[Detections]:
        if isinstance(inputs, (np.ndarray, jnp.ndarray)):
            # Back-compat: raw batched tensor in, decoded predictions out
            # (deprecated pattern, `yolox.py:42-44`).
            return self.module(inputs)
        images: List[Image.Image] = [self._to_image(image)
                                     for image in inputs]
        if self.module.head.decode_in_inference:
            # fused serving path: top-k select before decode, bitwise
            # identical to decode-then-postprocess in f32 (tested) and
            # materially faster on TPU.
            return self._fetch(self._dispatch(images, threshold))
        output = self.module(self.processor(images))
        return self.processor.postprocess(images, output, threshold=threshold)

    def stream(
        self,
        inputs: Iterable[Union[Image.Image, str, os.PathLike, np.ndarray]],
        threshold: float = 0.5,
        batch_size: int = 16,
    ):
        """Pipelined serving over a stream of images: yields one
        `Detections` dict per input, in order.

        Same results as `__call__` batch by batch, but software-pipelined
        the way the evaluator is (`evaluators/coco_evaluator.py`): JAX
        dispatch is asynchronous, so batch k+1's host work — image
        decode, letterbox preprocess, H2D transfer — runs while the
        device is still executing batch k, and batch k's result fetch
        happens only once batch k+1 is in flight. The synchronous
        `__call__` serializes those stages per request; on a video/
        directory workload the host side is a large fraction of wall
        time (the reference demo loop is fully synchronous per frame,
        `/root/reference/yolox/tools/demo.py:282-301`).

        A ragged tail batch is zero-padded to the next power of two
        (same bounded-compile-count rule as `__call__`).
        """
        import itertools

        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")

        if not self.module.head.decode_in_inference:
            # legacy decode path has no fused device postprocess to
            # overlap with — plain batched loop, identical results
            it = iter(inputs)
            while True:
                chunk = list(itertools.islice(it, batch_size))
                if not chunk:
                    return
                yield from self(chunk, threshold=threshold)

        it = iter(inputs)
        pending = None
        while True:
            chunk = list(itertools.islice(it, batch_size))
            if not chunk:
                break
            images = [self._to_image(image) for image in chunk]
            dispatched = self._dispatch(images, threshold)  # async
            if pending is not None:
                yield from self._fetch(pending)
            pending = dispatched
        if pending is not None:
            yield from self._fetch(pending)


class YoloxModule:
    """The network: PAFPN backbone + decoupled head, jitted eval forward.

    Functional core: static module definitions (`backbone`, `head`) +
    a parameter pytree (`params`) mirroring upstream state-dict keys.
    """

    def __init__(
        self,
        backbone: Optional[YoloPafpn] = None,
        head: Optional[YoloxHead] = None,
        params: Optional[dict] = None,
        config: Optional[YoloxConfig] = None,
        dtype: Any = jnp.float32,
    ):
        self.backbone = backbone if backbone is not None else YoloPafpn()
        self.head = head if head is not None else YoloxHead(80)
        self.config = config
        self.dtype = dtype
        self.params = params

        def _forward_eval(p, x):
            if dtype != jnp.float32:
                x = x.astype(dtype)
            fpn_outs = self.backbone(p["backbone"], x)
            out = self.head(p["head"], fpn_outs)
            return out.astype(jnp.float32)

        self._forward_eval = jax.jit(_forward_eval)

    # ---------------- construction ----------------

    @classmethod
    def from_config(cls, config: YoloxConfig, rng_seed: int = 0,
                    dtype: Any = jnp.float32) -> "YoloxModule":
        # configs may define a bespoke model topology (e.g. yolov3)
        if type(config).get_model is not YoloxConfig.get_model:
            module = config.get_model(rng_seed=rng_seed)
            if dtype != jnp.float32:
                module.dtype = dtype
                module.params = cls.cast_params(module.params, dtype)
            return module
        in_channels = [256, 512, 1024]
        backbone = YoloPafpn(config.depth, config.width,
                             in_channels=in_channels,
                             depthwise=config.depthwise, act=config.act,
                             lane_fold=getattr(config, "lane_fold", True),
                             lane_fold_target=getattr(
                                 config, "lane_fold_target", 256))
        head = YoloxHead(config.num_classes, config.width,
                         in_channels=in_channels,
                         depthwise=config.depthwise, act=config.act)
        module = cls(backbone, head, config=config, dtype=dtype)
        module.params = module.init(rng_seed)
        return module

    def init(self, rng_seed: int = 0) -> dict:
        rng = np.random.default_rng(rng_seed)
        params = {"backbone": self.backbone.init(rng),
                  "head": self.head.init(rng)}
        params = jax.tree.map(jnp.asarray, params)
        if self.dtype != jnp.float32:
            params = self.cast_params(params, self.dtype)
        return params

    @staticmethod
    def cast_params(params: dict, dtype) -> dict:
        def cast(x):
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
                return jnp.asarray(x, dtype)
            return x

        return jax.tree.map(cast, params)

    # ---------------- forward ----------------

    def __call__(self, x, params: Optional[dict] = None):
        """Eval forward: decoded (B, n_anchors, 5 + num_classes), float32.

        Accepts NHWC (native) or NCHW (reference layout, auto-transposed)
        numpy/JAX arrays.
        """
        p = params if params is not None else self.params
        x = jnp.asarray(x)
        if x.ndim == 3:
            x = x[None]
        if x.shape[1] <= 4 and x.shape[3] > 4:  # NCHW -> NHWC
            x = jnp.transpose(x, (0, 2, 3, 1))
        if self.dtype != jnp.float32:
            p = self.cast_params(p, self.dtype)
        return self._forward_eval(p, x.astype(jnp.float32))

    def serve(self, params: dict, x, conf_thre: float = 0.5,
              nms_thre: float = 0.65, class_agnostic: bool = False,
              max_det: int = 256, lane_fold: Optional[bool] = None,
              int8_qtab: Optional[dict] = None,
              int8_hbm_qtab: Optional[dict] = None,
              stem_s2d: Optional[bool] = None):
        """Fused serving step: forward + top-k select + f32 decode of the
        selected candidates + on-device NMS, as one graph. x: (B, H, W, 3)
        float NHWC. Returns (detections (B, max_det, 7), valid mask).
        Jit this (or call under jit); see bench.py and
        `yolox_tpu/ops/nms.py:postprocess_fused`. Accepts uint8 pixels
        directly (4x cheaper host->device transfer than f32 letterboxed
        batches; the cast happens on device).

        `int8_qtab`: calibration table from `calibrate_int8` — runs every
        conv+BN+act block as int8 on the MXU's 2x-rate int8 path
        (yolox_tpu/ops/quant.py). Mutually exclusive with lane folding.

        `int8_hbm_qtab`: table from `calibrate_int8(..., hbm=True)` — the
        int8-in-HBM mode: activations CROSS block boundaries as int8
        codes + per-channel scale (quant.QTensor), halving inter-block
        HBM traffic; producers requantize in their conv epilogue and
        consumers fold the incoming scale into their weights, so the
        per-block quantize/dequant ladder of `int8_qtab` disappears.
        The lever for the bandwidth-bound light models (nano/tiny).

        `stem_s2d` (default `config.serve_stem_s2d`, normally "auto" =
        on for traced batches <= `config.serve_stem_s2d_max_batch`): run
        the CspDarknet stem through the transpose-free space-to-depth
        fold (yolox_tpu/ops/stem_s2d.py) — same math MXU-shaped,
        measured 3.6x on the stem region that dominates batch-1 latency;
        loses at large batch (A/B in docs/serving_performance.md).
        Composes with the int8 modes; ignored where illegal.
        """
        import dataclasses

        from yolox_tpu.models.blocks import EVAL_CTX
        from yolox_tpu.ops.nms import postprocess_fused_levels

        if x.dtype == jnp.uint8 or self.dtype != jnp.float32:
            x = x.astype(self.dtype)
        if lane_fold is None:
            lane_fold = getattr(self.config, "serve_lane_fold", False)
        if stem_s2d is None:
            policy = getattr(self.config, "serve_stem_s2d", "auto")
            if policy == "auto":
                # batch size is static at trace time: each compiled
                # serve graph picks the stem formulation measured best
                # for its batch (small-batch: MXU s2d fold; large-batch:
                # the folded-Focus stem) — docs/serving_performance.md
                stem_s2d = x.shape[0] <= getattr(
                    self.config, "serve_stem_s2d_max_batch", 32)
            else:
                stem_s2d = bool(policy)
        if int8_hbm_qtab is not None:
            ctx = dataclasses.replace(EVAL_CTX, int8_hbm_qtab=int8_hbm_qtab)
        elif int8_qtab is not None:
            ctx = dataclasses.replace(EVAL_CTX, int8_qtab=int8_qtab)
        elif lane_fold:
            # lane-dense folded backbone execution (lane_fold.py): a FLOP
            # -for-bytes trade that wins on bandwidth-bound light models
            # (nano/tiny) and loses on compute-bound s/m/l/x — see
            # config.serve_lane_fold and docs/serving_performance.md
            ctx = dataclasses.replace(EVAL_CTX, lane_fold=True)
        else:
            ctx = EVAL_CTX
        if stem_s2d:
            # transpose-free space-to-depth stem (ops/stem_s2d.py);
            # composes with the int8 modes above. CspDarknet checks
            # per-call legality (skips itself under lane folding /
            # calibration / depthwise) and other backbones ignore the
            # flag.
            ctx = dataclasses.replace(ctx, stem_s2d=True)
        fpn_outs = self.backbone(params["backbone"], x, ctx, "backbone")
        outs, grids, strides = self.head.forward_raw_levels(
            params["head"], fpn_outs, ctx, "head")
        return postprocess_fused_levels(
            outs, grids, strides, self.head.num_classes, conf_thre,
            nms_thre, class_agnostic, max_det)

    def calibrate_int8(self, params: dict, batches,
                       percentile: Optional[float] = None) -> dict:
        """Collect the int8 activation-scale table over calibration data.

        `batches`: iterable of (B, H, W, 3) float NHWC arrays (a single
        array is accepted too; NCHW is auto-transposed like `__call__`).
        Runs the eval forward with a calibration sink recording every
        BaseConv input's abs-max — or, with `percentile` (e.g. 99.99),
        that percentile of |input|, the standard outlier-clipping PTQ
        knob — elementwise-maxed across batches. Returns {param_path:
        f32 scale basis} for `serve(..., int8_qtab=...)` / `enable_int8`.
        One jit compile per distinct batch shape.
        """
        import dataclasses

        from yolox_tpu.models.blocks import EVAL_CTX
        from yolox_tpu.ops.quant import merge_amax

        @jax.jit
        def calib_fn(p, xx):
            sink = {}
            ctx = dataclasses.replace(EVAL_CTX, calib_sink=sink,
                                      calib_q=percentile)
            fpn = self.backbone(p["backbone"], xx, ctx, "backbone")
            self.head.forward_raw_levels(p["head"], fpn, ctx, "head")
            return sink

        if hasattr(batches, "ndim"):
            batches = [batches]
        table: dict = {}
        for x in batches:
            x = jnp.asarray(x)
            if x.ndim == 3:
                x = x[None]
            if x.shape[1] <= 4 and x.shape[3] > 4:  # NCHW -> NHWC
                x = jnp.transpose(x, (0, 2, 3, 1))
            if x.dtype == jnp.uint8 or self.dtype != jnp.float32:
                x = x.astype(self.dtype)
            table = merge_amax(table, calib_fn(params, x))
        return jax.tree.map(jnp.asarray, table)

    def enable_int8(self, qtab: dict, hbm: bool = False) -> None:
        """Switch the module's eval forward (`__call__`) to an int8 PTQ
        path using the calibration table from `calibrate_int8`. Default:
        the per-block ladder (quantize -> int8 MXU conv -> dequant per
        BaseConv). `hbm=True`: the int8-activations-in-HBM mode (QTensor
        block interface, `yolox_tpu/ops/quant.py`). Decode and
        postprocess stay f32, so the evaluator / CLI paths
        (`yolox-tpu eval --int8[-hbm]`) measure the true quantized mAP."""
        import dataclasses

        from yolox_tpu.models.blocks import EVAL_CTX

        def _forward_int8(p, x, qt):
            if self.dtype != jnp.float32:
                x = x.astype(self.dtype)
            if hbm:
                ctx = dataclasses.replace(EVAL_CTX, int8_hbm_qtab=qt)
            else:
                ctx = dataclasses.replace(EVAL_CTX, int8_qtab=qt)
            fpn_outs = self.backbone(p["backbone"], x, ctx, "backbone")
            out = self.head(p["head"], fpn_outs, ctx, "head")
            return out.astype(jnp.float32)

        fwd = jax.jit(_forward_int8)
        self._forward_eval = lambda p, x: fwd(p, x, qtab)

    def serve_jit(self, x, conf_thre: float = 0.5, nms_thre: float = 0.65,
                  max_det: int = 256, int8_qtab: Optional[dict] = None,
                  int8_hbm_qtab: Optional[dict] = None):
        """Jitted `serve` on the module's own params (compiled once per
        (batch shape, max_det, qtab identity); thresholds are traced, not
        baked in)."""
        x = jnp.asarray(np.asarray(x), jnp.float32)
        key = (max_det, id(int8_qtab), id(int8_hbm_qtab))
        if getattr(self, "_serve_key", None) != key:
            self._serve_key = key
            self._serve_jit = jax.jit(
                lambda p, xx, conf, nms: self.serve(
                    p, xx, conf_thre=conf, nms_thre=nms, max_det=max_det,
                    int8_qtab=int8_qtab, int8_hbm_qtab=int8_hbm_qtab))
        p = self.params
        if self.dtype != jnp.float32:
            p = self.cast_params(p, self.dtype)
        return self._serve_jit(p, x, jnp.float32(conf_thre),
                               jnp.float32(nms_thre))

    def make_serving_fn(self, mesh=None, conf_thre: float = 0.5,
                        nms_thre: float = 0.65, class_agnostic: bool = False,
                        max_det: int = 256, int8_qtab: Optional[dict] = None,
                        int8_hbm_qtab: Optional[dict] = None):
        """Compiled serving function fn(params, x) -> (dets, valid).

        With a 1-D `jax.sharding.Mesh` ('data'), the batch is sharded over
        the mesh (params replicated): data-parallel inference — batch size
        must be divisible by the mesh size. With a 2-D ('data', 'space')
        mesh from `parallel.mesh.serving_mesh`, the image-height axis is
        additionally sharded over 'space': each conv runs on its row slab
        with XLA-inserted halo exchanges (GSPMD spatial partitioning),
        scaling single-image latency across chips. Detections come back
        sharded over 'data' only. `int8_qtab` (ladder) / `int8_hbm_qtab`
        (int8-activations-in-HBM, the recommended mode — see
        docs/serving_performance.md) serve the quantized graph; both
        compose with both mesh kinds (the QTensor codes shard like any
        NHWC activation; per-channel scales replicate).
        """
        import jax

        def fn(p, x):
            return self.serve(p, x, conf_thre=conf_thre, nms_thre=nms_thre,
                              class_agnostic=class_agnostic, max_det=max_det,
                              int8_qtab=int8_qtab,
                              int8_hbm_qtab=int8_hbm_qtab)

        if mesh is None:
            return jax.jit(fn)
        from yolox_tpu.parallel.mesh import (
            batch_sharding,
            image_sharding,
            replicated_sharding,
        )

        return jax.jit(
            fn,
            in_shardings=(replicated_sharding(mesh), image_sharding(mesh)),
            out_shardings=(batch_sharding(mesh), batch_sharding(mesh)),
        )

    def apply_train(self, params: dict, x, collector: Optional[BNCollector],
                    freeze_prefix: Optional[str] = None,
                    fused_bwd: bool = False,
                    lane_fold: bool = True,
                    stem_s2d: bool = False):
        """Train-mode forward (pure): head training outputs + BN updates.

        Used by the training step (`yolox_tpu/core/train_step.py`); loss and
        SimOTA assignment live in `yolox_tpu/models/assign.py`.
        `freeze_prefix` runs BatchNorm under that parameter path in eval
        mode (frozen modules use running stats; reference
        `model_utils.py:148-150`). `stem_s2d` routes the CspDarknet stem
        through the space-to-depth fold (differentiable; train-mode BN
        pools the block slots — config.train_stem_s2d, A/B in
        docs/train_step_performance.md). Ignored when lane_fold folds the
        stem.
        """
        ctx = Ctx(train=True, collector=collector,
                  eval_prefix=freeze_prefix, fused_bwd=fused_bwd,
                  lane_fold=lane_fold, stem_s2d=stem_s2d)
        fpn_outs = self.backbone(params["backbone"], x, ctx, "backbone")
        return self.head.forward_train(params["head"], fpn_outs, ctx, "head")

    def visualize(self, x, targets, save_prefix: str = "assign_vis_"):
        """Draw SimOTA assignment results per image (reference
        `yolox.py:94-96` / `yolo_head.py:576-639`). x: NHWC float batch
        (BGR pixel values as in training); targets: (B, M, 5)."""
        import numpy as np

        from yolox_tpu.models.assign import simota_assign
        from yolox_tpu.utils.visualize import visualize_assign

        head_out = self.apply_train(self.params, jnp.asarray(x), None)
        outputs = np.asarray(head_out["outputs"])
        xs = np.asarray(head_out["x_shifts"])
        ys = np.asarray(head_out["y_shifts"])
        strides = np.asarray(head_out["expanded_strides"])
        coords = np.stack([(xs + 0.5) * strides, (ys + 0.5) * strides], 1)

        for b in range(outputs.shape[0]):
            assign = jax.tree.map(np.asarray, simota_assign(
                jnp.asarray(targets[b], jnp.float32),
                jnp.asarray(outputs[b, :, :4]),
                jnp.asarray(outputs[b, :, 4]),
                jnp.asarray(outputs[b, :, 5:]),
                head_out["x_shifts"], head_out["y_shifts"],
                head_out["expanded_strides"], self.head.num_classes))
            fg = assign["fg_mask"]
            labels = np.asarray(targets[b])
            real = labels[labels.sum(-1) > 0]
            boxes_xyxy = np.stack([
                real[:, 1] - real[:, 3] / 2, real[:, 2] - real[:, 4] / 2,
                real[:, 1] + real[:, 3] / 2, real[:, 2] + real[:, 4] / 2,
            ], 1)
            img = np.asarray(x[b]).astype(np.uint8)
            visualize_assign(img, boxes_xyxy, coords[fg],
                             assign["matched_gt"][fg],
                             f"{save_prefix}{b}.png")

    # ---------------- pretrained loading ----------------

    @classmethod
    def from_pretrained(
        cls,
        pretrained_model_name_or_path: Union[str, os.PathLike],
        config: Optional[YoloxConfig] = None,
        device: Optional[str] = None,  # kept for API parity; JAX manages placement
        dtype: Any = jnp.float32,
    ) -> "YoloxModule":
        path = str(pretrained_model_name_or_path)
        if os.path.isfile(path):
            if config is None:
                raise ValueError(
                    "config must be provided when loading model from a file")
        else:
            config = YoloxConfig.get_named_config(path)
            if config is None:
                raise ValueError(
                    f"Unknown model: {pretrained_model_name_or_path}")
            path = cls._cached_pretrained_weights(path)
        module = cls.from_config(config, dtype=dtype)
        params = load_pth_params(path)
        module.load_params(params)
        return module

    def load_params(self, params: dict, strict: bool = True):
        """Install a converted checkpoint pytree, validating shapes."""
        if strict and self.params is not None:
            ref = jax.tree.map(lambda x: jnp.asarray(x).shape, self.params)
            new = jax.tree.map(lambda x: jnp.asarray(x).shape, params)
            if ref != new:
                from yolox_tpu.models.weights import nested_to_flat

                ref_f, new_f = nested_to_flat(ref), nested_to_flat(new)
                missing = sorted(set(ref_f) - set(new_f))
                unexpected = sorted(set(new_f) - set(ref_f))
                mismatched = sorted(
                    k for k in set(ref_f) & set(new_f) if ref_f[k] != new_f[k]
                )
                raise ValueError(
                    "checkpoint/model mismatch: "
                    f"missing={missing[:8]} unexpected={unexpected[:8]} "
                    f"mismatched={mismatched[:8]}")
        if self.dtype != jnp.float32:
            params = self.cast_params(params, self.dtype)
        self.params = params

    @classmethod
    def _cached_pretrained_weights(cls, model_id: str) -> str:
        weights_dir = HOME / "weights"
        weights_dir.mkdir(exist_ok=True, parents=True)
        file_id = _WEIGHTS_ALIAS.get(model_id, model_id)
        weights_file = weights_dir / f"{file_id}.pth"
        if not weights_file.exists():
            weights_url = _WEIGHTS_URL.format(model_id=file_id)
            try:
                urllib.request.urlretrieve(weights_url, f"{weights_file}.tmp")
            except Exception as e:
                raise RuntimeError(
                    f"Could not download pretrained weights for {model_id!r} "
                    f"from {weights_url} and none cached at {weights_file}. "
                    "In offline environments, place the upstream .pth there "
                    "manually."
                ) from e
            os.rename(f"{weights_file}.tmp", weights_file)
        return str(weights_file)
