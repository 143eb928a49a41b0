"""YoloxConfig — hyperparameter dataclass + named model registry + factory hub.

Re-design of `/root/reference/yolox/config.py`: identical field names and
defaults (so `-D key=value` CLI overrides and user config subclasses carry
over), with the factory methods building the TPU-native stack instead of
torch objects.
"""

from __future__ import annotations

import ast
from dataclasses import dataclass
from typing import Any, Dict, Literal, Optional, Tuple

import numpy as np


@dataclass
class YoloxConfig:
    name: str

    # ---------------- model config ---------------- #
    num_classes: int = 80
    depth: float = 1.00
    width: float = 1.00
    depthwise: bool = False
    act: Literal["silu", "relu", "lrelu"] = "silu"

    seed: Optional[Any] = None
    output_dir: str = "./out"

    # ---------------- dataloader config ---------------- #
    deterministic: bool = False
    data_num_workers: int = 4
    input_size: Tuple[int, int] = (640, 640)  # (height, width)
    # Actual multiscale ranges: [640 - 5 * 32, 640 + 5 * 32]; 0 disables.
    multiscale_range: int = 5
    random_size: Optional[Tuple[int, int]] = None
    data_dir: Optional[str] = None
    train_ann: str = "instances_train2017.json"
    val_ann: str = "instances_val2017.json"
    test_ann: str = "instances_test2017.json"

    # --------------- transform config ----------------- #
    mosaic_prob: float = 1.0
    mixup_prob: float = 1.0
    hsv_prob: float = 1.0
    flip_prob: float = 0.5
    degrees: float = 10.0
    translate: float = 0.1
    mosaic_scale: Tuple[float, float] = (0.1, 2)
    enable_mixup: bool = True
    mixup_scale: Tuple[float, float] = (0.5, 1.5)
    shear: float = 2.0

    # --------------  training config --------------------- #
    warmup_epochs: int = 5
    max_epoch: int = 300
    warmup_lr: int = 0
    min_lr_ratio: float = 0.05
    basic_lr_per_img: float = 0.01 / 64.0
    scheduler: str = "yoloxwarmcos"
    no_aug_epochs: int = 15
    ema: bool = True
    # Freeze every param whose flat key starts with this dotted prefix
    # (e.g. "backbone.backbone" = CSPDarknet). Reference analog:
    # `freeze_module` applied in Exp.get_model (`model_utils.py:129`).
    freeze_prefix: Optional[str] = None
    # Labels-per-image cap for the training transforms (reference:
    # `TrainTransform(max_labels=120)` inside MosaicDetection,
    # `yolox/exp/yolox_base.py:118`).
    max_labels: int = 120
    # SimOTA candidate-compaction slots. Default None = dense-exact
    # assignment over ALL anchors — always identical to the reference's
    # per-image matching, and MEASURED FASTER than every compacted cap on
    # a v5e (yolox-s b64 640px full step: dense 591 img/s vs 550 at 2048
    # / 501 at 4096; tiny 847 vs 754; nano 524 vs 488 — the top_k sort +
    # gathers cost more than the smaller cost matrices save).  Set an int
    # to opt into compaction (caps the (M, N) matching matrices at N
    # slots, e.g. for memory at extreme batch x multiscale sizes);
    # assignment then deviates per-image once the ~27-anchors/gt geometry
    # constraint admits more than N candidates — the trainer warns via
    # the cand_overflow metric when that happens.
    simota_candidates: Optional[int] = None

    weight_decay: float = 5e-4
    momentum: float = 0.9
    print_interval: int = 10
    eval_interval: int = 10
    save_history_ckpt: bool = True
    # "pth" (upstream-compatible torch pickles, default) or "orbax"
    # (zarr-sharded async checkpoints, yolox_tpu/utils/orbax_io.py)
    ckpt_format: str = "pth"
    # rematerialize the forward in the backward pass (jax.checkpoint):
    # activation memory ~O(1 layer) for ~1 extra forward of compute —
    # enables large-batch yolox-l/x training on a single chip
    remat: bool = False
    # lane-dense folding of the small-channel backbone stages in the
    # TRAIN step (yolox_tpu/ops/lane_fold.py): stem/dark2/dark3 run on a
    # width-folded representation so C<128 activations stop paying the
    # TPU's 128-lane padding through HBM (measured 470 -> 547 img/s on
    # the yolox-s b64 step). Exact (same math, summation order aside);
    # parameters and checkpoints are unchanged. Serving/eval always runs
    # plain — folding trades FLOPs for bytes, a loss on the
    # compute-bound serving path.
    lane_fold: bool = True
    # fold depth: smallest power-of-two stem fold reaching this many
    # lanes (yolox_tpu/ops/lane_fold.py:stage_folds). 256 measured best
    # for the bandwidth-bound train step (128: 526 img/s, 256: 547,
    # 512: 320 on yolox-s b64); 128 halves the folded-conv FLOP tax and
    # is the serving-side candidate for light models.
    lane_fold_target: int = 256
    # also run the SERVING backbone on the folded representation.
    # Default False: serving is compute-bound for s/m/l/x and folding
    # trades FLOPs for bytes (measured regression there); the
    # bandwidth-bound light models (nano/tiny) flip this on in their
    # named configs — see docs/serving_performance.md
    serve_lane_fold: bool = False
    # serve the CspDarknet stem through the transpose-free space-to-depth
    # fold (yolox_tpu/ops/stem_s2d.py): same math, MXU-shaped. XLA's
    # 3-channel Focus conv is VPU-lowered at ~0.6% MFU — 65% of batch-1
    # device time; the fold measured 3.6x on the stem+dark2conv1 region
    # (v5e, 640px b1) but its 2.67x structural-zero FLOPs lose at large
    # batch where the folded-Focus stem is already cheap. "auto"
    # (default): enable when the traced batch is <= serve_stem_s2d_max_
    # batch — batch size is static under jit, so this is a per-shape
    # compile-time choice, not a runtime branch. True/False force it.
    # Composes with the int8 modes; silently falls back when illegal
    # (depthwise stem, spatial dims not divisible by 4, lane folding).
    # Measured A/B per model/batch: docs/serving_performance.md.
    serve_stem_s2d: Any = "auto"
    # "auto" cutoff: largest batch the s2d stem serves. Round-5 on-chip
    # A/B at b1: tiny 1.61x (0.523 ms), s 1.92x (0.741), m 1.58x
    # (1.20), l 1.42x (1.580), x 1.17x (2.906) — every fold-eligible
    # model wins; s also wins 1.34x at b8 and 1.12x at b32 but
    # loses 0.91x at b256 (crossover in (32, 256]); x at its published
    # b32 is flat (401 vs 407 img/s). An early m b1 reading of 2.702 ms
    # was a contaminated measurement (host jobs overlapping the chip
    # during the --all sweep) — re-measured idle 3x incl. a fresh
    # compile: 1.187-1.203 ms, and the region study at m's width agrees
    # (894 -> 267 us). docs/serving_performance.md "stem_s2d A/B".
    serve_stem_s2d_max_batch: int = 32
    # run the TRAIN-step stem through the same space-to-depth fold
    # (differentiable gathers; train-mode BN pools the block slots —
    # ops/stem_s2d.py:blocked_batch_norm_train). Mutually exclusive with
    # lane folding at the stem (lane_fold wins when both are on). A/B in
    # docs/train_step_performance.md.
    train_stem_s2d: bool = False
    # fused custom-vjp backward for the Conv->BN->act blocks
    # (yolox_tpu/ops/pallas_conv_bwd.py). Measured on a v5e (yolox-s b64):
    # XLA autodiff of the unfused composite is FASTER (136 ms vs 155 ms
    # stage-1 / 207 ms Pallas) — XLA's backward already runs at the
    # padded-layout HBM roofline, so the hand-restructured passes only
    # add bytes. Kept as an opt-in for future hardware/compilers; see
    # docs/train_step_performance.md ("fused backward: negative result").
    fused_conv_bwd: bool = False
    # run mosaic/affine/MixUp/HSV/flip on the TPU instead of host cv2
    # (yolox_tpu/data/device_augment.py) — for CPU-poor TPU hosts where
    # the input pipeline cannot feed the chips
    device_augment: bool = False
    # pre-compile the training step for every multiscale bucket size in a
    # background thread once real batch shapes are known — with the
    # persistent XLA compilation cache on (the train CLI enables it),
    # this removes the minutes-scale mid-epoch stall the first time each
    # of the 11 sizes is drawn
    warmup_multiscale: bool = False

    # -----------------  testing config ------------------ #
    test_size: Tuple[int, int] = (640, 640)
    test_conf: float = 0.01
    nmsthre: float = 0.65

    dataset: Optional[Any] = None

    @classmethod
    def get_named_config(cls, name: str) -> Optional["YoloxConfig"]:
        factory = _NAMED_CONFIG.get(name.replace("-", "_"))
        return factory() if factory is not None else None

    def validate(self):
        h, w = self.input_size
        assert h % 32 == 0 and w % 32 == 0, "input size must be multiples of 32"

    def resolved_simota_candidates(self) -> Optional[int]:
        """The SimOTA compaction cap: explicit int, or None = dense-exact
        assignment over all anchors (the measured-fastest form on TPU —
        see the ``simota_candidates`` field comment)."""
        if self.simota_candidates is None:
            return None
        return int(self.simota_candidates)

    def update(self, opts: Dict[str, str]):
        """Apply `-D key=value` CLI overrides with type coercion
        (`config.py:129-157`)."""
        for k, v in opts.items():
            if not hasattr(self, k):
                raise AttributeError(
                    f"Unknown model configuration option: {k}")
            src_value = getattr(self, k)
            src_type = type(src_value)

            if isinstance(src_value, (list, tuple)):
                v = v.strip("[]()")
                v = [t.strip() for t in v.split(",")]
                if len(src_value) > 0:
                    src_item_type = type(src_value[0])
                    v = [src_item_type(t) for t in v]
                v = src_type(v)
            elif src_value is not None and src_type != type(v):
                try:
                    v = src_type(v)
                except Exception:
                    v = ast.literal_eval(v)
            elif src_value is None:
                # Optional fields (e.g. simota_candidates): accept numeric /
                # literal overrides, keep plain strings as strings
                try:
                    v = ast.literal_eval(v)
                except (ValueError, SyntaxError):
                    pass
            if k == "seed":
                v = int(v)
            setattr(self, k, v)

    # ----------------- factory hub ----------------- #

    def get_model(self, rng_seed: int = 0):
        """Build a fresh YoloxModule with initialized parameters."""
        from yolox_tpu.models.yolox import YoloxModule

        return YoloxModule.from_config(self, rng_seed=rng_seed)

    def get_dataset(self, cache: bool = False, cache_type: str = "ram"):
        from yolox_tpu.data import CocoDataset, TrainTransform

        return CocoDataset(
            data_dir=self.data_dir,
            json_file=self.train_ann,
            img_size=self.input_size,
            preproc=TrainTransform(
                max_labels=50,
                flip_prob=self.flip_prob,
                hsv_prob=self.hsv_prob,
            ),
            cache=cache,
            cache_type=cache_type,
        )

    def get_data_loader(self, batch_size, is_distributed=False, no_aug=False,
                        cache_img: Optional[str] = None):
        from yolox_tpu.data import (
            DataLoader,
            InfiniteSampler,
            MosaicDetection,
            TrainTransform,
            YoloBatchSampler,
        )
        from yolox_tpu.parallel import process_count, process_index

        if self.dataset is None:
            assert cache_img is None, (
                "cache_img must be None if you didn't create self.dataset "
                "before launch")
            self.dataset = self.get_dataset(cache=False)

        if self.device_augment and not no_aug:
            # raw-tile loader: all augmentation runs on device
            # (yolox_tpu/data/device_augment.py)
            from yolox_tpu.data.device_augment import TileDataset

            dataset = TileDataset(self.dataset,
                                  tile_size=max(self.input_size))
        elif self.device_augment and no_aug:
            # no-aug phase: plain letterbox path, host side (cheap)
            dataset = MosaicDetection(
                dataset=self.dataset, mosaic=False,
                img_size=self.input_size,
                preproc=TrainTransform(
                    max_labels=self.max_labels, flip_prob=self.flip_prob,
                    hsv_prob=self.hsv_prob),
            )
        else:
            dataset = MosaicDetection(
            dataset=self.dataset,
            mosaic=not no_aug,
            img_size=self.input_size,
            preproc=TrainTransform(
                max_labels=self.max_labels,
                flip_prob=self.flip_prob,
                hsv_prob=self.hsv_prob,
            ),
            degrees=self.degrees,
            translate=self.translate,
            mosaic_scale=self.mosaic_scale,
            mixup_scale=self.mixup_scale,
            shear=self.shear,
            enable_mixup=self.enable_mixup,
            mosaic_prob=self.mosaic_prob,
            mixup_prob=self.mixup_prob,
        )

        # One JAX process per host: shard the per-step global batch by host.
        if is_distributed:
            batch_size = batch_size // process_count()

        sampler = InfiniteSampler(
            len(dataset),
            seed=self.seed if self.seed else 0,
            rank=process_index() if is_distributed else 0,
            world_size=process_count() if is_distributed else 1,
        )
        batch_sampler = YoloBatchSampler(
            sampler=sampler,
            batch_size=batch_size,
            mosaic=not no_aug,
        )
        return DataLoader(
            dataset,
            batch_sampler=batch_sampler,
            num_workers=self.data_num_workers,
            deterministic=self.deterministic,
        )

    def random_resize(self, rng: np.random.Generator):
        """Sample a multiscale input size from the 32-aligned bucket set."""
        size_factor = self.input_size[1] * 1.0 / self.input_size[0]
        if self.random_size is None:
            min_size = int(self.input_size[0] / 32) - self.multiscale_range
            max_size = int(self.input_size[0] / 32) + self.multiscale_range
            self.random_size = (min_size, max_size)
        size = int(rng.integers(self.random_size[0], self.random_size[1] + 1))
        return (int(32 * size), 32 * int(size * size_factor))

    def multiscale_sizes(self):
        """The full 32-aligned bucket set `random_resize` draws from."""
        size_factor = self.input_size[1] * 1.0 / self.input_size[0]
        if self.random_size is None:
            min_size = int(self.input_size[0] / 32) - self.multiscale_range
            max_size = int(self.input_size[0] / 32) + self.multiscale_range
        else:
            min_size, max_size = self.random_size
        return [(32 * s, 32 * int(s * size_factor))
                for s in range(int(min_size), int(max_size) + 1)]

    def get_optimizer(self, batch_size):
        from yolox_tpu.core.optimizer import build_optimizer

        lr = self.warmup_lr if self.warmup_epochs > 0 \
            else self.basic_lr_per_img * batch_size
        return build_optimizer(
            lr=lr, momentum=self.momentum, weight_decay=self.weight_decay)

    def get_lr_scheduler(self, lr, iters_per_epoch):
        from yolox_tpu.utils.lr_scheduler import LRScheduler

        return LRScheduler(
            self.scheduler,
            lr,
            iters_per_epoch,
            self.max_epoch,
            warmup_epochs=self.warmup_epochs,
            warmup_lr_start=self.warmup_lr,
            no_aug_epochs=self.no_aug_epochs,
            min_lr_ratio=self.min_lr_ratio,
        )

    def get_eval_dataset(self, **kwargs):
        from yolox_tpu.data import CocoDataset, ValTransform

        testdev = kwargs.get("testdev", False)
        legacy = kwargs.get("legacy", False)
        return CocoDataset(
            data_dir=self.data_dir,
            json_file=self.val_ann if not testdev else self.test_ann,
            name="val2017" if not testdev else "test2017",
            img_size=self.test_size,
            preproc=ValTransform(legacy=legacy),
        )

    def get_eval_loader(self, batch_size, is_distributed=False, **kwargs):
        from yolox_tpu.data import DataLoader, SequentialBatchSampler
        from yolox_tpu.parallel import process_count, process_index

        valdataset = self.get_eval_dataset(**kwargs)
        if is_distributed:
            batch_size = batch_size // process_count()
        batch_sampler = SequentialBatchSampler(
            len(valdataset),
            batch_size=batch_size,
            rank=process_index() if is_distributed else 0,
            world_size=process_count() if is_distributed else 1,
        )
        return DataLoader(
            valdataset,
            batch_sampler=batch_sampler,
            num_workers=self.data_num_workers,
        )

    def get_evaluator(self, batch_size, is_distributed=False, testdev=False,
                      legacy=False):
        from yolox_tpu.evaluators import CocoEvaluator

        return CocoEvaluator(
            dataloader=self.get_eval_loader(
                batch_size, is_distributed, testdev=testdev, legacy=legacy),
            img_size=self.test_size,
            confthre=self.test_conf,
            nmsthre=self.nmsthre,
            num_classes=self.num_classes,
            testdev=testdev,
        )

    def get_trainer(self, args):
        from yolox_tpu.core import Trainer

        return Trainer(self, args)

    def eval(self, model, evaluator, is_distributed=False, half=False,
             return_outputs=False):
        return evaluator.evaluate(
            model, is_distributed, half, return_outputs=return_outputs)


def validate_config(config: YoloxConfig):
    config.validate()


class YoloxS(YoloxConfig):
    def __init__(self):
        super().__init__("yolox_s")
        self.depth = 0.33
        self.width = 0.50


class YoloxM(YoloxConfig):
    def __init__(self):
        super().__init__("yolox_m")
        self.depth = 0.67
        self.width = 0.75


class YoloxL(YoloxConfig):
    def __init__(self):
        super().__init__("yolox_l")
        self.depth = 1.0
        self.width = 1.0


class YoloxX(YoloxConfig):
    def __init__(self):
        super().__init__("yolox_x")
        self.depth = 1.33
        self.width = 1.25


class YoloxTiny(YoloxConfig):
    def __init__(self):
        super().__init__("yolox_tiny")
        self.depth = 0.33
        self.width = 0.375
        self.input_size = (416, 416)
        self.random_size = (10, 20)
        self.mosaic_scale = (0.5, 1.5)
        self.test_size = (416, 416)
        self.enable_mixup = False


class Yolov3(YoloxConfig):
    """Legacy yolov3 variant: Darknet-53 + YoloFpn + decoupled head, lrelu.

    The reference ships the model code (`yolox/models/darknet.py:8-92`,
    `yolox/models/yolo_fpn.py`) and an upstream checkpoint
    (yolox_darknet.pth, `yolox/models/build.py:25`) but no registry entry;
    here it is reachable via from_pretrained("yolov3").
    """

    def __init__(self):
        super().__init__("yolov3")
        self.depth = 1.0
        self.width = 1.0
        self.act = "lrelu"

    def get_model(self, rng_seed: int = 0):
        from yolox_tpu.models.head import YoloxHead
        from yolox_tpu.models.yolo_fpn import YoloFpn
        from yolox_tpu.models.yolox import YoloxModule

        backbone = YoloFpn()
        head = YoloxHead(self.num_classes, self.width,
                         in_channels=(128, 256, 512), act="lrelu")
        module = YoloxModule(backbone, head, config=self)
        module.params = module.init(rng_seed)
        return module


class YoloxNano(YoloxConfig):
    def __init__(self):
        super().__init__("yolox_nano")
        self.depth = 0.33
        self.width = 0.25
        self.depthwise = True
        self.input_size = (416, 416)
        self.random_size = (10, 20)
        self.mosaic_scale = (0.5, 1.5)
        self.test_size = (416, 416)
        self.mosaic_prob = 0.5
        self.enable_mixup = False


# Registered as factories (fresh instance per lookup) so callers mutating a
# config never poison the registry — the reference shares single instances
# (`config.py:466-469`), a latent-bug pattern we deliberately fix.
_NAMED_CONFIG = {
    "yolox_s": YoloxS,
    "yolox_m": YoloxM,
    "yolox_l": YoloxL,
    "yolox_x": YoloxX,
    "yolox_tiny": YoloxTiny,
    "yolox_nano": YoloxNano,
    "yolov3": Yolov3,
}
