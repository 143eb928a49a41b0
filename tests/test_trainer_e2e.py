"""End-to-end trainer test: short training runs on the synthetic COCO set.

Covers the full stack: config factories -> data pipeline -> jitted train
step -> EMA -> eval -> upstream-compatible checkpointing -> resume. Also
round-trips our checkpoint into the reference torch model (the strongest
interop guarantee).
"""

import glob
import os
from argparse import Namespace

import numpy as np
import pytest

from yolox_tpu.config import YoloxConfig

pytestmark = pytest.mark.slow  # minutes-long e2e lane


class TinyConfig(YoloxConfig):
    """User-config-subclass path (module:ClassName surface)."""

    def __init__(self):
        super().__init__("tiny_e2e")
        self.num_classes = 3
        self.depth = 0.33
        self.width = 0.125
        self.input_size = (64, 64)
        self.test_size = (64, 64)
        self.max_epoch = 2
        self.warmup_epochs = 1
        self.no_aug_epochs = 1
        self.eval_interval = 10  # skip in-training eval by default
        self.print_interval = 2
        self.data_num_workers = 0
        self.save_history_ckpt = False
        self.multiscale_range = 0

    def get_eval_dataset(self, **kwargs):
        from yolox_tpu.data import CocoDataset, ValTransform

        return CocoDataset(
            data_dir=self.data_dir, json_file=self.train_ann,
            name="train2017", img_size=self.test_size,
            preproc=ValTransform())


def _args(out_dir, **kw):
    base = dict(batch_size=4, fp16=False, cache=None, logger="tensorboard",
                ckpt=None, resume=False, start_epoch=None, name="run")
    base.update(kw)
    return Namespace(**base)


@pytest.fixture()
def tiny_cfg(coco_dir, tmp_path):
    cfg = TinyConfig()
    cfg.data_dir = coco_dir
    cfg.output_dir = str(tmp_path / "out")
    return cfg


def test_short_training_run_and_checkpoint(tiny_cfg, tmp_path):
    trainer = tiny_cfg.get_trainer(_args(tiny_cfg.output_dir))
    trainer.train()

    run_dir = os.path.join(tiny_cfg.output_dir, "run")
    ckpts = sorted(os.path.basename(p)
                   for p in glob.glob(os.path.join(run_dir, "*_ckpt.pth")))
    assert "latest_ckpt.pth" in ckpts
    assert "last_mosaic_epoch_ckpt.pth" in ckpts  # epoch switch fired
    # losses were finite
    assert np.isfinite(trainer.meter["total_loss"].latest)
    # LR followed the schedule
    assert trainer.meter["lr"].latest > 0


def test_checkpoint_roundtrips_into_reference_torch(tiny_cfg):
    from tests._reference_oracle import load_reference, reference_available

    if not reference_available():
        pytest.skip("/root/reference not available")

    trainer = tiny_cfg.get_trainer(_args(tiny_cfg.output_dir))
    trainer.train()
    ckpt_path = os.path.join(tiny_cfg.output_dir, "run", "latest_ckpt.pth")

    load_reference()
    import torch
    from yolox.models import YoloPafpn, YoloxHead, YoloxModule

    in_channels = [256, 512, 1024]
    tmodel = YoloxModule(
        YoloPafpn(tiny_cfg.depth, tiny_cfg.width, in_channels=in_channels),
        YoloxHead(tiny_cfg.num_classes, tiny_cfg.width,
                  in_channels=in_channels))
    weights = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    tmodel.load_state_dict(weights["model"])  # strict=True: full parity

    # and back into ours
    from yolox_tpu.models.yolox import YoloxModule as OurModule
    from yolox_tpu.utils.checkpoint import load_checkpoint

    module = OurModule.from_config(tiny_cfg)
    module.load_params(load_checkpoint(ckpt_path)["model"])


def test_resume(tiny_cfg):
    trainer = tiny_cfg.get_trainer(_args(tiny_cfg.output_dir))
    trainer.train()

    cfg2 = TinyConfig()
    cfg2.data_dir = tiny_cfg.data_dir
    cfg2.output_dir = tiny_cfg.output_dir
    cfg2.max_epoch = 3
    trainer2 = cfg2.get_trainer(_args(cfg2.output_dir, resume=True))
    trainer2.train()
    assert trainer2.start_epoch == 2
    assert trainer2.epoch == 2  # ran exactly the one remaining epoch


def test_training_with_eval(tiny_cfg):
    tiny_cfg.eval_interval = 1
    trainer = tiny_cfg.get_trainer(_args(tiny_cfg.output_dir))
    trainer.train()
    # eval ran and produced the last_epoch checkpoint; best_ckpt only
    # appears when AP strictly improves (reference `trainer.py:360`), which
    # a 2-epoch run on 12 images may never achieve (AP stays 0.0)
    run_dir = os.path.join(tiny_cfg.output_dir, "run")
    assert os.path.exists(os.path.join(run_dir, "last_epoch_ckpt.pth"))
    assert trainer.best_ap >= 0.0


def test_training_with_frozen_backbone(tiny_cfg):
    """freeze_prefix through the FULL trainer surface (config -> train)."""
    from yolox_tpu.models.weights import nested_to_flat

    tiny_cfg.freeze_prefix = "backbone.backbone"
    trainer = tiny_cfg.get_trainer(_args(tiny_cfg.output_dir))
    trainer.before_train()
    before = {k: np.asarray(v).copy() for k, v in nested_to_flat(
        trainer.train_state["params"]).items()}
    trainer.train_in_epoch()
    after = nested_to_flat(trainer.train_state["params"])
    changed = {k for k in before
               if not np.array_equal(before[k], np.asarray(after[k]))}
    assert changed, "training should have updated something"
    assert all(not k.startswith("backbone.backbone") for k in changed)
    trainer.after_train()


def test_profiler_trace_capture(tiny_cfg, monkeypatch, tmp_path):
    """YOLOX_PROFILE_DIR captures a jax.profiler trace of the train loop."""
    prof_dir = str(tmp_path / "prof")
    monkeypatch.setenv("YOLOX_PROFILE_DIR", prof_dir)
    monkeypatch.setenv("YOLOX_PROFILE_START", "1")
    monkeypatch.setenv("YOLOX_PROFILE_ITERS", "1")
    trainer = tiny_cfg.get_trainer(_args(tiny_cfg.output_dir))
    trainer.before_train()
    trainer.train_in_iter()
    trainer.after_train()
    traces = glob.glob(os.path.join(prof_dir, "**", "*.xplane.pb"),
                       recursive=True)
    assert traces, f"no trace written under {prof_dir}"


def test_orbax_checkpoint_and_resume(tiny_cfg):
    """-D ckpt_format=orbax: async zarr checkpoints + resume round-trip."""
    import jax

    from yolox_tpu.models.weights import nested_to_flat
    from yolox_tpu.utils.orbax_io import best_orbax_step, latest_orbax_step

    tiny_cfg.ckpt_format = "orbax"
    trainer = tiny_cfg.get_trainer(_args(tiny_cfg.output_dir))
    trainer.train()
    odir = os.path.join(trainer.file_name, "orbax")
    assert latest_orbax_step(odir) == tiny_cfg.max_epoch
    # best-model identity must be recorded even when the best flag arrives
    # AFTER the step was already saved as 'latest' within the same epoch
    # (random-weight runs score AP 0.0 so the trainer never marks best;
    # drive the flag directly through the same save path)
    assert best_orbax_step(odir) is None
    trainer.save_ckpt("last_epoch", update_best_ckpt=True, ap=0.5)
    assert best_orbax_step(odir) == tiny_cfg.max_epoch
    final = {k: np.asarray(v) for k, v in nested_to_flat(
        jax.tree.map(np.asarray, trainer.train_state["params"])).items()}

    cfg2 = TinyConfig()
    cfg2.data_dir = tiny_cfg.data_dir
    cfg2.output_dir = tiny_cfg.output_dir
    cfg2.ckpt_format = "orbax"
    trainer2 = cfg2.get_trainer(_args(cfg2.output_dir, resume=True))
    trainer2.before_train()
    assert trainer2.start_epoch == tiny_cfg.max_epoch
    resumed = nested_to_flat(trainer2.train_state["params"])
    for k, v in final.items():
        np.testing.assert_array_equal(v, np.asarray(resumed[k]), err_msg=k)
    # momentum restored too (full state, not just weights)
    assert any(
        np.abs(np.asarray(m)).sum() > 0
        for m in jax.tree.leaves(trainer2.train_state["momentum"]))
    trainer2.after_train()


def test_training_bitwise_deterministic(tiny_cfg, tmp_path):
    """Two identical runs produce bitwise-identical parameters — the
    reference's checkpoint-SHA test (`tests/test_training.py:39-51`) made
    strict: no 'set of 10 known hashes' escape hatch."""
    from yolox_tpu.models.weights import nested_to_flat

    def run(out_dir):
        cfg = TinyConfig()
        cfg.data_dir = tiny_cfg.data_dir
        cfg.output_dir = str(out_dir)
        cfg.seed = 42
        cfg.deterministic = True
        cfg.max_epoch = 1
        trainer = cfg.get_trainer(_args(cfg.output_dir))
        trainer.train()
        return {k: np.asarray(v) for k, v in nested_to_flat(
            trainer.train_state["params"]).items()}

    p1 = run(tmp_path / "r1")
    p2 = run(tmp_path / "r2")
    assert p1.keys() == p2.keys()
    for k in p1:
        np.testing.assert_array_equal(p1[k], p2[k], err_msg=k)


def test_training_with_device_augment(tiny_cfg):
    """-D device_augment=True: mosaic/affine/mixup/HSV/flip run on device;
    the host loader only serves raw tiles. Covers the no-aug switch back to
    the host letterbox loader (max_epoch=2, no_aug_epochs=1)."""
    tiny_cfg.device_augment = True
    trainer = tiny_cfg.get_trainer(_args(tiny_cfg.output_dir))
    trainer.train()
    assert np.isfinite(float(np.asarray(
        trainer.meter["total_loss"].latest)))
    # epoch 2 is the no-aug phase: device augmentation must be off
    assert trainer._device_augment is False
    assert trainer.use_l1 is True


@pytest.mark.skipif(not os.environ.get("YOLOX_RUN_AB"),
                    reason="outcome-level augment A/B trains 2x200 steps "
                           "(~20 min/arm on a 1-core CPU host; minutes on "
                           "TPU) — set YOLOX_RUN_AB=1. Measured results "
                           "recorded in docs/training.md.")
def test_device_augment_training_outcome_ab():
    """Training-OUTCOME equivalence of device vs host augmentation: train
    the same learnable task through the full Trainer with each pipeline;
    both must converge (loss down from ~12) to confident, correctly
    classified, correctly centered detections on clean images, with
    run-average losses in a mutual band. Complements the
    distribution-level equivalence test (test_augment_equivalence.py).
    Semantics owner: reference mosaicdetection.py:76-158. Calibrated
    datum (2026-08-19, 50 epochs): host loss 9.00 / dev 9.05, 2 of 6
    images confidently detected by each arm."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "augment_ab",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "augment_ab.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    host, dev = mod.main(["--which", "both"])

    for arm in (host, dev):
        assert arm["run_avg_loss"] < 10.5, arm   # converged (init ~12.5)
        assert arm["confident_correct"] >= 1, arm
    rel = (abs(host["run_avg_loss"] - dev["run_avg_loss"])
           / host["run_avg_loss"])
    assert rel < 0.2, (host["run_avg_loss"], dev["run_avg_loss"])


def test_multiscale_resize_scales_images_and_targets(tiny_cfg):
    """On-device multiscale: batch resized to the drawn bucket size and
    (cls, cx, cy, w, h) targets scaled with it (reference
    `config.py:296-305`)."""
    trainer = tiny_cfg.get_trainer(_args(tiny_cfg.output_dir))
    trainer.before_train()
    trainer._current_size = (32, 32)  # half of the 64px input
    x = np.zeros((2, 64, 64, 3), np.float32)
    x[:, :32, :32] = 200.0
    t = np.zeros((2, 120, 5), np.float32)
    t[:, 0] = [1, 32, 16, 20, 10]   # cls, cx, cy, w, h in 64px space
    xr, tr = trainer._multiscale_resize(x, t)
    xr, tr = np.asarray(xr), np.asarray(tr)
    assert xr.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(
        tr[:, 0], np.tile([1, 16, 8, 10, 5], (2, 1)), rtol=1e-5)
    # content scaled into the top-left quadrant
    assert xr[0, 8, 8].mean() > 150 and xr[0, 24, 24].mean() < 50
    trainer.after_train()


def test_multiscale_bucket_set(tiny_cfg):
    """random_resize draws only 32-aligned sizes within +-range buckets."""
    cfg = tiny_cfg
    cfg.input_size = (640, 640)
    cfg.multiscale_range = 5
    cfg.random_size = None
    rng = np.random.default_rng(0)
    sizes = {cfg.random_resize(rng) for _ in range(200)}
    assert all(h % 32 == 0 and w % 32 == 0 for h, w in sizes)
    assert min(h for h, _ in sizes) == 480 and max(h for h, _ in sizes) == 800
    assert len(sizes) == 11


def test_multiscale_warmup_precompiles_bucket_sizes(tiny_cfg):
    """config.warmup_multiscale: after the first iteration a background
    thread AOT-compiles the step for every other bucket size (and both
    L1 phases), priming the persistent XLA compilation cache."""
    tiny_cfg.multiscale_range = 1          # buckets: 32, 64, 96
    tiny_cfg.warmup_multiscale = True
    trainer = tiny_cfg.get_trainer(_args(tiny_cfg.output_dir))
    # after_train signals the daemon to stop after its current compile
    # (training is over; further compiles only serve the persistent
    # cache) — disable that for the test so the full bucket enumeration
    # can be asserted even though this run ends in seconds.
    trainer._stop_multiscale_warmup = lambda *a, **k: None
    trainer.train()
    assert trainer._warmup_thread is not None
    trainer._warmup_thread.join(timeout=300)
    assert not trainer._warmup_thread.is_alive()
    # 2 non-default sizes x 2 steps (plain + L1)
    assert trainer.warmup_compiled == 4


def test_multiscale_sizes_enumeration():
    cfg = YoloxConfig.get_named_config("yolox_s")
    sizes = cfg.multiscale_sizes()
    assert (640, 640) in sizes
    assert len(sizes) == 11
    assert all(h % 32 == 0 and w % 32 == 0 for h, w in sizes)
    assert min(s[0] for s in sizes) == 640 - 5 * 32
    assert max(s[0] for s in sizes) == 640 + 5 * 32
