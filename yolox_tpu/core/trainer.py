"""Trainer — re-design of `/root/reference/yolox/core/trainer.py`.

Same lifecycle (`before/after_{train,epoch,iter}` around the epoch/iter
loops) and schedule semantics (mosaic close + L1 enable at
max_epoch - no_aug_epochs, per-iter LR, EMA, periodic eval + best-ckpt
tracking, multiscale every 10 iters), mapped onto the TPU execution model:

  - the whole optimization step is ONE jitted program
    (`yolox_tpu/core/train_step.py`) — no GradScaler (bf16 needs no loss
    scaling), no DDP wrapper (data parallelism is a mesh axis),
  - multiscale resize runs on device (jax.image bilinear, bucketed sizes
    -> a bounded set of compiled graphs, SURVEY.md §5),
  - multiscale size selection is derived from a seeded RNG shared by all
    hosts instead of a rank-0 broadcast (collective-free, deterministic),
  - checkpoints are upstream-compatible `.pth` files.
"""

from __future__ import annotations

import datetime
import os
import signal
import threading
import time

import numpy as np

from yolox_tpu.config import YoloxConfig
from yolox_tpu.utils.checkpoint import (
    load_checkpoint,
    load_ckpt,
    save_checkpoint,
)
from yolox_tpu.utils.logger import logger, setup_logger
from yolox_tpu.utils.metric import MeterBuffer, device_mem_usage, mem_usage
from yolox_tpu.utils.model_utils import get_model_info


class PreemptionExit(Exception):
    """Raised at an iteration boundary after a preemption notice; the
    resume checkpoint has already been written. `Trainer.train` turns it
    into a clean (rc 0) exit so the scheduler sees an orderly shutdown."""


class Trainer:
    def __init__(self, config: YoloxConfig, args):
        import jax

        self.exp = config
        self.args = args

        self.max_epoch = config.max_epoch
        self.use_bf16 = bool(getattr(args, "fp16", False))
        self.is_distributed = (
            jax.process_count() > 1 or jax.device_count() > 1)
        self.rank = jax.process_index()
        self.use_model_ema = config.ema
        self.save_history_ckpt = config.save_history_ckpt

        self.input_size = config.input_size
        self.best_ap = 0.0

        self.meter = MeterBuffer(window_size=config.print_interval)
        self.file_name = os.path.join(
            config.output_dir, getattr(args, "name", config.name)
            or config.name)
        if self.rank == 0:
            os.makedirs(self.file_name, exist_ok=True)
        # capture_std: raw prints (third-party chatter) become log records
        # in train_log.txt, as in the reference (`logger.py:32-78`);
        # after_train restores the real streams
        setup_logger(self.file_name, rank=self.rank,
                     filename="train_log.txt", mode="a", capture_std=True)

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def train(self):
        self.before_train()
        try:
            self.train_in_epoch()
        except PreemptionExit:
            logger.info("preemption: resume checkpoint written, exiting "
                        "cleanly (restart with --resume)")
        except Exception:
            logger.exception("Exception in training")
            raise
        finally:
            self.after_train()

    def train_in_epoch(self):
        for self.epoch in range(self.start_epoch, self.max_epoch):
            self.before_epoch()
            self.train_in_iter()
            self.after_epoch()

    def train_in_iter(self):
        for self.iter in range(self.max_iter):
            self.before_iter()
            self.train_one_iter()
            self.after_iter()
            self._maybe_handle_preemption()

    # ---------------- preemption (SURVEY §5 failure recovery) ----------
    #
    # TPU pods are preemptible: the scheduler sends SIGTERM, then kills.
    # The reference trainer has no preemption story (it dies wherever it
    # stands); here the notice is turned into a resume checkpoint + clean
    # exit at the next iteration boundary. Multi-host runs coordinate the
    # exit step through the jax.distributed coordination service (which
    # owns the SIGTERM watcher once `jax.distributed.initialize` ran), so
    # every host checkpoints at the SAME step and no collective is left
    # half-entered. Single-host runs use a plain signal handler.

    def _install_preemption_handler(self):
        import jax

        self._sigterm = threading.Event()
        self._prev_sigterm = None
        if (jax.process_count() == 1
                and threading.current_thread() is threading.main_thread()):
            self._prev_sigterm = signal.signal(
                signal.SIGTERM, lambda *_: self._sigterm.set())

    def _restore_preemption_handler(self):
        if getattr(self, "_prev_sigterm", None) is not None:
            signal.signal(signal.SIGTERM, self._prev_sigterm)
            self._prev_sigterm = None

    def _maybe_handle_preemption(self):
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            # cross-host protocol: on any host's SIGTERM the coordination
            # service computes a common safe step; True means THIS step is
            # it and every host is saving now
            preempted = multihost_utils.reached_preemption_sync_point(
                self.progress_in_iter)
        else:
            preempted = self._sigterm.is_set()
        if not preempted:
            return
        logger.info(
            f"preemption notice at epoch {self.epoch + 1} iter "
            f"{self.iter + 1}: checkpointing with the interrupted epoch "
            f"marked for redo")
        # the interrupted epoch is REDONE on resume (start_epoch stays at
        # the current epoch): some data is seen twice, none is skipped
        self.save_ckpt(ckpt_name="latest", start_epoch=self.epoch)
        raise PreemptionExit

    # ---------------- profiling ----------------
    #
    # TPU-native analog of the reference's (absent) profiler: set
    # YOLOX_PROFILE_DIR to capture a jax.profiler device trace of iters
    # [YOLOX_PROFILE_START, +YOLOX_PROFILE_ITERS) on rank 0, viewable in
    # TensorBoard / Perfetto (SURVEY.md §5 tracing).

    def _maybe_profile(self):
        profile_dir = os.environ.get("YOLOX_PROFILE_DIR")
        if not profile_dir or self.rank != 0:
            return
        import jax

        start = int(os.environ.get("YOLOX_PROFILE_START", "10"))
        n = int(os.environ.get("YOLOX_PROFILE_ITERS", "10"))
        it = self.progress_in_iter
        if it == start:
            logger.info(f"profiler: tracing iters [{start}, {start + n}) "
                        f"to {profile_dir}")
            jax.profiler.start_trace(profile_dir)
            self._profiling = True
        elif getattr(self, "_profiling", False) and it >= start + n:
            jax.profiler.stop_trace()
            self._profiling = False
            logger.info("profiler: trace written")

    def train_one_iter(self):
        import jax.numpy as jnp

        iter_start_time = time.time()
        batch = self.prefetcher.next()
        if batch is None:  # infinite sampler never ends, but be safe
            return
        inps, targets, infos, _ = batch
        data_end_time = time.time()

        lr = self.lr_scheduler.update_lr(self.progress_in_iter + 1)
        if self._device_augment and self._step_aug is not None:
            # augment + multiscale resize + step as one compiled program
            import jax

            hw = np.stack([np.asarray(i) for i in infos]).astype(np.float32)
            if self._batch_sharding is not None:
                from yolox_tpu.parallel.mesh import put_process_local

                hw = put_process_local(hw, self._batch_sharding)
            key = jax.random.fold_in(self._aug_key, self.progress_in_iter)
            self.train_state, outputs = self._call_step(
                self._step_aug,
                self.train_state, inps, hw, targets.astype(jnp.float32),
                key, jnp.float32(lr), tuple(self.input_size),
                tuple(self._current_size))
        else:
            inps, targets = self._multiscale_resize(inps, targets)
            step = self._step_l1 if self.use_l1 else self._step
            self.train_state, outputs = self._call_step(
                step, self.train_state, inps, targets, jnp.float32(lr))
        self._maybe_warmup_multiscale(inps, targets)

        iter_end_time = time.time()
        self.meter.update(
            iter_time=iter_end_time - iter_start_time,
            data_time=data_end_time - iter_start_time,
            lr=lr,
            **outputs,
        )
        self._check_finite_loss()

    def _check_finite_loss(self):
        """Failure detection (SURVEY §5): fail FAST on a non-finite loss.
        The loss scalars are already on host (the meter fetches them every
        iteration), so this is a free float compare. The reference has no
        guard — a NaN silently poisons the weights and every later
        checkpoint; here training aborts with the loss breakdown while
        `latest_ckpt.pth` still holds the last finite-loss epoch."""
        total = self.meter["total_loss"].latest
        if total is None or np.isfinite(total):
            return
        breakdown = ", ".join(
            f"{k}: {v.latest}" for k, v in
            self.meter.get_filtered_meter("loss").items())
        raise FloatingPointError(
            f"non-finite training loss at epoch {self.epoch + 1} iter "
            f"{self.iter + 1} ({breakdown}, lr "
            f"{self.meter['lr'].latest:.3e}). Training aborted before the "
            f"state could be checkpointed; resume from the last epoch "
            f"checkpoint with --resume. Typical causes: learning rate too "
            f"high for the batch size, corrupt/degenerate labels.")

    def _call_step(self, step_fn, *args):
        """Invoke a jitted step; under multi-process, rate-match the ranks
        through the FIRST compile. Concurrent per-rank compiles of a big
        SPMD program can skew rank arrival at the program's first
        collective beyond the CPU transport's fixed ~30 s rendezvous
        window (observed with gloo on contended hosts). AOT-compile first
        (populating the persistent XLA cache `cli/train.py` configures),
        barrier on the coordination service (no such window), THEN run —
        the run's recompile is a cache deserialization, so ranks enter the
        collective within seconds of each other. TPU pods compile on
        many-core hosts where the skew is small, but the barrier is cheap
        and kept unconditionally."""
        if getattr(self, "_first_step_pending", False):
            import jax

            self._first_step_pending = False
            if jax.process_count() > 1:
                logger.info("multi-process: AOT-compiling the first step "
                            "program, then syncing ranks")
                step_fn.lower(*args).compile()
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("yolox-tpu:first-step")
        return step_fn(*args)

    def _apply_device_augment(self, tiles, labels, infos):
        """Run the on-device augmentation pipeline on a raw-tile batch
        (config.device_augment; yolox_tpu/data/device_augment.py)."""
        import jax
        import jax.numpy as jnp

        from yolox_tpu.data.device_augment import device_augment_batch

        hw = np.stack([np.asarray(i) for i in infos]).astype(np.float32)
        if self._batch_sharding is not None:
            from yolox_tpu.parallel.mesh import put_process_local

            hw = put_process_local(hw, self._batch_sharding)
        key = jax.random.fold_in(self._aug_key, self.progress_in_iter)
        cfg = self.exp
        return device_augment_batch(
            tiles, hw, labels.astype(jnp.float32), key,
            out_size=tuple(self.input_size), max_labels=120,
            degrees=float(cfg.degrees), translate=float(cfg.translate),
            scales=tuple(cfg.mosaic_scale),
            mixup_scale=tuple(cfg.mixup_scale), shear=float(cfg.shear),
            enable_mixup=bool(cfg.enable_mixup),
            flip_prob=float(cfg.flip_prob), hsv_prob=float(cfg.hsv_prob),
            mosaic_prob=float(cfg.mosaic_prob),
            mixup_prob=float(cfg.mixup_prob))

    def before_train(self):
        import jax
        import jax.numpy as jnp

        from yolox_tpu.core.train_step import (
            init_train_state,
            make_train_step,
        )
        from yolox_tpu.data import DevicePrefetcher
        from yolox_tpu.parallel.mesh import (
            batch_sharding,
            data_parallel_mesh,
            replicate,
        )

        logger.info(f"args: {vars(self.args)}")
        logger.info(f"config: {self.exp.name}")

        self.module = self.exp.get_model(
            rng_seed=self.exp.seed if self.exp.seed else 0)
        logger.info("Model Summary: "
                    + get_model_info(self.module, self.exp.test_size))

        params, start_epoch_state = self.resume_train(self.module.params)
        self.module.params = params
        self.no_aug = (self.start_epoch
                       >= self.max_epoch - self.exp.no_aug_epochs)
        self.use_l1 = self.no_aug

        self.train_loader = self.exp.get_data_loader(
            batch_size=self.args.batch_size,
            is_distributed=jax.process_count() > 1,
            no_aug=self.no_aug,
            cache_img=getattr(self.args, "cache", None),
        )
        self._device_augment = (
            bool(getattr(self.exp, "device_augment", False))
            and not self.no_aug)
        self._aug_key = jax.random.PRNGKey((self.exp.seed or 0) + 777)
        self.max_iter = len(self.train_loader.dataset) // \
            self.args.batch_size
        self.lr_scheduler = self.exp.get_lr_scheduler(
            self.exp.basic_lr_per_img * self.args.batch_size, self.max_iter)

        nproc = jax.process_count()
        per_host_batch = self.args.batch_size // max(nproc, 1)
        n_local = jax.local_device_count()
        if nproc > 1:
            # multi-process (one process per host): the mesh MUST span all
            # global devices — a subset mesh leaves some processes holding
            # arrays on non-addressable devices. Per-host device counts
            # are uniform on TPU pods, so no trimming; the per-host batch
            # has to divide over the local devices.
            if getattr(self.args, "devices", None):
                raise ValueError(
                    "--devices cannot subset the mesh under multi-process "
                    "training; every process's local devices participate")
            if per_host_batch % n_local != 0:
                raise ValueError(
                    f"per-host batch {per_host_batch} "
                    f"(= batch_size {self.args.batch_size} / {nproc} "
                    f"processes) must be divisible by the "
                    f"{n_local} local devices")
            self.mesh = data_parallel_mesh()  # ALL global devices
            logger.info(
                f"data-parallel over {len(jax.devices())} global device(s) "
                f"across {nproc} processes")
        else:
            if getattr(self.args, "devices", None):
                n_local = min(n_local, self.args.devices)
            # the mesh size must divide the per-host batch
            while n_local > 1 and per_host_batch % n_local != 0:
                n_local -= 1
            self.mesh = data_parallel_mesh(n_local) if n_local > 1 else None
            logger.info(f"data-parallel over {n_local} local device(s)")
        compute_dtype = jnp.bfloat16 if self.use_bf16 else jnp.float32
        common = dict(
            momentum=self.exp.momentum,
            weight_decay=self.exp.weight_decay,
            use_ema=self.use_model_ema,
            mesh=self.mesh,
            compute_dtype=compute_dtype,
            freeze_prefix=getattr(self.exp, "freeze_prefix", None),
            remat=getattr(self.exp, "remat", False),
            num_candidates=(
                self.exp.resolved_simota_candidates()
                if hasattr(self.exp, "resolved_simota_candidates")
                else getattr(self.exp, "simota_candidates", None)),
            fused_bwd=getattr(self.exp, "fused_conv_bwd", False),
            stem_s2d=getattr(self.exp, "train_stem_s2d", False),
        )
        self._step = make_train_step(
            self.module, self.exp.num_classes, use_l1=False, **common)
        self._step_l1 = make_train_step(
            self.module, self.exp.num_classes, use_l1=True, **common)
        self._step_aug = None
        if self._device_augment:
            # augmentation + step fused into ONE program (see
            # make_augmented_train_step: removes the inter-program
            # boundary and the f32 image round-trip through HBM)
            from yolox_tpu.core.train_step import make_augmented_train_step

            cfg = self.exp
            self._step_aug = make_augmented_train_step(
                self.module, self.exp.num_classes,
                augment_kwargs=dict(
                    max_labels=120,
                    degrees=float(cfg.degrees),
                    translate=float(cfg.translate),
                    scales=tuple(cfg.mosaic_scale),
                    mixup_scale=tuple(cfg.mixup_scale),
                    shear=float(cfg.shear),
                    enable_mixup=bool(cfg.enable_mixup),
                    flip_prob=float(cfg.flip_prob),
                    hsv_prob=float(cfg.hsv_prob),
                    mosaic_prob=float(cfg.mosaic_prob),
                    mixup_prob=float(cfg.mixup_prob)),
                use_l1=False, **common)

        state = init_train_state(self.module.params,
                                 use_ema=self.use_model_ema)
        if start_epoch_state is not None:
            state.update(start_epoch_state)
        if self.use_model_ema:
            state["ema_updates"] = jnp.asarray(
                self.max_iter * self.start_epoch, jnp.int32)
        self.train_state = (replicate(self.mesh, state)
                            if self.mesh is not None else state)

        self._batch_sharding = (batch_sharding(self.mesh)
                                if self.mesh is not None else None)
        self.prefetcher = DevicePrefetcher(
            self.train_loader, sharding=self._batch_sharding)
        self._resize_fns = {}
        self._multiscale_rng = np.random.default_rng(
            (self.exp.seed or 0) + 12345)
        self._current_size = self.input_size

        self.evaluator = self.exp.get_evaluator(
            batch_size=self.args.batch_size,
            is_distributed=jax.process_count() > 1)

        self.tblogger = None
        logger_kind = getattr(self.args, "logger", "tensorboard")
        if self.rank == 0 and logger_kind == "tensorboard":
            try:
                from tensorboardX import SummaryWriter

                self.tblogger = SummaryWriter(
                    os.path.join(self.file_name, "tensorboard"))
            except Exception:
                logger.warning("tensorboardX unavailable; scalar logging "
                               "to console only")
        elif self.rank == 0 and logger_kind == "mlflow":
            from yolox_tpu.utils.mlflow_logger import MlflowLogger

            self.mlflow_logger = MlflowLogger()
            self.mlflow_logger.setup(args=self.args, exp=self.exp)
        elif self.rank == 0 and logger_kind == "wandb":
            from yolox_tpu.utils.wandb_logger import WandbLogger

            self.wandb_logger = WandbLogger()
            self.wandb_logger.setup(args=self.args, exp=self.exp)

        self.epoch = self.start_epoch  # valid even before the epoch loop
        self._first_step_pending = jax.process_count() > 1
        self._install_preemption_handler()
        logger.info("Training start...")

    def after_train(self):
        from yolox_tpu.utils.logger import restore_sys_output

        self._restore_preemption_handler()
        self._stop_multiscale_warmup()
        restore_sys_output()
        logger.info("Training of experiment is done and the best AP is "
                    f"{self.best_ap * 100:.2f}")
        if getattr(self, "_profiling", False):
            import jax

            jax.profiler.stop_trace()
            self._profiling = False
        if getattr(self.exp, "ckpt_format", "pth") == "orbax":
            from yolox_tpu.utils.orbax_io import wait_orbax

            wait_orbax(os.path.join(self.file_name, "orbax"))
        if self.tblogger is not None:
            self.tblogger.close()
        if getattr(self, "mlflow_logger", None):
            self.mlflow_logger.on_train_end(
                self.args, file_name=self.file_name,
                metadata={"best_ap": round(float(self.best_ap), 5)})
        if getattr(self, "wandb_logger", None):
            self.wandb_logger.finish()
        if getattr(self, "train_loader", None) is not None:
            self.train_loader.close()

    def before_epoch(self):
        logger.info(f"---> start train epoch{self.epoch + 1}")
        if (self.epoch + 1 == self.max_epoch - self.exp.no_aug_epochs
                or self.no_aug):
            logger.info("--->No mosaic aug now!")
            if self._device_augment:
                # switch from the raw-tile device pipeline to the plain
                # host letterbox loader for the no-aug phase
                import jax

                self._device_augment = False
                self.train_loader.close()
                self.train_loader = self.exp.get_data_loader(
                    batch_size=self.args.batch_size,
                    is_distributed=jax.process_count() > 1,
                    no_aug=True,
                    cache_img=getattr(self.args, "cache", None),
                )
            else:
                self.train_loader.close_mosaic()
            self.prefetcher = None
            from yolox_tpu.data import DevicePrefetcher

            self.prefetcher = DevicePrefetcher(
                self.train_loader, sharding=self._batch_sharding)
            logger.info("--->Add additional L1 loss now!")
            self.use_l1 = True
            self.exp.eval_interval = 1
            if not self.no_aug:
                self.save_ckpt(ckpt_name="last_mosaic_epoch")
                self.no_aug = True

    def after_epoch(self):
        self.save_ckpt(ckpt_name="latest")
        if (self.epoch + 1) % self.exp.eval_interval == 0:
            # BN stats are already replica-synced every step (train_step
            # pmeans them) — no allreduce_norm pass needed before eval.
            self.evaluate_and_save_model()

    def before_iter(self):
        self._maybe_profile()

    def after_iter(self):
        if (self.iter + 1) % self.exp.print_interval == 0:
            left_iters = (self.max_iter * self.max_epoch
                          - (self.progress_in_iter + 1))
            eta_seconds = self.meter["iter_time"].global_avg * left_iters
            eta_str = f"ETA: {datetime.timedelta(seconds=int(eta_seconds))}"
            progress_str = (f"epoch: {self.epoch + 1}/{self.max_epoch}, "
                            f"iter: {self.iter + 1}/{self.max_iter}")
            loss_meter = self.meter.get_filtered_meter("loss")
            loss_str = ", ".join(
                [f"{k}: {v.latest:.1f}" for k, v in loss_meter.items()])
            time_meter = self.meter.get_filtered_meter("time")
            time_str = ", ".join(
                [f"{k}: {v.avg:.3f}s" for k, v in time_meter.items()])
            mem_str = (f"dev mem: {device_mem_usage():.0f}Mb, "
                       f"mem: {mem_usage() / 1024:.1f}Gb")

            logger.info(
                f"{progress_str}, {mem_str}, {time_str}, {loss_str}, "
                f"lr: {self.meter['lr'].latest:.3e}, "
                f"size: {self._current_size[0]:d}, {eta_str}")

            overflow = self.meter.get("cand_overflow")
            if overflow is not None and overflow.avg and overflow.avg > 0:
                # compaction is exact only while candidates <= the cap;
                # past it, assignment silently deviates from the reference
                cap = (self.exp.resolved_simota_candidates()
                       if hasattr(self.exp, "resolved_simota_candidates")
                       else getattr(self.exp, "simota_candidates", None))
                logger.warning(
                    "SimOTA candidate compaction overflowed in "
                    f"{overflow.avg:.1%} of recent images (cap "
                    f"simota_candidates={cap}): label assignment deviates "
                    "from the reference for those images — raise the cap, "
                    "or clear the override (default None = dense-exact, "
                    "which is also the measured-fastest form)")

            if self.rank == 0 and self.tblogger is not None:
                self.tblogger.add_scalar(
                    "train/lr", self.meter["lr"].latest,
                    self.progress_in_iter)
                for k, v in loss_meter.items():
                    self.tblogger.add_scalar(
                        f"train/{k}", v.latest, self.progress_in_iter)
            if self.rank == 0 and getattr(self, "mlflow_logger", None):
                logs = {"train/" + k: v.latest
                        for k, v in loss_meter.items()}
                logs["train/lr"] = self.meter["lr"].latest
                self.mlflow_logger.on_log(
                    self.args, self.exp, self.epoch + 1, logs)
            if self.rank == 0 and getattr(self, "wandb_logger", None):
                logs = {"train/" + k: v.latest
                        for k, v in loss_meter.items()}
                logs["train/lr"] = self.meter["lr"].latest
                self.wandb_logger.log_metrics(
                    logs, step=self.progress_in_iter)
            self.meter.clear_meters()

        # multiscale: every 10 iters pick a new 32-aligned size from the
        # shared seeded stream (`config.py:275-294` analog, broadcast-free)
        if not self.exp.deterministic:
            if (self.progress_in_iter + 1) % 10 == 0:
                self._current_size = self.exp.random_resize(
                    self._multiscale_rng)

    @property
    def progress_in_iter(self):
        return self.epoch * self.max_iter + self.iter

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _maybe_warmup_multiscale(self, inps, targets):
        """Once real batch shapes are known (first iteration), pre-compile
        the training step for every multiscale bucket size in a background
        thread (config.warmup_multiscale). The AOT compiles populate the
        persistent XLA compilation cache (enabled by the train CLI), so
        when `random_resize` later draws a new size the jit call re-traces
        but skips the minutes-scale XLA compile.
        """
        if (not getattr(self.exp, "warmup_multiscale", False)
                or self.exp.deterministic
                or getattr(self, "_warmup_thread", None) is not None):
            return
        import threading

        import jax

        def sds(t, shape=None):
            # keep shardings so warmed programs match the real call's
            # signature on a mesh
            return jax.ShapeDtypeStruct(
                np.shape(t) if shape is None else shape, t.dtype,
                sharding=getattr(t, "sharding", None))

        batch_shape = tuple(np.shape(inps))
        bsz = batch_shape[0]
        fused = self._device_augment and self._step_aug is not None
        batch_shard = getattr(inps, "sharding", None)
        if fused:
            # inps are raw tiles; the plain step (used by the later
            # no-aug phase) sees augmented images + packed labels
            x_proto = jax.ShapeDtypeStruct(
                (bsz, self.input_size[0], self.input_size[1], 3),
                np.float32, sharding=batch_shard)
            target_sds = jax.ShapeDtypeStruct(
                (bsz, 120, 5), np.float32, sharding=batch_shard)
            aug_sds = (jax.tree.map(sds, inps),
                       jax.ShapeDtypeStruct((bsz, 5, 2), np.float32,
                                            sharding=batch_shard),
                       jax.tree.map(
                           lambda t: jax.ShapeDtypeStruct(
                               np.shape(t), np.float32,
                               sharding=getattr(t, "sharding", None)),
                           targets),
                       jax.ShapeDtypeStruct(
                           np.shape(jax.random.PRNGKey(0)), np.uint32))
        else:
            x_proto = jax.tree.map(sds, inps)
            target_sds = jax.tree.map(sds, targets)
        state_sds = jax.tree.map(sds, self.train_state)
        lr_sds = jax.ShapeDtypeStruct((), np.float32)
        sizes = [tuple(s) for s in self.exp.multiscale_sizes()
                 if tuple(s) != tuple(self.input_size)]
        self.warmup_compiled = 0
        self._warmup_stop = threading.Event()
        base_size = tuple(self.input_size)

        def work():
            done = 0
            for (th, tw) in sizes:
                x_sds = sds(x_proto, (bsz, th, tw, batch_shape[3])
                            if not fused else (bsz, th, tw, 3))
                variants = [
                    lambda: self._step.lower(
                        state_sds, x_sds, target_sds, lr_sds),
                    lambda: self._step_l1.lower(
                        state_sds, x_sds, target_sds, lr_sds),
                ]
                if fused:
                    variants.append(lambda: self._step_aug.lower(
                        state_sds, *aug_sds, lr_sds, base_size, (th, tw)))
                for lower in variants:
                    if self._warmup_stop.is_set():
                        return
                    try:
                        lower().compile()
                        done += 1
                        # published only from this thread; readers see a
                        # monotonic count
                        self.warmup_compiled = done
                    except Exception as e:  # never take training down
                        logger.warning(
                            "multiscale warmup failed for %sx%s: %s",
                            th, tw, e)
                        return

        self._warmup_thread = threading.Thread(
            target=work, daemon=True, name="multiscale-warmup")
        self._warmup_thread.start()

    def _stop_multiscale_warmup(self, timeout: float = 300.0):
        """Stop the warmup thread after its current compile. Training is
        over by the time this runs, so any not-yet-started compiles are
        useless — signal stop FIRST, then wait out only the in-flight
        compile (bounded by the grace period)."""
        th = getattr(self, "_warmup_thread", None)
        if th is None or not th.is_alive():
            return
        self._warmup_stop.set()
        th.join(timeout=timeout)
        if th.is_alive():
            logger.warning(
                "multiscale warmup thread still compiling after %.0fs; "
                "leaving the daemon to finish in the background",
                timeout)

    def _multiscale_resize(self, inps, targets):
        """On-device bilinear resize to the current multiscale size."""
        import jax
        import jax.numpy as jnp

        tsize = tuple(self._current_size)
        if tsize == tuple(self.input_size):
            return inps, targets
        key = (tsize, tuple(np.shape(inps)))
        if key not in self._resize_fns:
            scale_y = tsize[0] / self.input_size[0]
            scale_x = tsize[1] / self.input_size[1]

            def _resize(x, t):
                b, h, w, c = x.shape
                x = jax.image.resize(
                    x, (b, tsize[0], tsize[1], c), method="bilinear",
                    antialias=False)
                t = t.at[..., 1].multiply(scale_x)
                t = t.at[..., 3].multiply(scale_x)
                t = t.at[..., 2].multiply(scale_y)
                t = t.at[..., 4].multiply(scale_y)
                return x, t

            self._resize_fns[key] = jax.jit(_resize)
        return self._resize_fns[key](inps, targets)

    def resume_train(self, params):
        """Returns (params, extra_state or None) and sets start_epoch."""
        fmt = getattr(self.exp, "ckpt_format", "pth")
        if getattr(self.args, "resume", False) and fmt == "orbax":
            from yolox_tpu.core.train_step import full_params
            from yolox_tpu.utils.orbax_io import load_orbax

            ckpt = load_orbax(os.path.join(self.file_name, "orbax"))
            state = ckpt["state"]
            meta = ckpt["metadata"] or {}
            self.best_ap = float(meta.get("best_ap", 0.0))
            self.start_epoch = (self.args.start_epoch - 1
                                if getattr(self.args, "start_epoch", None)
                                is not None else int(ckpt["step"]))
            logger.info(f"resumed orbax step {ckpt['step']} "
                        f"(epoch {self.start_epoch})")
            # state holds the complete training state; merge it wholesale
            return full_params(state), state
        if getattr(self.args, "resume", False):
            logger.info("resume training")
            ckpt_file = self.args.ckpt or os.path.join(
                self.file_name, "latest_ckpt.pth")
            ckpt = load_checkpoint(ckpt_file)
            params = ckpt["model"]
            self.best_ap = ckpt.pop("best_ap", 0)
            start_epoch = (self.args.start_epoch - 1
                           if getattr(self.args, "start_epoch", None)
                           is not None else ckpt["start_epoch"])
            self.start_epoch = start_epoch
            extra = {}
            if "momentum_buf" in ckpt:
                import jax

                extra["momentum"] = jax.tree.map(
                    np.asarray, ckpt["momentum_buf"])
            logger.info(f"loaded checkpoint '{ckpt_file}' "
                        f"(epoch {self.start_epoch})")
            return params, extra or None
        if getattr(self.args, "ckpt", None) is not None:
            logger.info("loading checkpoint for fine tuning")
            ckpt = load_checkpoint(self.args.ckpt)
            params = load_ckpt(params, ckpt["model"])
        self.start_epoch = 0
        return params, None

    def _eval_params(self):
        import jax

        from yolox_tpu.core.train_step import full_params

        params = (self.train_state["ema"] if self.use_model_ema
                  else full_params(self.train_state))
        if jax.process_count() > 1:
            # evaluation is per-process local inference over each host's
            # dataset shard + one detection gather — pin the (replicated)
            # global-mesh params to a local device so the eval program is
            # a plain local jit, not an SPMD program over the train mesh
            dev = jax.local_devices()[0]
            params = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x), dev), params)
        return params

    def evaluate_and_save_model(self):
        eval_params = self._eval_params()

        def evalmodel(x):
            return self.module(x, params=eval_params)

        results = self.exp.eval(
            evalmodel, self.evaluator, self.is_distributed,
            return_outputs=True)
        if isinstance(results, tuple) and len(results) == 2:
            (ap50_95, ap50, summary), predictions = results
        else:
            ap50_95, ap50, summary = results
            predictions = None

        update_best_ckpt = ap50_95 > self.best_ap
        self.best_ap = max(self.best_ap, ap50_95)

        if self.rank == 0:
            if self.tblogger is not None:
                self.tblogger.add_scalar(
                    "val/COCOAP50", ap50, self.epoch + 1)
                self.tblogger.add_scalar(
                    "val/COCOAP50_95", ap50_95, self.epoch + 1)
            if getattr(self, "mlflow_logger", None):
                self.mlflow_logger.on_log(
                    self.args, self.exp, self.epoch + 1, {
                        "val/COCOAP50": ap50,
                        "val/COCOAP50_95": ap50_95,
                        "val/best_ap": round(self.best_ap, 3),
                    })
            if getattr(self, "wandb_logger", None):
                self.wandb_logger.log_metrics({
                    "val/COCOAP50": ap50,
                    "val/COCOAP50_95": ap50_95,
                    "val/best_ap": self.best_ap,
                }, step=self.progress_in_iter)
                if isinstance(predictions, dict):
                    self.wandb_logger.log_images(predictions)
            if summary:
                logger.info("\n" + summary)

        self.save_ckpt("last_epoch", update_best_ckpt, ap=ap50_95)
        if self.save_history_ckpt:
            self.save_ckpt(f"epoch_{self.epoch + 1}", ap=ap50_95)

    def save_ckpt(self, ckpt_name, update_best_ckpt=False, ap=None,
                  start_epoch=None):
        """`start_epoch` overrides the epoch a resume restarts from; the
        default (current epoch + 1) means "this epoch completed". The
        preemption path passes the CURRENT epoch to redo it."""
        if self.rank != 0:
            return
        import jax

        if start_epoch is None:
            start_epoch = self.epoch + 1
        if getattr(self.exp, "ckpt_format", "pth") == "orbax":
            from yolox_tpu.utils.orbax_io import save_orbax

            step = start_epoch
            orbax_dir = os.path.join(self.file_name, "orbax")
            if getattr(self, "_orbax_saved_step", None) != step:
                # one orbax step per epoch ("latest"/"last_epoch"/history
                # all alias the same training state)
                self._orbax_saved_step = step
                # full training state (params/stats/momentum/ema) -> host
                host_state = jax.tree.map(np.asarray, self.train_state)
                save_orbax(host_state, orbax_dir, step,
                           metadata={
                               "best_ap": float(self.best_ap),
                               "curr_ap": None if ap is None else float(ap),
                               "name": ckpt_name})
            if update_best_ckpt:
                # best-model identity survives even when the best flag
                # arrives after the step was already saved ("latest" saves
                # first, eval marks best later in the same epoch)
                import json

                os.makedirs(orbax_dir, exist_ok=True)
                with open(os.path.join(orbax_dir, "best.json"), "w") as f:
                    json.dump({"step": step,
                               "best_ap": float(self.best_ap)}, f)
            return

        logger.info(f"Save weights to {self.file_name}")
        save_params = jax.tree.map(np.asarray, self._eval_params())
        ckpt_state = {
            "start_epoch": start_epoch,
            "model": save_params,
            "momentum_buf": jax.tree.map(
                np.asarray, self.train_state["momentum"]),
            "best_ap": self.best_ap,
            "curr_ap": ap,
        }
        save_checkpoint(ckpt_state, update_best_ckpt, self.file_name,
                        ckpt_name)
        if getattr(self, "mlflow_logger", None):
            self.mlflow_logger.save_checkpoints(
                self.args, self.exp, self.file_name, self.epoch + 1,
                {"best_ap": self.best_ap, "curr_ap": ap}, update_best_ckpt)
        if getattr(self, "wandb_logger", None):
            self.wandb_logger.save_checkpoint(
                self.file_name, ckpt_name, update_best_ckpt,
                metadata={"epoch": self.epoch + 1, "best_ap": self.best_ap,
                          "curr_ap": ap})
