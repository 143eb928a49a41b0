"""Worker for the multi-process distributed test.

Launched as `python tests/multiprocess_worker.py <rank> <nprocs> <port>
<outdir>` with XLA_FLAGS forcing 2 virtual CPU devices per process:
initializes `jax.distributed`, runs ONE data-parallel training step over
the global (nprocs x 2)-device mesh with the batch sharded across
processes, does one host-object all-gather round, and writes its results
as JSON for the parent test to compare against a single-process run of
the identical mesh shape.

Covers the `jax.process_count() > 1` code paths (mesh over
non-addressable devices, make_array_from_process_local_data feeding,
multihost object gather) that single-process tests cannot reach —
executed-coverage analog of the reference's multi-node stack
(`yolox/utils/dist.py:193-272`, `yolox/core/launch.py:99-145`).
"""

import json
import pathlib
import sys


def main(rank: int, nprocs: int, port: int, outdir: str,
         eval_data_dir: str = None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=rank,
    )
    assert jax.process_count() == nprocs, jax.process_count()

    import jax.numpy as jnp
    import numpy as np

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.core import init_train_state, make_train_step
    from yolox_tpu.parallel.mesh import (
        all_gather_objects,
        batch_sharding,
        data_parallel_mesh,
        replicate,
    )

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = YoloxModule.from_config(cfg)          # seeded: same on all ranks
    mesh = data_parallel_mesh()                    # all GLOBAL devices
    n_dev = len(jax.devices())
    state = replicate(mesh, init_train_state(module.params))
    step = make_train_step(module, cfg.num_classes, mesh=mesh)

    global_batch, size = 2 * n_dev, 64
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (global_batch, size, size, 3)).astype(np.float32)
    labels = np.zeros((global_batch, 10, 5), np.float32)
    labels[:, 0] = [1, size / 2, size / 2, size / 3, size / 3]

    # feed only this process's slice of the global batch
    per = global_batch // nprocs
    sh = batch_sharding(mesh)
    gx = jax.make_array_from_process_local_data(
        sh, x[rank * per:(rank + 1) * per], global_shape=x.shape)
    gl = jax.make_array_from_process_local_data(
        sh, labels[rank * per:(rank + 1) * per], global_shape=labels.shape)

    state, metrics = step(state, gx, gl, jnp.float32(0.01))
    losses = {k: float(np.asarray(v)) for k, v in metrics.items()}

    gathered = all_gather_objects({"rank": rank, "tag": "x" * (rank + 3)})

    out = {
        "rank": rank,
        "process_count": jax.process_count(),
        "n_devices": n_dev,
        "losses": losses,
        "gathered": gathered,
    }

    if eval_data_dir:
        # distributed COCO evaluation: each process infers its strided
        # shard of the synthetic val set, detections are all-gathered, and
        # rank 0 runs COCOeval — the `distributed=True` gather/dedup path
        # (reference analog: yolox/evaluators/coco_evaluator.py:189-196)
        sys.path.insert(0, str(pathlib.Path(__file__).parent))
        from _synthetic_coco import make_tiny_eval_config

        cfg = make_tiny_eval_config(eval_data_dir)
        eval_module = YoloxModule.from_config(cfg)  # seeded: same weights
        evaluator = cfg.get_evaluator(
            batch_size=2 * nprocs, is_distributed=True)
        ap50_95, ap50, summary = evaluator.evaluate(
            eval_module, distributed=True)
        out["eval"] = {
            "ap50_95": float(ap50_95),
            "ap50": float(ap50),
            "has_summary": summary is not None,
        }

    path = pathlib.Path(outdir) / f"rank{rank}.json"
    path.write_text(json.dumps(out))
    jax.distributed.shutdown()


def main_trainer(rank: int, nprocs: int, port: int, outdir: str,
                 data_dir: str, mode: str = "trainer"):
    """Full-Trainer mode: run `yolox_tpu.cli.train.main` end to end under
    `jax.distributed` — dataloader sharding via process_index, rank-0-only
    checkpoints/logging, and eval-in-train with the multihost gather, all
    through the real CLI entrypoint (reference analog:
    `/root/reference/yolox/core/launch.py:99-145`).

    `mode == "trainer-preempt"` runs the long-lived preemption config
    instead: the PARENT test SIGTERMs one rank mid-training and both
    ranks must checkpoint-and-exit cleanly through the coordination
    service's preemption sync protocol."""
    import os

    os.environ["YOLOX_MP_DATA_DIR"] = data_dir
    os.environ["YOLOX_MP_OUT_DIR"] = str(pathlib.Path(outdir) / "out")
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

    import jax

    jax.config.update("jax_platforms", "cpu")

    from yolox_tpu.cli import train as train_cli

    if mode == "trainer-preempt":
        config_cls = "tests._mp_preempt_config:MpPreemptConfig"
        run_name = "mp_preempt_e2e"
    else:
        config_cls = "tests._mp_train_config:MpTrainConfig"
        run_name = "mp_train_e2e"
    rc = train_cli.main([
        "-c", config_cls,
        "-b", str(2 * nprocs * 2),   # 2 imgs/device x 2 devices x nprocs
        "--num_machines", str(nprocs),
        "--machine_rank", str(rank),
        "--dist-url", f"localhost:{port}",
        "--seed", "0",
    ])

    run_dir = pathlib.Path(outdir) / "out" / run_name
    out = {
        "rank": rank,
        "rc": rc,
        "process_count": jax.process_count(),
        "n_devices": len(jax.devices()),
        "ckpts": sorted(p.name for p in run_dir.glob("*.pth"))
        if run_dir.exists() else [],
        "has_log": (run_dir / "train_log.txt").exists(),
    }
    path = pathlib.Path(outdir) / f"rank{rank}.json"
    path.write_text(json.dumps(out))
    # align ranks before shutdown: rank 0's solo tail work (COCOeval,
    # checkpoint writes) can exceed the coordination-service shutdown
    # barrier timeout on a contended host if rank 1 calls shutdown early
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mp-train-e2e:done")
    jax.distributed.shutdown()


if __name__ == "__main__":
    if len(sys.argv) > 6 and sys.argv[6].startswith("trainer"):
        main_trainer(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
                     sys.argv[4], sys.argv[5], mode=sys.argv[6])
    else:
        main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
             sys.argv[4], sys.argv[5] if len(sys.argv) > 5 else None)
