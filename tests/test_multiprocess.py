"""Multi-process distributed execution: 2 real processes, one coordinator.

Spawns two subprocesses that `jax.distributed.initialize` against a local
coordinator (2 virtual CPU devices each -> a 4-device global mesh), run one
sharded training step + one host-object gather, and checks their results
against a single-process run over an identical 4-device mesh. This gives
the `jax.process_count() > 1` paths executed coverage — something the
reference never tests (SURVEY.md §4: "Distributed testing: none").
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(tmp_path, nprocs=2, extra_args=(), timeout=480):
    """Spawn the worker script across nprocs local processes and return
    their parsed result JSONs."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multiprocess_worker.py"),
             str(rank), str(nprocs), str(port), str(tmp_path),
             *map(str, extra_args)],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for rank in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    return [json.loads((tmp_path / f"rank{r}.json").read_text())
            for r in range(nprocs)]


@pytest.mark.slow
def test_two_process_train_step_and_gather(tmp_path):
    nprocs = 2
    results = _run_workers(tmp_path, nprocs)
    assert all(r["process_count"] == nprocs for r in results)
    assert all(r["n_devices"] == 4 for r in results)

    # the host-object gather is ordered by process index on every rank
    for r in results:
        assert [g["rank"] for g in r["gathered"]] == [0, 1]
        assert r["gathered"][1]["tag"] == "xxxx"

    # both ranks observe the same pmean'd losses
    for key, v0 in results[0]["losses"].items():
        assert v0 == pytest.approx(results[1]["losses"][key], abs=1e-6), key

    # single-process run over an identical 4-device mesh must agree: the
    # sharding (2 images/device), per-replica BN, and pmean math are the
    # same program regardless of how devices map to processes
    import jax
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.core import init_train_state, make_train_step
    from yolox_tpu.parallel.mesh import replicate, shard_batch
    from jax.sharding import Mesh

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = YoloxModule.from_config(cfg)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    state = replicate(mesh, init_train_state(module.params))
    step = make_train_step(module, cfg.num_classes, mesh=mesh)

    size, global_batch = 64, 8
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, (global_batch, size, size, 3)).astype(np.float32)
    labels = np.zeros((global_batch, 10, 5), np.float32)
    labels[:, 0] = [1, size / 2, size / 2, size / 3, size / 3]
    x, labels = shard_batch(mesh, x, labels)
    _, metrics = step(state, x, labels, jnp.float32(0.01))

    for key, want in results[0]["losses"].items():
        got = float(np.asarray(metrics[key]))
        assert got == pytest.approx(want, rel=1e-5, abs=1e-6), key


@pytest.mark.slow
def test_two_process_distributed_eval(tmp_path, tmp_path_factory):
    """`CocoEvaluator.evaluate(distributed=True)` across 2 real processes:
    each rank infers its strided shard, detections are all-gathered, and
    rank 0's COCO stats must equal a single-process evaluation of the
    identical dataset/weights (reference gather analog:
    `/root/reference/yolox/evaluators/coco_evaluator.py:189-196`)."""
    from tests._synthetic_coco import build_synthetic_coco, \
        make_tiny_eval_config

    data_dir = build_synthetic_coco(tmp_path_factory.mktemp("coco_mp"))
    results = _run_workers(tmp_path, 2, extra_args=[data_dir])

    ev0, ev1 = results[0]["eval"], results[1]["eval"]
    assert ev0["has_summary"] is True      # rank 0 ran COCOeval
    assert ev1["has_summary"] is False     # rank 1 returned early

    from yolox_tpu.models.yolox import YoloxModule

    cfg = make_tiny_eval_config(data_dir)
    module = YoloxModule.from_config(cfg)  # same seeded weights as workers
    evaluator = cfg.get_evaluator(batch_size=4, is_distributed=False)
    (ap50_95, ap50, summary), outputs = evaluator.evaluate(
        module, distributed=False, return_outputs=True)

    assert summary is not None
    assert outputs, "no detections produced — comparison would be vacuous"
    assert ev0["ap50_95"] == pytest.approx(float(ap50_95), abs=1e-6)
    assert ev0["ap50"] == pytest.approx(float(ap50), abs=1e-6)


@pytest.mark.slow
def test_two_process_full_trainer(tmp_path, tmp_path_factory):
    """The Trainer OBJECT under `jax.distributed`, end to end through
    `yolox_tpu.cli.train.main`: 2 real processes x 2 virtual devices, 2
    epochs on synthetic COCO with eval-in-train every epoch. Covers the
    remaining multi-process seam (loader sharding via process_index,
    rank-0-only checkpoint/log writes, the in-training distributed eval
    gather) that the bare train-step test above cannot reach. Reference
    analog: `/root/reference/yolox/core/launch.py:99-145`."""
    from tests._synthetic_coco import build_synthetic_coco

    data_dir = build_synthetic_coco(tmp_path_factory.mktemp("coco_mp_tr"))
    results = _run_workers(tmp_path, 2, extra_args=[data_dir, "trainer"],
                           timeout=1500)

    for r in results:
        assert r["rc"] == 0
        assert r["process_count"] == 2
        assert r["n_devices"] == 4

    # rank-0-only artifacts: checkpoints + the log file exist exactly once
    r0, r1 = results
    assert "latest_ckpt.pth" in r0["ckpts"], r0
    # last_epoch is written ONLY by evaluate_and_save_model -> proves the
    # in-training distributed eval ran. best_ckpt requires a STRICT AP
    # improvement (reference trainer.py:360), which random weights on
    # noise images never achieve (AP stays 0.0).
    assert "last_epoch_ckpt.pth" in r0["ckpts"], r0
    assert r0["has_log"] is True
    # rank 1 shares the filesystem here, so its view of the run dir equals
    # rank 0's — the real assertion is that BOTH report the same artifact
    # set (a rank-1 writer would race/duplicate, not diverge)
    assert r1["ckpts"] == r0["ckpts"]
