"""Preemption-safe checkpointing (SURVEY §5 failure recovery).

TPU pods are preemptible: the scheduler delivers SIGTERM, then kills the
process. The Trainer must turn that into a resume-capable checkpoint and
a clean exit — the reference has no preemption story at all
(`/root/reference/yolox/core/trainer.py` dies wherever it stands), so
this is TPU-production behavior the framework adds.

Covered here, end to end through `yolox_tpu.cli.train.main` in a real
subprocess:
  - SIGTERM mid-epoch -> `latest_ckpt.pth` written, exit code 0
  - the checkpoint's `start_epoch` REDOES the interrupted epoch (no
    silently skipped training data)
  - `--resume` restarts from it
"""

import os
import pathlib
import re
import signal
import subprocess
import sys
import time

import pytest

REPO = pathlib.Path(__file__).parent.parent


def _spawn_train(data_dir, out_dir, extra=()):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["YOLOX_PRE_DATA_DIR"] = str(data_dir)
    env["YOLOX_PRE_OUT_DIR"] = str(out_dir)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["PYTHONUNBUFFERED"] = "1"
    # pin the CPU backend in-process: the env var alone is unreliable
    # here (plugin init can rewrite it — see tests/conftest.py)
    bootstrap = ("import jax, sys; "
                 "jax.config.update('jax_platforms', 'cpu'); "
                 "from yolox_tpu.cli import train; "
                 "sys.exit(train.main(sys.argv[1:]))")
    return subprocess.Popen(
        [sys.executable, "-u", "-c", bootstrap,
         "-c", "tests._preempt_config:PreemptTrainConfig",
         "-b", "2", "--seed", "7", *extra],
        env=env, cwd=str(REPO),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def _wait_for_iter_line(log_file, proc, timeout=600):
    """Block until the trainer has completed >=1 optimization step."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read()
            raise AssertionError(f"train exited early rc={proc.returncode}:"
                                 f"\n{out[-3000:]}")
        if log_file.exists() and "iter_time" in log_file.read_text():
            return
        time.sleep(1.0)
    proc.kill()
    raise AssertionError("no training iteration within timeout")


@pytest.mark.slow
def test_two_process_preemption(tmp_path, tmp_path_factory):
    """Multi-host preemption: SIGTERM ONE of two `jax.distributed` ranks
    mid-training; the notice must propagate through the coordination
    service's preemption sync protocol (`reached_preemption_sync_point`)
    so BOTH ranks checkpoint at the same step and exit rc 0 — no hung
    collectives, no shutdown-barrier timeout."""
    import json

    from tests._synthetic_coco import build_synthetic_coco
    from tests.test_multiprocess import _free_port

    data_dir = build_synthetic_coco(tmp_path_factory.mktemp("coco_mp_pre"))
    port = _free_port()
    worker = REPO / "tests" / "multiprocess_worker.py"
    env = dict(os.environ)
    env["PYTHONUNBUFFERED"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", str(worker), str(r), "2", str(port),
             str(tmp_path), data_dir, "trainer-preempt"],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for r in range(2)
    ]
    run_dir = tmp_path / "out" / "mp_preempt_e2e"
    log_file = run_dir / "train_log.txt"
    try:
        _wait_for_iter_line(log_file, procs[0], timeout=900)
        procs[1].send_signal(signal.SIGTERM)  # rank 1 ONLY
        outs = [p.communicate(timeout=600)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is not None:
                continue
            p.kill()
            p.wait()

    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank{r} rc={p.returncode}:\n{out[-3000:]}"
    results = [json.loads((tmp_path / f"rank{r}.json").read_text())
               for r in range(2)]
    assert all(r["rc"] == 0 for r in results), results

    # rank 0 (which was NOT signalled) wrote the resume checkpoint with
    # the interrupted epoch marked for redo
    text = log_file.read_text()
    m = re.search(r"preemption notice at epoch (\d+)", text)
    assert m, "rank 0 never saw the propagated preemption notice"
    from yolox_tpu.utils.checkpoint import load_checkpoint

    ckpt = load_checkpoint(str(run_dir / "latest_ckpt.pth"))
    assert ckpt["start_epoch"] == int(m.group(1)) - 1


@pytest.mark.slow
def test_sigterm_checkpoints_and_resumes(tmp_path, tmp_path_factory):
    from tests._synthetic_coco import build_synthetic_coco

    data_dir = build_synthetic_coco(tmp_path_factory.mktemp("coco_pre"))
    out_dir = tmp_path / "out"
    run_dir = out_dir / "preempt_e2e"
    log_file = run_dir / "train_log.txt"

    proc = _spawn_train(data_dir, out_dir)
    try:
        _wait_for_iter_line(log_file, proc)
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()

    assert proc.returncode == 0, out[-3000:]
    assert "preempt" in out.lower(), out[-3000:]
    ckpt_file = run_dir / "latest_ckpt.pth"
    assert ckpt_file.exists(), sorted(p.name for p in run_dir.iterdir())

    # the interrupted epoch is REDONE on resume: the trainer logs which
    # epoch the notice landed in (iterations are fast once compiled, so
    # the signal can land in any epoch) — the saved start_epoch must be
    # exactly that epoch, not the next one
    import re

    from yolox_tpu.utils.checkpoint import load_checkpoint

    m = re.search(r"preemption notice at epoch (\d+)",
                  log_file.read_text())
    assert m, "trainer never logged the preemption notice"
    interrupted_epoch = int(m.group(1))
    ckpt = load_checkpoint(str(ckpt_file))
    assert ckpt["start_epoch"] == interrupted_epoch - 1, (
        ckpt["start_epoch"], interrupted_epoch)
    assert "model" in ckpt and "momentum_buf" in ckpt

    # --resume picks it up and trains on (train_log.txt appends across
    # runs, so progress = iteration lines BEYOND the first run's)
    iters_before = log_file.read_text().count("iter_time")
    proc2 = _spawn_train(data_dir, out_dir, extra=("--resume",))
    try:
        deadline = time.time() + 600
        resumed = False
        while time.time() < deadline:
            if proc2.poll() is not None:
                out2 = proc2.stdout.read()
                raise AssertionError(f"resume exited early "
                                     f"rc={proc2.returncode}:"
                                     f"\n{out2[-3000:]}")
            text = log_file.read_text()
            if ("resume training" in text
                    and text.count("iter_time") > iters_before):
                resumed = True
                break
            time.sleep(1.0)
        assert resumed, "resume run never reached a training iteration"
        proc2.send_signal(signal.SIGTERM)
        out2, _ = proc2.communicate(timeout=300)
        assert proc2.returncode == 0, out2[-3000:]
    finally:
        if proc2.poll() is None:
            proc2.kill()
