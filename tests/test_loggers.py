"""Experiment-tracker tests: WandbLogger / MlflowLogger against fake
backends injected into sys.modules (neither package is installed in the
supported environment — reference gates the same way)."""

import sys
import types

import pytest


class _FakeRun:
    def __init__(self):
        self.id = "fake123"
        self.logged = []
        self.artifacts = []
        self.config = self
        self.finished = False

    def update(self, cfg, allow_val_change=False):
        self.cfg = cfg

    def log(self, metrics, step=None):
        self.logged.append((metrics, step))

    def log_artifact(self, artifact, aliases=None):
        self.artifacts.append((artifact, aliases))

    def finish(self):
        self.finished = True


class _FakeTable:
    def __init__(self, columns=None):
        self.columns = columns
        self.rows = []

    def add_data(self, *row):
        self.rows.append(row)


class _FakeArtifact:
    def __init__(self, name=None, type=None, metadata=None):
        self.name, self.type, self.metadata = name, type, metadata
        self.files = []

    def add_file(self, path, name=None):
        self.files.append((path, name))


@pytest.fixture()
def fake_wandb(monkeypatch):
    run = _FakeRun()
    mod = types.ModuleType("wandb")
    mod.init = lambda **kw: run
    mod.Table = _FakeTable
    mod.Artifact = _FakeArtifact
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return run


def test_wandb_logger_noop_without_package(monkeypatch):
    monkeypatch.setitem(sys.modules, "wandb", None)
    from yolox_tpu.utils.wandb_logger import WandbLogger

    wl = WandbLogger()
    assert not wl.enabled
    wl.setup()                      # all no-ops, no crash
    wl.log_metrics({"a": 1.0})
    wl.finish()


def test_wandb_logger_full_cycle(fake_wandb, monkeypatch, tmp_path):
    monkeypatch.setenv("WANDB_PROJECT", "proj")
    monkeypatch.setenv("YOLOX_WANDB_LOG_CHECKPOINTS", "true")
    from yolox_tpu import YoloxConfig
    from yolox_tpu.utils.wandb_logger import WandbLogger

    cfg = YoloxConfig.get_named_config("yolox_nano")
    wl = WandbLogger()
    assert wl.enabled
    wl.setup(exp=cfg)
    assert fake_wandb.cfg["num_classes"] == 80

    wl.log_metrics({"train/loss": 3.5, "skip": "notanumber"}, step=7)
    assert fake_wandb.logged[-1] == ({"train/loss": 3.5}, 7)

    wl.log_images({"img0.jpg": {
        "bboxes": [[0, 0, 10, 10]], "scores": [0.9], "categories": [2]}})
    table = fake_wandb.logged[-1][0]["val/predictions"]
    assert table.rows[0][1] == 1  # one box

    # artifact upload: the trainer writes '<ckpt_name>_ckpt.pth' via
    # checkpoint.save_checkpoint — plant exactly that file name
    (tmp_path / "latest_ckpt.pth").write_bytes(b"x")
    wl.save_checkpoint(str(tmp_path), "latest", is_best=True,
                       metadata={"epoch": 3})
    art, aliases = fake_wandb.artifacts[-1]
    assert "best" in aliases and art.metadata["epoch"] == 3

    wl.finish()
    assert fake_wandb.finished


def test_mlflow_logger_noop_without_package(monkeypatch):
    monkeypatch.setitem(sys.modules, "mlflow", None)
    from yolox_tpu.utils.mlflow_logger import MlflowLogger

    ml = MlflowLogger()
    assert not ml.enabled
    ml.setup()
    ml.on_log(None, None, 1, {"x": 1.0})


@pytest.fixture()
def fake_mlflow(monkeypatch):
    calls = {"params": {}, "param_batches": [], "metrics": [],
             "artifacts": [], "tags": {}, "start_kwargs": None,
             "ended": False}
    mod = types.ModuleType("mlflow")
    mod.set_tracking_uri = lambda uri: calls.__setitem__("uri", uri)
    mod.set_experiment = lambda name: calls.__setitem__("experiment", name)

    def start_run(**kw):
        calls["start_kwargs"] = kw
        return types.SimpleNamespace(
            info=types.SimpleNamespace(run_id="r1"), **kw)

    mod.start_run = start_run
    mod.set_tags = lambda t: calls["tags"].update(t)

    def log_params(p):
        calls["param_batches"].append(p)
        calls["params"].update(p)

    mod.log_params = log_params
    mod.log_metrics = lambda m, step=None: calls["metrics"].append((m, step))
    mod.log_artifact = lambda p: calls["artifacts"].append(p)
    mod.end_run = lambda: calls.__setitem__("ended", True)
    monkeypatch.setitem(sys.modules, "mlflow", mod)
    return calls


def test_mlflow_logger_full_cycle(fake_mlflow, monkeypatch, tmp_path):
    monkeypatch.setenv("MLFLOW_TRACKING_URI", "file:///tmp/mlruns")
    monkeypatch.setenv("YOLOX_MLFLOW_EXPERIMENT_NAME", "exp1")
    monkeypatch.setenv("YOLOX_MLFLOW_LOG_MODEL_ARTIFACTS", "True")
    monkeypatch.setenv("YOLOX_MLFLOW_LOG_MODEL_PER_n_EPOCHS", "3")
    monkeypatch.setenv("YOLOX_MLFLOW_LOG_Nth_EPOCH_MODELS", "True")
    monkeypatch.setenv("YOLOX_MLFLOW_RUN_NAME", "run7")
    monkeypatch.setenv("MLFLOW_TAGS", '{"team": "cv", "stage": "dev"}')
    from yolox_tpu import YoloxConfig
    from yolox_tpu.utils.mlflow_logger import MlflowLogger

    cfg = YoloxConfig.get_named_config("yolox_nano")
    ml = MlflowLogger()
    assert ml.enabled
    ml.setup(exp=cfg)
    assert fake_mlflow["uri"] == "file:///tmp/mlruns"
    assert fake_mlflow["experiment"] == "exp1"
    assert fake_mlflow["start_kwargs"]["run_name"] == "run7"
    assert fake_mlflow["tags"] == {"team": "cv", "stage": "dev"}
    assert fake_mlflow["params"]["num_classes"] == "80"
    # batched param logging (mlflow caps params per call)
    assert all(len(b) <= 100 for b in fake_mlflow["param_batches"])

    ml.on_log(None, cfg, 3, {"train/loss": 2.0, "note": "skip-me"})
    assert fake_mlflow["metrics"][-1] == ({"train_loss": 2.0}, 3)

    # artifact cadence: epoch 3 is on the n=3 cadence -> latest + history;
    # best uploaded whenever the best flag fires
    (tmp_path / "latest_ckpt.pth").write_bytes(b"x")
    (tmp_path / "epoch_3_ckpt.pth").write_bytes(b"x")
    (tmp_path / "best_ckpt.pth").write_bytes(b"x")
    ml.save_checkpoints(None, cfg, str(tmp_path), 3, {}, False)
    assert str(tmp_path / "latest_ckpt.pth") in fake_mlflow["artifacts"]
    assert str(tmp_path / "epoch_3_ckpt.pth") in fake_mlflow["artifacts"]
    n_before = len(fake_mlflow["artifacts"])
    ml.save_checkpoints(None, cfg, str(tmp_path), 4, {}, True)  # off-cadence
    assert fake_mlflow["artifacts"][n_before:] == [
        str(tmp_path / "best_ckpt.pth")]

    ml.on_train_end(None, file_name=str(tmp_path),
                    metadata={"best_ap": 0.1})
    assert fake_mlflow["ended"]
    assert fake_mlflow["params"]["final_best_ap"] == "0.1"


def test_mlflow_flatten_and_resume(fake_mlflow, monkeypatch):
    monkeypatch.setenv("YOLOX_MLFLOW_FLATTEN_PARAMS", "True")
    monkeypatch.setenv("MLFLOW_RUN_ID", "prev-run")
    monkeypatch.setenv("MLFLOW_NESTED_RUN", "True")
    from yolox_tpu.utils.mlflow_logger import MlflowLogger

    ml = MlflowLogger()
    ml.setup(exp=types.SimpleNamespace(name="x", opts={"a": {"b": 2}}))
    assert fake_mlflow["start_kwargs"]["run_id"] == "prev-run"
    assert fake_mlflow["start_kwargs"]["nested"] is True
    assert fake_mlflow["params"]["opts.a.b"] == "2"


def test_setup_logger_captures_prints(tmp_path):
    """capture_std routes raw prints into the log file (the reference
    redirects stdout/stderr so pycocotools chatter is logged)."""
    import sys

    from yolox_tpu.utils.logger import restore_sys_output, setup_logger

    orig_out, orig_err = sys.stdout, sys.stderr
    try:
        setup_logger(str(tmp_path), rank=0, filename="log.txt",
                     capture_std=True)
        print("hello-from-print")
        sys.stdout.flush()
    finally:
        restore_sys_output()
        setup_logger(rank=1)  # detach the file handler
    assert sys.stdout is orig_out and sys.stderr is orig_err
    text = (tmp_path / "log.txt").read_text()
    assert "hello-from-print" in text
