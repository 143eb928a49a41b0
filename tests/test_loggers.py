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
    calls = {"params": {}, "metrics": [], "artifacts": [], "ended": False}
    mod = types.ModuleType("mlflow")
    mod.set_tracking_uri = lambda uri: calls.__setitem__("uri", uri)
    mod.set_experiment = lambda name: calls.__setitem__("experiment", name)
    mod.start_run = lambda run_name=None: types.SimpleNamespace(
        info=types.SimpleNamespace(run_id="r1"), run_name=run_name)
    mod.log_params = lambda p: calls["params"].update(p)
    mod.log_metrics = lambda m, step=None: calls["metrics"].append((m, step))
    mod.log_artifact = lambda p: calls["artifacts"].append(p)
    mod.end_run = lambda: calls.__setitem__("ended", True)
    monkeypatch.setitem(sys.modules, "mlflow", mod)
    return calls


def test_mlflow_logger_full_cycle(fake_mlflow, monkeypatch, tmp_path):
    monkeypatch.setenv("MLFLOW_TRACKING_URI", "file:///tmp/mlruns")
    monkeypatch.setenv("YOLOX_MLFLOW_EXPERIMENT_NAME", "exp1")
    monkeypatch.setenv("YOLOX_MLFLOW_LOG_MODEL_ARTIFACTS", "True")
    from yolox_tpu import YoloxConfig
    from yolox_tpu.utils.mlflow_logger import MlflowLogger

    cfg = YoloxConfig.get_named_config("yolox_nano")
    ml = MlflowLogger()
    assert ml.enabled
    ml.setup(exp=cfg)
    assert fake_mlflow["uri"] == "file:///tmp/mlruns"
    assert fake_mlflow["experiment"] == "exp1"
    assert fake_mlflow["params"]["num_classes"] == 80

    ml.on_log(None, cfg, 3, {"train/loss": 2.0})
    assert fake_mlflow["metrics"][-1] == ({"train_loss": 2.0}, 3)

    (tmp_path / "latest_ckpt.pth").write_bytes(b"x")
    ml.save_checkpoints(None, cfg, str(tmp_path), 3, {}, False)
    assert fake_mlflow["artifacts"]

    ml.on_train_end(None, metadata={"best_ap": 0.1})
    assert fake_mlflow["ended"]
    assert fake_mlflow["params"]["final_best_ap"] == "0.1"
