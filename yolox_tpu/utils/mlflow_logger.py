"""MLflow experiment tracking — re-design of
`/root/reference/yolox/utils/mlflow_logger.py` (env-var driven:
MLFLOW_TRACKING_URI, YOLOX_MLFLOW_* family). Degrades to a warning when the
mlflow package is not installed (it is not part of the supported
environment; the default tracker is tensorboard).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from yolox_tpu.utils.logger import logger


class MlflowLogger:
    def __init__(self):
        try:
            import mlflow  # noqa: F401

            self._mlflow = mlflow
        except ImportError:
            self._mlflow = None
            logger.warning(
                "mlflow is not installed; MlflowLogger is a no-op. "
                "`pip install mlflow` to enable it.")
        self._run = None

    @property
    def enabled(self) -> bool:
        return self._mlflow is not None

    def setup(self, args=None, exp=None):
        if not self.enabled:
            return
        tracking_uri = os.getenv("MLFLOW_TRACKING_URI")
        if tracking_uri:
            self._mlflow.set_tracking_uri(tracking_uri)
        experiment_name = os.getenv(
            "YOLOX_MLFLOW_EXPERIMENT_NAME", "yolox_tpu")
        self._mlflow.set_experiment(experiment_name)
        run_name = os.getenv("YOLOX_MLFLOW_RUN_NAME") or (
            getattr(exp, "name", None))
        self._run = self._mlflow.start_run(run_name=run_name)
        if exp is not None:
            params = {
                k: v for k, v in vars(exp).items()
                if isinstance(v, (int, float, str, bool, tuple))
            }
            self._mlflow.log_params(params)

    def on_log(self, args, exp, epoch: int, logs: Dict[str, Any]):
        if not self.enabled or self._run is None:
            return
        self._mlflow.log_metrics(
            {k.replace("/", "_"): float(v) for k, v in logs.items()},
            step=epoch)

    def save_checkpoints(self, args, exp, file_name, epoch, metadata,
                         update_best_ckpt):
        if not self.enabled or self._run is None:
            return
        if os.getenv("YOLOX_MLFLOW_LOG_MODEL_ARTIFACTS", "False") == "True":
            ckpt = os.path.join(file_name, "latest_ckpt.pth")
            if os.path.exists(ckpt):
                self._mlflow.log_artifact(ckpt)

    def on_train_end(self, args, file_name=None,
                     metadata: Optional[dict] = None):
        if not self.enabled or self._run is None:
            return
        if metadata:
            self._mlflow.log_params(
                {f"final_{k}": str(v) for k, v in metadata.items()})
        self._mlflow.end_run()
