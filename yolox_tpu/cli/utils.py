"""CLI helpers — re-design of `/root/reference/yolox/cli/utils.py`.

`resolve_config`: named config (hyphen/underscore tolerant) or a
`module:ClassName` path to a user YoloxConfig subclass.
`parse_model_config_opts`: `-D key=value` pairs -> dict.
"""

from __future__ import annotations

import importlib
from typing import Dict, List, Optional

from yolox_tpu.config import YoloxConfig


def resolve_config(name: str) -> YoloxConfig:
    config = YoloxConfig.get_named_config(name)
    if config is not None:
        return config
    if ":" in name:
        module_name, class_name = name.rsplit(":", 1)
        module = importlib.import_module(module_name)
        cls = getattr(module, class_name, None)
        if cls is None or not (isinstance(cls, type)
                               and issubclass(cls, YoloxConfig)):
            raise ValueError(
                f"{name} is not a YoloxConfig subclass")
        return cls()
    raise ValueError(f"Unknown model config: {name}")


def parse_model_config_opts(opts: Optional[List[str]]) -> Dict[str, str]:
    out: Dict[str, str] = {}
    for opt in opts or []:
        if "=" not in opt:
            raise ValueError(
                f"Invalid -D option {opt!r}; expected key=value")
        k, v = opt.split("=", 1)
        out[k] = v
    return out
