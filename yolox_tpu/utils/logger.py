"""Logging setup — re-design of `/root/reference/yolox/utils/logger.py:81-113`.

The reference uses loguru with stdout/stderr redirection; we use the stdlib
logging module with the same surface: `setup_logger(save_dir, rank,
filename)` logs to stderr + file on rank 0 only.
"""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(asctime)s | %(levelname)s | %(name)s:%(lineno)d - %(message)s"

logger = logging.getLogger("yolox_tpu")


def setup_logger(save_dir: str = None, rank: int = 0,
                 filename: str = "log.txt", mode: str = "a"):
    """Configure the package logger. Rank-0 writes to stderr + file; other
    ranks are silenced (matching `logger.py:96-113`)."""
    root = logging.getLogger("yolox_tpu")
    root.handlers.clear()
    root.setLevel(logging.INFO)
    if rank != 0:
        root.addHandler(logging.NullHandler())
        root.propagate = False
        return root

    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(logging.Formatter(_FORMAT, datefmt="%Y-%m-%d %H:%M:%S"))
    root.addHandler(sh)

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        path = os.path.join(save_dir, filename)
        if mode == "o" and os.path.exists(path):
            os.remove(path)
        fh = logging.FileHandler(path)
        fh.setFormatter(
            logging.Formatter(_FORMAT, datefmt="%Y-%m-%d %H:%M:%S"))
        root.addHandler(fh)
    root.propagate = False
    return root
