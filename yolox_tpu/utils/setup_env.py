"""Environment setup — re-design of `/root/reference/yolox/utils/setup_env.py`.

The NCCL tuning knobs have no TPU analog (ICI needs no env configuration);
what carries over is taming cv2/OpenMP thread pools around the data workers
and raising the fd limit for many-worker loaders.
"""

from __future__ import annotations

import os


def configure_omp(num_threads: int = 1):
    """Pin OMP threads for data workers (`setup_env.py:26-46`)."""
    if "OMP_NUM_THREADS" not in os.environ:
        os.environ["OMP_NUM_THREADS"] = str(num_threads)


def configure_module(ulimit_value: int = 8192):
    """Raise RLIMIT_NOFILE and disable cv2 threading/OpenCL
    (`setup_env.py:49-75`)."""
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
        resource.setrlimit(resource.RLIMIT_NOFILE,
                           (min(ulimit_value, hard), hard))
    except Exception:
        pass
    try:
        import cv2

        cv2.setNumThreads(0)
        cv2.ocl.setUseOpenCL(False)
    except Exception:
        pass
