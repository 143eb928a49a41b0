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


def configure_compilation_cache(cache_dir: str = None):
    """Enable JAX's persistent XLA compilation cache (idempotent; no-op
    if the user already configured one).

    Multiscale training compiles one step program per 32-aligned input
    size; with the cache, that minutes-scale cost is paid once per
    machine instead of once per run. Default location:
    $YOLOX_HOME/xla_cache.
    """
    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    if cache_dir is None:
        home = os.environ.get(
            "YOLOX_HOME", os.path.join(os.path.expanduser("~"),
                                       ".cache", "yolox"))
        cache_dir = os.path.join(home, "xla_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass


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
