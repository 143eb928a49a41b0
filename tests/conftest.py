"""Test configuration: run on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes — this conftest is imported before
any test module.
"""

import os

# NOTE: the surrounding environment exports JAX_PLATFORMS=axon (a tunneled
# TPU) and plugin init can rewrite the env var, so an env override alone is
# unreliable — set the config explicitly after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

# Persistent XLA compilation cache: repeat suite runs skip LLVM codegen
# (the dominant cost on a 1-core host — e.g. the smoke-lane train step
# compiles in 42 s cold / 9 s warm).  Safe across processes (content-hash
# keyed files); bounded by the suite's own graph count.
_CACHE_DIR = pathlib.Path(__file__).parent / ".xla_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402

TESTS_DIR = pathlib.Path(__file__).parent
GOLDEN_DIR = TESTS_DIR / "golden"


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    from tests._synthetic_coco import build_synthetic_coco

    return build_synthetic_coco(tmp_path_factory.mktemp("coco"))
