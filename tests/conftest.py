"""Test configuration: run on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes — this conftest is imported before
any test module.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib  # noqa: E402

import pytest  # noqa: E402

TESTS_DIR = pathlib.Path(__file__).parent
GOLDEN_DIR = TESTS_DIR / "golden"


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR
