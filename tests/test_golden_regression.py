"""Self-golden regression tests (reference test strategy §4 analog).

The reference pins hardcoded detections from pretrained weights
(`tests/test_detections.py`, requires network). These tests pin OUR
numerics instead: fixed-seed random weights + fixed input -> committed
golden outputs. They catch silent numeric drift in the conv stack, decode,
or NMS across refactors. Regenerate with:

    python -m tests.test_golden_regression  (writes tests/golden/*.npz)
"""

import os
import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _compute_golden():
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.ops.nms import postprocess_device

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = YoloxModule.from_config(cfg, rng_seed=1234)
    x = jnp.asarray(
        np.random.default_rng(99).uniform(0, 255, (2, 416, 416, 3)),
        jnp.float32)
    out = np.asarray(module(x))
    dets, valid = postprocess_device(
        jnp.asarray(out), 80, 1e-5, 0.65, False, 64)
    return {
        "head_slice": out[:, ::997, :],          # (2, 6, 85) spread sample
        "dets": np.asarray(dets),
        "valid": np.asarray(valid),
    }


def test_inference_matches_committed_golden():
    path = GOLDEN / "nano_seed1234.npz"
    if not path.exists():
        pytest.skip("golden file not committed yet — run this module as "
                    "a script to generate")
    want = np.load(path)
    got = _compute_golden()
    np.testing.assert_array_equal(got["valid"], want["valid"])
    # f32 conv stacks may reassociate across XLA versions: loose-ish tols
    np.testing.assert_allclose(got["head_slice"], want["head_slice"],
                               rtol=1e-4, atol=1e-3)
    m = want["valid"]
    np.testing.assert_allclose(got["dets"][m], want["dets"][m],
                               rtol=1e-4, atol=1e-2)


if __name__ == "__main__":
    # goldens are CPU-f32 (the env's JAX_PLATFORMS=cpu is unreliable under
    # the axon plugin — force via config, as tests/conftest.py does)
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN, exist_ok=True)
    np.savez(GOLDEN / "nano_seed1234.npz", **_compute_golden())
    print(f"wrote {GOLDEN / 'nano_seed1234.npz'}")
