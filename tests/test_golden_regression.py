"""Self-golden regression tests (reference test strategy §4 analog).

The reference pins hardcoded detections from pretrained weights across
six models (`/root/reference/tests/test_detections.py`, requires
network). These tests pin OUR numerics instead: fixed-seed random
weights + fixed input -> committed golden outputs. They catch silent
numeric drift in the conv stack, decode, or NMS across refactors.
Coverage (round-5 widening): nano (depthwise family), s (the headline
model), yolov3 (the legacy Darknet/YoloFpn head family), plus the
fused `serve()` graph for s with the space-to-depth stem fold both on
and off — so serving-graph refactors get caught by numerics, not just
throughput. Regenerate with:

    python -m tests.test_golden_regression  (writes tests/golden/*.npz)
"""

import os
import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"

# (config name, weight seed, input size, input seed)
SPECS = {
    "nano": ("yolox_nano", 1234, 416, 99),
    "s": ("yolox_s", 4321, 640, 98),
    "yolov3": ("yolov3", 777, 640, 97),
}


def _module_and_input(name):
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule

    cfg_name, wseed, size, xseed = SPECS[name]
    cfg = YoloxConfig.get_named_config(cfg_name)
    module = YoloxModule.from_config(cfg, rng_seed=wseed)
    x = jnp.asarray(
        np.random.default_rng(xseed).uniform(0, 255, (2, size, size, 3)),
        jnp.float32)
    return module, x


def _compute_golden(name):
    import jax.numpy as jnp

    from yolox_tpu.ops.nms import postprocess_device

    module, x = _module_and_input(name)
    out = np.asarray(module(x))
    dets, valid = postprocess_device(
        jnp.asarray(out), 80, 1e-5, 0.65, False, 64)
    return {
        "head_slice": out[:, ::997, :],          # (2, ~, 85) spread sample
        "dets": np.asarray(dets),
        "valid": np.asarray(valid),
    }


def _compute_serve_golden():
    """Fused serve() graph goldens for yolox-s, s2d stem on and off."""
    import jax

    module, x = _module_and_input("s")
    out = {}
    for tag, flag in (("s2d_on", True), ("s2d_off", False)):
        dets, valid = jax.jit(
            lambda p, xx, f=flag: module.serve(
                p, xx, conf_thre=1e-5, max_det=64, stem_s2d=f)
        )(module.params, x)
        out[f"dets_{tag}"] = np.asarray(dets)
        out[f"valid_{tag}"] = np.asarray(valid)
    return out


def _golden_path(name):
    return GOLDEN / f"{name}_seed{SPECS[name][1]}.npz"


@pytest.mark.parametrize("name", list(SPECS))
def test_inference_matches_committed_golden(name):
    path = _golden_path(name)
    if not path.exists():
        pytest.skip("golden file not committed yet — run this module as "
                    "a script to generate")
    want = np.load(path)
    got = _compute_golden(name)
    np.testing.assert_array_equal(got["valid"], want["valid"])
    # f32 conv stacks may reassociate across XLA versions: loose-ish tols
    np.testing.assert_allclose(got["head_slice"], want["head_slice"],
                               rtol=1e-4, atol=1e-3)
    m = want["valid"]
    np.testing.assert_allclose(got["dets"][m], want["dets"][m],
                               rtol=1e-4, atol=1e-2)


def test_serve_graph_matches_committed_golden():
    path = GOLDEN / "s_serve_seed4321.npz"
    if not path.exists():
        pytest.skip("golden file not committed yet — run this module as "
                    "a script to generate")
    want = np.load(path)
    got = _compute_serve_golden()
    for tag in ("s2d_on", "s2d_off"):
        np.testing.assert_array_equal(
            got[f"valid_{tag}"], want[f"valid_{tag}"], err_msg=tag)
        m = want[f"valid_{tag}"]
        np.testing.assert_allclose(
            got[f"dets_{tag}"][m], want[f"dets_{tag}"][m],
            rtol=1e-4, atol=1e-2, err_msg=tag)


if __name__ == "__main__":
    # goldens are CPU-f32 (the env's JAX_PLATFORMS=cpu is unreliable under
    # the axon plugin — force via config, as tests/conftest.py does)
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN, exist_ok=True)
    for name in SPECS:
        np.savez(_golden_path(name), **_compute_golden(name))
        print(f"wrote {_golden_path(name)}")
    np.savez(GOLDEN / "s_serve_seed4321.npz", **_compute_serve_golden())
    print(f"wrote {GOLDEN / 's_serve_seed4321.npz'}")
