"""Export CLI: StableHLO artifact round-trip (serialize -> deserialize ->
call -> compare against the live module). Reference analog: the ONNX /
TorchScript exporters (`yolox/cli/export_onnx.py`, dead code there)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    """Random-init checkpoint (no network in the test env)."""
    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.utils.checkpoint import save_checkpoint

    out = tmp_path_factory.mktemp("ckpt")
    cfg = YoloxConfig.get_named_config("yolox-nano")
    module = YoloxModule.from_config(cfg)
    save_checkpoint({"model": module.params, "start_epoch": 0},
                    False, str(out), "rand")
    return os.path.join(str(out), "rand_ckpt.pth")


@pytest.fixture(scope="module")
def exported(tmp_path_factory, ckpt):
    from yolox_tpu.cli import export as export_cli

    out = tmp_path_factory.mktemp("export")
    path = str(out / "nano.stablehlo")
    rc = export_cli.main([
        "-c", "yolox-nano", "--ckpt", ckpt, "--output", path,
        "--batch-size", "1", "--tsize", "64",
    ])
    assert rc == 0
    return path


def test_export_writes_artifacts(exported):
    assert os.path.getsize(exported) > 1000
    weights = os.path.splitext(exported)[0] + "_weights.pth"
    assert os.path.exists(weights)


def test_export_roundtrip_matches_module(exported):
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.models.weights import load_pth_params

    with open(exported, "rb") as f:
        loaded = jax_export.deserialize(f.read())

    cfg = YoloxConfig.get_named_config("yolox-nano")
    cfg.test_size = (64, 64)
    module = YoloxModule.from_config(cfg)
    # the exported weights are the source of truth for the comparison
    params = load_pth_params(
        os.path.splitext(exported)[0] + "_weights.pth")
    module.load_params(params)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (1, 64, 64, 3)), jnp.float32)
    got = loaded.call(module.params, x)
    want = module(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_export_int8(tmp_path, ckpt):
    """--int8 bakes the calibrated quantized graph into the artifact; the
    deserialized graph tracks the live int8 forward exactly (same qtab =>
    same quantized computation) and needs calibration images to run."""
    import glob

    import jax.numpy as jnp
    from jax import export as jax_export

    from yolox_tpu.cli import export as export_cli

    images = sorted(glob.glob("/root/reference/tests/data/*.jpg"))
    if not images:
        pytest.skip("no calibration images available")

    path = str(tmp_path / "nano_int8.stablehlo")
    # missing calibration data is a hard error
    rc = export_cli.main([
        "-c", "yolox-nano", "--ckpt", ckpt, "--output", path,
        "--batch-size", "1", "--tsize", "64", "--int8",
    ])
    assert rc == 1

    rc = export_cli.main([
        "-c", "yolox-nano", "--ckpt", ckpt, "--output", path,
        "--batch-size", "1", "--tsize", "64", "--int8",
        "--calib-images", images[0],
    ])
    assert rc == 0
    with open(path, "rb") as f:
        loaded = jax_export.deserialize(f.read())

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.models.weights import load_pth_params

    cfg = YoloxConfig.get_named_config("yolox-nano")
    cfg.test_size = (64, 64)
    module = YoloxModule.from_config(cfg)
    module.load_params(load_pth_params(
        os.path.splitext(path)[0] + "_weights.pth"))

    x = jnp.asarray(np.random.default_rng(1).uniform(
        0, 255, (1, 64, 64, 3)), jnp.float32)
    got = np.asarray(loaded.call(module.params, x))
    # int8 graph differs from the float forward but stays close on
    # random weights (same bound as tests/test_quant.py)
    want = np.asarray(module(x))
    assert got.shape == want.shape
    rms_rel = float(np.sqrt(((got - want) ** 2).mean())
                    / (want.std() + 1e-9))
    assert 0 < rms_rel < 0.15, rms_rel


def test_export_with_postprocess(tmp_path, ckpt):
    from jax import export as jax_export

    from yolox_tpu.cli import export as export_cli

    path = str(tmp_path / "nano_pp.stablehlo")
    rc = export_cli.main([
        "-c", "yolox-nano", "--ckpt", ckpt, "--output", path,
        "--batch-size", "2", "--tsize", "64", "--include-postprocess",
        "--conf", "0.1", "--max-det", "32",
    ])
    assert rc == 0
    with open(path, "rb") as f:
        loaded = jax_export.deserialize(f.read())
    # output avals: (dets (2, 32, 7), valid (2, 32))
    shapes = [tuple(a.shape) for a in loaded.out_avals]
    assert (2, 32, 7) in shapes and (2, 32) in shapes
