"""Pallas NMS kernel vs the XLA formulation (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp


def _random_boxes(rng, k):
    cx, cy = rng.uniform(50, 500, (2, k))
    w, h = rng.uniform(20, 120, (2, k))
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                    axis=1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("thr", [0.3, 0.65])
def test_pallas_nms_matches_xla(seed, thr):
    from yolox_tpu.ops.nms import nms_fixed
    from yolox_tpu.ops.pallas_nms import nms_pallas

    rng = np.random.default_rng(seed)
    k = 256
    boxes = _random_boxes(rng, k)
    valid = rng.random(k) > 0.15
    ref = np.asarray(nms_fixed(
        jnp.asarray(boxes), None, thr, jnp.asarray(valid)))
    got = np.asarray(nms_pallas(
        jnp.asarray(boxes), None, thr, jnp.asarray(valid), interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_postprocess_with_pallas_flag():
    """postprocess_device(use_pallas=True) == default path (interpret-mode
    Pallas requires CPU; exercised on TPU separately)."""
    from yolox_tpu.ops import pallas_nms

    if not pallas_nms.pallas_available():
        pytest.skip("pallas path requires a TPU backend")
