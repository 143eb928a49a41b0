"""Device-side augmentation vs the host cv2 pipeline.

Exactness bars: warp_affine vs cv2.warpAffine within fixed-point bilinear
tolerance; mosaic geometry = the reference paste formulas on identical
draws; labels always consistent with where the pixels actually land.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _checker(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


def test_warp_affine_matches_cv2():
    import cv2

    from yolox_tpu.data.device_augment import warp_affine

    img = _checker(120, 160)
    for seed in range(4):
        rng = np.random.default_rng(seed)
        ang = rng.uniform(-30, 30)
        scale = rng.uniform(0.5, 1.5)
        m = cv2.getRotationMatrix2D((0, 0), ang, scale)
        m[:, 2] = rng.uniform(-30, 30, 2)
        want = cv2.warpAffine(img, m, dsize=(96, 80),
                              borderValue=(114, 114, 114)).astype(np.float32)
        got = np.asarray(warp_affine(
            jnp.asarray(img), jnp.asarray(m, jnp.float32), (80, 96)))
        # cv2 uses 5-bit fixed-point bilinear; border pixels can blend
        # content with the 114 constant differently — compare the interior
        # agreement rate and value error where both sampled content
        close = np.abs(got - want) <= 6.0
        assert close.mean() > 0.97, (seed, close.mean())


def test_mosaic_geometry_matches_reference_formula():
    """Host mosaic_geometry and device _mosaic_geometry both reproduce the
    reference's get_mosaic_coordinate on random sizes (parity oracle)."""
    from tests._reference_oracle import load_reference, reference_available

    from yolox_tpu.data.datasets.mosaicdetection import mosaic_geometry
    from yolox_tpu.data.device_augment import _mosaic_geometry

    if not reference_available():
        pytest.skip("/root/reference not present")
    load_reference()
    from yolox.data.datasets.mosaicdetection import get_mosaic_coordinate

    rng = np.random.default_rng(1)
    s = 64
    for _ in range(20):
        hw = rng.integers(16, 65, (4, 2)).astype(np.float32)
        xc = int(rng.integers(32, 97))
        yc = int(rng.integers(32, 97))
        paste_d, offset_d = _mosaic_geometry(
            jnp.asarray(hw), float(xc), float(yc), float(s), float(s))
        paste_h, shift_h = mosaic_geometry(hw, xc, yc, s, s)
        for i in range(4):
            (x1, y1, x2, y2), (sx1, sy1, _, _) = get_mosaic_coordinate(
                None, i, xc, yc, int(hw[i, 1]), int(hw[i, 0]), s, s)
            want_paste = [x1, y1, x2, y2]
            want_shift = [x1 - sx1, y1 - sy1]
            np.testing.assert_allclose(
                np.asarray(paste_d[i]), want_paste, err_msg=f"device {i}")
            np.testing.assert_allclose(
                np.asarray(offset_d[i]), want_shift, err_msg=f"device {i}")
            np.testing.assert_array_equal(
                paste_h[i], want_paste, err_msg=f"host {i}")
            np.testing.assert_array_equal(
                shift_h[i], want_shift, err_msg=f"host {i}")


def test_mosaic_identity_affine_places_tiles():
    """With the identity affine shifted to view the canvas TL quadrant,
    output pixels must equal the source tile pixels at the right spots."""
    from yolox_tpu.data.device_augment import mosaic_warp

    s = 64
    tiles = np.zeros((4, s, s, 3), np.uint8)
    for i in range(4):
        tiles[i] = (i + 1) * 50
    hw = np.full((4, 2), s, np.float32)
    xc, yc = 64.0, 64.0  # center at (s, s): all quadrants fully covered
    # affine = crop the canvas window [32, 32+64) (center region)
    m = np.array([[1.0, 0, -32.0], [0, 1.0, -32.0]], np.float32)
    out = np.asarray(mosaic_warp(
        jnp.asarray(tiles), jnp.asarray(hw), jnp.asarray(m), xc, yc,
        (s, s)))
    # output pixel (0,0) <- canvas (32,32): quadrant TL -> tile 0
    assert np.allclose(out[0, 0], 50)
    # output pixel (63, 63) <- canvas (95, 95): BR -> tile 3
    assert np.allclose(out[60, 60], 200)
    # (0, 63) <- canvas (95, 32): TR tile 1; (63, 0) -> BL tile 2
    assert np.allclose(out[0, 60], 100)
    assert np.allclose(out[60, 0], 150)


def test_device_augment_batch_labels_on_content():
    """End-to-end: boxes returned must sit on actual (non-pad) content."""
    from yolox_tpu.data.device_augment import device_augment_batch

    s = 96
    b = 4
    rng = np.random.default_rng(3)
    tiles = np.zeros((b, 5, s, s, 3), np.uint8)
    tile_hw = np.zeros((b, 5, 2), np.float32)
    labels = np.zeros((b, 5, 8, 5), np.float32)
    for bi in range(b):
        for ti in range(5):
            h = int(rng.integers(48, s + 1))
            w = int(rng.integers(48, s + 1))
            tiles[bi, ti, :h, :w] = rng.integers(
                60, 255, (h, w, 3), dtype=np.uint8)
            tile_hw[bi, ti] = (h, w)
            labels[bi, ti, 0] = [8.0, 8.0, w - 8.0, h - 8.0,
                                 float(rng.integers(0, 80))]

    imgs, out_labels = device_augment_batch(
        jnp.asarray(tiles), jnp.asarray(tile_hw), jnp.asarray(labels),
        jax.random.PRNGKey(0), out_size=(s, s), max_labels=16)
    imgs = np.asarray(imgs)
    out_labels = np.asarray(out_labels)
    assert imgs.shape == (b, s, s, 3) and out_labels.shape == (b, 16, 5)
    assert np.isfinite(imgs).all() and (imgs >= 0).all() \
        and (imgs <= 255).all()

    n_with_labels = 0
    for bi in range(b):
        rows = out_labels[bi]
        live = rows[np.abs(rows).sum(1) > 0]
        # an aggressive affine can clip out every label (reference
        # behavior too) — but not for most of the batch
        n_with_labels += bool(len(live))
        for cls, cx, cy, w, h in live:
            assert 0 <= cx <= s and 0 <= cy <= s and w > 1 and h > 1
            # the box region must contain some non-114 content
            x1 = int(max(cx - w / 2, 0)); x2 = int(min(cx + w / 2, s))
            y1 = int(max(cy - h / 2, 0)); y2 = int(min(cy + h / 2, s))
            region = imgs[bi, y1:y2, x1:x2]
            assert (np.abs(region - 114.0) > 5).mean() > 0.1, (bi, cls)
    assert n_with_labels >= b // 2


def test_device_augment_deterministic():
    from yolox_tpu.data.device_augment import device_augment_batch

    s = 64
    rng = np.random.default_rng(5)
    tiles = rng.integers(0, 255, (2, 5, s, s, 3), dtype=np.uint8)
    hw = np.full((2, 5, 2), s, np.float32)
    labels = np.zeros((2, 5, 4, 5), np.float32)
    labels[..., 0, :] = [4, 4, 40, 40, 1]
    args = (jnp.asarray(tiles), jnp.asarray(hw), jnp.asarray(labels))
    a1, l1 = device_augment_batch(*args, jax.random.PRNGKey(7),
                                  out_size=(s, s), max_labels=8)
    a2, l2 = device_augment_batch(*args, jax.random.PRNGKey(7),
                                  out_size=(s, s), max_labels=8)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    a3, _ = device_augment_batch(*args, jax.random.PRNGKey(8),
                                 out_size=(s, s), max_labels=8)
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


@pytest.mark.parametrize("px", [1, 3])
def test_shear_reference_matches_numpy(px):
    from yolox_tpu.ops.pallas_warp import shear_x_reference

    rng = np.random.default_rng(0)
    b, h, w, out_w = 2, 32, 128, 64
    img = rng.uniform(0, 255, (b, h, w * px)).astype(np.float32)
    shifts = rng.uniform(1.0, 60.0, (b, h)).astype(np.float32)
    got = np.asarray(shear_x_reference(
        jnp.asarray(img), jnp.asarray(shifts), out_w, px=px))
    imp = img.reshape(b, h, w, px)
    gop = got.reshape(b, h, out_w, px)
    for bi in range(b):
        for i in range(h):
            s = shifts[bi, i]
            k, f = int(np.floor(s)), s - np.floor(s)
            want = imp[bi, i, k:k + out_w] * (1 - f) \
                + imp[bi, i, k + 1:k + 1 + out_w] * f
            np.testing.assert_allclose(gop[bi, i], want, rtol=1e-5,
                                       atol=1e-3)


def test_mosaic_affine_warp_exact_on_integer_transform():
    """With an integer pure-translation affine, the multi-pass engine is
    exact: compare against the gather-based reference warp."""
    from yolox_tpu.data.device_augment import mosaic_warp
    from yolox_tpu.ops.pallas_warp import mosaic_affine_warp

    s = 64
    rng = np.random.default_rng(2)
    tiles = np.zeros((1, 4, s, s, 3), np.uint8)
    hw = np.zeros((1, 4, 2), np.float32)
    for t in range(4):
        h = int(rng.integers(40, s + 1)); w = int(rng.integers(40, s + 1))
        tiles[0, t, :h, :w] = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        hw[0, t] = (h, w)
    xc, yc = 70.0, 58.0
    m = np.array([[1.0, 0.0, -17.0], [0.0, 1.0, -23.0]], np.float32)

    got = np.asarray(mosaic_affine_warp(
        jnp.asarray(tiles), jnp.asarray(hw), jnp.asarray(m)[None],
        jnp.asarray([xc]), jnp.asarray([yc]), (s, s)))[0]
    want = np.asarray(mosaic_warp(
        jnp.asarray(tiles[0]), jnp.asarray(hw[0]), jnp.asarray(m),
        xc, yc, (s, s)))
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_mosaic_affine_warp_close_on_general_affine():
    """General rotation/scale/shear: the 3-pass engine differs from
    single-pass bilinear only by interpolation order — compare on smooth
    content with a tight tolerance."""
    from yolox_tpu.data.device_augment import mosaic_warp
    from yolox_tpu.ops.pallas_warp import mosaic_affine_warp

    s = 64
    xc, yc = 64.0, 64.0
    # tiles crafted so the assembled canvas is a globally smooth gradient
    # (content continuous across quadrant boundaries; multi-pass and
    # single-pass interpolation then agree except at the outer border)
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    tiles = np.zeros((1, 4, s, s, 3), np.uint8)
    for t, (ox, oy) in enumerate([(0, 0), (64, 0), (0, 64), (64, 64)]):
        cx_, cy_ = xx + ox, yy + oy
        tiles[0, t] = np.stack(
            [cx_ * 1.5, cy_ * 1.5, (cx_ + cy_) * 0.75], -1).astype(np.uint8)
    hw = np.full((1, 4, 2), s, np.float32)
    ang = np.deg2rad(8.0)
    sc = 1.3
    m = np.array([
        [np.cos(ang) * sc, np.sin(ang) * sc, -40.0],
        [-np.sin(ang) * sc, np.cos(ang) * sc, -30.0],
    ], np.float32)

    got = np.asarray(mosaic_affine_warp(
        jnp.asarray(tiles), jnp.asarray(hw), jnp.asarray(m)[None],
        jnp.asarray([xc]), jnp.asarray([yc]), (s, s)))[0]
    want = np.asarray(mosaic_warp(
        jnp.asarray(tiles[0]), jnp.asarray(hw[0]), jnp.asarray(m),
        xc, yc, (s, s)))
    # agree where both sample content or both sample the 114 border;
    # the 1px frontier can differ by interpolation-order effects
    close = np.abs(got - want) <= 3.0
    assert close.mean() > 0.98, close.mean()


def test_folded_flip_is_a_mirror():
    """The TrainTransform flip is folded into the image producers'
    sample coordinates. Invariants: the plain (non-mosaic) path is a
    BIT-EXACT mirror; labels mirror exactly (ow - x convention, as the
    reference's _mirror); the mosaic path mirrors up to the engine's
    multi-pass interpolation variance."""
    from yolox_tpu.data.device_augment import device_augment_batch

    s = 64
    rng = np.random.default_rng(5)
    tiles = rng.integers(0, 255, (2, 5, s, s, 3), dtype=np.uint8)
    hw = np.full((2, 5, 2), s, np.float32)
    labels = np.zeros((2, 5, 4, 5), np.float32)
    labels[..., 0, :] = [4, 4, 40, 40, 1]
    args = (jnp.asarray(tiles), jnp.asarray(hw), jnp.asarray(labels))
    key = jax.random.PRNGKey(7)

    common = dict(out_size=(s, s), max_labels=8, hsv_prob=0.0,
                  mixup_prob=0.0)
    a_f, l_f = device_augment_batch(*args, key, mosaic_prob=0.0,
                                    flip_prob=1.0, **common)
    a_n, l_n = device_augment_batch(*args, key, mosaic_prob=0.0,
                                    flip_prob=0.0, **common)
    np.testing.assert_array_equal(
        np.asarray(a_f), np.asarray(a_n)[:, :, ::-1])
    lf, ln = np.asarray(l_f[0, 0]), np.asarray(l_n[0, 0])
    assert lf[1] == s - ln[1] and (lf[2:] == ln[2:]).all()

    b_f, _ = device_augment_batch(*args, key, mosaic_prob=1.0,
                                  flip_prob=1.0, **common)
    b_n, _ = device_augment_batch(*args, key, mosaic_prob=1.0,
                                  flip_prob=0.0, **common)
    d = np.abs(np.asarray(b_f) - np.asarray(b_n)[:, :, ::-1])
    assert d.mean() < 3.0 and np.median(d) < 1.0


def test_bf16_resample_deviation_bounded():
    """The TPU path runs the interpolation matmuls in bf16 (docstring
    claims O(1) pixel LSB deviation); bound it on CPU by running the same
    call with compute_dtype=bfloat16 vs float32."""
    from yolox_tpu.ops.pallas_warp import mixup_resample, scale_resample_tiles

    rng = np.random.default_rng(7)
    t = 64
    tiles = jnp.asarray(
        rng.integers(0, 255, (4, t, t, 3), dtype=np.uint8))
    tile_hw = jnp.asarray(
        rng.integers(32, t + 1, (4, 2)).astype(np.float32))
    offsets = jnp.asarray(rng.uniform(0, 40, (4, 2)).astype(np.float32)
                          .round())
    xs = jnp.asarray(np.linspace(-5.0, 120.0, 96, dtype=np.float32))
    ys = jnp.asarray(np.linspace(-3.0, 110.0, 96, dtype=np.float32))

    out = {}
    for dt in (jnp.float32, jnp.bfloat16):
        out[dt] = np.asarray(scale_resample_tiles(
            tiles, tile_hw, offsets, xs, ys, (128, 128),
            compute_dtype=dt))
    # pixel values 0..255 are exact in bf16; the weights round to ~2^-9
    # relative, so each of the <=4 contributing taps moves by <=255*2^-8
    # with f32 accumulation -> a few LSB worst case
    dev = np.abs(out[jnp.float32] - out[jnp.bfloat16]).max()
    assert dev <= 4.0, dev

    # mixup_resample picks its compute dtype via _use_pallas(); force the
    # bf16 branch (its single pass is pure XLA, no Pallas kernel) and
    # compare against the CPU f32 branch on identical geometry
    from yolox_tpu.ops import pallas_warp

    p_tile = tiles[0]
    p_hw = tile_hw[0]
    for flips in ((False, False), (True, True)):
        call = lambda: mixup_resample(  # noqa: E731
            p_tile, p_hw, jnp.float32(1.3), flips[0],
            jnp.float32(4.0), jnp.float32(2.0), (96, 96),
            out_flip=flips[1])
        f32 = np.asarray(call())
        orig = pallas_warp._use_pallas
        pallas_warp._use_pallas = lambda: True
        try:
            b16 = np.asarray(call())
        finally:
            pallas_warp._use_pallas = orig
        dev = np.abs(f32 - b16).max()
        assert dev <= 4.0, dev
