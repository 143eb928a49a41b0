"""Postprocess/NMS parity: reference pipeline vs yolox_tpu on controlled inputs.

The reference path is `YoloxProcessor.postprocess` -> `utils.postprocess`
(conf filter + torchvision batched_nms) -> rescale
(`/root/reference/yolox/models/processor.py:39-54`, `yolox/utils/boxes.py:31-75`).
torchvision is absent here, so the oracle uses a clean-room torch
implementation of the documented torchvision NMS semantics
(tests/_reference_oracle.py) — independent of the JAX implementation under
test.

Synthetic decoded predictions give full control over overlaps, score spread,
and class collisions (a randomly initialized backbone yields degenerate
near-constant scores, see git history).
"""

import numpy as np
import pytest

from tests._reference_oracle import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not available")


class _FakeImage:
    def __init__(self, h, w):
        self.height = h
        self.width = w


def _synthetic_predictions(seed, batch, n_anchors, num_classes,
                           n_clusters=40):
    """Decoded (cx, cy, w, h, obj, cls...) with heavy real overlap.

    Boxes are drawn around a few cluster centers so NMS does real
    suppression; scores/classes spread over their full ranges.
    """
    rng = np.random.default_rng(seed)
    centers = rng.uniform(50, 590, (batch, n_clusters, 2))
    which = rng.integers(0, n_clusters, (batch, n_anchors))
    cxy = np.take_along_axis(
        centers, which[..., None].repeat(2, -1), axis=1
    ) + rng.normal(0, 12, (batch, n_anchors, 2))
    wh = rng.uniform(10, 120, (batch, n_anchors, 2))
    obj = rng.uniform(0, 1, (batch, n_anchors, 1)) ** 2
    cls = rng.uniform(0, 1, (batch, n_anchors, num_classes)) ** 4
    return np.concatenate([cxy, wh, obj, cls], axis=-1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("threshold", [0.25, 0.55])
def test_postprocess_parity(seed, threshold):
    import torch

    load_reference()
    from yolox.config import YoloxConfig as RefConfig
    from yolox.models.processor import YoloxProcessor as RefProcessor

    from yolox_tpu import YoloxConfig, YoloxProcessor

    num_classes = 80
    preds = _synthetic_predictions(seed, 3, 2000, num_classes)
    images = [_FakeImage(480, 640), _FakeImage(640, 480), _FakeImage(333, 500)]

    ref_proc = RefProcessor(RefConfig.get_named_config("yolox_s"))
    ref_dets = ref_proc.postprocess(
        images, torch.from_numpy(preds.copy()), threshold=threshold)

    our_proc = YoloxProcessor(YoloxConfig.get_named_config("yolox_s"))
    our_dets = our_proc.postprocess(images, preds, threshold=threshold)

    for r, o in zip(ref_dets, our_dets):
        assert len(r["labels"]) > 0, "degenerate test: no detections"
        assert o["labels"] == r["labels"]
        np.testing.assert_allclose(
            np.array(o["scores"]), np.array(r["scores"]), atol=1e-4)
        np.testing.assert_allclose(
            np.array(o["bboxes"]), np.array(r["bboxes"]), atol=1e-2)


def test_class_agnostic_nms_parity():
    import torch

    load_reference()
    from yolox.utils import postprocess as ref_postprocess

    from yolox_tpu.ops.nms import postprocess_device

    preds = _synthetic_predictions(7, 2, 1500, 80)
    ref_out = ref_postprocess(
        torch.from_numpy(preds.copy()), 80, conf_thre=0.3, nms_thre=0.65,
        class_agnostic=True)
    dets, valid = postprocess_device(
        preds, 80, conf_thre=0.3, nms_thre=0.65, class_agnostic=True)
    for i in range(2):
        ref_rows = ref_out[i].numpy()
        our_rows = np.asarray(dets[i])[np.asarray(valid[i])]
        assert ref_rows.shape == our_rows.shape
        np.testing.assert_allclose(our_rows, ref_rows, atol=1e-4)


def test_preproc_matches_reference():
    import glob

    from PIL import Image

    load_reference()
    from yolox.data.data_augment import ValTransform

    from yolox_tpu.ops.preproc import preproc

    vt = ValTransform(legacy=False)
    for path in sorted(glob.glob("/root/reference/tests/data/*.jpg")):
        img = np.array(Image.open(path))
        ref_img, _ = vt(img, None, (640, 640))          # CHW
        ours, r = preproc(img, (640, 640))               # HWC
        np.testing.assert_array_equal(ours.transpose(2, 0, 1), ref_img)


def _greedy_nms_np(boxes, scores, thr):
    """Reference-textbook greedy NMS (score-sorted input)."""
    n = len(scores)
    keep = np.ones(n, bool)
    x1, y1, x2, y2 = boxes.T
    area = (x2 - x1) * (y2 - y1)
    for i in range(n):
        if not keep[i]:
            continue
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / (area[i] + area - inter + 1e-16)
        keep &= ~((iou > thr) & (np.arange(n) > i))
    return keep


@pytest.mark.parametrize("thr", [0.1, 0.5, 0.9])
def test_fixpoint_nms_exact_on_dense_overlaps(thr):
    """The while-loop fixpoint formulation must equal sequential greedy
    even on adversarially dense suppression chains."""
    import jax.numpy as jnp

    from yolox_tpu.ops.nms import nms_fixed

    rng = np.random.default_rng(7)
    for _ in range(10):
        k = 256
        cx, cy = rng.uniform(50, 200, (2, k))  # dense -> deep chains
        w, h = rng.uniform(20, 160, (2, k))
        boxes = np.stack(
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1
        ).astype(np.float32)
        scores = np.sort(rng.random(k).astype(np.float32))[::-1].copy()
        ref = _greedy_nms_np(boxes, scores, thr)
        got = np.asarray(nms_fixed(
            jnp.asarray(boxes), jnp.asarray(scores), float(thr)))
        np.testing.assert_array_equal(got, ref)


def test_postprocess_fused_matches_unfused_f32():
    """postprocess_fused (select-then-decode) must be bitwise identical to
    postprocess_device (decode-then-select) when everything is f32."""
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.ops.nms import postprocess_device, postprocess_fused

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = YoloxModule.from_config(cfg)
    x = jnp.asarray(np.random.default_rng(3).uniform(
        0, 255, (2, 416, 416, 3)), jnp.float32)

    dets_a, va = postprocess_device(module(x), 80, 1e-5, 0.65, False, 256)
    fpn = module.backbone(module.params["backbone"], x)
    raw, grid, stride = module.head.forward_raw(module.params["head"], fpn)
    dets_b, vb = postprocess_fused(raw, grid, stride, 80, 1e-5, 0.65,
                                   False, 256)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    m = np.asarray(va)
    np.testing.assert_array_equal(np.asarray(dets_a)[m], np.asarray(dets_b)[m])

    dets_c, vc = module.serve(module.params, x, conf_thre=1e-5)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vc))


def test_sharded_serving_matches_single_device():
    """Data-parallel serving over the virtual mesh == single-device serve."""
    import jax
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.parallel.mesh import data_parallel_mesh

    n = min(8, jax.device_count())
    assert n >= 2
    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = YoloxModule.from_config(cfg)
    x = jnp.asarray(np.random.default_rng(5).uniform(
        0, 255, (n, 128, 128, 3)), jnp.float32)

    single = module.make_serving_fn(conf_thre=1e-5, max_det=64)
    dets1, v1 = single(module.params, x)

    mesh = data_parallel_mesh(n)
    sharded = module.make_serving_fn(mesh=mesh, conf_thre=1e-5, max_det=64)
    detsn, vn = sharded(module.params, x)

    np.testing.assert_array_equal(np.asarray(v1), np.asarray(vn))
    np.testing.assert_allclose(np.asarray(dets1), np.asarray(detsn),
                               rtol=1e-6, atol=1e-6)


def test_spatial_serving_matches_single_device():
    """Spatially-partitioned serving (image H sharded over the 'space'
    mesh axis, GSPMD halo exchange at slab borders) == single-device
    serve — including batch 1, where data parallelism cannot help."""
    import jax
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.parallel.mesh import serving_mesh

    assert jax.device_count() >= 8
    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = YoloxModule.from_config(cfg)

    for n_data, n_space, batch in [(1, 8, 1), (2, 4, 2), (4, 2, 4)]:
        x = jnp.asarray(np.random.default_rng(7).uniform(
            0, 255, (batch, 128, 128, 3)), jnp.float32)
        single = module.make_serving_fn(conf_thre=1e-5, max_det=64)
        dets1, v1 = single(module.params, x)

        mesh = serving_mesh(n_data, n_space)
        sharded = module.make_serving_fn(
            mesh=mesh, conf_thre=1e-5, max_det=64)
        detsn, vn = sharded(module.params, x)

        np.testing.assert_array_equal(
            np.asarray(v1), np.asarray(vn), err_msg=f"{n_data}x{n_space}")
        np.testing.assert_allclose(
            np.asarray(dets1), np.asarray(detsn), rtol=1e-6, atol=1e-5,
            err_msg=f"{n_data}x{n_space}")


def test_yolox_stream_matches_call():
    """Yolox.stream (pipelined batch serving) must yield exactly
    __call__'s detections, in input order, including the ragged
    power-of-two-padded tail batch."""
    from PIL import Image

    from yolox_tpu import Yolox, YoloxConfig, YoloxModule, YoloxProcessor

    cfg = YoloxConfig.get_named_config("yolox_nano")
    cfg.test_size = (64, 64)
    model = Yolox(YoloxModule.from_config(cfg), YoloxProcessor(cfg))

    rng = np.random.default_rng(11)
    imgs = [Image.fromarray(rng.integers(0, 255, (80, 100, 3),
                                         dtype=np.uint8)) for _ in range(5)]
    want = model(imgs, threshold=1e-5)
    got = list(model.stream(iter(imgs), threshold=1e-5, batch_size=2))
    assert len(got) == 5                       # batches 2, 2, 1 (tail)
    # label equality across the batch-8 (__call__) and batch-2/1 (stream)
    # compiled graphs relies on the conftest-pinned CPU platform + fixed
    # seed: same-platform XLA recompiles are deterministic here. On TPU,
    # batch-shape-dependent layouts could flip near-threshold candidates.
    for a, b in zip(got, want):
        assert a["labels"] == b["labels"]
        np.testing.assert_allclose(np.asarray(a["bboxes"]),
                                   np.asarray(b["bboxes"]),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(a["scores"]),
                                   np.asarray(b["scores"]), atol=1e-6)


def test_fused_payload_promotes_past_bf16_exactness():
    """The (B, A, 10) candidate payload stores integer-valued columns
    (class id, grid coords, stride); bf16 only represents integers up to
    256, so configs past that bound must promote the table to f32 —
    class ids above 255 and grid coords above 256 round otherwise."""
    import jax.numpy as jnp

    from yolox_tpu.models.head import exact_int_bound, level_grid
    from yolox_tpu.ops.nms import _score_and_payload

    assert exact_int_bound(jnp.bfloat16) == 256
    assert exact_int_bound(jnp.float32) == 2 ** 24

    rng = np.random.default_rng(3)
    nc = 300  # > 257 classes: class id column needs f32
    outs = jnp.asarray(rng.uniform(0, 1, (2, 64, 5 + nc)), jnp.bfloat16)
    grid = level_grid(8, 8, jnp.bfloat16)
    stride = jnp.full((64, 1), 8, jnp.bfloat16)
    masked, tbl = _score_and_payload(outs, grid, stride, nc, 0.01)
    assert tbl.dtype == jnp.float32
    assert masked.dtype == jnp.bfloat16
    cls = np.asarray(
        jnp.argmax(outs[..., 5:5 + nc].astype(jnp.float32), axis=-1))
    np.testing.assert_array_equal(np.asarray(tbl[..., 6]), cls)

    # > 2048 px input (grid coord > 256): level_grid refuses bf16
    big = level_grid(1, 300, jnp.bfloat16)
    assert big.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(big[:, 0]), np.arange(300))
    # and the payload follows the promoted grid even for few classes
    outs80 = jnp.asarray(rng.uniform(0, 1, (1, 300, 85)), jnp.bfloat16)
    _, tbl80 = _score_and_payload(
        outs80, big, jnp.full((300, 1), 8, jnp.bfloat16), 80, 0.01)
    assert tbl80.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(tbl80[0, :, 7]),
                                  np.arange(300))

    # default envelope stays bf16 (no traffic regression)
    g = level_grid(80, 80, jnp.bfloat16)
    outs_def = jnp.asarray(rng.uniform(0, 1, (1, 6400, 85)), jnp.bfloat16)
    _, tbl_def = _score_and_payload(
        outs_def, g, jnp.full((6400, 1), 8, jnp.bfloat16), 80, 0.01)
    assert tbl_def.dtype == jnp.bfloat16


def test_serve_accepts_uint8():
    import jax.numpy as jnp

    from yolox_tpu import YoloxConfig, YoloxModule

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = YoloxModule.from_config(cfg)
    xu8 = np.random.default_rng(4).integers(
        0, 255, (1, 128, 128, 3), dtype=np.uint8)
    d1, v1 = module.serve(module.params, jnp.asarray(xu8), conf_thre=1e-5)
    d2, v2 = module.serve(module.params,
                          jnp.asarray(xu8, jnp.float32), conf_thre=1e-5)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_yolox_call_batch_padding():
    """Yolox.__call__ zero-pads to the next power-of-two batch (bounded
    compile count for variable request sizes); results are identical to
    the exact-size batch and padded rows never leak into the output."""
    from PIL import Image

    from yolox_tpu import Yolox, YoloxConfig, YoloxModule, YoloxProcessor

    cfg = YoloxConfig.get_named_config("yolox_nano")
    cfg.test_size = (64, 64)
    model = Yolox(YoloxModule.from_config(cfg), YoloxProcessor(cfg))

    rng = np.random.default_rng(9)
    imgs = [Image.fromarray(rng.integers(0, 255, (96, 128, 3),
                                         dtype=np.uint8)) for _ in range(3)]
    got3 = model(imgs, threshold=1e-5)        # 3 -> padded to 4
    assert len(got3) == 3
    got2 = model(imgs[:2], threshold=1e-5)    # 2 == power of two, no pad
    for a, b in zip(got3[:2], got2):
        assert a["labels"] == b["labels"]
        np.testing.assert_allclose(np.asarray(a["bboxes"]),
                                   np.asarray(b["bboxes"]),
                                   rtol=1e-5, atol=1e-4)


def test_yolox_call_fused_equals_manual_pipeline():
    """Yolox.__call__ (fused serve path) must equal the manual
    module -> processor.postprocess pipeline in f32."""
    from PIL import Image

    from yolox_tpu import Yolox, YoloxConfig, YoloxModule, YoloxProcessor

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = YoloxModule.from_config(cfg)
    processor = YoloxProcessor(cfg)
    model = Yolox(module, processor)

    rng = np.random.default_rng(8)
    imgs = [Image.fromarray(rng.integers(0, 255, (240, 320, 3),
                                         dtype=np.uint8)) for _ in range(2)]
    got = model(imgs, threshold=1e-5)

    batch = processor(imgs)
    output = module(batch)
    want = processor.postprocess(imgs, output, threshold=1e-5)

    for g, w in zip(got, want):
        assert g["labels"] == w["labels"]
        np.testing.assert_allclose(g["scores"], w["scores"], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g["bboxes"]),
                                   np.asarray(w["bboxes"]), rtol=1e-5,
                                   atol=1e-4)
