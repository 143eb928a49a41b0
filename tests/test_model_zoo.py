"""Model zoo surface: yolov3 variant, build factories, demo CLI, viz."""

import os

import numpy as np
import pytest

from tests._reference_oracle import load_reference, reference_available


def test_yolov3_eval_forward_parity():
    """Full yolov3 (Darknet-53 YoloFpn + decoupled lrelu head) vs torch."""
    if not reference_available():
        pytest.skip("/root/reference not available")
    import torch

    load_reference()
    from yolox.models import YoloPafpn  # noqa: F401  (package import check)
    from yolox.models.yolo_fpn import YoloFpn as TorchYoloFpn
    from yolox.models.yolo_head import YoloxHead as TorchHead
    from yolox.models.yolox import YoloxModule as TorchModule

    torch.manual_seed(4)
    tmodel = TorchModule(
        TorchYoloFpn(depth=21),  # same block types as depth-53, faster
        TorchHead(80, 1.0, in_channels=[128, 256, 512], act="lrelu"))
    for m in tmodel.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eps = 1e-3
            m.momentum = 0.03
    tmodel.eval()
    tmodel.head.training = False
    tmodel.training = False

    x = np.random.default_rng(9).uniform(
        0, 255, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x)).numpy()

    from yolox_tpu.models.head import YoloxHead
    from yolox_tpu.models.weights import state_dict_to_pytree
    from yolox_tpu.models.yolo_fpn import YoloFpn
    from yolox_tpu.models.yolox import YoloxModule

    module = YoloxModule(
        YoloFpn(depth=21),
        YoloxHead(80, 1.0, in_channels=(128, 256, 512), act="lrelu"))
    module.params = state_dict_to_pytree(tmodel.state_dict())
    out = np.asarray(module(x.transpose(0, 2, 3, 1)))
    rel = np.abs(out - ref_out) / (np.abs(ref_out) + 1.0)
    assert rel.max() < 1e-4


def test_yolov3_named_config_builds():
    from yolox_tpu import YoloxConfig

    cfg = YoloxConfig.get_named_config("yolov3")
    module = cfg.get_model()
    out = module(np.zeros((1, 64, 64, 3), np.float32))
    assert out.shape == (1, 8 * 8 + 4 * 4 + 2 * 2, 85)


def test_create_yolox_model_unpretrained():
    from yolox_tpu.models.build import create_yolox_model

    module = create_yolox_model("yolox-nano", pretrained=False,
                                num_classes=5)
    out = module(np.zeros((1, 64, 64, 3), np.float32))
    assert out.shape == (1, 84, 10)


def test_demo_cli_image(tmp_path):
    """Drive `yolox-tpu demo image` end to end with a saved checkpoint."""
    import cv2

    from yolox_tpu import YoloxConfig
    from yolox_tpu.cli import main
    from yolox_tpu.models.weights import save_pth_params

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = cfg.get_model()
    ckpt = tmp_path / "nano.pth"
    save_pth_params(module.params, ckpt)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    cv2.imwrite(str(img_dir / "a.jpg"),
                rng.integers(0, 255, (240, 320, 3), dtype=np.uint8))

    out_dir = tmp_path / "outputs"
    rc = main([
        "demo", "image", "-c", "yolox-nano", "--path", str(img_dir),
        "--ckpt", str(ckpt), "--conf", "1e-6", "--save_result",
        "--output-dir", str(out_dir),
    ])
    assert rc == 0
    assert (out_dir / "a.jpg").exists()
    drawn = cv2.imread(str(out_dir / "a.jpg"))
    assert drawn is not None and drawn.shape == (240, 320, 3)


def test_demo_cli_image_int8(tmp_path):
    """`demo image --int8` calibrates on the first input and serves the
    quantized graph end to end."""
    import cv2

    from yolox_tpu import YoloxConfig
    from yolox_tpu.cli import main
    from yolox_tpu.models.weights import save_pth_params

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = cfg.get_model()
    ckpt = tmp_path / "nano.pth"
    save_pth_params(module.params, ckpt)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"), np.random.default_rng(1).integers(
        0, 255, (240, 320, 3), dtype=np.uint8))

    out_dir = tmp_path / "outputs"
    rc = main([
        "demo", "image", "-c", "yolox-nano", "--path", str(img_dir),
        "--ckpt", str(ckpt), "--conf", "1e-6", "--int8", "--save_result",
        "--output-dir", str(out_dir),
    ])
    assert rc == 0
    assert (out_dir / "a.jpg").exists()


def test_demo_cli_video(tmp_path):
    """Drive `yolox-tpu demo video` end to end: the pipelined stream must
    annotate every frame in order and write a decodable video."""
    import cv2

    from yolox_tpu import YoloxConfig
    from yolox_tpu.cli import main
    from yolox_tpu.models.weights import save_pth_params

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = cfg.get_model()
    ckpt = tmp_path / "nano.pth"
    save_pth_params(module.params, ckpt)

    vid = tmp_path / "in.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 5,
                        (128, 96))
    if not w.isOpened():
        pytest.skip("cv2 VideoWriter cannot encode mp4v here")
    rng = np.random.default_rng(7)
    for _ in range(5):
        w.write(rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
    w.release()
    cap = cv2.VideoCapture(str(vid))
    ok, _ = cap.read()
    cap.release()
    if not ok:
        pytest.skip("cv2 cannot decode the mp4 it wrote")

    out_dir = tmp_path / "outputs"
    rc = main([
        "demo", "video", "-c", "yolox-nano", "--path", str(vid),
        "--ckpt", str(ckpt), "--conf", "1e-6", "--save_result",
        "--batch", "2", "--output-dir", str(out_dir),
    ])
    assert rc == 0
    cap = cv2.VideoCapture(str(out_dir / "in.mp4"))
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 5


def test_numpy_demo_postprocess_matches_head_decode():
    """demo_postprocess (numpy, for exported raw outputs) must equal the
    in-graph decode."""
    from yolox_tpu import YoloxConfig
    from yolox_tpu.utils.demo_utils import demo_postprocess

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = cfg.get_model()
    x = np.random.default_rng(1).uniform(
        0, 255, (1, 64, 64, 3)).astype(np.float32)
    decoded = np.asarray(module(x))

    module.head.decode_in_inference = False
    raw = np.asarray(module.head(
        module.params["head"],
        module.backbone(module.params["backbone"], x)))
    module.head.decode_in_inference = True

    redecoded = demo_postprocess(raw, (64, 64))
    np.testing.assert_allclose(redecoded, decoded, rtol=1e-5, atol=1e-5)


def test_visualize_assign(tmp_path, monkeypatch):
    from yolox_tpu import YoloxConfig

    cfg = YoloxConfig.get_named_config("yolox_nano")
    module = cfg.get_model()
    x = np.random.default_rng(2).uniform(
        0, 255, (1, 64, 64, 3)).astype(np.float32)
    targets = np.zeros((1, 5, 5), np.float32)
    targets[0, 0] = [1, 32, 32, 20, 20]
    monkeypatch.chdir(tmp_path)
    module.visualize(x, targets, save_prefix="vis_")
    assert os.path.exists(tmp_path / "vis_0.png")


def test_visualize_assign_cli(coco_dir, tmp_path):
    """`yolox-tpu visualize-assign` end-to-end on the synthetic COCO set."""
    import glob as _glob

    from yolox_tpu.cli import main as cli_main

    out = str(tmp_path / "vis")
    rc = cli_main([
        "visualize-assign", "-c", "yolox-nano", "-b", "2",
        "--output-dir", out,
        "-D", f"data_dir={coco_dir}", "-D", "input_size=(64,64)",
        "-D", "data_num_workers=0", "-D", "multiscale_range=0",
    ])
    assert rc == 0
    pngs = _glob.glob(os.path.join(out, "assign_vis_*.png"))
    assert len(pngs) == 2


def test_demo_cli_video(tmp_path):
    """`yolox-tpu demo video` writes an annotated output video."""
    import cv2

    from yolox_tpu import YoloxConfig, YoloxModule
    from yolox_tpu.cli import main as cli_main
    from yolox_tpu.models.weights import save_pth_params

    cfg = YoloxConfig.get_named_config("yolox-nano")
    module = YoloxModule.from_config(cfg)
    ckpt = tmp_path / "nano.pth"
    save_pth_params(module.params, ckpt)

    vid = str(tmp_path / "in.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 5, (96, 64))
    rng = np.random.default_rng(0)
    for _ in range(4):
        w.write(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
    w.release()

    out = str(tmp_path / "out")
    rc = cli_main([
        "demo", "video", "-c", "yolox-nano", "--path", vid,
        "--ckpt", str(ckpt), "--conf", "1e-6", "--tsize", "64",
        "--save_result", "--output-dir", out,
    ])
    assert rc == 0
    import glob as _glob
    vids = _glob.glob(os.path.join(out, "**", "*.avi"), recursive=True) + \
        _glob.glob(os.path.join(out, "**", "*.mp4"), recursive=True)
    assert vids, f"no output video under {out}"
    cap = cv2.VideoCapture(vids[0])
    assert cap.read()[0]
