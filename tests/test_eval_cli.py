"""`yolox-tpu eval` CLI end-to-end on the synthetic COCO set (reference
`yolox/cli/eval.py`): --speed mode (random weights) and --fuse."""

import os
import textwrap

import pytest


@pytest.fixture()
def cfg_module(coco_dir, tmp_path, monkeypatch):
    """A user config addressed as module:ClassName (the reference's custom
    config mechanism, `cli/utils.py:7-28`)."""
    mod_dir = tmp_path / "cfgs"
    mod_dir.mkdir()
    (mod_dir / "my_eval_cfg.py").write_text(textwrap.dedent(f"""
        from yolox_tpu import YoloxConfig

        class TinyEval(YoloxConfig):
            def __init__(self):
                super().__init__("tiny_eval_cli")
                self.num_classes = 3
                self.depth, self.width = 0.33, 0.125
                self.input_size = self.test_size = (64, 64)
                self.data_dir = {coco_dir!r}
                self.val_ann = "instances_train2017.json"
                self.data_num_workers = 0

            def get_eval_dataset(self, **kw):
                from yolox_tpu.data import CocoDataset, ValTransform
                return CocoDataset(
                    data_dir=self.data_dir, json_file=self.val_ann,
                    name="train2017", img_size=self.test_size,
                    preproc=ValTransform())
    """))
    monkeypatch.syspath_prepend(str(mod_dir))
    monkeypatch.setenv("YOLOX_OUTPUT_DIR", str(tmp_path / "out"))
    return "my_eval_cfg:TinyEval", tmp_path


def test_eval_cli_speed_mode(cfg_module):
    from yolox_tpu.cli import eval as eval_cli

    name, tmp_path = cfg_module
    rc = eval_cli.main([
        "-c", name, "-b", "4", "--speed", "--conf", "0.01",
        "-D", f"output_dir={tmp_path / 'out'}",
    ])
    assert rc == 0


def test_eval_cli_int8(cfg_module):
    """--int8 calibrates on eval batches and runs the PTQ forward
    end-to-end through the COCO evaluator (yolox_tpu/ops/quant.py)."""
    from yolox_tpu.cli import eval as eval_cli

    name, tmp_path = cfg_module
    rc = eval_cli.main([
        "-c", name, "-b", "4", "--speed", "--int8", "--calib-batches", "2",
        "--conf", "0.01", "-D", f"output_dir={tmp_path / 'out'}",
    ])
    assert rc == 0


def test_eval_cli_with_ckpt_and_fuse(cfg_module):
    from yolox_tpu.cli import eval as eval_cli
    from yolox_tpu.cli.utils import resolve_config
    from yolox_tpu.models.yolox import YoloxModule
    from yolox_tpu.utils.checkpoint import save_checkpoint

    name, tmp_path = cfg_module
    cfg = resolve_config(name)
    module = YoloxModule.from_config(cfg)
    save_checkpoint({"model": module.params, "start_epoch": 1},
                    False, str(tmp_path), "m")
    rc = eval_cli.main([
        "-c", name, "-b", "4", "--ckpt",
        os.path.join(str(tmp_path), "m_ckpt.pth"), "--fuse",
        "--conf", "0.01", "-D", f"output_dir={tmp_path / 'out'}",
    ])
    assert rc == 0


def test_eval_cli_int8_hbm(cfg_module):
    """--int8-hbm runs the QTensor int8-in-HBM forward end-to-end through
    the COCO evaluator (same calibration flags as --int8)."""
    from yolox_tpu.cli import eval as eval_cli

    name, tmp_path = cfg_module
    rc = eval_cli.main([
        "-c", name, "-b", "4", "--speed", "--int8-hbm",
        "--calib-batches", "2", "--conf", "0.01",
        "-D", f"output_dir={tmp_path / 'out'}",
    ])
    assert rc == 0
