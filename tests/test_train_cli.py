"""`yolox-tpu train` CLI end-to-end: argparse -> config resolution ->
-D overrides -> Trainer on the synthetic COCO set."""

import glob
import os
import textwrap

import pytest

pytestmark = pytest.mark.slow  # minutes-long e2e lane


@pytest.fixture()
def cfg_module(coco_dir, tmp_path, monkeypatch):
    mod_dir = tmp_path / "cfgs"
    mod_dir.mkdir()
    (mod_dir / "my_train_cfg.py").write_text(textwrap.dedent(f"""
        from yolox_tpu import YoloxConfig

        class TinyTrain(YoloxConfig):
            def __init__(self):
                super().__init__("tiny_train_cli")
                self.num_classes = 3
                self.depth, self.width = 0.33, 0.125
                self.input_size = self.test_size = (64, 64)
                self.data_dir = {coco_dir!r}
                self.max_epoch = 1
                self.warmup_epochs = 1
                self.no_aug_epochs = 0
                self.eval_interval = 10
                self.data_num_workers = 0
                self.save_history_ckpt = False
                self.multiscale_range = 0

            def get_eval_dataset(self, **kw):
                from yolox_tpu.data import CocoDataset, ValTransform
                return CocoDataset(
                    data_dir=self.data_dir, json_file=self.train_ann,
                    name="train2017", img_size=self.test_size,
                    preproc=ValTransform())
    """))
    monkeypatch.syspath_prepend(str(mod_dir))
    return "my_train_cfg:TinyTrain", tmp_path


def test_train_cli_end_to_end(cfg_module):
    from yolox_tpu.cli import train as train_cli

    name, tmp_path = cfg_module
    out = str(tmp_path / "out")
    rc = train_cli.main([
        "-c", name, "-b", "4", "--seed", "3",
        "-D", f"output_dir={out}", "-D", "print_interval=1",
    ])
    assert rc == 0
    ckpts = glob.glob(os.path.join(out, "tiny_train_cli", "*_ckpt.pth"))
    assert ckpts, f"no checkpoint written under {out}"
    log = os.path.join(out, "tiny_train_cli", "train_log.txt")
    assert os.path.exists(log)
    assert "Training start" in open(log).read()


def test_train_cli_with_ram_cache(cfg_module):
    """--cache ram: the cached dataset is built pre-launch and training
    runs off the RAM cache (reference `cli/train.py:128` behavior)."""
    from yolox_tpu.cli import train as train_cli

    name, tmp_path = cfg_module
    out = str(tmp_path / "out_cache")
    rc = train_cli.main([
        "-c", name, "-b", "4", "--cache", "ram",
        "-D", f"output_dir={out}",
    ])
    assert rc == 0
    assert glob.glob(os.path.join(out, "tiny_train_cli", "*_ckpt.pth"))
