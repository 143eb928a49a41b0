"""CLI dispatcher — re-design of `/root/reference/yolox/cli/__init__.py`.

    yolox-tpu train -c yolox-s -b 64 ...
    yolox-tpu eval  -c yolox-s --ckpt ...
"""

from __future__ import annotations

import sys

from yolox_tpu.version import __version__


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "train":
        from yolox_tpu.cli import train

        return train.main(argv[1:]) or 0
    if argv and argv[0] == "eval":
        from yolox_tpu.cli import eval as eval_cmd

        return eval_cmd.main(argv[1:]) or 0
    if argv and argv[0] == "demo":
        from yolox_tpu.cli import demo

        return demo.main(argv[1:]) or 0
    if argv and argv[0] == "export":
        from yolox_tpu.cli import export

        return export.main(argv[1:]) or 0
    if argv and argv[0] == "visualize-assign":
        from yolox_tpu.cli import visualize_assign

        return visualize_assign.main(argv[1:]) or 0
    if argv and argv[0] in ("-h", "--help"):
        _print_help()
        return 0
    print(f"yolox-tpu {__version__}")
    _print_help()
    return 0 if not argv else 1


def _print_help():
    print(
        "usage: yolox-tpu <command> [args]\n\n"
        "commands:\n"
        "  train    train a model (see `yolox-tpu train -h`)\n"
        "  eval     evaluate a model (see `yolox-tpu eval -h`)\n"
        "  demo     run inference on images/video (see `yolox-tpu demo -h`)\n"
        "  export   export a model to StableHLO (see `yolox-tpu export -h`)\n"
        "  visualize-assign\n"
        "           draw SimOTA assignments for training batches\n"
    )
