"""`yolox-tpu train` — re-design of `/root/reference/yolox/cli/train.py`.

Same flag surface (-c/-b/--resume/--ckpt/-e/--fp16/--cache/-l/-D/--seed);
the device flags (-d/--num_machines/--machine_rank/--dist-*) map onto the
JAX runtime: one process per host, all local devices form the data mesh
automatically, multi-host rendezvous via `jax.distributed.initialize`
(env-configured) instead of explicit process spawning.
"""

from __future__ import annotations

import argparse
import random
import sys

from yolox_tpu.cli.utils import parse_model_config_opts, resolve_config
from yolox_tpu.config import validate_config
from yolox_tpu.utils.logger import logger


def make_parser():
    parser = argparse.ArgumentParser("yolox-tpu train")
    parser.add_argument("-n", "--name", type=str, default=None,
                        help="experiment/run name (default: model name)")
    parser.add_argument("-c", "--config", type=str, default=None,
                        required=True,
                        help="named model config (e.g. yolox-s) or "
                             "module:ClassName")
    parser.add_argument("-b", "--batch-size", type=int, default=64,
                        help="global batch size across all devices")
    parser.add_argument("-d", "--devices", type=int, default=None,
                        help="number of local devices (default: all)")
    parser.add_argument("--num_machines", type=int, default=1,
                        help="number of hosts (jax.distributed)")
    parser.add_argument("--machine_rank", type=int, default=0,
                        help="host rank (jax.distributed)")
    parser.add_argument("--dist-url", type=str, default=None,
                        help="coordinator address for multi-host "
                             "(host:port)")
    parser.add_argument("--resume", action="store_true",
                        help="resume from latest checkpoint")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint to resume from / warm-start with")
    parser.add_argument("-e", "--start_epoch", type=int, default=None,
                        help="resume start epoch")
    parser.add_argument("--fp16", dest="fp16", action="store_true",
                        help="mixed precision training (bf16 on TPU)")
    parser.add_argument("--cache", type=str, nargs="?", const="ram",
                        default=None, choices=["ram", "disk"],
                        help="cache images to RAM or disk")
    parser.add_argument("-o", "--occupy", action="store_true",
                        help="kept for flag parity; XLA preallocates HBM")
    parser.add_argument("-l", "--logger", type=str, default="tensorboard",
                        choices=["tensorboard", "mlflow", "wandb"],
                        help="experiment tracker")
    parser.add_argument("-D", dest="opts", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="override a config option")
    parser.add_argument("--seed", type=int, default=None)
    return parser


def train(config, args):
    import numpy as np

    from yolox_tpu.utils.setup_env import (
        configure_compilation_cache,
        configure_module,
        configure_omp,
    )

    # reference `cli/train.py:96-110` analog: tame worker thread pools,
    # raise fd limits; plus the persistent XLA compile cache (multiscale
    # compiles one program per size — cache makes that per-machine)
    configure_omp()
    configure_module()
    configure_compilation_cache()

    if config.seed is not None:
        random.seed(config.seed)
        np.random.seed(config.seed)
        logger.warning(
            "You have chosen to seed training. Note that augmentation "
            "seeding is deterministic per (seed, sample) by design; full "
            "run determinism additionally requires deterministic XLA "
            "reductions.")
    trainer = config.get_trainer(args)
    trainer.train()


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)

    if args.num_machines > 1:
        import jax
        from jax.experimental import multihost_utils

        jax.distributed.initialize(
            coordinator_address=args.dist_url,
            num_processes=args.num_machines,
            process_id=args.machine_rank,
        )
        # Establish the cross-process collective context NOW, while ranks
        # are in lockstep: the first collective otherwise happens deep in
        # the trainer where per-rank compile skew (minutes on contended
        # hosts) can exceed the transport's rendezvous timeout (observed:
        # gloo's 30s on CPU meshes). Also fails fast on bad rendezvous.
        multihost_utils.sync_global_devices("yolox-tpu:train-start")

    config = resolve_config(args.config)
    config.update(parse_model_config_opts(args.opts))
    if args.seed is not None:
        config.seed = args.seed
    validate_config(config)
    if args.name is None:
        args.name = config.name

    if getattr(args, "cache", None) is not None:
        # build the cached dataset up front (reference `cli/train.py:128`:
        # must exist before worker processes fork so they share the cache)
        config.dataset = config.get_dataset(cache=True,
                                            cache_type=args.cache)

    train(config, args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
