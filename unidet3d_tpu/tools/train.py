"""Training CLI.

Mirror of reference tools/train.py UX:
  python -m unidet3d_tpu.tools.train <config.py> [--work-dir D]
      [--resume [auto|STEP]] [--cfg-options key=val ...]
"""
from __future__ import annotations

import argparse
import dataclasses
import logging


def main():
    ap = argparse.ArgumentParser(description="Train a UniDet3D-TPU model")
    ap.add_argument("config", help="experiment config python file")
    ap.add_argument("--work-dir", default=None)
    ap.add_argument(
        "--resume", nargs="?", const="auto", default=None,
        help="resume from latest ('auto') or a specific step",
    )
    ap.add_argument("--cfg-options", nargs="*", default=[])
    args = ap.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
    )

    # Multi-host launch (reference: mmengine DDP launchers,
    # tools/train.py:48-60): set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
    # / JAX_PROCESS_ID per host, or JAX_AUTO_DISTRIBUTED=1 on TPU pods —
    # see parallel/distributed.py for the recipe. No-op on one host.
    from ..parallel.distributed import maybe_initialize

    maybe_initialize()

    from ..core.experiment import apply_overrides, load_experiment
    from ..train.loop import train

    exp = load_experiment(args.config)
    exp = apply_overrides(exp, args.cfg_options)
    if args.work_dir:
        exp = dataclasses.replace(exp, work_dir=args.work_dir)
    train(exp, resume=args.resume)


if __name__ == "__main__":
    main()
