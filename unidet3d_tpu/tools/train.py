"""Training CLI.

Mirror of reference tools/train.py UX:
  python -m unidet3d_tpu.tools.train <config.py> [--work-dir D]
      [--resume [auto|STEP]] [--cfg-options key=val ...]
      [--precision bf16|fp32] [--auto-scale-lr]

Precision note (the reference's --amp analog, tools/train.py:32-36): mixed
precision is ON by default here — the backbone/decoder compute dtype is
bfloat16 (ModelConfig.compute_dtype) with fp32 accumulation, which is the
TPU-native equivalent of torch AMP. `--precision fp32` turns it OFF for
debugging/parity runs instead of a flag turning it on.
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
    ap.add_argument(
        "--precision", choices=("bf16", "fp32"), default=None,
        help="compute dtype for backbone/decoder matmuls (default: the "
        "config's compute_dtype, bf16 in production — the TPU-native "
        "always-on analog of the reference's --amp; fp32 disables it)",
    )
    ap.add_argument(
        "--auto-scale-lr", action="store_true",
        help="linearly scale the configured lr by global batch_size / "
        "base_batch_size. (The reference exposes the same flag, handled "
        "at its tools/train.py:102-110 — though with its shipped configs, "
        "which define no auto_scale_lr block, that path raises; here "
        "base_batch_size defaults to the 8 implied by the reference's "
        "'1xb8' config naming.)",
    )
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

    from ..core.cache import enable_persistent_cache

    enable_persistent_cache()  # second run skips every XLA recompile

    from ..core.experiment import apply_overrides, load_experiment

    # Load the config BEFORE the heavy train-loop import: config files may
    # force a platform (jax.config.update("jax_platforms", ...)) and that
    # only works while no jax array has been created yet.
    exp = load_experiment(args.config)
    from ..train.loop import train
    exp = apply_overrides(exp, args.cfg_options)
    if args.work_dir:
        exp = dataclasses.replace(exp, work_dir=args.work_dir)
    if args.precision:
        dtype = "bfloat16" if args.precision == "bf16" else "float32"
        exp = dataclasses.replace(
            exp, model=dataclasses.replace(exp.model, compute_dtype=dtype)
        )
    if args.auto_scale_lr:
        scale = exp.batch_size / exp.base_batch_size
        logging.getLogger("unidet3d_tpu").info(
            "auto-scale-lr: %g -> %g (batch %d / base %d)",
            exp.lr, exp.lr * scale, exp.batch_size, exp.base_batch_size,
        )
        exp = dataclasses.replace(exp, lr=exp.lr * scale)
    train(exp, resume=args.resume)


if __name__ == "__main__":
    main()
