"""One-command checkpoint-parity evaluation against the released model.

The BASELINE north star is mAP@0.25/0.50 within 0.3 of `unidet3d.pth` on
ScanNet val (reference README.md:81-90 checkpoint-eval workflow). This
harness runs that end to end:

  1. convert the torch checkpoint (tools/convert_checkpoint.py — tolerant
     of `module.` prefixes / extra buffers, reports unconsumed keys),
  2. re-anchor genuine mmdet3d-v2 info pkls when the framework-format ann
     files are absent (tools/convert_mmdet3d_infos.py),
  3. evaluate every dataset the config names whose data is present,
  4. print per-dataset mAP@0.25/0.50 next to the reference README numbers
     with the delta, and exit non-zero if any |delta| > tolerance.

Usage:
  python -m unidet3d_tpu.tools.parity_eval unidet3d.pth \
      [--config configs/unidet3d_joint.py] [--tolerance 0.3] \
      [--datasets scannet ...] [--cfg-options key=val ...]

Datasets whose ann/info files are missing are skipped with a notice, so the
same command works for a ScanNet-only drop or the full 6-dataset layout.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

# Reference README.md:83-90 released-checkpoint metrics (mAP@0.25, @0.50).
REFERENCE_MAP = {
    "scannet": (77.0, 65.9),
    "arkitscenes": (60.1, 47.2),
    "s3dis": (76.7, 65.3),
    "multiscan": (62.6, 52.3),
    "3rscan": (63.6, 44.9),
    "scannetpp": (24.0, 16.8),
}


def _ensure_infos(spec) -> bool:
    """Make sure the val ann file exists, converting a genuine mmdet3d-v2
    pkl sitting next to it when needed. Returns False if neither exists."""
    if spec.ann_val is None:
        return False
    ann = os.path.join(spec.data_root, spec.ann_val)
    if os.path.exists(ann):
        return True
    # Common names produced by the reference's create_data / update_infos_to_v2.
    for cand_name in (
        spec.ann_val,
        f"{spec.name}_infos_val.pkl",
        "infos_val.pkl",
        f"{spec.name}_oneformer3d_infos_val.pkl",
    ):
        cand = os.path.join(spec.data_root, "mmdet3d", cand_name)
        if not os.path.exists(cand):
            cand = os.path.join(spec.data_root, "v2_" + cand_name)
        if os.path.exists(cand):
            from .convert_mmdet3d_infos import convert_infos

            logging.info("re-anchoring mmdet3d-v2 infos %s -> %s", cand, ann)
            convert_infos(cand, ann)
            return True
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="reference torch .pth file")
    ap.add_argument("--config", default="configs/unidet3d_joint.py")
    ap.add_argument("--tolerance", type=float, default=0.3,
                    help="max |mAP delta| (percentage points) to pass")
    ap.add_argument("--datasets", nargs="*", default=None,
                    help="restrict to these dataset names")
    ap.add_argument("--cfg-options", nargs="*", default=[])
    ap.add_argument("--planes", type=int, nargs="+",
                    default=[32, 64, 96, 128, 160])
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--layers", type=int, default=6)
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")

    if not os.path.exists(args.checkpoint):
        print(f"checkpoint not found: {args.checkpoint}", file=sys.stderr)
        print("(download: README.md:81 — this harness is ready to run the "
              "moment the artifact lands)", file=sys.stderr)
        return 2

    from ..core.cache import enable_persistent_cache

    enable_persistent_cache()

    import dataclasses

    import jax  # noqa: F401  (device init before torch)
    import numpy as np  # noqa: F401
    import torch

    from ..core.experiment import apply_overrides, load_experiment
    from ..parallel.train_step import TrainState
    from ..train.loop import build_model, evaluate
    from .convert_checkpoint import convert_torch_state_dict

    exp = load_experiment(args.config)
    exp = apply_overrides(exp, args.cfg_options)

    # Keep only datasets that are requested AND have data on disk.
    keep = []
    for spec in exp.datasets:
        if args.datasets and spec.name not in args.datasets:
            continue
        if _ensure_infos(spec):
            keep.append(spec)
        else:
            logging.info("skipping %s: no val infos under %s",
                         spec.name, spec.data_root)
    if not keep:
        print("no dataset has val infos on disk — nothing to evaluate",
              file=sys.stderr)
        return 2
    exp = dataclasses.replace(exp, datasets=tuple(keep))

    ckpt = torch.load(args.checkpoint, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    report: dict = {}
    tree = convert_torch_state_dict(
        sd, num_levels=len(args.planes), num_layers=args.layers,
        d_model=args.d_model, num_heads=args.heads, report=report,
    )
    logging.info("converted %d checkpoint tensors", report["consumed"])
    if report["unexpected"]:
        logging.warning("unconsumed checkpoint keys: %s", report["unexpected"])

    model, table = build_model(exp)
    state = TrainState(tree["params"], tree["batch_stats"], None, 0)
    results = evaluate(exp, state, model, table)

    print(f"\n{'dataset':<12} {'mAP@0.25':>9} {'ref':>6} {'d':>6}  "
          f"{'mAP@0.50':>9} {'ref':>6} {'d':>6}")
    failed = []
    for name, res in results.items():
        ours = (100 * res.get("mAP_0.25", 0.0), 100 * res.get("mAP_0.50", 0.0))
        ref = REFERENCE_MAP.get(name)
        if ref is None:
            print(f"{name:<12} {ours[0]:9.1f} {'--':>6} {'--':>6}  "
                  f"{ours[1]:9.1f} {'--':>6} {'--':>6}")
            continue
        d25, d50 = ours[0] - ref[0], ours[1] - ref[1]
        print(f"{name:<12} {ours[0]:9.1f} {ref[0]:6.1f} {d25:+6.1f}  "
              f"{ours[1]:9.1f} {ref[1]:6.1f} {d50:+6.1f}")
        if max(abs(d25), abs(d50)) > args.tolerance:
            failed.append(name)
    if failed:
        print(f"\nPARITY FAIL (|delta| > {args.tolerance}): {failed}")
        return 1
    print(f"\nPARITY OK (all deltas within {args.tolerance})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
