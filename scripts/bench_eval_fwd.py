"""Per-component breakdown of the bs1 eval forward (the primary bench's
per-scene device cost).

The reference's TestLoop runs bs=1 scene-at-a-time through backbone ->
pooling -> decoder (unidet3d/unidet3d.py:475-538); our eval step is the
same graph at a capacity bucket. This script splits the forward by jit-level
ablation (run ALONE on the chip):

  full           eval forward (last-layer logits/boxes), the bench unit
  backbone       UNetBackbone alone on the voxel features
  bb_xla         backbone with subm_impl='xla' (banded advantage)
  pool+decoder   full - backbone (derived)
  decoder slope  full at num_layers 6 vs 3 -> per-layer cost
  sp buckets     full at max_superpoints 3072 vs 1024 (query compaction win)

Usage: python scripts/bench_eval_fwd.py [--cap 131072] [--iters 8]
"""
import argparse
import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--sp", type=int, default=3072)
    ap.add_argument("--skip", nargs="*", default=[])
    args = ap.parse_args()

    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from unidet3d_tpu.core.config import default_config
    from unidet3d_tpu.data.batcher import build_packs
    from unidet3d_tpu.models.unet import UNetBackbone
    from unidet3d_tpu.parallel.train_step import init_state, make_eval_step
    from unidet3d_tpu.train.optim import make_optimizer

    cfg = default_config(
        max_points=args.cap, voxel_capacity=args.cap,
        max_superpoints=args.sp,
    )
    batch_np, _ = ge._synthetic_inputs(cfg, b=1, as_numpy=True)
    results = {}

    def setup(cfg_v):
        model = ge._build(cfg_v)
        pack_np = build_packs(
            batch_np.vox_src, batch_np.valid, cfg_v, n_shards=1
        )
        state = init_state(
            model, cfg_v, make_optimizer(total_steps=10),
            jax.tree_util.tree_map(jnp.asarray, batch_np),
            jax.random.PRNGKey(0),
        )
        batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
        pack = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)[None]), pack_np
        )
        return model, state, batch, pack

    model, state, batch, pack = setup(cfg)
    step = make_eval_step(model, cfg)
    results["full"] = timeit(
        step, state.params, state.batch_stats, batch, pack,
        iters=args.iters,
    )
    print(f"full eval fwd          {results['full']*1e3:8.1f} ms",
          flush=True)

    # --- backbone alone -------------------------------------------------
    def bb_fn(cfg_v, state_v, pack_v):
        bb = UNetBackbone(
            num_planes=cfg_v.num_planes,
            axis_name=None,
            dtype=jnp.dtype(cfg_v.compute_dtype),
            conv_window=cfg_v.level_conv_windows(),
            conv_wsub=cfg_v.level_conv_subwindows(),
            conv_align=cfg_v.level_pack_align(),
            remat=False,
            name="backbone",
        )
        params = state_v.params["backbone"]
        bstats = state_v.batch_stats.get("backbone", {})
        v0 = args.cap
        feats0 = jnp.zeros((v0, 3 + 3), jnp.float32)

        def fwd(p, bs, f, packs):
            pk = jax.tree_util.tree_map(lambda x: x[0], packs)
            return bb.apply(
                {"params": p, "batch_stats": bs}, f, pk, False
            )

        return jax.jit(fwd), params, bstats, feats0

    if "backbone" not in args.skip:
        f, p, bs_, x0 = bb_fn(cfg, state, pack)
        results["backbone"] = timeit(f, p, bs_, x0, pack, iters=args.iters)
        print(f"backbone alone         "
              f"{results['backbone']*1e3:8.1f} ms", flush=True)

    if "bb_xla" not in args.skip:
        cfgx = dataclasses.replace(cfg, subm_impl="xla")
        modelx, statex, batchx, packx = setup(cfgx)
        f, p, bs_, x0 = bb_fn(cfgx, statex, packx)
        results["backbone_xla"] = timeit(
            f, p, bs_, x0, packx, iters=args.iters
        )
        print(f"backbone (XLA conv)    "
              f"{results['backbone_xla']*1e3:8.1f} ms", flush=True)

    if "decoder" not in args.skip:
        cfg3 = dataclasses.replace(cfg, num_layers=3)
        model3, state3, batch3, pack3 = setup(cfg3)
        step3 = make_eval_step(model3, cfg3)
        t3 = timeit(
            step3, state3.params, state3.batch_stats, batch3, pack3,
            iters=args.iters,
        )
        per_layer = (results["full"] - t3) / 3.0
        results["decoder_layer"] = per_layer
        print(f"full (3 dec layers)    {t3*1e3:8.1f} ms  "
              f"-> per layer {per_layer*1e3:6.2f} ms "
              f"(x6 = {per_layer*6e3:6.1f} ms)", flush=True)

    if "spbucket" not in args.skip and args.sp > 1024:
        cfgs = dataclasses.replace(cfg, max_superpoints=1024)
        models, states, batchs, packs_ = setup(cfgs)
        steps = make_eval_step(models, cfgs)
        results["full_sp1024"] = timeit(
            steps, states.params, states.batch_stats, batchs, packs_,
            iters=args.iters,
        )
        print(f"full (sp cap 1024)     "
              f"{results['full_sp1024']*1e3:8.1f} ms", flush=True)

    print("\n--- derived ---")
    if "backbone" in results:
        print(f"non-backbone           "
              f"{(results['full']-results['backbone'])*1e3:8.1f} ms")
    if "backbone_xla" in results and "backbone" in results:
        print(f"banded conv advantage  "
              f"{(results['backbone_xla']-results['backbone'])*1e3:8.1f} ms")
    if "full_sp1024" in results:
        print(f"sp 3072->1024 win      "
              f"{(results['full']-results['full_sp1024'])*1e3:8.1f} ms")
    import json
    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
