"""Per-component breakdown of the production bs8/65k train step.

The reference trains with mmengine's epoch loop + DDP (tools/train.py:48-60);
its per-step cost splits across spconv U-Net, transformer decoder, top-k
matcher criterion, and AdamW. This script measures the same split for our
step via jit-level ablations (no profiler dependency — the relay exposes no
xplane viewer):

  step        full train step (fwd + bwd + pmean + AdamW), the bench number
  fwd         loss value only (same shard_map plumbing)
  fwd+bwd     value_and_grad, no optimizer
  decoder     slope of fwd+bwd wrt num_layers (6 vs 3) -> per-layer cost
  criterion   grad of criterion alone on captured decoder outputs
  conv(xla)   step with subm_impl='xla' (pallas advantage = step - this)
  remat-off   step with backbone_remat=False (remat recompute tax)
  optimizer   jit(optimizer.update) alone on a real grad tree

Run ALONE on the chip (single-core host; concurrent processes corrupt
timings): python scripts/bench_train_step.py
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=3, donate=None):
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
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--cap", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip", nargs="*", default=[],
                    help="component keys to skip (e.g. conv_xla remat_off)")
    args = ap.parse_args()

    import sys
    sys.path.insert(0, "/root/repo")
    import dataclasses

    import __graft_entry__ as ge
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from unidet3d_tpu.core.config import default_config
    from unidet3d_tpu.data.batcher import build_packs
    from unidet3d_tpu.losses.criterion import criterion
    from unidet3d_tpu.models.detector import detection_loss, prepare_gt
    from unidet3d_tpu.parallel.train_step import (
        create_mesh, init_state, make_train_step,
    )
    from unidet3d_tpu.train.optim import make_optimizer

    cfg = default_config(
        axis_name="data", max_points=args.cap, voxel_capacity=args.cap,
        max_superpoints=2048, max_gts=64,
    )
    mesh = create_mesh(1)
    opt = make_optimizer(total_steps=100)
    batch_np, gt_np = ge._synthetic_inputs(cfg, b=args.bs, as_numpy=True)
    pack_np = build_packs(batch_np.vox_src, batch_np.valid, cfg, n_shards=1)
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
    gt = jax.tree_util.tree_map(jnp.asarray, gt_np)
    pack = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x)[None]), pack_np
    )
    rng = jax.random.PRNGKey(1)
    results = {}

    def build(cfg_v):
        model = ge._build(cfg_v)
        state = init_state(
            model, cfg_v, opt,
            jax.tree_util.tree_map(lambda x: x[:1], batch),
            jax.random.PRNGKey(0),
        )
        return model, state

    def fwd_fn(model, cfg_v, *, with_grad):
        def local(params, batch_stats, batch, gt, packs, rng):
            pk = jax.tree_util.tree_map(lambda x: x[0], packs)

            def loss_fn(p):
                (out, aux), _ = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    batch, True, pk, rngs={"queries": rng},
                    mutable=["batch_stats"],
                )
                return detection_loss(cfg_v, out, aux, batch, gt)

            if with_grad:
                loss, grads = jax.value_and_grad(loss_fn)(params)
                return loss, jax.lax.pmean(grads, "data")
            return loss_fn(params)

        return jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data"), P()),
            out_specs=(P(), P()) if with_grad else P(),
            check_vma=False,
        ))

    # --- baseline model -----------------------------------------------
    model, state = build(cfg)
    step = make_train_step(model, cfg, opt, mesh)
    st = state
    st, m = step(st, batch, gt, pack, rng)
    float(m["loss"])
    best = float("inf")
    for i in range(args.iters):
        t0 = time.perf_counter()
        st, m = step(st, batch, gt, pack, jax.random.fold_in(rng, i))
        float(m["loss"])
        best = min(best, time.perf_counter() - t0)
    results["step"] = best
    print(f"step (full)            {best*1e3:9.1f} ms", flush=True)

    f = fwd_fn(model, cfg, with_grad=False)
    results["fwd"] = timeit(
        f, state.params, state.batch_stats, batch, gt, pack, rng,
        iters=args.iters,
    )
    print(f"fwd (loss only)        {results['fwd']*1e3:9.1f} ms", flush=True)

    fb = fwd_fn(model, cfg, with_grad=True)
    results["fwdbwd"] = timeit(
        fb, state.params, state.batch_stats, batch, gt, pack, rng,
        iters=args.iters,
    )
    print(f"fwd+bwd                {results['fwdbwd']*1e3:9.1f} ms",
          flush=True)
    loss, grads = fb(state.params, state.batch_stats, batch, gt, pack, rng)
    jax.block_until_ready(grads)

    # --- optimizer alone ----------------------------------------------
    upd = jax.jit(lambda g, o, p: opt.update(g, o, p))
    results["optimizer"] = timeit(
        upd, grads, state.opt_state, state.params, iters=args.iters
    )
    print(f"optimizer.update       {results['optimizer']*1e3:9.1f} ms",
          flush=True)

    # --- decoder slope: num_layers 6 -> 3 -------------------------------
    if "decoder" not in args.skip:
        cfg3 = dataclasses.replace(cfg, num_layers=3)
        model3, state3 = build(cfg3)
        fb3 = fwd_fn(model3, cfg3, with_grad=True)
        t3 = timeit(
            fb3, state3.params, state3.batch_stats, batch, gt, pack, rng,
            iters=args.iters,
        )
        per_layer = (results["fwdbwd"] - t3) / 3.0
        results["decoder_layer_fwdbwd"] = per_layer
        results["fwdbwd_3layers"] = t3
        print(f"fwd+bwd (3 layers)     {t3*1e3:9.1f} ms  "
              f"-> per decoder layer {per_layer*1e3:7.1f} ms "
              f"(x6 = {per_layer*6e3:7.1f} ms)", flush=True)

    # --- criterion alone on captured outputs ----------------------------
    if "criterion" not in args.skip:
        def capture(params, batch_stats, batch, gt, packs, rng):
            pk = jax.tree_util.tree_map(lambda x: x[0], packs)
            (out, aux), _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch, True, pk, rngs={"queries": rng},
                mutable=["batch_stats"],
            )
            sg = prepare_gt(cfg, batch, gt, aux)
            return out.cls_logits, out.boxes, aux.query_valid, sg

        cap_fn = jax.jit(shard_map(
            capture, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data"), P()),
            out_specs=(P("data"), P("data"), P("data"), P("data")),
            check_vma=False,
        ))
        cls_l, boxes, qv, sg = jax.block_until_ready(cap_fn(
            state.params, state.batch_stats, batch, gt, pack, rng
        ))
        rotated = jnp.asarray(np.asarray(cfg.angles))[batch.dataset_ids]
        topk = jnp.asarray(np.asarray(cfg.topk))[batch.dataset_ids]
        wts = jnp.asarray(np.asarray(cfg.datasets_weights))[batch.dataset_ids]

        def crit_local(cl, bx, qv, sg, rot, tk, w):
            def lf(inp):
                return criterion(
                    inp[0], inp[1], qv, sg, rot, tk, w,
                    loss_weight=cfg.loss_weight,
                    non_object_weight=cfg.non_object_weight,
                    axis_name=cfg.axis_name,
                )
            l, g = jax.value_and_grad(lf)((cl, bx))
            return l, jax.lax.pmean(g, "data")

        crit_fn = jax.jit(shard_map(
            crit_local, mesh=mesh,
            in_specs=(P("data"),) * 4 + (P("data"),) * 3,
            out_specs=(P(), P()),
            check_vma=False,
        ))
        results["criterion_fwdbwd"] = timeit(
            crit_fn, cls_l, boxes, qv, sg, rotated, topk, wts,
            iters=args.iters,
        )
        print(f"criterion fwd+bwd      "
              f"{results['criterion_fwdbwd']*1e3:9.1f} ms", flush=True)

    # --- conv impl ablation ---------------------------------------------
    if "conv_xla" not in args.skip:
        cfgx = dataclasses.replace(cfg, subm_impl="xla")
        modelx, statex = build(cfgx)
        packx_np = build_packs(
            batch_np.vox_src, batch_np.valid, cfgx, n_shards=1
        )
        packx = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)[None]), packx_np
        )
        fbx = fwd_fn(modelx, cfgx, with_grad=True)
        results["fwdbwd_xla_conv"] = timeit(
            fbx, statex.params, statex.batch_stats, batch, gt, packx, rng,
            iters=args.iters,
        )
        print(f"fwd+bwd (XLA conv)     "
              f"{results['fwdbwd_xla_conv']*1e3:9.1f} ms", flush=True)

    # --- remat ablation ---------------------------------------------------
    if "remat_off" not in args.skip:
        cfgr = dataclasses.replace(cfg, backbone_remat=False)
        modelr, stater = build(cfgr)
        fbr = fwd_fn(modelr, cfgr, with_grad=True)
        try:
            results["fwdbwd_remat_off"] = timeit(
                fbr, stater.params, stater.batch_stats, batch, gt, pack,
                rng, iters=args.iters,
            )
            print(f"fwd+bwd (remat off)    "
                  f"{results['fwdbwd_remat_off']*1e3:9.1f} ms", flush=True)
        except Exception as e:  # OOM is an acceptable outcome here
            print(f"fwd+bwd (remat off)    failed: {type(e).__name__}",
                  flush=True)

    # --- summary ----------------------------------------------------------
    print("\n--- derived ---")
    s, fbt = results["step"], results["fwdbwd"]
    print(f"bwd alone              {(fbt-results['fwd'])*1e3:9.1f} ms")
    print(f"opt+state plumbing     {(s-fbt)*1e3:9.1f} ms")
    if "decoder_layer_fwdbwd" in results:
        print(f"decoder (6 layers)     "
              f"{results['decoder_layer_fwdbwd']*6e3:9.1f} ms")
    if "criterion_fwdbwd" in results:
        print(f"criterion+matcher      "
              f"{results['criterion_fwdbwd']*1e3:9.1f} ms")
    if "fwdbwd_xla_conv" in results:
        print(f"pallas conv advantage  "
              f"{(results['fwdbwd_xla_conv']-fbt)*1e3:9.1f} ms")
    if "fwdbwd_remat_off" in results:
        print(f"remat recompute tax    "
              f"{(fbt-results['fwdbwd_remat_off'])*1e3:9.1f} ms")
    import json
    print(json.dumps({k: round(v * 1e3, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
