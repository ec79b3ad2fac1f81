"""Level-0 banded-conv kernel microbenchmark on the real chip.

Times subm_conv_pallas at the production level-0 geometry (131k voxel cap,
surface-like synthetic scene, cfg windows/subwindows) across channel-packing
factors and the fused-output-matmul variant, with a parity check against the
XLA gather form. One TPU process at a time (relay constraint).

Usage: python scripts/bench_conv_kernel.py [--cap 131072] [--cin 32 64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, iters=10):
    """Single-dispatch min-of-N timing (relay round trip INCLUDED — use
    timed_chained for per-op numbers)."""
    out = fn(*args)
    float(jnp.sum(out))  # compile + barrier
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best, out


def timed_chained(conv, feat, w, n_lo=2, n_hi=22, reps=5):
    """Per-conv seconds with the ~25-30 ms relay dispatch floor cancelled:
    scan-chain the conv in-device (cout == cin required) at two lengths and
    difference. `conv(f, w) -> (V, C)`."""
    def chained(n):
        def fn(f, wt):
            def body(x, _):
                return conv(x, wt).astype(f.dtype) * 1e-2, ()
            y, _ = jax.lax.scan(body, f, None, length=n)
            return jnp.sum(y)
        return jax.jit(fn)

    f_lo, f_hi = chained(n_lo), chained(n_hi)
    float(f_lo(feat, w)); float(f_hi(feat, w))
    t_lo = t_hi = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(f_lo(feat, w))
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f_hi(feat, w))
        t_hi = min(t_hi, time.perf_counter() - t0)
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=131072)
    ap.add_argument("--cin", type=int, nargs="+", default=[32, 64])
    ap.add_argument("--cout", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--pred", type=int, nargs="+", default=[0, 1],
                    help="predication variants to sweep (0/1)")
    ap.add_argument("--fuse", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--aligns", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument("--pipeline", type=int, nargs="+", default=[1],
                    help="cross-block DMA double-buffering variants (0/1)")
    ap.add_argument("--wsub", type=int, default=None,
                    help="override y/z/center subgroup onehot width")
    ap.add_argument("--wsub-x", type=int, default=None,
                    help="override x subgroup onehot width")
    args = ap.parse_args()

    from unidet3d_tpu.core.config import ModelConfig
    from unidet3d_tpu.data.synthetic import synthetic_scene
    from unidet3d_tpu.native import rulebook as native_rb
    from unidet3d_tpu.ops.gridpack import build_gridpack_host, quantize_points
    from unidet3d_tpu.ops.pallas_conv import (
        MissList,
        apply_miss_correction,
        build_miss_list,
        build_banded_rulebook,
        choose_pack,
        n_subgroups,
        subm_conv_pallas,
    )
    from unidet3d_tpu.ops.sparse_conv import subm_conv

    cfg = ModelConfig(max_points=args.cap, voxel_capacity=args.cap)
    cap = args.cap
    sc = synthetic_scene(cap, seed=5)
    vox_src = (sc[None, :, :3] / cfg.voxel_size).astype(np.float32)
    valid = np.ones((1, len(sc)), bool)
    bxyz = quantize_points(vox_src, valid)
    pack, _ = build_gridpack_host(bxyz, valid.reshape(-1), [cap])
    nbr = np.asarray(pack.neighbors[0])
    n_real = int(pack.valid[0].sum())
    print(f"cap={cap} real voxels={n_real} ({100*n_real/cap:.0f}%)")

    windows = cfg.level_conv_windows()[0]  # (3,) per-GROUP (dx=-1,0,+1)
    wsubs = cfg.level_conv_subwindows()[0]
    if args.wsub or args.wsub_x:
        wy = args.wsub or wsubs[9]
        wx = args.wsub_x or wsubs[0]
        wsubs = tuple(
            min(wx if (o // 9 != 1) else wy, windows[o // 9])
            for o in range(27)
        )
    interp = jax.default_backend() != "tpu"
    print(f"group windows c/x: {windows[1]}/{windows[0]}  "
          f"wsubs: {wsubs[9]}/{wsubs[0]}  backend={jax.default_backend()}")

    rng = np.random.RandomState(0)
    for cin in args.cin:
        cout = cin  # chained timing feeds outputs back as inputs
        feat = jnp.asarray(
            rng.randn(cap, cin).astype(np.float32), dtype=jnp.bfloat16
        )
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1,
                        dtype=jnp.bfloat16)
        nbr_j = jnp.asarray(nbr)
        t_ref = timed_chained(
            lambda f, wt: subm_conv(f, nbr_j, wt), feat, w
        )
        ref = np.asarray(
            jax.jit(lambda f, wt: subm_conv(f, nbr_j, wt))(feat, w),
            np.float32,
        )
        print(f"\ncin={cin}: XLA gather form {t_ref*1e3:7.2f} ms/conv")
        for align in args.aligns:
            p = choose_pack(cin, windows, wsubs, align // 16)
            if align > 16 and p == 1:
                continue
            w27 = np.asarray(windows, np.int64)
            ws27 = np.asarray(wsubs, np.int64)
            mcap0 = cfg.level_miss_caps()[0]
            (bs, so, rl, ac, mr_, mn_, mo_, total) = native_rb.build_banded(
                nbr, cap, 512, w27, ws27, n_subgroups(512),
                2 * mcap0, align=align,
            )
            two = lambda a: jnp.asarray(a.reshape(2, mcap0))
            ml = MissList(rows=two(mr_), nbrs=two(mn_), offs=two(mo_))
            for fuse in [bool(f) for f in args.fuse]:
              for pred in [bool(x) for x in args.pred]:
               for pipe in [bool(x) for x in args.pipeline]:
                def bare(f, wt, bs=jnp.asarray(bs), so=jnp.asarray(so),
                         rl=jnp.asarray(rl), ac=jnp.asarray(ac), fuse=fuse,
                         align=align, pred=pred, pipe=pipe):
                    return subm_conv_pallas(
                        f, bs, rl, wt, window=windows, wsub=wsubs,
                        sub_offs=so, active=ac, interpret=interp,
                        pack_limit=align // 16, fuse=fuse, pred=pred,
                        pipeline=pipe,
                    )

                def run(f, wt, bare=bare):
                    return apply_miss_correction(bare(f, wt), f, wt, ml)

                try:
                    t_bare = timed_chained(bare, feat, w)
                    t_miss = timed_chained(run, feat, w)
                    out = jax.jit(run)(feat, w)  # parity check
                except Exception as e:
                    print(f"  align={align} pack={p} fuse={fuse} "
                          f"pred={int(pred)}: FAIL "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                    continue
                err = np.abs(np.asarray(out, np.float32) - ref).max()
                print(f"  align={align} pack={p} fuse={int(fuse)} "
                      f"pred={int(pred)} pipe={int(pipe)}: "
                      f"bare {t_bare*1e3:7.2f}  +miss {t_miss*1e3:7.2f} "
                      f"ms/conv  maxerr={err:.4f}  miss={total}", flush=True)


if __name__ == "__main__":
    main()
