"""Times the NON-conv backbone ops at production eval shapes (bs1, 131k).

The eval breakdown (scripts/bench_eval_fwd.py) shows the backbone at ~92 ms
of a ~113 ms forward with ~55 ms attributable to the banded subm convs —
this probe splits the remaining ~37 ms: masked BN, strided/inverse convs,
the voxel->point->superpoint pooling chain, and a single banded conv per
level for the conv-total cross-check.

Run ALONE on the chip: python scripts/bench_backbone_ops.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_chained(fn, args, n_lo=2, n_hi=22, reps=5, carry_idx=0):
    """Per-op seconds with the relay dispatch floor cancelled: chain the op
    on itself in-device at two lengths and difference. `fn(*args)` must
    return something shaped like args[carry_idx]."""
    def chained(n):
        def run(*a):
            def body(x, _):
                a2 = list(a)
                a2[carry_idx] = x
                return fn(*a2).astype(a[carry_idx].dtype) * 0.5, ()
            y, _ = jax.lax.scan(body, a[carry_idx], None, length=n)
            return jnp.sum(y)
        return jax.jit(run)

    f_lo, f_hi = chained(n_lo), chained(n_hi)
    float(f_lo(*args)); float(f_hi(*args))
    t_lo = t_hi = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(f_lo(*args))
        t_lo = min(t_lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); float(f_hi(*args))
        t_hi = min(t_hi, time.perf_counter() - t0)
    return (t_hi - t_lo) / (n_hi - n_lo)


def main():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    from unidet3d_tpu.core.config import default_config
    from unidet3d_tpu.data.batcher import build_packs
    from unidet3d_tpu.models.norm import MaskedBatchNorm
    from unidet3d_tpu.ops.segment import segment_mean
    from unidet3d_tpu.ops.sparse_conv import inverse_conv, strided_conv

    cap = 131072
    cfg = default_config(max_points=cap, voxel_capacity=cap)
    batch_np, _ = ge._synthetic_inputs(cfg, b=1, as_numpy=True)
    pack_np = build_packs(batch_np.vox_src, batch_np.valid, cfg, n_shards=1)
    pack = jax.tree_util.tree_map(jnp.asarray, pack_np)
    caps = cfg.level_capacities(1)
    planes = cfg.num_planes
    rng = np.random.RandomState(0)
    print(f"level caps: {caps}  planes: {planes}", flush=True)

    # --- masked BN (eval: running stats, scale+shift+mask) per level ----
    total_bn = 0.0
    for lvl in (0, 1, 2):
        v, c = caps[lvl], planes[lvl]
        bn = MaskedBatchNorm(c, axis_name=None)
        x = jnp.asarray(rng.randn(v, c), jnp.float32)
        mask = jnp.asarray(pack.valid[lvl])
        vars_ = bn.init(jax.random.PRNGKey(0), x, mask,
                        use_running_average=True)

        def f(x, mask):
            return bn.apply(vars_, x, mask, use_running_average=True)

        t = timed_chained(f, [x, mask])
        # 2 blocks x 2 convs-per-block BNs + down/up norms ~ 9-10 BNs/level
        total_bn += t * 10
        print(f"BN lvl{lvl} ({v}x{c})      {t*1e3:7.3f} ms (x10 = "
              f"{t*1e4:6.2f})", flush=True)

    # --- strided + inverse conv per transition --------------------------
    total_updown = 0.0
    for lvl in (0, 1, 2):
        vi, vo = caps[lvl], caps[lvl + 1]
        ci, co = planes[lvl], planes[lvl + 1]
        x = jnp.asarray(rng.randn(vi, ci), jnp.bfloat16)
        wd = jnp.asarray(rng.randn(8, ci, co) * 0.1, jnp.bfloat16)
        wu = jnp.asarray(rng.randn(8, co, ci) * 0.1, jnp.bfloat16)
        parent = jnp.asarray(pack.parent[lvl])
        ocode = jnp.asarray(pack.offset_code[lvl])

        def fd(x, parent, ocode, wd):
            y = strided_conv(x, parent, ocode, vo, wd)
            # project back so the chain carry keeps x's shape
            return (y.astype(jnp.bfloat16).at[parent].get(
                mode="fill", fill_value=0.0) @ wu[0]).astype(jnp.bfloat16)

        t_pair = timed_chained(fd, [x, parent, ocode, wd])
        xc = jnp.asarray(rng.randn(vo, co), jnp.bfloat16)

        def fu(xc, parent, ocode, wu):
            y = inverse_conv(xc, parent, ocode, wu)
            return strided_conv(
                y.astype(jnp.bfloat16), parent, ocode, vo, wd
            ).astype(jnp.bfloat16)

        t_pair2 = timed_chained(fu, [xc, parent, ocode, wu])
        # Each transition runs 1 strided (down) + 1 inverse (up); the two
        # chains above each time one of each (plus a gather/matmul carry
        # fixup), so average them for the pair cost.
        pair = (t_pair + t_pair2) / 2
        total_updown += pair
        print(f"strided+inverse lvl{lvl}->{lvl+1} ({vi}->{vo})  "
              f"{pair*1e3:7.3f} ms/pair", flush=True)

    # --- pooling chain (voxel->point gather, two segment means) ---------
    p = cfg.max_points
    s = cfg.max_superpoints
    feats = jnp.asarray(rng.randn(caps[0], 32), jnp.float32)
    pinv = jnp.asarray(np.minimum(np.arange(p), caps[0] - 1), jnp.int32)
    sp_flat = jnp.asarray(rng.randint(0, s, size=p), jnp.int32)

    def pool(feats, pinv, sp_flat):
        pf = feats.at[pinv].get(mode="fill", fill_value=0.0)
        spf = segment_mean(pf, sp_flat, s)
        return jnp.broadcast_to(spf[:1], feats.shape).astype(feats.dtype)

    t_pool = timed_chained(pool, [feats, pinv, sp_flat])
    print(f"pool gather+segmean ({p}p->{s}sp)  {t_pool*1e3:7.3f} ms",
          flush=True)

    print(f"\nBN total (~10/lvl, lvls 0-2)   {total_bn*1e3:7.1f} ms")
    print(f"up/down pairs (lvls 0-2)       {total_updown*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
