"""Bottleneck bisection probe for the banded conv kernel.

Times stripped variants of the forward kernel at production level-0 scale:
  full      — the real kernel (pack=4, fused)
  dma_only  — window DMAs + trivial output (no onehot/matmuls)
  no_dma    — full compute against uninitialized window scratch (no DMAs)
  no_onehot — DMAs + second matmul on a constant G (no iota/compare/gather)

Interpretation: if dma_only ~ full, the kernel is DMA-bound (count or
latency, since bytes changes with pack didn't move it); if no_dma ~ full,
compute/VPU-bound; if both are far below full, it's the interleaving.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unidet3d_tpu.core.config import ModelConfig
from unidet3d_tpu.data.synthetic import synthetic_scene
from unidet3d_tpu.native import rulebook as native_rb
from unidet3d_tpu.ops.gridpack import build_gridpack_host, quantize_points
from unidet3d_tpu.ops.pallas_conv import (
    _pack_geometry,
    choose_pack,
    n_subgroups,
)

_SUB, _LANE = 8, 64


def make_kernel(n_off, wp, wsp, n_sub, dtype, pack, c_slice, mode):
    def kernel(bases_ref, sub_offs_ref, active_ref, *refs):
        rels = refs[:n_off]
        feat_ref = refs[n_off]
        w_ref = refs[n_off + 1]
        out_ref = refs[n_off + 2]
        wins = refs[n_off + 3 : n_off + 3 + n_off]
        stage = refs[2 * n_off + 3]
        sem = refs[2 * n_off + 4]
        kb = pl.program_id(0)
        lane_w = pack * c_slice

        def dma(o):
            base = pl.multiple_of(bases_ref[kb * n_off + o], 16)
            return pltpu.make_async_copy(
                feat_ref.at[pl.ds(base, wp[o])], wins[o], sem.at[o]
            )

        @pl.when(active_ref[kb] == 0)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        @pl.when(active_ref[kb] != 0)
        def _():
            if mode != "no_dma":
                for o in range(n_off):
                    dma(o).start()
            if mode == "dma_only":
                acc = jnp.zeros((1, 128), jnp.float32)
                for o in range(n_off):
                    dma(o).wait()
                    acc = acc + wins[o][0:1, :].astype(jnp.float32)
                out_ref[0] = jnp.broadcast_to(
                    acc[0, : out_ref.shape[-1]],
                    out_ref.shape[1:],
                )[None][0]
                return
            for o in range(n_off):
                if mode != "no_dma":
                    dma(o).wait()
                rel = rels[o][0]
                sub = rel.shape[0]
                rows = sub // n_sub
                for sg in range(n_sub):
                    off = pl.multiple_of(
                        sub_offs_ref[(kb * n_sub + sg) * n_off + o], 16
                    )
                    wslice = wins[o][pl.ds(off, wsp[o]), :].astype(dtype)
                    rel_sg = rel[sg * rows : (sg + 1) * rows]
                    if mode == "no_onehot":
                        g = jnp.broadcast_to(
                            wslice[0], (rows, _LANE, lane_w)
                        ).astype(jnp.float32)
                    else:
                        if pack == 1:
                            prel = rel_sg
                        else:
                            prel = jnp.where(rel_sg < 0, -1, rel_sg // pack)
                        iota = jax.lax.broadcasted_iota(
                            jnp.int32, (*rel_sg.shape, wsp[o]), 2
                        )
                        onehot = (prel[:, :, None] == iota).astype(dtype)
                        g = jax.lax.dot_general(
                            onehot, wslice,
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        if pack > 1:
                            j = rel_sg - prel * pack
                            lane = jax.lax.broadcasted_iota(
                                jnp.int32, (*rel_sg.shape, lane_w), 2
                            ) // c_slice
                            g = jnp.where(lane == j[:, :, None], g, 0.0)
                    lo = sg * rows
                    stage[lo : lo + rows, :, o * lane_w : (o + 1) * lane_w] = (
                        g.astype(dtype)
                    )
            out_ref[0] = jax.lax.dot_general(
                stage[...], w_ref[...],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    return kernel


def run_variant(feats, bases, rel, soffs, active, weights, windows, wsubs,
                pack, mode, cout):
    v, c = feats.shape
    k = 27
    nb = bases.shape[0]
    block = v // nb
    sub = block // _LANE
    ns = n_subgroups(block)
    kdtype = jnp.bfloat16
    c_slice, lane_w, wp, wsp, feat_view, w_lane = _pack_geometry(
        c, cout, feats, weights, windows, wsubs, pack
    )
    w_arg = w_lane.reshape(k * lane_w, cout)
    rel_tiled = rel.reshape(k, nb, sub, _LANE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[
            *[pl.BlockSpec((1, sub, _LANE),
                           (lambda kb, b, s, a, _o=o: (kb, 0, 0)))
              for o in range(k)],
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(w_arg.shape, lambda kb, b, s, a: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sub, _LANE, cout),
                               lambda kb, b, s, a: (kb, 0, 0, 0)),
        scratch_shapes=[
            *[pltpu.VMEM((w, lane_w), feats.dtype) for w in wp],
            pltpu.VMEM((sub, _LANE, k * lane_w), kdtype),
            pltpu.SemaphoreType.DMA((k,)),
        ],
    )
    out = pl.pallas_call(
        make_kernel(k, wp, wsp, ns, kdtype, pack, c_slice, mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, sub, _LANE, cout), jnp.float32),
    )(
        bases.reshape(-1) // pack,
        soffs.reshape(-1) // pack,
        active,
        *[rel_tiled[o] for o in range(k)],
        feat_view,
        w_arg,
    )
    return out.reshape(v, cout)


def main():
    cap = 131072
    cfg = ModelConfig(max_points=cap, voxel_capacity=cap)
    sc = synthetic_scene(cap, seed=5)
    vox_src = (sc[None, :, :3] / cfg.voxel_size).astype(np.float32)
    valid = np.ones((1, len(sc)), bool)
    bxyz = quantize_points(vox_src, valid)
    pack_g, _ = build_gridpack_host(bxyz, valid.reshape(-1), [cap])
    nbr = np.asarray(pack_g.neighbors[0])
    windows = cfg.level_conv_windows()[0]
    wsubs = cfg.level_conv_subwindows()[0]
    align = 64
    p = choose_pack(32, windows, wsubs, align // 16)
    print(f"pack={p}")
    (bs, so, rl, ac, *_rest) = native_rb.build_banded(
        nbr, cap, 512, np.asarray(windows, np.int64),
        np.asarray(wsubs, np.int64), n_subgroups(512), 8192, align=align,
    )
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(cap, 32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(27, 32, 32) * 0.1, jnp.bfloat16)
    args = (feat, jnp.asarray(bs), jnp.asarray(rl), jnp.asarray(so),
            jnp.asarray(ac), w)
    # The axon relay costs ~25-30 ms per dispatch round trip — chain the
    # kernel IN-DEVICE with lax.scan (cout == cin so outputs feed back) and
    # difference two scan lengths to cancel the relay + fixed overheads.
    def chained(n_iters, mode):
        def fn(f, b, r, s, a, wt):
            def body(x, _):
                out = run_variant(x, b, r, s, a, wt, windows, wsubs, p,
                                  mode, 32)
                return out.astype(jnp.bfloat16) * 1e-2, ()
            y, _ = jax.lax.scan(body, f, None, length=n_iters)
            return jnp.sum(y)
        return jax.jit(fn)

    n_lo, n_hi = 2, 22
    for mode in ("full", "dma_only", "no_dma", "no_onehot"):
        try:
            f_lo, f_hi = chained(n_lo, mode), chained(n_hi, mode)
            float(f_lo(*args)); float(f_hi(*args))  # compile
            t_lo = t_hi = float("inf")
            for _ in range(5):
                t0 = time.perf_counter(); float(f_lo(*args))
                t_lo = min(t_lo, time.perf_counter() - t0)
                t0 = time.perf_counter(); float(f_hi(*args))
                t_hi = min(t_hi, time.perf_counter() - t0)
            per = (t_hi - t_lo) / (n_hi - n_lo)
            print(f"{mode:10s}: {per*1e3:7.2f} ms/conv "
                  f"(lo {t_lo*1e3:.1f} hi {t_hi*1e3:.1f})", flush=True)
        except Exception as e:
            print(f"{mode:10s}: FAIL {type(e).__name__} {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
