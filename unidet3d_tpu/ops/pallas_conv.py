"""Fused submanifold conv as a Pallas TPU kernel (banded gather-matmul).

THE hot kernel of the framework. XLA row gathers cost ~20 ns/row on TPU, so
the 26 neighbor gathers per subm conv run ~30x off the HBM roofline
(docs/PERF_NOTES.md). This kernel exploits the sorted voxel order: each
offset's neighbor map is monotone, so for a block of B consecutive output
voxels all existing neighbors lie in a narrow source window. The host
rulebook emits, per (block, offset), the window base (scalar-prefetched) and
in-window relative indices; the kernel runs, per block, an unrolled loop over
the K=27 offsets with double-buffered window DMAs:

    window  = DMA  feat[base : base + W]          (contiguous, full HBM BW)
    onehot  = (rel == iota(W))                    (VPU, in VMEM)
    acc    += (onehot @ window) @ weights[o]      (two MXU matmuls)

Mosaic layout notes: dynamic lane-dim indexing is not lowerable, so the
offset axis is unrolled with one rel input per offset, and every block is
carried in (8, 64)-tiled form (sublane x lane) — rel blocks are (1, 8, 64),
outputs (1, 8, 64, C). Contractions must be SINGLE-dim (tpu.matmul rejects
multi-dim contractions on hardware; interpret mode accepts them), and the
scalar-prefetch tables are passed FLAT (SMEM pads the last dim to 128
lanes). Out-of-band entries are encoded rel = -1 (match nothing); the host
compacts them into per-level miss lists (x-offsets only in practice) and
the wrapper applies an exact XLA-gather correction whose cost scales with
the static cap — see ModelConfig.conv_miss_cap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512
WINDOW = 1024  # must be >= BLOCK + max in-block drift spread
_SUB, _LANE = 8, 64  # BLOCK rows are carried as (BLOCK/64, 64) tiles
assert BLOCK % _LANE == 0


class BandedRulebook(NamedTuple):
    """Host-built TWO-LEVEL banded rulebook for one level's subm conv.

    Level 1 (DMA): per (block, offset) a window base covering the whole
    block's neighbors — one contiguous HBM->VMEM copy.
    Level 2 (compute): per (block, SUBGROUP, offset) an offset INTO that
    window; rel indices are rebased per subgroup, so the onehot matmul is
    only `wsub` wide instead of the full window (3-4x fewer MXU/VPU FLOPs —
    drift across 128 consecutive rows is far smaller than across 512).

    bases: (nB, K) int32 window base row per (block, offset), 16-aligned.
    sub_offs: (nB, nS, K) int32 subgroup start WITHIN the window, 16-aligned,
        in [0, window - wsub].
    rel: (K, V) int32 subgroup-relative index in [0, wsub), -1 = none.
    active: (nB,) int32 1 where the block has ANY valid neighbor entry.
        Fully-padded blocks (voxel capacity is a static worst case; real
        scenes fill 20-90% of it) produce all-zero outputs, so the kernel
        skips their DMAs and matmuls entirely.
    miss_idx: (K, V) int32 original neighbor row for out-of-band entries,
        sentinel V elsewhere.
    n_miss: int (python) — total out-of-band entries.
    """

    bases: np.ndarray
    sub_offs: np.ndarray
    rel: np.ndarray
    active: np.ndarray
    miss_idx: np.ndarray
    n_miss: int


def n_subgroups(block: int) -> int:
    """Subgroups of 2 sublane rows (128 voxels) per block; degenerate to a
    single group for small blocks."""
    sub = block // _LANE
    return max(sub // 2, 1)


def build_banded_rulebook(
    neighbors: np.ndarray, capacity: int, block: int = BLOCK,
    window=WINDOW, wsub=None,
) -> BandedRulebook:
    """Convert a (V, K) neighbor table (sentinel = capacity) into the
    two-level banded form. numpy, vectorised; runs in the input pipeline.

    `window` (DMA width) and `wsub` (onehot width) may each be an int or a
    (K,) per-offset sequence (x-offsets drift a whole x-slab, y/z-offsets
    only a z-run — see ModelConfig.level_conv_windows / subwindows).
    wsub=None uses the full window (single-level behaviour)."""
    v, k = neighbors.shape
    assert v % block == 0, (v, block)
    # Host subgroup boundaries (block // ns voxels) must coincide with the
    # kernel's sublane-row boundaries ((block // LANE) // ns rows x LANE).
    assert block % (n_subgroups(block) * _LANE) == 0, (
        block, n_subgroups(block),
    )
    windows = np.broadcast_to(np.asarray(window, np.int64), (k,))
    if wsub is None:
        wsubs = windows
    else:
        wsubs = np.minimum(
            np.broadcast_to(np.asarray(wsub, np.int64), (k,)), windows
        )
    nb = v // block
    ns = n_subgroups(block)
    sub_rows = block // ns
    idx = neighbors.reshape(nb, block, k)
    valid = idx < capacity
    big = np.where(valid, idx, np.iinfo(np.int32).max)
    bases = big.min(axis=1)  # (nB, K); INT_MAX when block empty
    bases = np.where(bases == np.iinfo(np.int32).max, 0, bases)
    bases = np.minimum(bases, max(capacity - 1, 0))
    bases = (bases - (bases % 16)).astype(np.int32)  # sublane-aligned DMA
    # (16 covers bf16 (16,128) tiling; f32 (8,128) needs only 8.)

    # Subgroup bases, clamped into the window.
    big_s = big.reshape(nb, ns, sub_rows, k)
    sbase = big_s.min(axis=2)  # (nB, nS, K)
    sbase = np.where(sbase == np.iinfo(np.int32).max, 0, sbase)
    sub_offs = sbase - bases[:, None, :]
    sub_offs = sub_offs - (sub_offs % 16)  # aligned dynamic sublane slice
    lim = (windows - wsubs)[None, None, :]
    sub_offs = np.clip(sub_offs, 0, np.maximum(lim, 0)).astype(np.int32)

    rel = idx.reshape(nb, ns, sub_rows, k) - (
        bases[:, None, :] + sub_offs
    )[:, :, None, :]
    in_band = valid.reshape(nb, ns, sub_rows, k) & (rel >= 0) & (
        rel < wsubs[None, None, None, :]
    )
    rel = np.where(in_band, rel, -1).astype(np.int32)
    miss = valid.reshape(nb, ns, sub_rows, k) & ~in_band
    miss_idx = np.where(
        miss, idx.reshape(nb, ns, sub_rows, k), capacity
    ).astype(np.int32)
    # (nB, nS, sub_rows, K) -> (K, V)
    rel = np.ascontiguousarray(rel.reshape(v, k).T)
    miss_idx = np.ascontiguousarray(miss_idx.reshape(v, k).T)
    active = valid.reshape(nb, block * k).any(axis=1).astype(np.int32)
    return BandedRulebook(
        bases=bases, sub_offs=sub_offs, rel=rel, active=active,
        miss_idx=miss_idx, n_miss=int(miss.sum()),
    )


def _make_kernel(n_off: int, windows: tuple, wsubs: tuple, n_sub: int,
                 dtype=jnp.bfloat16):
    """Burst-mode TWO-LEVEL kernel: all K window DMAs for a block launch at
    once (one buffer + semaphore per offset), then the compute loop drains
    them. Per offset the block's rows are processed in `n_sub` subgroups of
    2 sublane rows (128 voxels); each subgroup's onehot matmul reads only a
    `wsub`-wide dynamic slice of the window (host-rebased rel), cutting the
    dominant onehot FLOPs 3-4x vs matching the whole window."""

    def kernel(bases_ref, sub_offs_ref, active_ref, *refs):
        # refs: rel_0..rel_{K-1}, feat, weights, out, win_0..win_{K-1},
        #       acc, sem(K)
        # bases/sub_offs arrive FLAT (nB*K / nB*nS*K): SMEM pads the last
        # dim of scalar-prefetch arrays to 128 lanes, so a (nB, nS, 27)
        # table would blow the 1 MB SMEM budget at production batch sizes.
        rels = refs[:n_off]
        feat_ref = refs[n_off]
        w_ref = refs[n_off + 1]
        out_ref = refs[n_off + 2]
        wins = refs[n_off + 3 : n_off + 3 + n_off]
        acc = refs[2 * n_off + 3]
        sem = refs[2 * n_off + 4]
        kb = pl.program_id(0)

        def dma(o):
            base = pl.multiple_of(
                bases_ref[kb * n_off + o], 16
            )  # host 16-aligns bases
            return pltpu.make_async_copy(
                feat_ref.at[pl.ds(base, windows[o])],
                wins[o],
                sem.at[o],
            )

        # Fully-padded blocks (all rel = -1) would compute exact zeros —
        # skip their DMAs and matmuls; capacities are static worst cases
        # that real scenes fill only partially.
        @pl.when(active_ref[kb] == 0)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        @pl.when(active_ref[kb] != 0)
        def _():
            for o in range(n_off):
                dma(o).start()
            acc[...] = jnp.zeros_like(acc)
            for o in range(n_off):
                dma(o).wait()
                rel = rels[o][0]  # (sub, LANE) int32
                sub = rel.shape[0]
                rows = sub // n_sub  # sublane rows per subgroup
                for sg in range(n_sub):
                    off = pl.multiple_of(
                        sub_offs_ref[(kb * n_sub + sg) * n_off + o], 16
                    )
                    wslice = wins[o][pl.ds(off, wsubs[o]), :].astype(dtype)
                    rel_sg = rel[sg * rows : (sg + 1) * rows]  # (rows, LANE)
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (*rel_sg.shape, wsubs[o]), 2
                    )
                    onehot = (rel_sg[:, :, None] == iota).astype(dtype)
                    # (rows, LANE, Wsub) x (Wsub, C) -> (rows, LANE, C)
                    g = jax.lax.dot_general(
                        onehot,
                        wslice,
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc[sg * rows : (sg + 1) * rows] += jax.lax.dot_general(
                        g.astype(dtype),
                        w_ref[o].astype(dtype),
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            out_ref[0] = acc[...]

    return kernel


def subm_conv_pallas(
    features: jnp.ndarray,  # (V, C)
    rulebook_bases: jnp.ndarray,  # (nB, K)
    rulebook_rel: jnp.ndarray,  # (K, V)
    weights: jnp.ndarray,  # (K, C, Cout)
    miss_idx: jnp.ndarray | None = None,  # (K, V) or None
    n_miss: int = 0,
    window=WINDOW,
    wsub=None,
    sub_offs: jnp.ndarray | None = None,  # (nB, nS, K)
    active: jnp.ndarray | None = None,  # (nB,) int32; None = all active
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused two-level banded subm conv. Returns (V, Cout) fp32.

    `window` (DMA) and `wsub` (onehot) are ints or (K,) per-offset widths —
    must match what the host rulebook was built with. wsub=None means
    SINGLE-LEVEL semantics (wsub = window): a rulebook built with
    wsub=None has all-zero sub_offs (its clip limit is 0), so any caller-
    provided sub_offs are ignored rather than applied against full-window
    slices (which would run the window slice out of bounds and silently
    corrupt outputs if the pack was actually built with a narrower
    wsub)."""
    v, c = features.shape
    k = weights.shape[0]
    windows = tuple(
        int(w) for w in np.broadcast_to(np.asarray(window), (k,))
    )
    nb = rulebook_bases.shape[0]
    block = v // nb
    sub = block // _LANE
    ns = n_subgroups(block)
    if wsub is None:
        wsubs = windows
        sub_offs = None  # see docstring: single-level, offsets are zero
    else:
        wsubs = tuple(
            min(int(w), windows[i])
            for i, w in enumerate(np.broadcast_to(np.asarray(wsub), (k,)))
        )
    if sub_offs is None:
        sub_offs = jnp.zeros((nb, ns, k), jnp.int32)
        wsubs = windows
    if active is None:
        active = jnp.ones((nb,), jnp.int32)
    cout = weights.shape[-1]
    # Mosaic window DMAs must cover full 128-lane tiles: pad the channel dim
    # (zero weight rows keep the math exact).
    c_pad = -(-c // 128) * 128
    feat_pad = jnp.pad(features, ((0, max(windows)), (0, c_pad - c)))
    weights_k = jnp.pad(weights, ((0, 0), (0, c_pad - c), (0, 0)))
    c = c_pad
    rel_tiled = rulebook_rel.reshape(k, nb, sub, _LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # bases, sub_offs, active
        grid=(nb,),
        in_specs=[
            *[
                pl.BlockSpec(
                    (1, sub, _LANE),
                    (lambda kb, bases, soffs, act, _o=o: (kb, 0, 0)),
                )
                for o in range(k)
            ],
            pl.BlockSpec(memory_space=pl.ANY),  # feat (HBM)
            # weights fully resident in VMEM (<= 27*160*160*4 = 2.7 MB).
            pl.BlockSpec(
                (k, c, cout), lambda kb, bases, soffs, act: (0, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, sub, _LANE, cout),
            lambda kb, bases, soffs, act: (kb, 0, 0, 0),
        ),
        scratch_shapes=[
            *[pltpu.VMEM((w, c), features.dtype) for w in windows],
            pltpu.VMEM((sub, _LANE, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((k,)),
        ],
    )
    # Kernel matmul dtype follows the features dtype: bf16 in production,
    # f32 for exact-parity tests / fp32 configs.
    kdtype = (
        jnp.float32 if features.dtype == jnp.float32 else jnp.bfloat16
    )
    out = pl.pallas_call(
        _make_kernel(k, windows, wsubs, ns, kdtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, sub, _LANE, cout), jnp.float32),
        interpret=interpret,
    )(
        rulebook_bases.reshape(-1),  # flat SMEM tables: see kernel note
        sub_offs.reshape(-1),
        active,
        *[rel_tiled[o] for o in range(k)],
        feat_pad,
        weights_k,
    )
    out = out.reshape(v, cout)

    if miss_idx is not None and n_miss > 0:
        # Exact correction for out-of-window entries (rare).
        corr = jnp.zeros_like(out)
        for o in range(k):
            g = features.at[miss_idx[o]].get(mode="fill", fill_value=0.0)
            corr = corr + jnp.dot(
                g, weights[o], preferred_element_type=jnp.float32
            )
        out = out + corr
    return out


def _make_dw_burst_kernel(n_off: int, windows: tuple, wsubs: tuple,
                          n_sub: int, dtype=jnp.bfloat16):
    """Weight-gradient kernel, BURST form mirroring the forward: grid (nB,),
    all K window DMAs for a block in flight at once (per-offset STATIC
    widths), the block's g read once, and dW (K, C, Cout) accumulated in
    VMEM across the whole grid (out block index is constant). This replaces
    the offset-major (K, nB) variant, which re-fetched the g block K times
    and paid the max-over-offsets window width for every offset. Per
    subgroup (rows of voxels down the SUBLANE axis; single-contraction
    matmuls — Mosaic's tpu.matmul rejects multi-dim contractions on real
    hardware):

        s      = onehot_sg^T @ g_sg      (rows, Wsub)^T x (rows, Cout) MXU
        dW[o] += wslice^T @ s            (Wsub, C)^T x (Wsub, Cout)    MXU
    """

    def kernel(bases_ref, sub_offs_ref, active_ref, *refs):
        # refs: rel_0..rel_{K-1} (cols), g, feat, dw_out,
        #       win_0..win_{K-1}, sem(K)
        rels = refs[:n_off]
        g_ref = refs[n_off]
        feat_ref = refs[n_off + 1]
        dw_ref = refs[n_off + 2]
        wins = refs[n_off + 3 : n_off + 3 + n_off]
        sem = refs[2 * n_off + 3]
        kb = pl.program_id(0)

        def dma(o):
            base = pl.multiple_of(bases_ref[kb * n_off + o], 16)
            return pltpu.make_async_copy(
                feat_ref.at[pl.ds(base, windows[o])],
                wins[o],
                sem.at[o],
            )

        @pl.when(kb == 0)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        # Fully-padded blocks contribute exact zeros — skip entirely.
        @pl.when(active_ref[kb] != 0)
        def _():
            for o in range(n_off):
                dma(o).start()
            g = g_ref[0]  # (sub, LANE, Cout): LANE voxels on sublanes
            sub = g.shape[0]
            rows = sub // n_sub  # sublane rows per subgroup
            for o in range(n_off):
                dma(o).wait()
                rel = rels[o][0]  # (sub, LANE) int32
                for sg in range(n_sub):
                    off = pl.multiple_of(
                        sub_offs_ref[(kb * n_sub + sg) * n_off + o], 16
                    )
                    wslice = wins[o][pl.ds(off, wsubs[o]), :].astype(dtype)
                    rel_sg = rel[sg * rows : (sg + 1) * rows]  # (rows, LANE)
                    iota = jax.lax.broadcasted_iota(
                        jnp.int32, (*rel_sg.shape, wsubs[o]), 2
                    )
                    # (rows, LANE, Wsub), voxels on the (rows x LANE)
                    # leading dims; collapse them so the contraction over
                    # voxels is ONE full-depth single-contraction matmul
                    # (Mosaic rejects multi-dim contractions on hardware,
                    # and per-sublane-row matmuls are only 64 deep).
                    onehot = (rel_sg[:, :, None] == iota).astype(dtype)
                    nvox = rel_sg.shape[0] * rel_sg.shape[1]
                    onehot2 = onehot.reshape(nvox, wsubs[o])
                    g_sg = g[sg * rows : (sg + 1) * rows]  # (rows, LANE, C')
                    g2 = g_sg.astype(dtype).reshape(nvox, g.shape[-1])
                    # A = gathered features (the SAME matmul shape as the
                    # forward), then dW[o] += A^T @ g — 4 MXU passes per
                    # (offset, subgroup), vs 6 for the (onehot^T g) order
                    # whose intermediate is Wsub-tall.
                    a = jax.lax.dot_general(
                        onehot2,
                        wslice,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (nvox, C)
                    dw_ref[o] += jax.lax.dot_general(
                        a.astype(dtype),
                        g2,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

    return kernel


def subm_conv_dw_pallas(
    features: jnp.ndarray,  # (V, C)
    grad_out: jnp.ndarray,  # (V, Cout)
    rulebook_bases: jnp.ndarray,  # (nB, K)
    rulebook_rel: jnp.ndarray,  # (K, V)
    k: int,
    window=WINDOW,
    wsub=None,
    sub_offs: jnp.ndarray | None = None,
    active: jnp.ndarray | None = None,  # (nB,) int32; None = all active
    interpret: bool = False,
) -> jnp.ndarray:
    """Banded weight gradient: dW[o] = sum_i feat[nbr(i,o)]^T grad[i].
    Returns (K, C, Cout) fp32 (un-padded). Burst form: see
    _make_dw_burst_kernel. wsub=None means single-level semantics —
    caller sub_offs are ignored (see subm_conv_pallas docstring)."""
    v, c = features.shape
    cout = grad_out.shape[-1]
    nb = rulebook_bases.shape[0]
    block = v // nb
    ns = n_subgroups(block)
    windows = tuple(
        int(w) for w in np.broadcast_to(np.asarray(window), (k,))
    )
    if wsub is None:
        wsubs = windows
        sub_offs = None
    else:
        wsubs = tuple(
            min(int(w), windows[i])
            for i, w in enumerate(np.broadcast_to(np.asarray(wsub), (k,)))
        )
    if sub_offs is None:
        sub_offs = jnp.zeros((nb, ns, k), jnp.int32)
        wsubs = windows
    if active is None:
        active = jnp.ones((nb,), jnp.int32)
    sub = block // _LANE
    c_pad = -(-c // 128) * 128
    cout_pad = -(-cout // 128) * 128
    feat_pad = jnp.pad(features, ((0, max(windows)), (0, c_pad - c)))
    g_tiled = jnp.pad(grad_out, ((0, 0), (0, cout_pad - cout))).reshape(
        nb, sub, _LANE, cout_pad
    )
    rel_tiled = rulebook_rel.reshape(k, nb, sub, _LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # bases, sub_offs, active (flat, see fwd)
        grid=(nb,),
        in_specs=[
            *[
                pl.BlockSpec(
                    (1, sub, _LANE),
                    (lambda kb, bases, soffs, act, _o=o: (kb, 0, 0)),
                )
                for o in range(k)
            ],
            pl.BlockSpec(
                (1, sub, _LANE, cout_pad),
                lambda kb, bases, soffs, act: (kb, 0, 0, 0),
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # feat (HBM)
        ],
        # Constant out block: dW accumulates in VMEM across the whole grid.
        out_specs=pl.BlockSpec(
            (k, c_pad, cout_pad), lambda kb, bases, soffs, act: (0, 0, 0)
        ),
        scratch_shapes=[
            *[pltpu.VMEM((w, c_pad), features.dtype) for w in windows],
            pltpu.SemaphoreType.DMA((k,)),
        ],
    )
    kdtype = (
        jnp.float32 if features.dtype == jnp.float32 else jnp.bfloat16
    )
    dw = pl.pallas_call(
        _make_dw_burst_kernel(k, windows, wsubs, ns, kdtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, c_pad, cout_pad), jnp.float32),
        interpret=interpret,
    )(
        rulebook_bases.reshape(-1),  # flat SMEM tables: see fwd kernel note
        sub_offs.reshape(-1),
        active,
        *[rel_tiled[o] for o in range(k)],
        g_tiled,
        feat_pad,
    )
    return dw[:, :c, :cout]


class MissList(NamedTuple):
    """Compacted out-of-window entries (static capacity M, sentinel-padded).

    rows/nbrs/offs: (M,) int32 — output row, source row, kernel offset.
    """

    rows: np.ndarray
    nbrs: np.ndarray
    offs: np.ndarray


def warn_miss_overflow(total: int, miss_cap: int) -> None:
    """Shared overflow policy for the numpy and native miss-list builders:
    entries beyond the static cap are dropped (an accuracy, not a crash,
    problem) and the host logs once per build."""
    if total > miss_cap:
        import logging

        logging.getLogger("unidet3d_tpu").warning(
            "miss list overflow: %d > %d — widen the conv window",
            total, miss_cap,
        )


def build_miss_list(
    miss_idx: np.ndarray, capacity: int, miss_cap: int
) -> MissList:
    """(K, V) miss table -> compact (M,) lists. Entries beyond miss_cap are
    dropped (host logs); size miss_cap generously."""
    offs, rows = np.nonzero(miss_idx < capacity)
    nbrs = miss_idx[offs, rows]
    n = len(rows)
    warn_miss_overflow(n, miss_cap)
    if n > miss_cap:
        rows, nbrs, offs = rows[:miss_cap], nbrs[:miss_cap], offs[:miss_cap]

    def pad(a, fill):
        out = np.full(miss_cap, fill, np.int32)
        out[: len(a)] = a
        return out

    return MissList(
        rows=pad(rows, 2**30), nbrs=pad(nbrs, 2**30), offs=pad(offs, 0)
    )


def apply_miss_correction(
    out: jnp.ndarray,  # (V, Cout)
    features: jnp.ndarray,  # (V, C)
    weights: jnp.ndarray,  # (K, C, Cout)
    miss: MissList,
) -> jnp.ndarray:
    """out[rows[m]] += feat[nbrs[m]] @ W[offs[m]] for the compact miss list.

    Per-offset masked matmuls — gathering W[offs] would materialise an
    (M, C, Cout) tensor per conv, which dwarfs the correction itself."""
    g = features.at[miss.nbrs].get(mode="fill", fill_value=0.0)  # (M, C)
    k = weights.shape[0]
    contrib = jnp.zeros((g.shape[0], weights.shape[-1]), jnp.float32)
    for o in range(k):
        sel = (miss.offs == o)[:, None]
        contrib = contrib + jnp.dot(
            jnp.where(sel, g, 0.0),
            weights[o],
            preferred_element_type=jnp.float32,
        )
    return out.at[miss.rows].add(contrib, mode="drop")


def _miss_dw(
    features: jnp.ndarray,  # (V, C)
    grad_out: jnp.ndarray,  # (V, Cout)
    miss: MissList,
    k: int,
) -> jnp.ndarray:
    """Weight-grad contribution of the compact miss list:
    dW[offs[m]] += feat[nbrs[m]]^T grad[rows[m]]. Returns (K, C, Cout)."""
    f = features.at[miss.nbrs].get(mode="fill", fill_value=0.0)  # (M, C)
    g = grad_out.at[miss.rows].get(mode="fill", fill_value=0.0)  # (M, Cout)
    dws = []
    for o in range(k):
        sel = (miss.offs == o)[:, None]
        dws.append(
            jnp.dot(
                jnp.where(sel, f, 0.0).T, g,
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.stack(dws)


# ---------------------------------------------------------------------------
# Differentiable fused banded conv (production training path).
# ---------------------------------------------------------------------------


def _banded_fwd_impl(window, wsub, interpret, features, weights, bases, rel,
                     sub_offs, active, mrows, mnbrs, moffs):
    out = subm_conv_pallas(
        features, bases, rel, weights, window=window, wsub=wsub,
        sub_offs=sub_offs, active=active, interpret=interpret,
    )
    return apply_miss_correction(
        out, features, weights, MissList(rows=mrows, nbrs=mnbrs, offs=moffs)
    )


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def subm_conv_banded(window, wsub, interpret, features, weights, bases, rel,
                     sub_offs, active, mrows, mnbrs, moffs):
    """Fused two-level banded subm conv with a custom VJP (banded backward
    on both sides — no XLA row gathers anywhere in the training step).

    d/dfeat: the mirrored conv — the full pair set of a subm conv is
    symmetric (pair (i, j, o) <-> (j, i, K-1-o), the verified scatter dual,
    sparse_conv.subm_conv_scatter), so dfeat = banded_conv(g, W') with
    W'[o] = W[K-1-o]^T, evaluated banded + exact miss correction.
    d/dW: per (block, subgroup, offset) two MXU matmuls, onehot^T @ g then
    wslice^T @ (.), accumulated across blocks (subm_conv_dw_pallas), plus
    the compact miss-list term."""
    return _banded_fwd_impl(window, wsub, interpret, features, weights,
                            bases, rel, sub_offs, active, mrows, mnbrs,
                            moffs)


def _banded_conv_fwd(window, wsub, interpret, features, weights, bases, rel,
                     sub_offs, active, mrows, mnbrs, moffs):
    out = _banded_fwd_impl(window, wsub, interpret, features, weights,
                           bases, rel, sub_offs, active, mrows, mnbrs, moffs)
    return out, (features, weights, bases, rel, sub_offs, active, mrows,
                 mnbrs, moffs)


def _banded_conv_bwd(window, wsub, interpret, res, g):
    (features, weights, bases, rel, sub_offs, active, mrows, mnbrs,
     moffs) = res
    miss = MissList(rows=mrows, nbrs=mnbrs, offs=moffs)
    k = weights.shape[0]

    # dfeat: mirrored conv on the cotangent.
    w_prime = jnp.swapaxes(weights[::-1], 1, 2)  # (K, Cout, C)
    g_c = g.astype(features.dtype)
    dfeat = subm_conv_pallas(
        g_c, bases, rel, w_prime, window=window, wsub=wsub,
        sub_offs=sub_offs, active=active, interpret=interpret,
    )
    dfeat = apply_miss_correction(dfeat, g_c, w_prime, miss)
    dfeat = dfeat.astype(features.dtype)

    # dW: banded kernel + miss term.
    dw = subm_conv_dw_pallas(
        features, g, bases, rel, k, window=window, wsub=wsub,
        sub_offs=sub_offs, active=active, interpret=interpret,
    )
    dw = dw + _miss_dw(features, g, miss, k)
    dw = dw.astype(weights.dtype)
    return (dfeat, dw, None, None, None, None, None, None, None)


subm_conv_banded.defvjp(_banded_conv_fwd, _banded_conv_bwd)
