"""Fused submanifold conv as a Pallas TPU kernel (banded gather-matmul).

THE hot kernel of the framework. XLA row gathers cost ~20 ns/row on TPU, so
the 26 neighbor gathers per subm conv run ~30x off the HBM roofline
(docs/PERF_NOTES.md). This kernel exploits the sorted voxel order: each
offset's neighbor map is monotone, so for a block of B consecutive output
voxels all existing neighbors lie in a narrow source window. The host
rulebook emits, per (block, offset), the window base (scalar-prefetched) and
in-window relative indices; the kernel then runs, per (block, offset) grid
step:

    window  = DMA  feat[base : base + W]          (contiguous, full HBM BW)
    onehot  = (rel[:, None] == iota(W))           (VPU, in VMEM)
    acc    += (onehot @ window) @ weights[o]      (two MXU matmuls)

accumulating all K=27 offsets into the same VMEM output block (offset is the
innermost grid dim). Out-of-window entries are encoded rel = -1 (match
nothing); the host counts them (`n_miss`) and the wrapper applies an exact
XLA-gather correction only when any exist — typically never.
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


class BandedRulebook(NamedTuple):
    """Host-built banded rulebook for one level's subm conv.

    bases: (nB, K) int32 window base row per (block, offset).
    rel: (V, K) int32 in-window relative index, -1 = no contribution.
    miss_idx: (V, K) int32 original neighbor row for out-of-window entries,
        sentinel V for the rest (used by the rare fallback path).
    n_miss: int (python) — total out-of-window entries.
    """

    bases: np.ndarray
    rel: np.ndarray
    miss_idx: np.ndarray
    n_miss: int


def build_banded_rulebook(
    neighbors: np.ndarray, capacity: int, block: int = BLOCK,
    window: int = WINDOW,
) -> BandedRulebook:
    """Convert a (V, K) neighbor table (sentinel = capacity) into the banded
    form. numpy, vectorised; runs in the input pipeline."""
    v, k = neighbors.shape
    assert v % block == 0, (v, block)
    nb = v // block
    idx = neighbors.reshape(nb, block, k)
    valid = idx < capacity
    big = np.where(valid, idx, np.iinfo(np.int32).max)
    bases = big.min(axis=1)  # (nB, K); INT_MAX when block empty
    bases = np.where(bases == np.iinfo(np.int32).max, 0, bases)
    bases = np.minimum(bases, max(capacity - 1, 0)).astype(np.int32)
    rel = idx - bases[:, None, :]
    in_win = valid & (rel >= 0) & (rel < window)
    rel = np.where(in_win, rel, -1).astype(np.int32).reshape(v, k)
    miss = valid & ~in_win
    miss_idx = np.where(miss, idx, capacity).astype(np.int32).reshape(v, k)
    return BandedRulebook(
        bases=bases, rel=rel, miss_idx=miss_idx, n_miss=int(miss.sum())
    )


def _kernel(bases_ref, rel_ref, feat_ref, w_ref, out_ref, win, acc, sem):
    kb = pl.program_id(0)
    o = pl.program_id(1)
    n_off = pl.num_programs(1)
    block = rel_ref.shape[0]
    window = win.shape[0]

    base = bases_ref[kb, o]
    cp = pltpu.make_async_copy(feat_ref.at[pl.ds(base, window)], win, sem)
    cp.start()

    @pl.when(o == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    cp.wait()
    rel = rel_ref[:, o]  # (B,)
    iota = jax.lax.broadcasted_iota(jnp.int32, (block, window), 1)
    onehot = (rel[:, None] == iota).astype(jnp.bfloat16)
    g = jnp.dot(
        onehot, win[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    acc[...] += jnp.dot(
        g.astype(jnp.bfloat16), w_ref[0].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(o == n_off - 1)
    def _():
        out_ref[...] = acc[...]


def subm_conv_pallas(
    features: jnp.ndarray,  # (V, C)
    rulebook_bases: jnp.ndarray,  # (nB, K)
    rulebook_rel: jnp.ndarray,  # (V, K)
    weights: jnp.ndarray,  # (K, C, Cout)
    miss_idx: jnp.ndarray | None = None,  # (V, K) or None
    n_miss: int = 0,
    window: int = WINDOW,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused banded subm conv. Returns (V, Cout) fp32."""
    v, c = features.shape
    k = weights.shape[0]
    block = v // rulebook_bases.shape[0]
    cout = weights.shape[-1]
    feat_pad = jnp.pad(features, ((0, window), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # bases
        grid=(v // block, k),
        in_specs=[
            pl.BlockSpec((block, k), lambda kb, o, bases: (kb, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, c, cout), lambda kb, o, bases: (o, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block, cout), lambda kb, o, bases: (kb, 0)),
        scratch_shapes=[
            pltpu.VMEM((window, c), features.dtype),
            pltpu.VMEM((block, cout), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, cout), jnp.float32),
        interpret=interpret,
    )(rulebook_bases, rulebook_rel, feat_pad, weights)

    if miss_idx is not None and n_miss > 0:
        # Exact correction for out-of-window entries (rare).
        corr = jnp.zeros_like(out)
        for o in range(k):
            g = features.at[miss_idx[:, o]].get(mode="fill", fill_value=0.0)
            corr = corr + jnp.dot(
                g, weights[o], preferred_element_type=jnp.float32
            )
        out = out + corr
    return out
