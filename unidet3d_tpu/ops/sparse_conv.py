"""Sparse convolution engine: rulebooks + gather-matmul-scatter convs.

TPU-native replacement for spconv's SubMConv3d / SparseConv3d /
SparseInverseConv3d (reference unidet3d/spconv_unet.py, unidet3d.py:96-111).
Design (idiomatic XLA, all static shapes — see SURVEY.md §7 "hard parts" #1):

  * Submanifold k=3 conv: the voxel set is sorted by packed (batch,x,y,z)
    keys, so each of the 27 neighbor offsets is resolved with one vectorised
    binary search -> a dense neighbor table (V, 27) ("rulebook"). The conv is
    then 27 x [gather (V,Cin) + matmul (Cin,Cout)] accumulated in fp32 on the
    MXU. The table is built ONCE per level per batch and shared by every subm
    conv at that level (spconv `indice_key` reuse semantics,
    spconv_unet.py:138,200).

  * Strided k=2 s=2 downsample: every input voxel belongs to exactly ONE
    output voxel (its coords//2) at one of 8 kernel offsets, so the rulebook
    is just the voxelizer's inverse mapping + a 3-bit offset code. Conv =
    8 masked matmuls + segment-sum. No neighbor search at all.

  * Inverse k=2 upsample (indice_key reuse): the transpose of the downsample
    rulebook — one gather from the parent voxel + 8 masked matmuls.

Weight layouts: (27, Cin, Cout) with offset order (dx,dy,dz), dx-major, each
in (-1,0,1); (8, Cin, Cout) with offset order code ox*4+oy*2+oz from the
voxel's low coordinate bits.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .keys import pack_keys, lookup_pair
from .segment import segment_sum
from .voxelize import VoxelGrid, voxelize

SUBM_OFFSETS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
]


def build_subm_neighbors(grid: VoxelGrid) -> jnp.ndarray:
    """Neighbor table (V, 27) for submanifold 3x3x3 conv on a sorted grid.

    Entry [i, o] is the voxel row of neighbor i+offset_o, or `capacity`
    (sentinel) when absent/invalid. All 27 offsets are resolved in ONE
    batched binary search (a (V, 27) query matrix) so the log2(V) search
    steps are a handful of large gathers instead of hundreds of tiny ones —
    the search is latency-bound otherwise.
    """
    cap = grid.capacity
    coords = grid.coords  # (V, 4)
    offs = jnp.array(
        [[0, dx, dy, dz] for (dx, dy, dz) in SUBM_OFFSETS], dtype=jnp.int32
    )  # (27, 4)
    q = coords[:, None, :] + offs[None, :, :]  # (V, 27, 4)
    in_range = jnp.all((q[..., 1:] >= 0) & (q[..., 1:] <= 4095), axis=-1)
    ok = grid.valid[:, None] & in_range  # (V, 27)
    q1, q2 = pack_keys(jnp.clip(q, 0).reshape(-1, 4), ok.reshape(-1))
    idx, found = lookup_pair(grid.key1, grid.key2, q1, q2)
    nbr = jnp.where(
        (found & ok.reshape(-1)), idx.astype(jnp.int32), cap
    ).reshape(-1, len(SUBM_OFFSETS))
    # Center offset is the identity (cheaper than searching, and exact even
    # for duplicate-free guarantees).
    center = SUBM_OFFSETS.index((0, 0, 0))
    self_idx = jnp.where(grid.valid, jnp.arange(cap, dtype=jnp.int32), cap)
    return nbr.at[:, center].set(self_idx)


def subm_conv(
    features: jnp.ndarray, neighbors: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Submanifold conv: out[i] = sum_o feat[nbr[i,o]] @ W[o].

    Args:
        features: (V, Cin).
        neighbors: (V, K) int32 table from build_subm_neighbors.
        weights: (K, Cin, Cout).

    Returns:
        (V, Cout) fp32.
    """
    k = weights.shape[0]
    center = k // 2  # (0,0,0) offset in the x-major enumeration
    # Unrolled over the (static, small) kernel-offset axis: gathers each
    # feeding one MXU matmul; XLA overlaps the gathers with the matmuls.
    # (A lax.scan carry trips shard_map's varying-axis typing; unrolling is
    # also friendlier to the scheduler.) The center offset is the identity
    # for valid rows — matmul directly, no gather. fp32 accumulation.
    out = jnp.dot(
        features, weights[center], preferred_element_type=jnp.float32
    )
    for o in range(k):
        if o == center:
            continue
        g = features.at[neighbors[:, o]].get(mode="fill", fill_value=0.0)
        out = out + jnp.dot(g, weights[o], preferred_element_type=jnp.float32)
    return out


def subm_conv_scatter(
    features: jnp.ndarray, neighbors: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Scatter-form submanifold conv — algebraic dual of `subm_conv`.

    Because the voxel list is sorted by packed coordinate keys, each kernel
    offset's neighbor map is a strictly monotonic partial bijection; the
    gather `out[i] += feat[nbr[i,o]] @ W[o]` is therefore EXACTLY the scatter
    `out[nbr[j, mirror(o)]] += feat[j] @ W[o]` with mirror(o) = K-1-o (the
    opposite offset in the x-major enumeration). This form streams `feat`
    sequentially through the MXU and replaces the (TPU-slow) row gathers
    with row scatter-adds. Same results, different memory access pattern —
    pick per backend via ModelConfig.subm_impl.
    """
    k = weights.shape[0]
    center = k // 2
    out = jnp.dot(
        features, weights[center], preferred_element_type=jnp.float32
    )
    for o in range(k):
        if o == center:
            continue
        tmp = jnp.dot(features, weights[o], preferred_element_type=jnp.float32)
        tgt = neighbors[:, k - 1 - o]
        out = out.at[tgt].add(tmp, mode="drop")
    return out


class DownsampleMap(NamedTuple):
    """Rulebook linking a fine grid to its 2x-downsampled parent grid.

    Attributes:
        grid: the coarse VoxelGrid (sorted, capacity V_out).
        parent: (V_in,) int32 fine-voxel -> coarse-voxel row (capacity_out
            sentinel for invalid rows).
        offset_code: (V_in,) int32 in [0, 8): ox*4 + oy*2 + oz from the low
            bits of the fine coords.
    """

    grid: VoxelGrid
    parent: jnp.ndarray
    offset_code: jnp.ndarray


def build_downsample_map(grid: VoxelGrid, out_capacity: int) -> DownsampleMap:
    """Build the coarse grid + rulebook for a k=2 s=2 strided conv."""
    coords = grid.coords
    coarse = jnp.concatenate([coords[:, :1], coords[:, 1:] >> 1], axis=-1)
    out_grid, _ = voxelize(coarse, grid.valid, out_capacity)
    low = coords[:, 1:] & 1
    offset_code = low[:, 0] * 4 + low[:, 1] * 2 + low[:, 2]
    return DownsampleMap(
        grid=out_grid, parent=out_grid.inverse, offset_code=offset_code
    )


def strided_conv(
    features: jnp.ndarray,
    parent: jnp.ndarray,
    offset_code: jnp.ndarray,
    out_capacity: int,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """k=2 s=2 downsampling conv: out[p] = sum_{i: parent(i)=p} feat[i] @ W[o_i].

    Args:
        features: (V_in, Cin) fine-level features.
        parent: (V_in,) fine -> coarse row (sentinel out_capacity).
        offset_code: (V_in,) 3-bit kernel offset.
        weights: (8, Cin, Cout).

    Returns:
        (V_out, Cout) coarse-level features.
    """
    contrib = jnp.zeros(
        (features.shape[0], weights.shape[-1]), dtype=jnp.float32
    )
    for o in range(8):
        sel = (offset_code == o)[:, None]
        contrib = contrib + jnp.dot(
            jnp.where(sel, features, 0.0),
            weights[o],
            preferred_element_type=jnp.float32,
        )
    return segment_sum(contrib, parent, out_capacity)


def inverse_conv(
    features: jnp.ndarray,
    parent: jnp.ndarray,
    offset_code: jnp.ndarray,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """k=2 inverse (upsampling) conv reusing the downsample rulebook.

    out[i] = feat_coarse[parent(i)] @ W[o_i] — the transpose pair structure of
    spconv's SparseInverseConv3d with a shared indice_key
    (spconv_unet.py:175-192).

    Args:
        features: (V_out, Cin) coarse-level features.
        parent: (V_in,) fine -> coarse row map (same rulebook the strided
            conv used).
        offset_code: (V_in,) 3-bit kernel offset.
        weights: (8, Cin, Cout).

    Returns:
        (V_in, Cout) fine-level features.
    """
    g = features.at[parent].get(mode="fill", fill_value=0.0)  # (V_in, Cin)
    out = jnp.zeros((g.shape[0], weights.shape[-1]), dtype=jnp.float32)
    for o in range(8):
        sel = (offset_code == o)[:, None]
        out = out + jnp.dot(
            jnp.where(sel, g, 0.0),
            weights[o],
            preferred_element_type=jnp.float32,
        )
    return out
