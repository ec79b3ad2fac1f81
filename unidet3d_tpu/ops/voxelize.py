"""Fused voxelization: quantize + dedup + segment-mean + inverse mapping.

TPU-native replacement for MinkowskiEngine's `batch_sparse_collate` +
`TensorField(...).sparse()` + `field.inverse_mapping` (reference
unidet3d/unidet3d.py:157-176): floor-quantize batched point coordinates,
deduplicate voxels via lexicographic sort on packed int32 keys, average
features per voxel, and emit the point->voxel inverse mapping. Everything is
static-shaped: voxel arrays have a fixed `capacity`; overflow voxels (beyond
capacity) are dropped and their points marked invalid.

The returned voxel set is SORTED by (batch, x, y, z) key — downstream sparse
convolutions rely on this for binary-search neighbor lookup.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .keys import INVALID_KEY, MAX_COORD, lookup_pair, pack_keys  # noqa: F401
from .segment import segment_count, segment_sum


class VoxelGrid(NamedTuple):
    """A static-capacity sorted sparse voxel set.

    Attributes:
        coords: (V, 4) int32 (batch, x, y, z); garbage beyond n_voxels.
        key1, key2: (V,) int32 sorted lexicographic keys (INVALID_KEY padding).
        valid: (V,) bool — row < n_voxels.
        n_voxels: () int32 number of real voxels (<= capacity).
        inverse: (N,) int32 input-row -> voxel-row map; == capacity (sentinel)
            for invalid/overflowed inputs.
        counts: (V,) float32 number of input rows per voxel.
    """

    coords: jnp.ndarray
    key1: jnp.ndarray
    key2: jnp.ndarray
    valid: jnp.ndarray
    n_voxels: jnp.ndarray
    inverse: jnp.ndarray
    counts: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.key1.shape[0]


def voxelize(
    bxyz: jnp.ndarray,
    valid: jnp.ndarray,
    capacity: int,
    features: jnp.ndarray | None = None,
):
    """Deduplicate integer voxel coordinates and (optionally) average features.

    Args:
        bxyz: (N, 4) int32 (batch, x, y, z), coords assumed >= 0 (clipped to
            MAX_COORD internally).
        valid: (N,) bool input validity.
        capacity: static voxel capacity V.
        features: optional (N, F) features to segment-mean into voxels.

    Returns:
        (VoxelGrid, voxel_features or None).
    """
    n = bxyz.shape[0]
    bxyz = jnp.concatenate(
        [bxyz[:, :1], jnp.clip(bxyz[:, 1:], 0, MAX_COORD)], axis=-1
    )
    k1, k2 = pack_keys(bxyz, valid)

    order = jnp.lexsort((k2, k1))
    k1s = k1[order]
    k2s = k2[order]
    valid_s = valid[order]

    new_group = jnp.concatenate(
        [
            jnp.ones((1,), dtype=jnp.int32),
            ((k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])).astype(jnp.int32),
        ]
    )
    # Invalid rows share INVALID_KEY => they form (at most) one trailing group.
    seg = jnp.cumsum(new_group) - 1  # (N,) group id per sorted row
    n_voxels = jnp.sum(jnp.where(valid_s, new_group, 0))
    n_voxels = jnp.minimum(n_voxels, capacity)

    # Per-sorted-row voxel id; rows whose group >= capacity (overflow) or that
    # are invalid get the sentinel `capacity`.
    seg_ok = valid_s & (seg < capacity)
    seg_c = jnp.where(seg_ok, seg, capacity)

    # Scatter back to input order for the inverse mapping.
    inverse = jnp.zeros((n,), dtype=jnp.int32).at[order].set(seg_c)

    # Voxel keys/coords: first row of each group (groups are contiguous).
    first_of_group = new_group.astype(bool) & seg_ok
    row_ids = jnp.where(first_of_group, seg_c, capacity)
    key1 = jnp.full((capacity,), INVALID_KEY, jnp.int32).at[row_ids].set(
        k1s, mode="drop"
    )
    key2 = jnp.full((capacity,), INVALID_KEY, jnp.int32).at[row_ids].set(
        k2s, mode="drop"
    )
    coords = jnp.zeros((capacity, 4), jnp.int32).at[row_ids].set(
        bxyz[order], mode="drop"
    )

    vox_valid = jnp.arange(capacity) < n_voxels
    counts = segment_count(seg_c, capacity)

    grid = VoxelGrid(
        coords=coords,
        key1=key1,
        key2=key2,
        valid=vox_valid,
        n_voxels=n_voxels,
        inverse=inverse,
        counts=counts,
    )

    if features is None:
        return grid, None

    feats_s = features[order]
    total = segment_sum(
        jnp.where(valid_s[:, None], feats_s, 0.0), seg_c, capacity
    )
    vox_feats = total / jnp.maximum(counts[:, None], 1.0)
    return grid, vox_feats


def gather_voxel_to_points(
    voxel_feats: jnp.ndarray, inverse: jnp.ndarray
) -> jnp.ndarray:
    """Gather per-voxel features back to points; sentinel rows -> zeros."""
    return voxel_feats.at[inverse].get(mode="fill", fill_value=0.0)
