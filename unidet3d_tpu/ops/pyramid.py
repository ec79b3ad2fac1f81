"""Grid pyramid: per-level rulebooks for the sparse U-Net, built once per batch.

This is the TPU analog of spconv's `indice_key` rulebook caching
(reference unidet3d/spconv_unet.py:138-200): every submanifold conv at level l
shares one neighbor table; every strided/inverse conv pair across levels
(l, l+1) shares one DownsampleMap. Building the pyramid is jittable and
static-shaped; it runs before the network forward and is reused by all conv
layers in both the down and up paths.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

from .sparse_conv import (
    DownsampleMap,
    build_downsample_map,
    build_subm_neighbors,
)
from .voxelize import VoxelGrid


class GridPyramid(NamedTuple):
    grids: tuple  # VoxelGrid, one per level
    neighbors: tuple  # (V_l, 27) int32 subm tables, one per level
    ds: tuple  # DownsampleMap, one per level transition (len = levels - 1)


def build_pyramid(
    grid0: VoxelGrid, capacities: Sequence[int]
) -> GridPyramid:
    """Build all rulebooks. capacities[l] is the voxel capacity of level l;
    capacities[0] must equal grid0.capacity."""
    assert capacities[0] == grid0.capacity
    grids = [grid0]
    ds = []
    for cap in capacities[1:]:
        m = build_downsample_map(grids[-1], cap)
        ds.append(m)
        grids.append(m.grid)
    neighbors = [build_subm_neighbors(g) for g in grids]
    return GridPyramid(grids=tuple(grids), neighbors=tuple(neighbors), ds=tuple(ds))
