"""Tests for the fused voxelizer (dedup / segment-mean / inverse mapping)."""
import numpy as np
import jax.numpy as jnp

from unidet3d_tpu.ops.voxelize import voxelize, gather_voxel_to_points
from unidet3d_tpu.ops.keys import INVALID_KEY


def _make_points():
    # 6 points, 4 unique voxels across 2 batch elements.
    bxyz = np.array(
        [
            [0, 1, 1, 1],
            [0, 1, 1, 1],  # dup of row 0
            [0, 2, 0, 0],
            [1, 1, 1, 1],  # same coords, different batch
            [1, 0, 0, 0],
            [0, 2, 0, 0],  # dup of row 2
        ],
        dtype=np.int32,
    )
    feats = np.arange(12, dtype=np.float32).reshape(6, 2)
    valid = np.ones(6, bool)
    return bxyz, feats, valid


def test_voxelize_dedup_and_mean():
    bxyz, feats, valid = _make_points()
    grid, vf = voxelize(jnp.array(bxyz), jnp.array(valid), 8, jnp.array(feats))
    assert int(grid.n_voxels) == 4
    coords = np.asarray(grid.coords)[:4]
    # Sorted lexicographically by (batch, x, y, z).
    expected = np.array([[0, 1, 1, 1], [0, 2, 0, 0], [1, 0, 0, 0], [1, 1, 1, 1]])
    np.testing.assert_array_equal(coords, expected)
    vf = np.asarray(vf)
    # Voxel 0 = mean of rows 0,1; voxel 1 = mean of rows 2,5.
    np.testing.assert_allclose(vf[0], (feats[0] + feats[1]) / 2)
    np.testing.assert_allclose(vf[1], (feats[2] + feats[5]) / 2)
    np.testing.assert_allclose(vf[2], feats[4])
    np.testing.assert_allclose(vf[3], feats[3])
    # Counts.
    np.testing.assert_allclose(np.asarray(grid.counts)[:4], [2, 2, 1, 1])


def test_voxelize_inverse_mapping():
    bxyz, feats, valid = _make_points()
    grid, vf = voxelize(jnp.array(bxyz), jnp.array(valid), 8, jnp.array(feats))
    inv = np.asarray(grid.inverse)
    assert inv[0] == inv[1]
    assert inv[2] == inv[5]
    assert len({inv[0], inv[2], inv[3], inv[4]}) == 4
    # Round-trip: gather voxel feature back to each point.
    per_point = np.asarray(gather_voxel_to_points(vf, grid.inverse))
    np.testing.assert_allclose(per_point[0], (feats[0] + feats[1]) / 2)


def test_voxelize_invalid_points():
    bxyz, feats, valid = _make_points()
    valid[3] = False
    grid, _ = voxelize(jnp.array(bxyz), jnp.array(valid), 8, jnp.array(feats))
    assert int(grid.n_voxels) == 3
    assert int(grid.inverse[3]) == 8  # sentinel == capacity
    # Padding rows have INVALID_KEY.
    assert int(grid.key1[5]) == INVALID_KEY


def test_voxelize_overflow_drops():
    bxyz = np.stack(
        [np.zeros(10, np.int32), np.arange(10, dtype=np.int32),
         np.zeros(10, np.int32), np.zeros(10, np.int32)], axis=1)
    grid, _ = voxelize(
        jnp.array(bxyz), jnp.ones(10, bool), 4, jnp.zeros((10, 1))
    )
    assert int(grid.n_voxels) == 4
    inv = np.asarray(grid.inverse)
    assert (inv >= 4).sum() == 6  # overflowed points get sentinel
