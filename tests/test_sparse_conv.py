"""Sparse conv ops vs. brute-force dense reference on random small grids."""
import numpy as np
import jax.numpy as jnp

from unidet3d_tpu.ops.sparse_conv import (
    SUBM_OFFSETS,
    build_downsample_map,
    build_subm_neighbors,
    inverse_conv,
    strided_conv,
    subm_conv,
)
from unidet3d_tpu.ops.voxelize import voxelize

RNG = np.random.RandomState(0)


def _random_grid(n=40, extent=6, batch=2, cin=3, capacity=64):
    coords = RNG.randint(0, extent, size=(n, 3))
    b = RNG.randint(0, batch, size=(n, 1))
    bxyz = np.concatenate([b, coords], axis=1).astype(np.int32)
    feats = RNG.randn(n, cin).astype(np.float32)
    grid, vf = voxelize(
        jnp.array(bxyz), jnp.ones(n, bool), capacity, jnp.array(feats)
    )
    return grid, vf


def test_subm_neighbors_center_is_self():
    grid, _ = _random_grid()
    nbr = np.asarray(build_subm_neighbors(grid))
    nv = int(grid.n_voxels)
    center = SUBM_OFFSETS.index((0, 0, 0))
    np.testing.assert_array_equal(nbr[:nv, center], np.arange(nv))
    # Invalid rows are all-sentinel.
    assert (nbr[nv:] == grid.capacity).all()


def test_subm_conv_matches_bruteforce():
    grid, vf = _random_grid()
    nv = int(grid.n_voxels)
    coords = np.asarray(grid.coords)[:nv]
    feats = np.asarray(vf)[:nv]
    cin, cout = feats.shape[1], 5
    w = RNG.randn(27, cin, cout).astype(np.float32)

    # Brute force: for each voxel, sum over present neighbors.
    lut = {tuple(c): i for i, c in enumerate(coords.tolist())}
    expected = np.zeros((nv, cout), np.float32)
    for i, c in enumerate(coords.tolist()):
        for o, (dx, dy, dz) in enumerate(SUBM_OFFSETS):
            key = (c[0], c[1] + dx, c[2] + dy, c[3] + dz)
            j = lut.get(key)
            if j is not None:
                expected[i] += feats[j] @ w[o]

    nbr = build_subm_neighbors(grid)
    out = np.asarray(subm_conv(vf, nbr, jnp.array(w)))
    np.testing.assert_allclose(out[:nv], expected, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out[nv:], 0.0, atol=1e-6)


def test_strided_and_inverse_conv():
    grid, vf = _random_grid()
    nv = int(grid.n_voxels)
    coords = np.asarray(grid.coords)[:nv]
    feats = np.asarray(vf)[:nv]
    cin, cout = feats.shape[1], 4
    w = RNG.randn(8, cin, cout).astype(np.float32)

    ds = build_downsample_map(grid, 32)
    out = np.asarray(
        strided_conv(vf, ds.parent, ds.offset_code, 32, jnp.array(w))
    )
    n_out = int(ds.grid.n_voxels)
    out_coords = np.asarray(ds.grid.coords)[:n_out]

    # Brute force downsample.
    expected = np.zeros((n_out, cout), np.float32)
    lut_out = {tuple(c): i for i, c in enumerate(out_coords.tolist())}
    for i, c in enumerate(coords.tolist()):
        parent = (c[0], c[1] // 2, c[2] // 2, c[3] // 2)
        o = (c[1] % 2) * 4 + (c[2] % 2) * 2 + (c[3] % 2)
        expected[lut_out[parent]] += feats[i] @ w[o]
    np.testing.assert_allclose(out[:n_out], expected, rtol=1e-4, atol=1e-4)

    # Unique parent count sanity.
    parents = {(c[0], c[1] // 2, c[2] // 2, c[3] // 2) for c in coords.tolist()}
    assert n_out == len(parents)

    # Inverse conv: out[i] = coarse_feat[parent(i)] @ w2[o_i].
    w2 = RNG.randn(8, cout, cin).astype(np.float32)
    coarse = np.asarray(out)
    up = np.asarray(
        inverse_conv(jnp.array(coarse), ds.parent, ds.offset_code, jnp.array(w2))
    )
    expected_up = np.zeros((nv, cin), np.float32)
    for i, c in enumerate(coords.tolist()):
        parent = (c[0], c[1] // 2, c[2] // 2, c[3] // 2)
        o = (c[1] % 2) * 4 + (c[2] % 2) * 2 + (c[3] % 2)
        expected_up[i] = coarse[lut_out[parent]] @ w2[o]
    np.testing.assert_allclose(up[:nv], expected_up, rtol=1e-4, atol=1e-4)
