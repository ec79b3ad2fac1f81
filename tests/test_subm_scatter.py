"""Scatter-form subm conv must match the gather form exactly."""
import numpy as np
import jax.numpy as jnp

from unidet3d_tpu.ops.sparse_conv import (
    build_subm_neighbors,
    subm_conv,
    subm_conv_scatter,
)
from unidet3d_tpu.ops.voxelize import voxelize

RNG = np.random.RandomState(5)


def test_scatter_matches_gather():
    n = 300
    bxyz = np.concatenate(
        [RNG.randint(0, 3, (n, 1)), RNG.randint(0, 10, (n, 3))], axis=1
    ).astype(np.int32)
    valid = RNG.rand(n) > 0.1
    grid, vf = voxelize(
        jnp.array(bxyz), jnp.array(valid), 256,
        jnp.array(RNG.randn(n, 8).astype(np.float32)),
    )
    nbr = build_subm_neighbors(grid)
    w = jnp.array(RNG.randn(27, 8, 12).astype(np.float32))
    a = np.asarray(subm_conv(vf, nbr, w))
    b = np.asarray(subm_conv_scatter(vf, nbr, w))
    nv = int(grid.n_voxels)
    np.testing.assert_allclose(a[:nv], b[:nv], rtol=1e-4, atol=1e-4)
