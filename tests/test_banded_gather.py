"""Banded gather must equal a plain gather for any (even adversarial) index."""
import numpy as np
import jax.numpy as jnp

from unidet3d_tpu.ops.banded_gather import banded_gather, subm_conv_banded
from unidet3d_tpu.ops.sparse_conv import build_subm_neighbors, subm_conv
from unidet3d_tpu.ops.voxelize import voxelize

RNG = np.random.RandomState(9)


def _check(idx, v=512, c=8, hb=32, block=64):
    feat = RNG.randn(v, c).astype(np.float32)
    out = np.asarray(
        banded_gather(
            jnp.asarray(feat), jnp.asarray(idx.astype(np.int32)),
            half_band=hb, block=block, compute_dtype=jnp.float32,
        )
    )
    expected = np.where(
        (idx < v)[:, None], feat[np.clip(idx, 0, v - 1)], 0.0
    )
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_in_band_monotone():
    v = 512
    drift = RNG.randint(-20, 21, v)
    idx = np.clip(np.arange(v) + drift, 0, v - 1)
    _check(idx)


def test_with_sentinels():
    v = 512
    idx = np.clip(np.arange(v) + RNG.randint(-20, 21, v), 0, v - 1)
    idx[RNG.rand(v) < 0.3] = v  # sentinel
    _check(idx)


def test_out_of_band_fallback():
    v = 512
    idx = np.clip(np.arange(v) + RNG.randint(-20, 21, v), 0, v - 1)
    idx[5] = v - 1  # far out of band for early block
    idx[400] = 0
    _check(idx)


def test_adversarial_random():
    v = 512
    idx = RNG.randint(0, v + 1, v)  # fully random incl sentinels
    _check(idx)


def test_uneven_length():
    v = 512
    idx = np.clip(np.arange(300) + RNG.randint(-10, 11, 300), 0, v - 1)
    _check(idx.astype(np.int64))


def test_subm_conv_banded_matches_gather_form():
    n = 400
    bxyz = np.concatenate(
        [RNG.randint(0, 2, (n, 1)), RNG.randint(0, 12, (n, 3))], axis=1
    ).astype(np.int32)
    grid, vf = voxelize(
        jnp.array(bxyz), jnp.ones(n, bool), 512,
        jnp.array(RNG.randn(n, 8).astype(np.float32)),
    )
    nbr = build_subm_neighbors(grid)
    w = jnp.array(RNG.randn(27, 8, 8).astype(np.float32))
    a = np.asarray(subm_conv(vf, nbr, w))
    b = np.asarray(
        subm_conv_banded(
            vf, nbr, w, half_bands=[64] * 27, block=64,
            compute_dtype=jnp.float32,
        )
    )
    nv = int(grid.n_voxels)
    np.testing.assert_allclose(a[:nv], b[:nv], rtol=1e-4, atol=1e-4)
