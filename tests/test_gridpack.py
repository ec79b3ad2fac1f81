"""Host (numpy) GridPack builder must match the device (XLA) builder bit-for-bit."""
import numpy as np
import jax.numpy as jnp

from unidet3d_tpu.ops.gridpack import (
    build_gridpack_device,
    build_gridpack_numpy,
    quantize_points,
)
from unidet3d_tpu.ops.segment import segment_count


def _compare(bxyz, valid, caps):
    dev_pack, grid0 = build_gridpack_device(
        jnp.array(bxyz), jnp.array(valid), caps
    )
    host_pack, counts0 = build_gridpack_numpy(bxyz, valid, caps)
    for lvl in range(len(caps)):
        np.testing.assert_array_equal(
            np.asarray(dev_pack.valid[lvl]), host_pack.valid[lvl], f"valid L{lvl}"
        )
        np.testing.assert_array_equal(
            np.asarray(dev_pack.neighbors[lvl]),
            host_pack.neighbors[lvl],
            f"neighbors L{lvl}",
        )
    for t in range(len(caps) - 1):
        # Parent maps must agree on valid rows (padding rows may differ).
        v = host_pack.valid[t]
        np.testing.assert_array_equal(
            np.asarray(dev_pack.parent[t])[v], host_pack.parent[t][v], f"parent T{t}"
        )
        np.testing.assert_array_equal(
            np.asarray(dev_pack.offset_code[t])[v],
            host_pack.offset_code[t][v],
            f"offset T{t}",
        )
    np.testing.assert_array_equal(
        np.asarray(dev_pack.point_inverse), host_pack.point_inverse
    )
    np.testing.assert_allclose(np.asarray(grid0.counts), counts0)


def test_host_matches_device_random():
    rng = np.random.RandomState(0)
    n = 500
    bxyz = np.concatenate(
        [
            rng.randint(0, 3, (n, 1)),
            rng.randint(0, 12, (n, 3)),
        ],
        axis=1,
    ).astype(np.int32)
    valid = rng.rand(n) > 0.1
    _compare(bxyz, valid, [256, 128, 64])


def test_host_matches_device_overflow():
    rng = np.random.RandomState(1)
    n = 300
    bxyz = np.concatenate(
        [np.zeros((n, 1), np.int32), rng.randint(0, 32, (n, 3)).astype(np.int32)],
        axis=1,
    )
    valid = np.ones(n, bool)
    _compare(bxyz, valid, [64, 32])  # deliberately overflowing capacity


def test_quantize_points_matches_device_shift():
    rng = np.random.RandomState(2)
    vox_src = (rng.rand(2, 100, 3) * 50).astype(np.float32)
    valid = rng.rand(2, 100) > 0.2
    bxyz = quantize_points(vox_src, valid)
    assert bxyz.shape == (200, 4)
    # Min-shifted: each scene's valid min coordinate is 0.
    for b in range(2):
        sel = valid[b]
        coords = bxyz[b * 100 : (b + 1) * 100, 1:][sel]
        assert (coords.min(0) == 0).all()
        assert (bxyz[b * 100 : (b + 1) * 100, 0] == b).all()
