"""Native C++ rulebook builder must match the numpy reference exactly."""
import numpy as np
import pytest

from unidet3d_tpu.native import rulebook as native
from unidet3d_tpu.ops.gridpack import build_gridpack_numpy


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_matches_numpy():
    rng = np.random.RandomState(0)
    n = 5000
    bxyz = np.concatenate(
        [rng.randint(0, 4, (n, 1)), rng.randint(0, 40, (n, 3))], axis=1
    ).astype(np.int32)
    valid = rng.rand(n) > 0.05
    caps = [4096, 2048, 1024, 512, 256]

    ref_pack, ref_counts = build_gridpack_numpy(bxyz, valid, caps)
    nat_pack, nat_counts = native.build_gridpack(bxyz, valid, caps)

    np.testing.assert_array_equal(nat_pack.point_inverse, ref_pack.point_inverse)
    np.testing.assert_allclose(nat_counts, ref_counts)
    for lvl in range(len(caps)):
        np.testing.assert_array_equal(
            nat_pack.valid[lvl], ref_pack.valid[lvl], f"valid L{lvl}"
        )
        np.testing.assert_array_equal(
            nat_pack.neighbors[lvl], ref_pack.neighbors[lvl], f"nbr L{lvl}"
        )
    for t in range(len(caps) - 1):
        v = ref_pack.valid[t]
        np.testing.assert_array_equal(
            nat_pack.parent[t][v], ref_pack.parent[t][v], f"parent T{t}"
        )
        np.testing.assert_array_equal(
            nat_pack.offset_code[t][v], ref_pack.offset_code[t][v], f"off T{t}"
        )


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_overflow_and_all_invalid():
    rng = np.random.RandomState(1)
    n = 500
    bxyz = np.concatenate(
        [np.zeros((n, 1), np.int32), rng.randint(0, 32, (n, 3)).astype(np.int32)],
        axis=1,
    )
    valid = np.ones(n, bool)
    ref = build_gridpack_numpy(bxyz, valid, [64, 32])
    nat = native.build_gridpack(bxyz, valid, [64, 32])
    np.testing.assert_array_equal(nat[0].point_inverse, ref[0].point_inverse)
    np.testing.assert_array_equal(nat[0].neighbors[0], ref[0].neighbors[0])

    # All-invalid input.
    ref2 = build_gridpack_numpy(bxyz, np.zeros(n, bool), [64, 32])
    nat2 = native.build_gridpack(bxyz, np.zeros(n, bool), [64, 32])
    np.testing.assert_array_equal(nat2[0].point_inverse, ref2[0].point_inverse)
    assert not nat2[0].valid[0].any()


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_banded_bit_exact():
    """Native two-level banded rulebook == numpy twin, including the
    compact miss list, active flags and floor-mod sub_off alignment."""
    from unidet3d_tpu.ops.pallas_conv import (
        build_banded_rulebook,
        build_miss_list,
        n_subgroups,
    )
    from unidet3d_tpu.ops.sparse_conv import build_subm_neighbors
    from unidet3d_tpu.ops.voxelize import voxelize
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    for n, cap, block, extent in [(900, 1024, 128, 14), (400, 1024, 512, 6)]:
        bxyz = np.concatenate(
            [rng.randint(0, 2, (n, 1)), rng.randint(0, extent, (n, 3))],
            axis=1,
        ).astype(np.int32)
        grid, _ = voxelize(
            jnp.array(bxyz), jnp.ones(n, bool), cap,
            jnp.array(rng.randn(n, 4).astype(np.float32)),
        )
        nbr = np.asarray(build_subm_neighbors(grid))
        # Per-GROUP windows (one shared DMA window per dx slab of 9
        # offsets), per-offset subwindows.
        windows = np.array([256, 144, 256], np.int64)
        wsubs = np.array(
            [144 if o // 9 != 1 else 80 for o in range(27)], np.int64
        )
        for align in (16, 32, 64):
            rb = build_banded_rulebook(
                nbr, cap, block=block, window=windows, wsub=wsubs,
                align=align,
            )
            ml = build_miss_list(rb.miss_idx, cap, miss_cap=4096)
            # gridpack calls the native builder with 2*cap and reshapes
            # into the two-tier (2, cap) spill form — mirror that here.
            (bs, so, rl, ac, rows, nbrs, offs, total) = native.build_banded(
                nbr, cap, block, windows, wsubs, n_subgroups(block), 8192,
                align=align,
            )
            rows = rows.reshape(2, 4096)
            nbrs = nbrs.reshape(2, 4096)
            offs = offs.reshape(2, 4096)
            np.testing.assert_array_equal(bs, rb.bases)
            np.testing.assert_array_equal(so, rb.sub_offs)
            np.testing.assert_array_equal(rl, rb.rel)
            np.testing.assert_array_equal(ac, rb.active)
            assert total == rb.n_miss
            np.testing.assert_array_equal(rows, ml.rows)
            np.testing.assert_array_equal(nbrs, ml.nbrs)
            np.testing.assert_array_equal(offs, ml.offs)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_fused_pack_matches_two_phase():
    """ONE-CALL fused builder (quantize + gridpack + banded, rulebook.cc
    unidet3d_build_packs_fused) must be bit-exact with the two-phase flow
    quantize_points -> build_gridpack_host -> build_banded_pack, including
    neighbor tables (want_neighbors), per-level miss lists and the int16
    rel wire dtype."""
    from unidet3d_tpu.core.config import default_config
    from unidet3d_tpu.ops.gridpack import (
        build_banded_pack,
        build_fused_pack_host,
        build_gridpack_host,
        quantize_points,
    )

    cfg = default_config(
        max_points=4096, voxel_capacity=4096, subm_impl="pallas",
        conv_miss_cap=(512, 256, 128, 64, 64),
    )
    rng = np.random.RandomState(7)
    b, p = 2, 3000
    # Float voxel-unit coords with a negative origin (exercises the
    # per-scene min subtraction) and some invalid tail rows.
    vox_src = (rng.rand(b, p, 3).astype(np.float32) * 60.0 - 7.3)
    valid = np.arange(p)[None, :] < np.array([p, p - 123])[:, None]
    vox_src[~valid] = 0.0

    caps = list(cfg.level_capacities(b))
    bxyz = quantize_points(vox_src, valid)
    ref_pack, ref_counts = build_gridpack_host(
        bxyz, valid.reshape(-1), caps, num_threads=2
    )
    ref_banded = build_banded_pack(
        ref_pack, caps, window=cfg.level_conv_windows(),
        wsub=cfg.level_conv_subwindows(), align=cfg.level_pack_align(),
        miss_cap=[m * b for m in cfg.level_miss_caps()], num_threads=2,
    )

    out = build_fused_pack_host(
        vox_src, valid, cfg, num_threads=2, want_neighbors=True
    )
    assert out is not None
    fused, fused_counts = out

    np.testing.assert_array_equal(fused.point_inverse, ref_pack.point_inverse)
    np.testing.assert_allclose(fused_counts, ref_counts)
    for lvl in range(len(caps)):
        np.testing.assert_array_equal(
            fused.valid[lvl], ref_pack.valid[lvl], f"valid L{lvl}"
        )
        np.testing.assert_array_equal(
            fused.neighbors[lvl], ref_pack.neighbors[lvl], f"nbr L{lvl}"
        )
        np.testing.assert_array_equal(
            fused.banded.bases[lvl], ref_banded.bases[lvl], f"bases L{lvl}"
        )
        np.testing.assert_array_equal(
            fused.banded.sub_offs[lvl], ref_banded.sub_offs[lvl],
            f"sub_offs L{lvl}",
        )
        assert fused.banded.rel[lvl].dtype == np.int16
        np.testing.assert_array_equal(
            fused.banded.rel[lvl].astype(np.int32),
            np.asarray(ref_banded.rel[lvl]).astype(np.int32), f"rel L{lvl}",
        )
        np.testing.assert_array_equal(
            fused.banded.active[lvl], ref_banded.active[lvl], f"act L{lvl}"
        )
        for name in ("miss_rows", "miss_nbrs", "miss_offs"):
            np.testing.assert_array_equal(
                getattr(fused.banded, name)[lvl],
                getattr(ref_banded, name)[lvl], f"{name} L{lvl}",
            )
    for t in range(len(caps) - 1):
        v = ref_pack.valid[t]
        np.testing.assert_array_equal(
            fused.parent[t][v], ref_pack.parent[t][v], f"parent T{t}"
        )
        np.testing.assert_array_equal(
            fused.offset_code[t][v], ref_pack.offset_code[t][v], f"off T{t}"
        )


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_fused_pack_rel_9bit_roundtrip():
    """pack_rel=True emits rel as 9-bit-packed int32 words (3 per word,
    block-padded, e = rel + 1); decoding must reproduce the int16 planes
    of a plain build exactly."""
    from unidet3d_tpu.core.config import default_config
    from unidet3d_tpu.ops.gridpack import build_fused_pack_host

    cfg = default_config(
        max_points=4096, voxel_capacity=4096, subm_impl="pallas",
        conv_miss_cap=(512, 256, 128, 64, 64),
    )
    rng = np.random.RandomState(3)
    b, p = 2, 2500
    vox_src = rng.rand(b, p, 3).astype(np.float32) * 55.0 - 3.0
    valid = np.arange(p)[None, :] < np.array([p, p - 77])[:, None]

    plain, _ = build_fused_pack_host(vox_src, valid, cfg, num_threads=2)
    packed, _ = build_fused_pack_host(vox_src, valid, cfg, num_threads=2,
                                      pack_rel=True)
    caps = list(cfg.level_capacities(b))
    for lvl, cap in enumerate(caps):
        ref = np.asarray(plain.banded.rel[lvl]).astype(np.int32)  # (27, cap)
        pk = np.asarray(packed.banded.rel[lvl])
        assert pk.dtype == np.int32
        block = min(512, cap)
        nb = cap // block
        wpb = (block + 2) // 3
        assert pk.shape == (27, nb * wpb), (pk.shape, lvl)
        w = pk.reshape(27, nb, wpb, 1)
        lanes = (w >> np.array([0, 9, 18])) & 511
        dec = lanes.reshape(27, nb, wpb * 3)[:, :, :block].reshape(27, cap) - 1
        np.testing.assert_array_equal(dec, ref, f"rel L{lvl}")
        # Everything else identical between the two modes.
        for name in ("bases", "sub_offs", "active", "miss_rows"):
            np.testing.assert_array_equal(
                np.asarray(getattr(packed.banded, name)[lvl]),
                np.asarray(getattr(plain.banded, name)[lvl]), f"{name} L{lvl}",
            )
