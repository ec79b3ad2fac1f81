"""Wire transport tests (data/wire.py): single-buffer host->device groups.

The relay pays a fixed ~45 ms per FRESH host array; eval groups are ~60
leaves, so the per-leaf staging cost dominated sustained throughput
(BENCH_r04 0.87 scenes/s). These tests pin (a) exact pack/unpack roundtrip
across dtypes, and (b) the wire eval step producing bit-identical outputs
to the per-leaf step on the same group.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def test_pack_unpack_roundtrip():
    from unidet3d_tpu.data.wire import pack_wire, spec_for, unpack_wire

    rng = np.random.RandomState(0)
    tree = {
        "f32": rng.rand(3, 5).astype(np.float32),
        "i16": rng.randint(-300, 300, (7,), np.int16),
        "i32": rng.randint(-(2**30), 2**30, (2, 3, 4), np.int32),
        "u8": rng.randint(0, 255, (9,), np.uint8),
        "b": rng.rand(4, 6) > 0.5,
        "empty": np.zeros((0,), np.float32),
        "nested": (rng.randn(2, 2).astype(np.float32),
                   np.asarray(3, np.int32)),
    }
    buf, spec = pack_wire(tree)
    assert buf.dtype == np.int32  # see pack_wire: compiler-safe bitcasts
    out = jax.jit(lambda b: unpack_wire(b, spec))(jnp.asarray(buf))
    flat_in, td_in = jax.tree_util.tree_flatten(tree)
    flat_out, td_out = jax.tree_util.tree_flatten(out)
    assert td_in == td_out
    for a, b in zip(flat_in, flat_out):
        assert a.shape == b.shape and a.dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(a, np.asarray(b))
    # 64-bit leaves are rejected explicitly (device can't rebuild them
    # without jax_enable_x64 — bitcast would silently truncate).
    with pytest.raises(AssertionError, match="64-bit"):
        pack_wire({"bad": np.zeros((2,), np.int64)})


def test_wire_eval_step_matches_per_leaf():
    """make_eval_step_wire == make_eval_step on the same group, bit-exact
    (fp32, xla conv — the wire must be pure transport, zero numerics)."""
    from tests.test_detector import small_config
    from tests.test_data_pipeline import write_fake_dataset
    import tempfile

    from unidet3d_tpu.core.class_table import build_class_table
    from unidet3d_tpu.core.config import DATASETS_CLASSES
    from unidet3d_tpu.data.loader import EvalLoader
    from unidet3d_tpu.data.datasets import IndoorDataset
    from unidet3d_tpu.data.pipelines import test_pipeline
    from unidet3d_tpu.models.detector import UniDet3DTPU
    from unidet3d_tpu.parallel.train_step import (
        init_state, make_eval_step, make_eval_step_wire,
    )
    from unidet3d_tpu.train.optim import make_optimizer

    cfg = small_config(compute_dtype="float32", max_points=1024,
                       voxel_capacity=1024, max_superpoints=48, max_gts=8,
                       query_thr=24, num_planes=(4, 8), d_model=16,
                       num_heads=2, hidden_dim=32, num_layers=1)
    with tempfile.TemporaryDirectory() as root:
        write_fake_dataset(root, n_scenes=2)
        ds = IndoorDataset(root, "infos.pkl", 0,
                           pipeline=test_pipeline("scannet"), test_mode=True)
        wire_groups = list(EvalLoader(ds, cfg, batch_size=2, wire=True))
        plain_groups = list(EvalLoader(ds, cfg, batch_size=2, wire=False))
    assert len(wire_groups) == len(plain_groups) == 1
    _, batch_none, _, (buf, spec), n_real, cfg_b = wire_groups[0]
    assert batch_none is None and buf.dtype == np.int32
    _, batch_np, _, pack_np, _, cfg_b2 = plain_groups[0]
    assert (cfg_b.max_points, cfg_b.max_superpoints) == (
        cfg_b2.max_points, cfg_b2.max_superpoints)

    table = build_class_table(DATASETS_CLASSES)
    model = UniDet3DTPU(cfg=cfg_b, table=table)
    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
    state = init_state(
        model, cfg_b, make_optimizer(total_steps=1),
        jax.tree_util.tree_map(lambda x: x[:1], batch),
        jax.random.PRNGKey(0),
    )

    pack = jax.tree_util.tree_map(jnp.asarray, pack_np)
    ref = make_eval_step(model, cfg_b)(
        state.params, state.batch_stats, batch, pack
    )
    out = make_eval_step_wire(model, cfg_b, spec)(
        state.params, state.batch_stats, jnp.asarray(buf)
    )
    # cls_logits / boxes / query_valid bit-equal.
    for r, o, name in zip(ref, out, ("cls", "boxes", "qvalid")):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o), name)
    # Pass-through batch fields for the postprocess.
    np.testing.assert_array_equal(np.asarray(out[3]), batch_np.points)
    np.testing.assert_array_equal(np.asarray(out[4]), batch_np.valid)
    np.testing.assert_array_equal(np.asarray(out[5]), batch_np.sp_ids)


def test_decode_rel_plane_matches_builder():
    """Device-side 9-bit rel decode == the builder's plain int16 planes."""
    from unidet3d_tpu.core.config import default_config
    from unidet3d_tpu.native import rulebook as native
    from unidet3d_tpu.ops.gridpack import build_fused_pack_host
    from unidet3d_tpu.parallel.train_step import _decode_rel_plane

    if not native.available():
        pytest.skip("no C++ toolchain")
    cfg = default_config(
        max_points=4096, voxel_capacity=4096, subm_impl="pallas",
        conv_miss_cap=(512, 256, 128, 64, 64),
    )
    rng = np.random.RandomState(11)
    vox_src = rng.rand(1, 3000, 3).astype(np.float32) * 50.0
    valid = np.ones((1, 3000), bool)
    plain, _ = build_fused_pack_host(vox_src, valid, cfg, num_threads=1)
    packed, _ = build_fused_pack_host(vox_src, valid, cfg, num_threads=1,
                                      pack_rel=True)
    for lvl, cap in enumerate(cfg.level_capacities(1)):
        dec = jax.jit(_decode_rel_plane, static_argnums=1)(
            jnp.asarray(packed.banded.rel[lvl]), int(cap)
        )
        np.testing.assert_array_equal(
            np.asarray(dec),
            np.asarray(plain.banded.rel[lvl]).astype(np.int32), f"L{lvl}",
        )
