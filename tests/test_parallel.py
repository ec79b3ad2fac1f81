"""Multi-device DP training tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from unidet3d_tpu.core.class_table import build_class_table
from unidet3d_tpu.core.config import DATASETS_CLASSES
from unidet3d_tpu.data.batcher import build_packs
from unidet3d_tpu.models.detector import UniDet3DTPU
from unidet3d_tpu.parallel.train_step import (
    create_mesh,
    init_state,
    make_eval_step,
    make_train_step,
)
from unidet3d_tpu.train.optim import make_optimizer
from tests.test_detector import small_config, synthetic_batch


import pytest as _pytest

pytestmark = _pytest.mark.slow


def _tiny_cfg():
    return small_config(
        axis_name="data",
        # fp32 backbone: the DP-equality test checks SHARDING semantics;
        # bf16 rounding differs between pack padding layouts and would mask
        # real psum bugs behind dtype noise.
        compute_dtype="float32",
        max_points=128,
        voxel_capacity=128,
        max_superpoints=24,
        max_gts=4,
        query_thr=16,
        num_planes=(4, 8),
        d_model=16,
        num_heads=2,
        hidden_dim=32,
        num_layers=1,
    )


def _batch8(cfg):
    batches, gts = [], []
    for i in range(4):
        b, g = synthetic_batch(cfg, b=2, seed=i)
        batches.append(b)
        gts.append(g)
    batch = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *batches
    )
    gt = jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *gts)
    return batch, gt


def _packs(cfg, batch, n_shards):
    pack = build_packs(
        np.asarray(batch.vox_src), np.asarray(batch.valid), cfg,
        n_shards=n_shards,
    )
    if n_shards == 1:
        pack = jax.tree_util.tree_map(lambda x: np.asarray(x)[None], pack)
    return jax.tree_util.tree_map(jnp.asarray, pack)


def test_dp_train_step_runs_and_updates():
    assert len(jax.devices()) == 8
    cfg = _tiny_cfg()
    table = build_class_table(DATASETS_CLASSES)
    model = UniDet3DTPU(cfg=cfg, table=table)
    mesh = create_mesh()
    opt = make_optimizer(total_steps=100)

    batch, gt = _batch8(cfg)
    pack = _packs(cfg, batch, 8)
    state = init_state(
        model,
        cfg,
        opt,
        jax.tree_util.tree_map(lambda x: x[:1], batch),
        jax.random.PRNGKey(0),
    )
    step_fn = make_train_step(model, cfg, opt, mesh)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state2, metrics = step_fn(state, batch, gt, pack, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(state2.step) == 1
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert np.abs(np.asarray(p1) - np.asarray(p0)).max() > 0

    # Second step to confirm donation/carry works.
    state3, m2 = step_fn(state2, batch, gt, pack, jax.random.PRNGKey(2))
    assert np.isfinite(float(m2["loss"]))


def test_dp_matches_single_device_grads():
    """DP over 8 devices must reproduce the single-device computation on the
    same global batch EXACTLY (same query subsets via per-global-scene rng
    folding): loss + full updated param tree allclose."""
    cfg = _tiny_cfg()
    table = build_class_table(DATASETS_CLASSES)
    model = UniDet3DTPU(cfg=cfg, table=table)
    mesh = create_mesh()
    opt = make_optimizer(total_steps=100)
    batch, gt = _batch8(cfg)
    state = init_state(
        model,
        cfg,
        opt,
        jax.tree_util.tree_map(lambda x: x[:1], batch),
        jax.random.PRNGKey(0),
    )
    state_copy = jax.tree_util.tree_map(lambda x: x.copy(), state)
    step_fn = make_train_step(model, cfg, opt, mesh, with_grads=True)
    s8, metrics = step_fn(
        state, batch, gt, _packs(cfg, batch, 8), jax.random.PRNGKey(1)
    )

    mesh1 = create_mesh(1)
    step1 = make_train_step(model, cfg, opt, mesh1, with_grads=True)
    s1, m1 = step1(
        state_copy, batch, gt, _packs(cfg, batch, 1), jax.random.PRNGKey(1)
    )
    l8, l1 = float(metrics["loss"]), float(m1["loss"])
    assert np.isfinite(l8) and np.isfinite(l1)
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    # Gradient trees must agree leaf-by-leaf (catches any psum /
    # gradient-scaling bug, not just loss-level agreement). Post-Adam params
    # are NOT compared: near-zero grads make m/sqrt(v) sign-unstable.
    flat8, tdef8 = jax.tree_util.tree_flatten(metrics["grads"])
    flat1, tdef1 = jax.tree_util.tree_flatten(m1["grads"])
    assert tdef8 == tdef1
    for pa, pb in zip(flat8, flat1):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=5e-4, atol=1e-7
        )
    # BN running stats must also agree (count-weighted psum).
    for ba, bb in zip(
        jax.tree_util.tree_leaves(s8.batch_stats),
        jax.tree_util.tree_leaves(s1.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(ba), np.asarray(bb), rtol=2e-4, atol=1e-6
        )


def test_eval_step_sharded():
    cfg = _tiny_cfg()
    table = build_class_table(DATASETS_CLASSES)
    model = UniDet3DTPU(cfg=cfg, table=table)
    mesh = create_mesh()
    opt = make_optimizer(total_steps=10)
    batch, gt = _batch8(cfg)
    state = init_state(
        model,
        cfg,
        opt,
        jax.tree_util.tree_map(lambda x: x[:1], batch),
        jax.random.PRNGKey(0),
    )
    n_dev = mesh.devices.size
    packs = jax.tree_util.tree_map(
        jnp.asarray,
        build_packs(
            np.asarray(batch.vox_src), np.asarray(batch.valid), cfg,
            n_shards=n_dev,
        ),
    )
    eval_fn = make_eval_step(model, cfg, mesh)
    cls_logits, boxes, qvalid = eval_fn(
        state.params, state.batch_stats, batch, packs
    )
    assert cls_logits.shape[0] == 8
    assert boxes.shape[:2] == (8, cfg.max_superpoints)
    assert qvalid.shape[0] == 8
    assert np.isfinite(np.asarray(boxes)).all()

    # Sharded forward must match the single-device form scene-by-scene.
    single = make_eval_step(model, cfg, None)
    pack1 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x[None]),
        build_packs(
            np.asarray(batch.vox_src)[:1], np.asarray(batch.valid)[:1], cfg
        ),
    )
    c1, b1, q1 = single(
        state.params, state.batch_stats,
        jax.tree_util.tree_map(lambda x: x[:1], batch), pack1,
    )
    np.testing.assert_allclose(
        np.asarray(c1[0]), np.asarray(cls_logits[0]), rtol=2e-4, atol=2e-4
    )
