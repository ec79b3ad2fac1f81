"""End-to-end detector tests on synthetic scenes (small capacities)."""
import numpy as np
import jax
import jax.numpy as jnp

from unidet3d_tpu.core.class_table import build_class_table
from unidet3d_tpu.core.config import DATASETS_CLASSES, default_config
from unidet3d_tpu.models.detector import (
    GTBatch,
    PointBatch,
    UniDet3DTPU,
    detection_loss,
    prepare_gt,
)
from unidet3d_tpu.models.postprocess import predict_scene

RNG = np.random.RandomState(3)


import pytest as _pytest

pytestmark = _pytest.mark.slow


def small_config(**kw):
    base = dict(
        num_planes=(8, 16, 24, 32),
        d_model=32,
        num_heads=4,
        hidden_dim=64,
        num_layers=2,
        query_thr=32,
        max_points=256,
        voxel_capacity=512,
        max_superpoints=48,
        max_gts=8,
        topk_insts=64,
        # Tiny capacities: the XLA gather conv is the production choice at
        # this scale (config.subm_impl doc) and avoids interpret-mode pallas
        # on the CPU test backend; the pallas path has its own tests.
        subm_impl="xla",
    )
    base.update(kw)
    return default_config(**base)


def synthetic_batch(cfg, b=2, seed=0):
    rng = np.random.RandomState(seed)
    p = cfg.max_points
    s = cfg.max_superpoints
    g = cfg.max_gts
    pts = rng.rand(b, p, 3).astype(np.float32) * 4.0
    n_valid = np.array([p, p - 40])
    valid = np.arange(p)[None, :] < n_valid[:, None]
    colors = rng.rand(b, p, 3).astype(np.float32) - 0.5
    mean = (pts * valid[..., None]).sum(1, keepdims=True) / valid.sum(1)[
        :, None, None
    ]
    feats = np.concatenate([colors, pts - mean], -1).astype(np.float32)
    sp_ids = rng.randint(0, s // 2, size=(b, p)).astype(np.int32)
    ds_ids = np.array([0, 2], dtype=np.int32)  # scannet, multiscan

    labels = rng.randint(0, 5, size=(b, g)).astype(np.int32)
    centers = rng.rand(b, g, 3).astype(np.float32) * 4
    sizes = 0.4 + rng.rand(b, g, 3).astype(np.float32)
    boxes = np.concatenate(
        [centers, sizes, np.zeros((b, g, 1), np.float32)], -1
    )
    gt_valid = np.arange(g)[None, :] < np.array([5, 3])[:, None]
    sp_masks = rng.rand(b, g, s) > 0.8
    inst_ids = rng.randint(-1, 5, size=(b, p)).astype(np.int32)

    batch = PointBatch(
        points=jnp.array(pts),
        vox_src=jnp.array(pts / cfg.voxel_size),
        features=jnp.array(feats),
        valid=jnp.array(valid),
        sp_ids=jnp.array(sp_ids),
        dataset_ids=jnp.array(ds_ids),
    )
    gt = GTBatch(
        labels=jnp.array(labels),
        boxes=jnp.array(boxes),
        valid=jnp.array(gt_valid),
        sp_masks=jnp.array(sp_masks),
        inst_ids=jnp.array(inst_ids),
    )
    return batch, gt


def _build(cfg):
    table = build_class_table(DATASETS_CLASSES)
    return UniDet3DTPU(cfg=cfg, table=table), table


def test_forward_train_and_loss():
    cfg = small_config()
    model, table = _build(cfg)
    batch, gt = synthetic_batch(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "queries": jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, True)
    (out, aux), _ = model.apply(
        variables,
        batch,
        True,
        rngs={"queries": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out.cls_logits.shape[0] == cfg.num_layers + 1
    assert out.cls_logits.shape[2] == cfg.query_thr
    loss = detection_loss(cfg, out, aux, batch, gt)
    assert np.isfinite(float(loss))
    assert float(loss) > 0


def test_loss_is_differentiable():
    cfg = small_config()
    model, table = _build(cfg)
    batch, gt = synthetic_batch(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "queries": jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, True)

    def loss_fn(params):
        (out, aux), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch,
            True,
            rngs={"queries": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return detection_loss(cfg, out, aux, batch, gt)

    grads = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.abs(g).max()) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0


def test_prepare_gt_frames():
    """bbox_by_mask boxes must tightly bound their instance points (shifted
    frame); shifted boxes must equal raw - scene min."""
    cfg = small_config()
    model, table = _build(cfg)
    batch, gt = synthetic_batch(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "queries": jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, True)
    (out, aux), _ = model.apply(
        variables, batch, True,
        rngs={"queries": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    scene_gt = prepare_gt(cfg, batch, gt, aux)

    # Scene 0 = scannet (bbox_by_mask): check box 0 bounds points of inst 0.
    pts = np.asarray(aux.geom_points[0])
    valid = np.asarray(batch.valid[0])
    iid = np.asarray(gt.inst_ids[0])
    m = (iid == 0) & valid
    box = np.asarray(scene_gt.boxes[0, 0])
    np.testing.assert_allclose(
        box[:3], (pts[m].max(0) + pts[m].min(0)) / 2, atol=1e-5
    )
    np.testing.assert_allclose(box[3:6], pts[m].max(0) - pts[m].min(0), atol=1e-5)

    # Scene 1 = multiscan (shift path): center == raw - shift.
    shift = np.asarray(aux.shift[1, 0])
    raw = np.asarray(gt.boxes[1, 0])
    got = np.asarray(scene_gt.boxes[1, 0])
    np.testing.assert_allclose(got[:3], raw[:3] - shift, atol=1e-5)
    np.testing.assert_allclose(got[3:6], raw[3:6], atol=1e-6)


def test_predict_path():
    cfg = small_config()
    model, table = _build(cfg)
    batch, gt = synthetic_batch(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "queries": jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, True)
    out, aux = model.apply(variables, batch, False)
    assert out.cls_logits.shape[2] == cfg.max_superpoints  # all superpoints

    det = predict_scene(
        cfg,
        0,  # scannet: aa NMS + superpoint trimming
        out.cls_logits[-1, 0],
        out.boxes[-1, 0],
        aux.query_valid[0],
        batch.points[0],
        batch.valid[0],
        batch.sp_ids[0],
    )
    assert det.boxes.shape == (cfg.topk_insts, 7)
    v = np.asarray(det.valid)
    assert v.any()
    kept = np.asarray(det.boxes)[v]
    assert np.isfinite(kept).all()
    assert (kept[:, 3:6] >= 0).all()
    # Rotated dataset path compiles and runs too (arkitscenes idx 5).
    det2 = predict_scene(
        cfg, 5,
        out.cls_logits[-1, 1], out.boxes[-1, 1], aux.query_valid[1],
        batch.points[1], batch.valid[1], batch.sp_ids[1],
    )
    assert np.asarray(det2.valid).any()
