"""Data pipeline integration: synthetic on-disk dataset -> pipeline ->
collate -> model loss."""
import os
import pickle

import numpy as np
import pytest

from unidet3d_tpu.data import transforms as T
from unidet3d_tpu.data.batcher import collate
from unidet3d_tpu.data.datasets import ConcatDataset, IndoorDataset
from unidet3d_tpu.data.pipelines import train_pipeline
from unidet3d_tpu.data.pipelines import test_pipeline as eval_pipeline


import pytest as _pytest

pytestmark = _pytest.mark.slow


def make_fake_scene(root, name, n=2000, n_inst=3, n_sp=30, seed=0, yaw=False):
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "points"), exist_ok=True)
    for sub in ("instance_mask", "semantic_mask", "super_points"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    pts = np.zeros((n, 6), np.float32)
    pts[:, :3] = rng.rand(n, 3) * 5
    pts[:, 3:] = rng.randint(0, 255, (n, 3))
    pts.tofile(os.path.join(root, "points", f"{name}.bin"))

    inst = rng.randint(-1, n_inst, n).astype(np.int64)
    # Semantic mask carries RAW nyu40 ids (like the reference's bins):
    # instance i -> nyu40 3+i (cabinet/bed/chair...), rest wall(1)/floor(2).
    # point_seg_class_mapping turns these into train ids 2+i / 0 / 1.
    sem = np.where(inst >= 0, inst + 3, rng.randint(1, 3, n)).astype(np.int64)
    inst.tofile(os.path.join(root, "instance_mask", f"{name}.bin"))
    sem.tofile(os.path.join(root, "semantic_mask", f"{name}.bin"))
    sp = rng.randint(0, n_sp, n).astype(np.int64)
    sp.tofile(os.path.join(root, "super_points", f"{name}.bin"))

    boxes = []
    for i in range(n_inst):
        m = inst == i
        if not m.any():
            continue
        mn, mx = pts[m, :3].min(0), pts[m, :3].max(0)
        bb = list((mn + mx) / 2) + list(mx - mn)
        if yaw:
            bb.append(0.3)
        boxes.append({"bbox_3d": bb, "bbox_label_3d": i})
    return {
        "lidar_points": {"lidar_path": f"points/{name}.bin"},
        "pts_instance_mask_path": f"instance_mask/{name}.bin",
        "pts_semantic_mask_path": f"semantic_mask/{name}.bin",
        "super_pts_path": f"super_points/{name}.bin",
        "axis_align_matrix": np.eye(4).tolist(),
        "instances": boxes,
    }


def make_coherent_scene(root, name, seed=0, n_inst=3, sp_per_inst=4,
                        n_bg_sp=18):
    """A geometrically COHERENT synthetic scene: compact, well-separated
    instances whose superpoints nest entirely inside one instance each.

    make_fake_scene assigns instance and superpoint ids i.i.d. per point, so
    no superpoint is majority-owned by any instance and `gt_sp_masks` comes
    out all-zero — the matcher's query gating (ref criterion.py:273-320
    query_masks) then blocks every GT→query assignment and the only thing a
    model can learn from it is "all background". Detection-learning tests
    (tests/test_overfit.py) need THIS generator instead."""
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "points"), exist_ok=True)
    for sub in ("instance_mask", "semantic_mask", "super_points"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)

    centers = np.array(
        [[1.2, 1.2, 0.8], [3.6, 1.4, 0.7], [2.3, 3.7, 0.9]], np.float32
    )[:n_inst] + rng.uniform(-0.2, 0.2, (n_inst, 3)).astype(np.float32)
    sizes = np.array(
        [[1.2, 1.0, 1.4], [1.0, 1.3, 1.1], [1.4, 1.1, 0.9]], np.float32
    )[:n_inst]

    pts, inst, sem, sp = [], [], [], []
    n_pts_inst = 300
    for i in range(n_inst):
        p = (rng.rand(n_pts_inst, 3).astype(np.float32) - 0.5) * sizes[i]
        p += centers[i]
        pts.append(p)
        inst.append(np.full(n_pts_inst, i, np.int64))
        # Raw nyu40 ids: instance i -> 3+i (see make_fake_scene).
        sem.append(np.full(n_pts_inst, 3 + i, np.int64))
        # Split the instance's points into sp_per_inst superpoints by x so
        # each superpoint is spatially compact AND pure (one instance).
        order = np.argsort(p[:, 0])
        ids = np.empty(n_pts_inst, np.int64)
        ids[order] = np.arange(n_pts_inst) * sp_per_inst // n_pts_inst
        sp.append(i * sp_per_inst + ids)

    # Background: floor plane + one wall, grouped into spatial superpoints.
    n_bg = 1100
    bg = rng.rand(n_bg, 3).astype(np.float32) * 5.0
    bg[: n_bg // 2, 2] = rng.rand(n_bg // 2).astype(np.float32) * 0.05
    bg[n_bg // 2 :, 1] = rng.rand(n_bg - n_bg // 2).astype(np.float32) * 0.05
    pts.append(bg)
    inst.append(np.full(n_bg, -1, np.int64))
    sem.append(rng.randint(1, 3, n_bg).astype(np.int64))  # wall/floor
    cell = np.clip((bg[:, 0] * 0.999 // (5.0 / n_bg_sp)), 0, n_bg_sp - 1)
    sp.append(n_inst * sp_per_inst + cell.astype(np.int64))

    p3 = np.concatenate(pts)
    arr = np.zeros((len(p3), 6), np.float32)
    arr[:, :3] = p3
    arr[:, 3:] = rng.randint(0, 255, (len(p3), 3))
    inst = np.concatenate(inst)
    sem = np.concatenate(sem)
    sp = np.concatenate(sp)
    arr.tofile(os.path.join(root, "points", f"{name}.bin"))
    inst.tofile(os.path.join(root, "instance_mask", f"{name}.bin"))
    sem.tofile(os.path.join(root, "semantic_mask", f"{name}.bin"))
    sp.tofile(os.path.join(root, "super_points", f"{name}.bin"))

    boxes = []
    for i in range(n_inst):
        m = inst == i
        mn, mx = p3[m].min(0), p3[m].max(0)
        bb = list((mn + mx) / 2) + list(mx - mn)
        boxes.append({"bbox_3d": [float(v) for v in bb],
                      "bbox_label_3d": i})
    return {
        "lidar_points": {"lidar_path": f"points/{name}.bin"},
        "pts_instance_mask_path": f"instance_mask/{name}.bin",
        "pts_semantic_mask_path": f"semantic_mask/{name}.bin",
        "super_pts_path": f"super_points/{name}.bin",
        "axis_align_matrix": np.eye(4).tolist(),
        "instances": boxes,
    }


def write_coherent_dataset(root, n_scenes=4, **kw):
    entries = [
        make_coherent_scene(root, f"scene{i}", seed=i, **kw)
        for i in range(n_scenes)
    ]
    info = {"metainfo": {}, "data_list": entries}
    path = os.path.join(root, "infos.pkl")
    with open(path, "wb") as f:
        pickle.dump(info, f)
    return path


def write_fake_dataset(root, n_scenes=3, **kw):
    entries = [
        make_fake_scene(root, f"scene{i}", seed=i, **kw)
        for i in range(n_scenes)
    ]
    info = {"metainfo": {}, "data_list": entries}
    path = os.path.join(root, "infos.pkl")
    with open(path, "wb") as f:
        pickle.dump(info, f)
    return path


def test_scannet_train_sample(tmp_path):
    root = str(tmp_path / "scannet")
    write_fake_dataset(root)
    ds = IndoorDataset(
        root, "infos.pkl", 0, pipeline=train_pipeline("scannet"), seed=1
    )
    sample = ds[0]
    assert sample["points"].shape[1] == 6
    # Colors normalized to ~[-1, 1].
    assert np.abs(sample["points"][:, 3:]).max() <= 1.001
    assert "elastic_coords" in sample
    assert "gt_sp_masks" in sample
    g = len(sample["gt_labels_3d"])
    assert sample["gt_sp_masks"].shape[0] == g
    # Labels = semantic - n_stuff = instance id.
    assert set(sample["gt_labels_3d"].tolist()) <= {0, 1, 2}


def test_s3dis_mapping(tmp_path):
    root = str(tmp_path / "s3dis")
    # Instances with semantic classes 2..4 are NOT in S3DIS_CLASSES -> need
    # classes from [7..11]; build custom scene.
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "points"), exist_ok=True)
    for sub in ("instance_mask", "semantic_mask", "super_points"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    n = 1000
    pts = np.zeros((n, 6), np.float32)
    pts[:, :3] = rng.rand(n, 3) * 4
    pts.tofile(os.path.join(root, "points", "s.bin"))
    inst = rng.randint(0, 3, n).astype(np.int64)
    sem = np.where(inst == 0, 7, np.where(inst == 1, 9, 3)).astype(np.int64)
    inst.tofile(os.path.join(root, "instance_mask", "s.bin"))
    sem.tofile(os.path.join(root, "semantic_mask", "s.bin"))
    rng.randint(0, 10, n).astype(np.int64).tofile(
        os.path.join(root, "super_points", "s.bin")
    )
    info = {
        "metainfo": {},
        "data_list": [
            {
                "lidar_points": {"lidar_path": "points/s.bin"},
                "pts_instance_mask_path": "instance_mask/s.bin",
                "pts_semantic_mask_path": "semantic_mask/s.bin",
                "super_pts_path": "super_points/s.bin",
                "instances": [],
            }
        ],
    }
    with open(os.path.join(root, "infos.pkl"), "wb") as f:
        pickle.dump(info, f)
    ds = IndoorDataset(
        root, "infos.pkl", 1, pipeline=train_pipeline("s3dis"), seed=2
    )
    sample = ds[0]
    # Only instances with classes 7 and 9 kept -> labels {0, 2}.
    assert set(sample["gt_labels_3d"].tolist()) == {0, 2}
    assert sample["gt_sp_masks"].shape[0] == 2


def test_collate_and_loss(tmp_path):
    import jax
    from tests.test_detector import small_config, _build
    from unidet3d_tpu.models.detector import detection_loss

    root = str(tmp_path / "scannet")
    write_fake_dataset(root)
    cfg = small_config(max_points=2048, voxel_capacity=2048, max_superpoints=64)
    ds = IndoorDataset(
        root, "infos.pkl", 0, pipeline=train_pipeline("scannet"), seed=1
    )
    cat = ConcatDataset([ds])
    samples = [cat[0], cat[1]]
    batch_np, gt_np, pack_np = collate(samples, cfg, training=True)
    import jax.numpy as jnp

    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
    gt = jax.tree_util.tree_map(jnp.asarray, gt_np)
    pack = jax.tree_util.tree_map(jnp.asarray, pack_np)

    model, _ = _build(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "queries": jax.random.PRNGKey(1)}
    variables = model.init(rngs, batch, True, pack)
    (out, aux), _ = model.apply(
        variables, batch, True, pack,
        rngs={"queries": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    loss = detection_loss(cfg, out, aux, batch, gt)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_test_pipeline_no_aug(tmp_path):
    root = str(tmp_path / "scannet")
    write_fake_dataset(root)
    ds = IndoorDataset(
        root, "infos.pkl", 0, pipeline=eval_pipeline("scannet"), test_mode=True
    )
    s0a = ds[0]
    s0b = ds[0]
    np.testing.assert_array_equal(s0a["points"], s0b["points"])  # deterministic
    assert "elastic_coords" not in s0a


# Reference config values (configs/unidet3d_1xb8_..._arkitscenes.py):
# rot/scale: scannet :139-141, s3dis :229-231, multiscan :312-314,
# 3rscan :386-388, scannetpp :461-463, arkitscenes :539-541.
# train caps: s3dis :221, multiscan :304, 3rscan :378, scannetpp :453,
# arkitscenes :524. test caps: :275, :348, :422, :497, :572.
# partitions: :607-640.
REF_AUG = {
    "scannet": dict(rot=(-3.14, 3.14), scale=(0.8, 1.2), cap=None),
    "s3dis": dict(rot=(0.0, 0.0), scale=(0.9, 1.1), cap=180000),
    "multiscan": dict(rot=(0.0, 0.0), scale=(0.9, 1.1), cap=100000),
    "3rscan": dict(rot=(0.0, 0.0), scale=(0.9, 1.1), cap=100000),
    "scannetpp": dict(rot=(0.0, 0.0), scale=(0.9, 1.1), cap=200000),
    "arkitscenes": dict(rot=(-0.5, 0.5), scale=(0.9, 1.1), cap=100000),
}
REF_TEST_CAPS = {
    "s3dis": 180000,
    "multiscan": 100000,
    "3rscan": 100000,
    "scannetpp": 200000,
    "arkitscenes": 100000,
}
REF_PARTITIONS = {
    "s3dis": 0.33,
    "multiscan": 0.25,
    "3rscan": 0.15,
    "scannetpp": 0.33,
    "arkitscenes": 0.08,
}


def _pipeline_params(pipe):
    """Extract (rot_range, scale_range, num_points) from a pipeline's
    functools.partial stages."""
    import functools

    rot = scale = cap = None
    for stage in pipe:
        if not isinstance(stage, functools.partial):
            continue
        kw = stage.keywords or {}
        if stage.func is T.global_rot_scale_trans:
            rot, scale = kw["rot_range"], kw["scale_range"]
        if stage.func is T.point_sample:
            cap = kw["num_points"]
    return rot, scale, cap


@pytest.mark.parametrize("name", sorted(REF_AUG))
def test_train_aug_params_match_reference(name):
    rot, scale, cap = _pipeline_params(train_pipeline(name))
    ref = REF_AUG[name]
    assert tuple(rot) == ref["rot"], f"{name}: rot_range {rot} != {ref['rot']}"
    assert tuple(scale) == ref["scale"]
    assert cap == ref["cap"]


@pytest.mark.parametrize(
    "name", ["scannet", "s3dis", "multiscan", "arkitscenes"]
)
def test_train_pipeline_augment_off_drops_random_ops(name):
    from functools import partial as _partial

    random_fns = {T.random_flip, T.global_rot_scale_trans,
                  T.elastic_transform}
    full = train_pipeline(name)
    plain = train_pipeline(name, augment=False)
    fns = [f.func if isinstance(f, _partial) else f for f in plain]
    assert not (set(fns) & random_fns)
    # Everything deterministic survives, in order.
    want = [f for f in full
            if (f.func if isinstance(f, _partial) else f) not in random_fns]
    assert [(f.func if isinstance(f, _partial) else f) for f in want] == fns
    assert len(plain) < len(full)


@pytest.mark.parametrize("name", sorted(REF_TEST_CAPS) + ["scannet"])
def test_test_point_caps_match_reference(name):
    _, _, cap = _pipeline_params(eval_pipeline(name))
    assert cap == REF_TEST_CAPS.get(name), (
        f"{name}: test-time PointSample_ cap {cap} != reference"
    )


def test_joint_config_partitions_match_reference():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "unidet3d_joint",
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "unidet3d_joint.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    exp = mod.get_config()
    parts = {d.name: d.partition for d in exp.datasets}
    assert parts["scannet"] in (None, 1.0)
    for name, want in REF_PARTITIONS.items():
        assert parts[name] == pytest.approx(want), (name, parts[name], want)


def test_collate_random_subsample_not_prefix(tmp_path):
    """Overflowing scenes must be randomly subsampled, not first-N cut."""
    from tests.test_detector import small_config

    cfg = small_config(max_points=256, voxel_capacity=256, max_superpoints=16)
    n = 1024
    pts = np.zeros((n, 6), np.float32)
    pts[:, 0] = np.arange(n)  # x strictly increasing: prefix cut -> max < 256
    sm = {"points": pts, "dataset_idx": 0}
    batch, _, _ = collate([sm], cfg, build_rulebooks=False)
    xs = np.asarray(batch.points)[0, :, 0]
    assert xs.max() > 512, "collate truncated to the first-N prefix"
    assert len(np.unique(xs)) == 256  # without replacement
