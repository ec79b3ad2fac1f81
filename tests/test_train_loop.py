"""Full-stack smoke: config -> datasets -> train loop -> checkpoint -> eval."""
import dataclasses
import logging
import os

import numpy as np
import pytest

from tests.test_data_pipeline import write_fake_dataset
from tests.test_detector import small_config
from unidet3d_tpu.core.experiment import (
    DatasetSpec,
    ExperimentConfig,
    apply_overrides,
)
from unidet3d_tpu.train.loop import evaluate, train


import pytest as _pytest

pytestmark = _pytest.mark.slow


def _experiment(tmp_path):
    root = str(tmp_path / "scannet")
    write_fake_dataset(root, n_scenes=3)
    cfg = small_config(
        axis_name="data",
        max_points=1024,
        voxel_capacity=1024,
        max_superpoints=48,
        max_gts=8,
        query_thr=24,
        num_planes=(4, 8),
        d_model=16,
        num_heads=2,
        hidden_dim=32,
        num_layers=1,
        topk_insts=32,
    )
    return ExperimentConfig(
        model=cfg,
        datasets=(
            DatasetSpec(
                name="scannet",
                data_root=root,
                ann_train="infos.pkl",
                ann_val="infos.pkl",
            ),
        ),
        batch_size=8,
        epochs=2,
        steps_per_epoch=2,
        work_dir=str(tmp_path / "work"),
        val_interval_epochs=100,  # skip val inside train() for speed
        val_last_epochs=0,
        ckpt_interval_epochs=1,
    )


def test_train_checkpoint_eval(tmp_path, caplog):
    caplog.set_level(logging.INFO, logger="unidet3d_tpu")
    exp = _experiment(tmp_path)
    state = train(exp)
    assert int(state.step) == 4
    # Checkpoints written.
    ckpt_dir = os.path.join(exp.work_dir, "checkpoints")
    assert os.path.isdir(ckpt_dir)

    # Resume continues from saved step.
    exp2 = dataclasses.replace(exp, epochs=3)
    state2 = train(exp2, resume="auto")
    assert int(state2.step) == 6

    # Eval produces finite metrics; batched+sharded path (3 scenes pad to
    # the 8-device group) and --show-dir .obj dumps.
    show = str(tmp_path / "show")
    results = evaluate(exp, state, logger=None, show_dir=show)
    assert "scannet" in results
    assert np.isfinite(results["scannet"]["mAP_0.25"])
    dumped = sorted(os.listdir(show))
    assert len(dumped) == 3  # one dir per REAL scene, none for padding
    files = os.listdir(os.path.join(show, dumped[0]))
    assert any(f.endswith("_points.obj") for f in files)
    assert any(f.endswith("_gt.obj") for f in files)


def test_eval_loader_batches(tmp_path):
    from tests.test_data_pipeline import write_fake_dataset
    from unidet3d_tpu.data.datasets import IndoorDataset
    from unidet3d_tpu.data.loader import EvalLoader
    from unidet3d_tpu.data.pipelines import test_pipeline

    root = str(tmp_path / "scannet")
    write_fake_dataset(root, n_scenes=5)
    cfg = small_config(max_points=1024, voxel_capacity=1024,
                       max_superpoints=48)
    ds = IndoorDataset(root, "infos.pkl", 0,
                       pipeline=test_pipeline("scannet"), test_mode=True)
    groups = list(EvalLoader(ds, cfg, batch_size=2, n_shards=2))
    assert len(groups) == 3
    n_reals = [g[4] for g in groups]
    assert n_reals == [2, 2, 1]
    samples, batch, gt, pack, _, cfg_b = groups[0]
    assert batch.points.shape[0] == 2
    # Capacity buckets: the fake scenes are tiny, so the group collates at
    # a bucket below the configured cap (floored at 4096 > 1024 here, so
    # the floor bucket == min bucket == full cap for this tiny cfg).
    assert cfg_b.max_points <= cfg.max_points or cfg_b is cfg
    assert batch.points.shape[1] == cfg_b.max_points
    # Stacked per-shard pack form: leading dim == n_shards.
    import jax

    for leaf in jax.tree_util.tree_leaves(pack):
        assert leaf.shape[0] == 2
    # Padded last group repeats the final scene (collate's over-capacity
    # subsample differs per slot, so compare the raw pipeline samples).
    s_last, batch_last, _, _, n_real, _ = groups[2]
    np.testing.assert_array_equal(
        s_last[0]["points"], s_last[1]["points"]
    )


def test_eval_loader_capacity_buckets(tmp_path):
    """Groups collate at the smallest covering bucket; metrics consumers
    get the bucket cfg to key compiled steps on."""
    from tests.test_data_pipeline import write_fake_dataset
    from unidet3d_tpu.data.datasets import IndoorDataset
    from unidet3d_tpu.data.loader import EvalLoader, capacity_buckets
    from unidet3d_tpu.data.pipelines import test_pipeline

    root = str(tmp_path / "scannet")
    write_fake_dataset(root, n_scenes=2)
    cfg = small_config(max_points=32768, voxel_capacity=32768,
                       max_superpoints=48)
    assert capacity_buckets(cfg) == (
        8192, 16384, 20480, 24576, 28672, 30720, 32768
    )
    ds = IndoorDataset(root, "infos.pkl", 0,
                       pipeline=test_pipeline("scannet"), test_mode=True)
    groups = list(EvalLoader(ds, cfg, batch_size=2, n_shards=1))
    (samples, batch, gt, pack, n_real, cfg_b) = groups[0]
    # Fake scenes are 2000 uniform-random points (no downsampling
    # compression): the per-LEVEL voxel check rejects the 8192 bucket
    # (its level-3 cap 1024 < ~1930 coarse voxels) and picks 16384 —
    # the exact behaviour that protects sparse scans from coarse-level
    # voxel drops a raw point-count heuristic would cause.
    assert cfg_b.max_points == 16384
    assert batch.points.shape[1] == 16384
    assert cfg_b.voxel_capacity == 16384
    needs = EvalLoader._scene_level_needs(
        type("L", (), {"cfg": cfg})(), samples[0]
    )
    assert needs[0] <= 2000 and needs[-1] > 1024


def test_bucket_cfg_picks_intermediate_rungs():
    """A group whose needs land between the half and full caps selects the
    matching intermediate rung (5/8, 3/4 or 7/8), not the full cap — the
    behaviour the finer ladder exists for."""
    from unidet3d_tpu.data.loader import EvalLoader, capacity_buckets

    cfg = small_config(max_points=131072, voxel_capacity=131072,
                       max_superpoints=48)
    assert capacity_buckets(cfg) == (
        32768, 65536, 81920, 98304, 114688, 122880, 131072
    )
    dummy = type(
        "L", (),
        {"cfg": cfg, "buckets": capacity_buckets(cfg),
         "_scene_level_needs": EvalLoader._scene_level_needs},
    )()
    rng = np.random.RandomState(0)

    def sample(n):
        # Dense surface-ish points: a thin slab quantizes to far fewer
        # voxels than points, so the POINT count drives bucket choice.
        pts = rng.rand(n, 3).astype(np.float32) * [4.0, 4.0, 0.2]
        return {"points": pts}

    # ~0.7x cap -> the 3/4 rung (98304), not full.
    cfg_b = EvalLoader._bucket_cfg(dummy, [sample(92_000)])
    assert cfg_b.max_points == 98304
    # ~0.55x cap -> 5/8 rung.
    cfg_b = EvalLoader._bucket_cfg(dummy, [sample(72_000)])
    assert cfg_b.max_points == 81920
    # ~0.85x cap -> 7/8 rung.
    cfg_b = EvalLoader._bucket_cfg(dummy, [sample(110_000)])
    assert cfg_b.max_points == 114688
    # Group bucket = max over scenes.
    cfg_b = EvalLoader._bucket_cfg(
        dummy, [sample(20_000), sample(92_000)]
    )
    assert cfg_b.max_points == 98304


def test_bucket_cfg_compacts_superpoints():
    """The superpoint (query) capacity buckets independently from each
    scene's true superpoint count: eval makes every superpoint a query, so
    padding to the global cap costs a fixed decoder tax the rung avoids.
    A rung never folds a real superpoint (that would change predictions)."""
    from unidet3d_tpu.data.loader import (
        EvalLoader, capacity_buckets, superpoint_buckets,
    )

    cfg = small_config(max_points=131072, voxel_capacity=131072,
                       max_superpoints=3072)
    assert superpoint_buckets(cfg) == (1024, 2048, 3072)
    dummy = type(
        "L", (),
        {"cfg": cfg, "buckets": capacity_buckets(cfg),
         "_scene_level_needs": EvalLoader._scene_level_needs},
    )()
    rng = np.random.RandomState(0)

    def sample(n, n_sp):
        pts = rng.rand(n, 3).astype(np.float32) * [4.0, 4.0, 0.2]
        return {"points": pts,
                "sp_pts_mask": rng.randint(0, n_sp, size=n)}

    # 700 superpoints -> the 1024 rung, not the 3072 cap.
    cfg_b = EvalLoader._bucket_cfg(dummy, [sample(40_000, 700)])
    assert cfg_b.max_superpoints == 1024
    # 1500 -> 2048 rung.
    cfg_b = EvalLoader._bucket_cfg(dummy, [sample(40_000, 1500)])
    assert cfg_b.max_superpoints == 2048
    # Group rung covers the LARGEST scene's superpoint count.
    cfg_b = EvalLoader._bucket_cfg(
        dummy, [sample(40_000, 700), sample(40_000, 2500)]
    )
    assert cfg_b.max_superpoints == 3072
    # No sp masks in the group: collate leaves sp_ids at 0, so the
    # smallest rung covers it.
    cfg_b = EvalLoader._bucket_cfg(dummy, [{"points": sample(1000, 1)["points"]}])
    assert cfg_b.max_superpoints == 1024


def test_eval_loader_sorts_scenes_by_size(tmp_path):
    """Scenes are grouped in descending size order so mixed-size datasets
    don't pad small scenes up to the largest scene's bucket."""
    from tests.test_data_pipeline import write_fake_dataset
    from unidet3d_tpu.data.datasets import IndoorDataset
    from unidet3d_tpu.data.loader import EvalLoader
    from unidet3d_tpu.data.pipelines import test_pipeline

    import pickle

    from tests.test_data_pipeline import make_fake_scene

    root = str(tmp_path / "scannet")
    entries = [
        make_fake_scene(root, f"scene{i}", n=n, seed=i)
        for i, n in enumerate((900, 1700, 600, 1300))
    ]
    with open(os.path.join(root, "infos.pkl"), "wb") as f:
        pickle.dump({"metainfo": {}, "data_list": entries}, f)
    cfg = small_config(max_points=1024, voxel_capacity=1024,
                       max_superpoints=48)
    ds = IndoorDataset(root, "infos.pkl", 0,
                       pipeline=test_pipeline("scannet"), test_mode=True)
    sizes = [ds.scene_size(i) for i in range(4)]
    assert sizes == [900, 1700, 600, 1300]  # raw file point counts
    loader = EvalLoader(ds, cfg, batch_size=2, n_shards=1)
    order = list(loader._order)
    assert sorted(order) == [0, 1, 2, 3]
    assert [sizes[i] for i in order] == sorted(sizes, reverse=True)
    # All 4 scenes still come through exactly once (by scene identity).
    seen = []
    for samples, *_rest, n_real, _cfg_b in loader:
        seen += [s["scene_idx"] for s in samples[:n_real]]
    assert sorted(seen) == [0, 1, 2, 3]
    # Opt-out restores dataset order.
    loader2 = EvalLoader(ds, cfg, batch_size=2, n_shards=1,
                         sort_by_size=False)
    assert list(loader2._order) == [0, 1, 2, 3]
    list(loader2)  # drain the worker


def test_train_loader_reproducible_across_thread_counts(tmp_path):
    """Batch n is a pure function of (seed, n): same seed -> bit-identical
    batch streams for 1 vs 3 worker threads (the r3 loader shared one
    RandomState across threads, making the stream schedule-dependent)."""
    import jax

    from unidet3d_tpu.data.datasets import ConcatDataset, IndoorDataset
    from unidet3d_tpu.data.loader import TrainLoader
    from unidet3d_tpu.data.pipelines import train_pipeline

    root = str(tmp_path / "scannet")
    write_fake_dataset(root, n_scenes=3)
    cfg = small_config(max_points=512, voxel_capacity=512,
                       max_superpoints=48)
    ds = ConcatDataset([
        IndoorDataset(root, "infos.pkl", 0,
                      pipeline=train_pipeline("scannet"), seed=0)
    ])

    def take(num_threads, k=4):
        loader = TrainLoader(ds, cfg, batch_size=2, seed=7,
                             num_threads=num_threads)
        out = [next(loader) for _ in range(k)]
        loader.close()
        return out

    for a, b in zip(take(1), take(3)):
        for la, lb in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        ):
            np.testing.assert_array_equal(la, lb)
    # Different seeds diverge (the randomness is real).
    loader = TrainLoader(ds, cfg, batch_size=2, seed=8, num_threads=1)
    other = next(loader)
    loader.close()
    first = take(1, k=1)[0]
    diff = any(
        not np.array_equal(la, lb)
        for la, lb in zip(
            jax.tree_util.tree_leaves(first),
            jax.tree_util.tree_leaves(other),
        )
    )
    assert diff


def test_allgather_object_roundtrip():
    """Single-process path of the multi-host gather helpers."""
    from unidet3d_tpu.train.metric import (
        _allgather_object,
        _pad_pickle,
        _unpad_pickle,
    )

    obj = {"a": np.arange(5), "b": [1, "two"]}
    # Pad/unpad round trip at several lengths.
    raw_len = len(_pad_pickle(obj)) - 8
    for pad_to in (raw_len, raw_len + 17):
        out = _unpad_pickle(_pad_pickle(obj, pad_to))
        np.testing.assert_array_equal(out["a"], obj["a"])
        assert out["b"] == obj["b"]
    gathered = _allgather_object(obj)
    assert len(gathered) == 1
    np.testing.assert_array_equal(gathered[0]["a"], obj["a"])


def test_apply_overrides(tmp_path):
    exp = _experiment(tmp_path)
    exp2 = apply_overrides(
        exp, ["epochs=5", "model.query_thr=16", "lr=0.001"]
    )
    assert exp2.epochs == 5
    assert exp2.model.query_thr == 16
    assert exp2.lr == 0.001


def test_steps_per_epoch_derived_from_data():
    """Data-derived epoch length follows the reference formula:
    ceil(sum(partition-scaled dataset lengths) / batch_size) (mmengine
    EpochBasedTrainLoop over the concat mixture, ref config:600-645)."""
    from unidet3d_tpu.core.experiment import resolve_steps_per_epoch

    exp = ExperimentConfig(
        model=None, datasets=(), batch_size=8, epochs=1024,
    )
    # Reference joint mixture lengths (train scenes x partition):
    # scannet 1201x1.0, s3dis 5 areas x0.33 (68+71+23+49+67 scenes),
    # multiscan 0.25x230, 3rscan 0.15x1335, scannetpp 0.33x712,
    # arkitscenes 0.08x4498.
    lengths = [
        int(1201 * 1.0),
        *(max(1, int(n * 0.33)) for n in (68, 71, 23, 49, 67)),
        max(1, int(230 * 0.25)),
        max(1, int(1335 * 0.15)),
        max(1, int(712 * 0.33)),
        max(1, int(4498 * 0.08)),
    ]
    total = sum(lengths)
    exp2 = resolve_steps_per_epoch(exp, total)
    assert exp2.steps_per_epoch == -(-total // 8)
    assert exp2.total_steps == 1024 * exp2.steps_per_epoch
    # Joint mixture is ~2x the ScanNet-only 150-step epoch the old constant
    # assumed — the bug VERDICT r2 flagged.
    assert exp2.steps_per_epoch > 250
    # Explicit value wins.
    exp3 = resolve_steps_per_epoch(
        dataclasses.replace(exp, steps_per_epoch=150), total
    )
    assert exp3.steps_per_epoch == 150
