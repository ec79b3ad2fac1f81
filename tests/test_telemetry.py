"""Capacity-drop telemetry: every silent truncation site increments a
visible counter (VERDICT r3 weak #7 — a mis-sized config must be visible in
one interval of logs, not silent corruption)."""
import numpy as np

from tests.test_detector import small_config
from unidet3d_tpu.data.batcher import collate
from unidet3d_tpu.data.telemetry import DROPS, DropCounters


def _scene(n=100, coords=None, **extra):
    rng = np.random.RandomState(0)
    pts = np.zeros((n, 6), np.float32)
    if coords is None:
        coords = rng.randint(0, 20, (n, 3))
    pts[:, :3] = coords * 0.02
    sm = {
        "points": pts,
        "dataset_idx": 0,
        # Integer voxel coords directly (avoids float-quantization jitter).
        "elastic_coords": coords.astype(np.float32),
    }
    sm.update(extra)
    return sm


def test_counters_trigger_and_reset():
    cfg = small_config(max_points=256, voxel_capacity=512,
                       max_superpoints=16, max_gts=4)
    DROPS.reset()

    # points_dropped: 300 > 256 cap.
    collate([_scene(n=300)], cfg, build_rulebooks=False)
    # gts_dropped: 6 > 4 cap.
    boxes = np.tile(np.asarray([[0, 0, 0, 1, 1, 1]], np.float32), (6, 1))
    collate(
        [_scene(gt_bboxes_3d=boxes, gt_labels_3d=np.zeros(6, np.int64))],
        cfg, build_rulebooks=False,
    )
    # superpoints_folded: ids up to 40 >= 16 cap.
    collate(
        [_scene(sp_pts_mask=np.arange(100) % 40)], cfg,
        build_rulebooks=False,
    )
    # instances_dropped: ids up to 10 >= 4 cap.
    collate(
        [_scene(pts_instance_mask=(np.arange(100) % 10).astype(np.int64))],
        cfg, build_rulebooks=False,
    )
    snap = DROPS.snapshot()
    assert snap["points_dropped"] == 300 - 256
    assert snap["gts_dropped"] == 2
    assert snap["superpoints_folded"] > 0
    assert snap["instances_dropped"] > 0

    # snapshot(reset=True) clears.
    DROPS.snapshot(reset=True)
    assert DROPS.snapshot() == {}


def test_voxel_overflow_counters():
    # 4000 distinct EVEN coords: level-0 cap 4096 holds them all, but
    # halving keeps them distinct so level 1 (cap 2048) must drop ~1952.
    i = np.arange(4000)
    coords = np.stack([(i % 64) * 2, (i // 64) * 2, np.zeros_like(i)], -1)
    cfg = small_config(max_points=4096, voxel_capacity=4096,
                       max_superpoints=16, max_gts=4)
    DROPS.reset()
    collate([_scene(n=4000, coords=coords)], cfg)
    snap = DROPS.snapshot(reset=True)
    assert snap["coarse_voxels_dropped"] == 4000 - 2048

    # level-0 overflow: cap 1024 < 4000 unique voxels.
    cfg0 = small_config(max_points=4096, voxel_capacity=1024,
                        max_superpoints=16, max_gts=4)
    collate([_scene(n=4000, coords=coords)], cfg0)
    snap = DROPS.snapshot(reset=True)
    assert snap["voxels_dropped"] == 4000 - 1024

    # Well-sized caps: NO counters fire.
    cfg_ok = small_config(max_points=4096, voxel_capacity=4096,
                          max_superpoints=16, max_gts=4)
    dense = np.stack([i % 16, (i // 16) % 16, i // 256], -1)
    collate([_scene(n=4000, coords=dense)], cfg_ok)
    assert DROPS.snapshot() == {}


def test_counters_thread_safe():
    import threading

    c = DropCounters()

    def work():
        for _ in range(1000):
            c.add("x", 1)

    ts = [threading.Thread(target=work) for _ in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert c.snapshot()["x"] == 8000
