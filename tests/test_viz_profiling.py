"""Visualization variants + profiling utilities."""
import logging
import os

import numpy as np

from unidet3d_tpu.train.profiling import (
    StepTimer,
    annotate,
    device_memory_stats,
    log_compile_stats,
    trace,
)
from unidet3d_tpu.viz.image_vis import (
    draw_bbox3d_on_img,
    draw_camera_bbox3d_on_img,
    draw_depth_bbox3d_on_img,
    draw_lidar_bbox3d_on_img,
    project_points,
)
from unidet3d_tpu.viz.show_results import (
    show_multi_modality_result,
    show_online,
    show_seg_result,
)


def test_show_seg_result(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.rand(100, 6).astype(np.float32)
    gt = rng.randint(0, 3, 100)
    gt[:10] = 255  # ignored
    pred = rng.randint(0, 3, 100)
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.float32)
    d = show_seg_result(
        str(tmp_path), "scene0", pts, gt, pred, palette, ignore_index=255
    )
    files = sorted(os.listdir(d))
    assert files == [
        "scene0_gt.obj", "scene0_points.obj", "scene0_pred.obj"
    ]
    # Ignored points filtered: 90 vertices per obj.
    n = sum(1 for l in open(os.path.join(d, "scene0_gt.obj"))
            if l.startswith("v "))
    assert n == 90


def test_show_multi_modality_result(tmp_path):
    img = np.zeros((64, 64, 3), np.uint8)
    # Simple pinhole: f=32, principal point center; box 4m ahead on z.
    proj = np.array(
        [[32, 0, 32, 0], [0, 32, 32, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float64,
    )
    boxes = np.array([[0, 0, 4.0, 1, 1, 1]], np.float32)
    d = show_multi_modality_result(
        img, boxes, boxes, proj, str(tmp_path), "scene0"
    )
    files = sorted(os.listdir(d))
    assert files == ["scene0_gt.png", "scene0_img.png", "scene0_pred.png"]
    from PIL import Image

    drawn = np.asarray(Image.open(os.path.join(d, "scene0_pred.png")))
    assert (drawn != 0).any()  # wireframe landed in frame


def test_image_vis_modes():
    proj = np.array(
        [[32, 0, 32, 0], [0, 32, 32, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float64,
    )
    uvd = project_points(np.array([[0.0, 0.0, 4.0]]), proj)
    np.testing.assert_allclose(uvd[0], [32, 32, 4])
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[0, 0, 4.0, 1, 1, 1, 0.2]], np.float32)
    for fn, mat in (
        (draw_depth_bbox3d_on_img, proj[:3, :3]),  # 3x3 intrinsics accepted
        (draw_lidar_bbox3d_on_img, proj),
        (draw_camera_bbox3d_on_img, proj),
        (draw_bbox3d_on_img, proj),
    ):
        out = fn(boxes, img.copy(), mat)
        assert (out != 0).any()
    # depth variant with an extrinsic: shift the box out of frame.
    ext = np.eye(4)
    ext[0, 3] = 100.0
    out = draw_depth_bbox3d_on_img(boxes, img.copy(), proj, ext)
    assert (out == 0).all()


def test_show_online_gated():
    try:
        import open3d  # noqa: F401

        have = True
    except ImportError:
        have = False
    if not have:
        try:
            show_online(np.zeros((4, 3), np.float32))
            raised = False
        except ImportError as e:
            raised = "open3d" in str(e)
        assert raised


def test_step_timer_and_eta():
    t = StepTimer(ema=0.5)
    assert t.tick() is None  # first call primes
    import time

    time.sleep(0.01)
    a = t.tick()
    assert a is not None and a > 0
    eta = t.eta(10)
    assert eta is not None and abs(eta - 10 * a) < 1e-9
    assert StepTimer().eta(5) is None


def test_trace_and_annotate(tmp_path, caplog):
    import jax
    import jax.numpy as jnp

    logdir = str(tmp_path / "trace")
    with caplog.at_level(logging.INFO, logger="unidet3d_tpu"):
        with trace(logdir):
            with annotate("bench-step"):
                float(jax.jit(lambda x: x * 2)(jnp.ones(8)).sum())
    assert os.path.isdir(logdir)
    # jax writes trace events under plugins/profile.
    found = any("profile" in r for r, _, _ in os.walk(logdir))
    assert found
    assert any("profiler trace" in m for m in caplog.messages)


def test_compile_stats_and_memory(caplog):
    with caplog.at_level(logging.INFO, logger="unidet3d_tpu"):
        log_compile_stats("test ")
    assert any("compile-cache" in m for m in caplog.messages)
    stats = device_memory_stats()
    assert len(stats) >= 1
