"""Tests for ARKitScenes prep utilities and superpoint remapping."""
import numpy as np

from unidet3d_tpu.tools.arkitscenes_utils import (
    annotation_to_box7,
    unproject_depth,
    voxel_downsample,
)
from unidet3d_tpu.tools.remap_superpoints import remap_superpoints


def test_unproject_roundtrip():
    h, w = 4, 4
    depth = np.full((h, w), 2.0, np.float32)
    k = np.array([[100.0, 0, 2.0], [0, 100.0, 2.0], [0, 0, 1]])
    pose = np.eye(4)
    pts = unproject_depth(depth, k, pose)
    assert pts.shape == (16, 3)
    np.testing.assert_allclose(pts[:, 2], 2.0)
    # Center pixel maps to (0, 0, z).
    center = pts[np.argmin(np.abs(pts[:, 0]) + np.abs(pts[:, 1]))]
    np.testing.assert_allclose(center, [0, 0, 2.0], atol=1e-6)


def test_voxel_downsample_merges():
    pts = np.array(
        [[0.0, 0, 0], [0.01, 0, 0], [1.0, 1.0, 1.0]], np.float32
    )
    out = voxel_downsample(pts, grid=0.05)
    assert len(out) == 2
    np.testing.assert_allclose(sorted(out[:, 0]), [0.005, 1.0], atol=1e-6)


def test_annotation_to_box7_yaw():
    c, s = [1, 2, 3], [2, 2, 2]
    a = np.pi / 6
    rot = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
    )
    box = annotation_to_box7(c, s, rot)
    np.testing.assert_allclose(box[:6], [1, 2, 3, 2, 2, 2])
    np.testing.assert_allclose(box[6], a, atol=1e-6)


def test_remap_superpoints_permutation():
    rng = np.random.RandomState(0)
    pts = np.concatenate(
        [rng.rand(50, 3).astype(np.float32), np.zeros((50, 3), np.float32)], 1
    )
    perm = rng.permutation(50)
    sp_pts = pts[perm]
    sp = (perm % 5).astype(np.int64)  # superpoints aligned with sp_pts order
    out = remap_superpoints(pts, sp_pts, sp)
    # out[i] must equal the superpoint of the same physical point.
    inv = np.empty(50, int)
    inv[perm] = np.arange(50)
    expected = sp[inv]
    # Compacted ids: same partition (equality pattern preserved).
    for i in range(50):
        for j in range(50):
            assert (out[i] == out[j]) == (expected[i] == expected[j])
