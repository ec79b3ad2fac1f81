"""Unit tests for the geometry core against hand-checked golden cases."""
import numpy as np
import jax.numpy as jnp
import pytest

from unidet3d_tpu.core.boxes import (
    axis_aligned_overlaps_3d,
    bbox_pred_to_bbox,
    boxes_to_corner_format,
    box_corners_bev,
    corner_to_center_format,
    get_face_distances,
    rotate_points_z,
)


def test_corner_roundtrip():
    boxes = jnp.array([[1.0, 2.0, 3.0, 2.0, 4.0, 6.0], [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]])
    corners = boxes_to_corner_format(boxes)
    np.testing.assert_allclose(
        corners[0], [0.0, 0.0, 0.0, 2.0, 4.0, 6.0], atol=1e-6
    )
    back = corner_to_center_format(corners)
    np.testing.assert_allclose(back, boxes, atol=1e-6)


def test_corner_format_identity_for_rotated():
    boxes7 = jnp.ones((3, 7))
    np.testing.assert_allclose(boxes_to_corner_format(boxes7), boxes7)


def test_rotate_points_z_quarter_turn():
    pts = jnp.array([[1.0, 0.0, 5.0]])
    out = rotate_points_z(pts, jnp.array(np.pi / 2))
    # mmdet3d convention (p @ R with R = [[c, s, 0], [-s, c, 0], [0,0,1]]):
    # (1, 0) -> (0, 1) for a +90 degree angle.
    np.testing.assert_allclose(out, [[0.0, 1.0, 5.0]], atol=1e-6)


def test_bbox_pred_to_bbox_axis_aligned():
    points = jnp.array([[1.0, 1.0, 1.0]])
    # dx_min=1, dx_max=3, dy_min=2, dy_max=2, dz_min=0.5, dz_max=1.5
    pred = jnp.array([[1.0, 3.0, 2.0, 2.0, 0.5, 1.5]])
    out = bbox_pred_to_bbox(points, pred)
    # center_x = 1 + (3-1)/2 = 2; size_x = 4; y: center 1, size 4; z: 1.5, 2
    np.testing.assert_allclose(out, [[2.0, 1.0, 1.5, 4.0, 4.0, 2.0]], atol=1e-6)


def test_bbox_pred_to_bbox_rotated():
    points = jnp.array([[0.0, 0.0, 0.0]])
    s, c = 0.0, 1.0  # sin(2a)lnq = 0, cos(2a)lnq = 1 -> q = e, alpha = 0
    pred = jnp.array([[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, s, c]])
    out = bbox_pred_to_bbox(points, pred)
    q = np.exp(1.0)
    scale = 4.0
    np.testing.assert_allclose(
        out,
        [[0.0, 0.0, 0.0, scale / (1 + q), scale * q / (1 + q), 2.0, 0.0]],
        rtol=1e-5,
    )


def test_face_distances_inside_outside():
    box = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    pts = jnp.array([[0.5, 0.0, 0.0], [2.0, 0.0, 0.0]])
    d = get_face_distances(pts[:, None, :], box[None, :, :])
    # Inside point: all positive.
    assert bool(jnp.all(d[0, 0] > 0))
    np.testing.assert_allclose(d[0, 0], [1.5, 0.5, 1.0, 1.0, 1.0, 1.0], atol=1e-6)
    # Outside point: dx_max negative.
    assert float(d[1, 0, 1]) < 0


def test_face_distances_rotated():
    # Box rotated 90 degrees: w=4 along y now, h=2 along x.
    box = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, np.pi / 2]])
    pts = jnp.array([[0.0, 1.9, 0.0], [1.9, 0.0, 0.0]])
    d = get_face_distances(pts[:, None, :], box[None, :, :])
    assert bool(jnp.all(d[0, 0] > 0))  # inside: long axis now along y
    assert not bool(jnp.all(d[1, 0] > 0))  # outside along x


def test_axis_aligned_overlaps():
    b1 = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0]])
    b2 = jnp.array([[1.0, 1.0, 1.0, 3.0, 3.0, 3.0], [5.0, 5.0, 5.0, 6.0, 6.0, 6.0]])
    iou = axis_aligned_overlaps_3d(b1, b2)
    assert iou.shape == (1, 2)
    np.testing.assert_allclose(iou[0, 0], 1.0 / 15.0, rtol=1e-5)
    np.testing.assert_allclose(iou[0, 1], 0.0, atol=1e-7)
    # Aligned mode.
    iou_self = axis_aligned_overlaps_3d(b1, b1, aligned=True)
    np.testing.assert_allclose(iou_self, [1.0], rtol=1e-6)


def test_box_corners_bev():
    c = box_corners_bev(jnp.array([0.0, 0.0, 2.0, 4.0, 0.0]))
    assert c.shape == (4, 2)
    xs = sorted(np.asarray(c[:, 0]).tolist())
    ys = sorted(np.asarray(c[:, 1]).tolist())
    np.testing.assert_allclose(xs, [-1, -1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(ys, [-2, -2, 2, 2], atol=1e-6)
