"""Project 3D points / boxes into images (numpy-only).

Mirror of reference unidet3d/image_vis.py:10-205 (`project_pts_on_img`,
`draw_depth_bbox3d_on_img`, `draw_camera_bbox3d_on_img`) without the cv2
dependency: lines are rasterised with a simple numpy Bresenham so results can
be saved by any image writer. (This path is unused by train/eval — parity
utility only, like the reference.)
"""
from __future__ import annotations

import numpy as np

from ..core.boxes import boxes7_corners

_LINES = [
    (0, 1), (0, 2), (1, 3), (2, 3),
    (4, 5), (4, 6), (5, 7), (6, 7),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def project_points(points: np.ndarray, proj_mat: np.ndarray) -> np.ndarray:
    """(N, 3) world points x (4, 4) projection -> (N, 3) [u, v, depth]."""
    ones = np.ones((len(points), 1), points.dtype)
    hom = np.concatenate([points[:, :3], ones], axis=1)
    cam = hom @ proj_mat.T
    depth = cam[:, 2:3]
    uv = cam[:, :2] / np.maximum(np.abs(depth), 1e-6) * np.sign(depth)
    return np.concatenate([uv, depth], axis=1)


def _draw_line(img, p0, p1, color):
    h, w = img.shape[:2]
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1))
    xs = np.linspace(p0[0], p1[0], n + 1).round().astype(int)
    ys = np.linspace(p0[1], p1[1], n + 1).round().astype(int)
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[ok], xs[ok]] = color
    return img


def draw_points_on_img(
    points: np.ndarray, img: np.ndarray, proj_mat: np.ndarray,
    color=(0, 255, 0),
):
    """Splat projected points into the image (ref project_pts_on_img)."""
    uvd = project_points(points, proj_mat)
    ok = uvd[:, 2] > 0
    u = uvd[ok, 0].round().astype(int)
    v = uvd[ok, 1].round().astype(int)
    h, w = img.shape[:2]
    m = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    img[v[m], u[m]] = color
    return img


def draw_depth_bbox3d_on_img(
    boxes: np.ndarray, img: np.ndarray, calib: np.ndarray,
    extrinsic: np.ndarray | None = None, color=(0, 255, 0),
):
    """Depth-frame variant (ref image_vis.py:128-165): boxes live in the
    depth/world frame; an optional depth->camera extrinsic composes with the
    calib intrinsics before projection."""
    proj = np.asarray(calib, np.float64)
    if proj.shape == (3, 3):
        p = np.eye(4)
        p[:3, :3] = proj
        proj = p
    if extrinsic is not None:
        proj = proj @ np.asarray(extrinsic, np.float64)
    return draw_bbox3d_on_img(boxes, img, proj, color=color)


def draw_lidar_bbox3d_on_img(
    boxes: np.ndarray, img: np.ndarray, lidar2img: np.ndarray,
    color=(0, 255, 0),
):
    """Lidar-frame variant (ref image_vis.py:89-125): a single (4, 4)
    lidar->image matrix carries the whole transform."""
    return draw_bbox3d_on_img(boxes, img, lidar2img, color=color)


def draw_camera_bbox3d_on_img(
    boxes: np.ndarray, img: np.ndarray, cam2img: np.ndarray,
    color=(0, 255, 0),
):
    """Camera-frame variant (ref image_vis.py:168-205): boxes already in
    camera coordinates, projected by the (3, 3)|(4, 4) intrinsics."""
    return draw_depth_bbox3d_on_img(boxes, img, cam2img, None, color=color)


def draw_bbox3d_on_img(
    boxes: np.ndarray, img: np.ndarray, proj_mat: np.ndarray,
    color=(0, 255, 255),
):
    """Draw (M, 6|7) gravity-center boxes as projected wireframes
    (ref draw_depth_bbox3d_on_img / draw_camera_bbox3d_on_img)."""
    import jax.numpy as jnp

    boxes = np.asarray(boxes, np.float32)
    if boxes.shape[-1] == 6:
        boxes = np.concatenate([boxes, np.zeros_like(boxes[:, :1])], -1)
    corners = np.asarray(boxes7_corners(jnp.asarray(boxes)))
    for cs in corners:
        uvd = project_points(cs, proj_mat)
        if (uvd[:, 2] <= 0).any():
            continue
        for a, b in _LINES:
            img = _draw_line(img, uvd[a, :2], uvd[b, :2], color)
    return img
