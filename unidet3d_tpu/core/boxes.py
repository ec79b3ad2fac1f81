"""3D box geometry core (pure jnp, fully static shapes).

Box convention used THROUGHOUT this framework: ``(cx, cy, cz, dx, dy, dz[, yaw])``
with the center being the *gravity center* (volumetric center) of the box and
yaw a rotation around +z. This mirrors what the reference model math actually
operates on after it calls ``.gravity_center`` (reference:
unidet3d/unidet3d.py:318-330, unidet3d/criterion.py:87-91); we simply never
round-trip through mmdet3d's bottom-center storage convention.

Functional parity targets (reference file:line):
  - corner-format conversion  -> unidet3d/criterion.py:180-198 (`_bbox_to_loss`)
  - FCAF3D-style box decode   -> unidet3d/encoder.py:241-283 (`_bbox_pred_to_bbox`)
  - point-to-face distances   -> unidet3d/unidet3d.py:652-677 (`get_face_distances`)
  - axis-aligned overlaps     -> mmdet3d AxisAlignedBboxOverlaps3D (used at
                                 unidet3d/axis_aligned_iou_loss.py:28)
  - rotation around axis      -> mmdet3d rotation_3d_in_axis (used at
                                 unidet3d/unidet3d.py:667)
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def rotation_matrix_z(angles: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices around +z for a batch of angles.

    Args:
        angles: (...,) rotation angles in radians.

    Returns:
        (..., 3, 3) rotation matrices R such that ``p_rot = p @ R`` matches
        mmdet3d's ``rotation_3d_in_axis(points, angles, axis=2)`` convention
        (row-vector points, counter-clockwise positive).
    """
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    # mmdet3d axis=2: [[cos, sin, 0], [-sin, cos, 0], [0, 0, 1]] applied as p @ R.
    rot = jnp.stack(
        [
            jnp.stack([c, s, zeros], axis=-1),
            jnp.stack([-s, c, zeros], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return rot


def rotate_points_z(points: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Rotate points around +z. points (..., 3), angles broadcastable to (...)."""
    rot = rotation_matrix_z(angles)
    return jnp.einsum("...i,...ij->...j", points, rot)


def boxes_to_corner_format(boxes: jnp.ndarray) -> jnp.ndarray:
    """Center-size -> (x1, y1, z1, x2, y2, z2). Identity for 7-dof (rotated) boxes.

    Mirror of reference unidet3d/criterion.py:180-198.
    """
    if boxes.shape[-1] != 6:
        return boxes
    half = boxes[..., 3:6] / 2
    return jnp.concatenate([boxes[..., :3] - half, boxes[..., :3] + half], axis=-1)


def corner_to_center_format(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, z1, x2, y2, z2) -> center-size."""
    center = (boxes[..., :3] + boxes[..., 3:6]) / 2
    size = boxes[..., 3:6] - boxes[..., :3]
    return jnp.concatenate([center, size], axis=-1)


def bbox_pred_to_bbox(points: jnp.ndarray, bbox_pred: jnp.ndarray) -> jnp.ndarray:
    """Decode face-distance predictions into boxes around reference points.

    Mirror of reference unidet3d/encoder.py:241-283 (`_bbox_pred_to_bbox`).

    Args:
        points: (N, 3) reference locations (superpoint centers).
        bbox_pred: (N, 6) ``(dx_min, dx_max, dy_min, dy_max, dz_min, dz_max)``
            (already exp-ed) or (N, 8) with trailing ``(sin(2a)ln q, cos(2a)ln q)``.

    Returns:
        (N, 6) axis-aligned or (N, 7) rotated boxes, gravity-center convention.
    """
    x_center = points[:, 0] + (bbox_pred[:, 1] - bbox_pred[:, 0]) / 2
    y_center = points[:, 1] + (bbox_pred[:, 3] - bbox_pred[:, 2]) / 2
    z_center = points[:, 2] + (bbox_pred[:, 5] - bbox_pred[:, 4]) / 2

    base = jnp.stack(
        [
            x_center,
            y_center,
            z_center,
            bbox_pred[:, 0] + bbox_pred[:, 1],
            bbox_pred[:, 2] + bbox_pred[:, 3],
            bbox_pred[:, 4] + bbox_pred[:, 5],
        ],
        axis=-1,
    )
    if bbox_pred.shape[-1] == 6:
        return base

    # Rotated branch: q = exp(sqrt(s^2 + c^2)), alpha = atan2(s, c) / 2.
    scale = bbox_pred[:, 0] + bbox_pred[:, 1] + bbox_pred[:, 2] + bbox_pred[:, 3]
    q = jnp.exp(jnp.sqrt(bbox_pred[:, 6] ** 2 + bbox_pred[:, 7] ** 2))
    alpha = 0.5 * jnp.arctan2(bbox_pred[:, 6], bbox_pred[:, 7])
    return jnp.stack(
        [
            x_center,
            y_center,
            z_center,
            scale / (1 + q),
            scale / (1 + q) * q,
            bbox_pred[:, 5] + bbox_pred[:, 4],
            alpha,
        ],
        axis=-1,
    )


def get_face_distances(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Distances from points to the six faces of (possibly rotated) boxes.

    Mirror of reference unidet3d/unidet3d.py:652-677, but batched cleanly:
    broadcasting instead of materialised expand.

    Args:
        points: (..., 3).
        boxes: (..., 7) broadcast-compatible with points; yaw in column 6.
            Pass zeros in the yaw column for axis-aligned boxes.

    Returns:
        (..., 6): (dx_min, dx_max, dy_min, dy_max, dz_min, dz_max).
        All six positive <=> point inside box.
    """
    shift = points - boxes[..., :3]
    # Rotate the offset into the box frame (negative yaw, consistent with
    # rotation_3d_in_axis(shift, -yaw, axis=2) in the reference).
    shift = rotate_points_z(shift, -boxes[..., 6])
    half = boxes[..., 3:6] / 2
    d_min = shift + half  # distance to min faces
    d_max = half - shift  # distance to max faces
    return jnp.stack(
        [
            d_min[..., 0],
            d_max[..., 0],
            d_min[..., 1],
            d_max[..., 1],
            d_min[..., 2],
            d_max[..., 2],
        ],
        axis=-1,
    )


def axis_aligned_overlaps_3d(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray, aligned: bool = False
) -> jnp.ndarray:
    """IoU of axis-aligned corner-format boxes (x1, y1, z1, x2, y2, z2).

    Parity with mmdet3d AxisAlignedBboxOverlaps3D (consumed by the reference
    at unidet3d/axis_aligned_iou_loss.py:28).

    Args:
        boxes1: (..., N, 6); boxes2: (..., M, 6) (or (..., N, 6) if aligned).
        aligned: if True computes elementwise IoU (N,), else pairwise (N, M).
    """
    if aligned:
        lt = jnp.maximum(boxes1[..., :3], boxes2[..., :3])
        rb = jnp.minimum(boxes1[..., 3:], boxes2[..., 3:])
        wh = jnp.clip(rb - lt, 0)
        overlap = wh[..., 0] * wh[..., 1] * wh[..., 2]
        vol1 = jnp.prod(boxes1[..., 3:] - boxes1[..., :3], axis=-1)
        vol2 = jnp.prod(boxes2[..., 3:] - boxes2[..., :3], axis=-1)
        union = vol1 + vol2 - overlap
    else:
        lt = jnp.maximum(boxes1[..., :, None, :3], boxes2[..., None, :, :3])
        rb = jnp.minimum(boxes1[..., :, None, 3:], boxes2[..., None, :, 3:])
        wh = jnp.clip(rb - lt, 0)
        overlap = wh[..., 0] * wh[..., 1] * wh[..., 2]
        vol1 = jnp.prod(boxes1[..., 3:] - boxes1[..., :3], axis=-1)
        vol2 = jnp.prod(boxes2[..., 3:] - boxes2[..., :3], axis=-1)
        union = vol1[..., :, None] + vol2[..., None, :] - overlap
    return overlap / jnp.maximum(union, EPS)


def box_corners_bev(boxes5: jnp.ndarray) -> jnp.ndarray:
    """BEV corners of rotated 2D boxes.

    Parity with mmcv `box2corners` (consumed by the reference at
    unidet3d/rotated_iou_loss.py:25-26).

    Args:
        boxes5: (..., 5) = (x, y, w, h, alpha).

    Returns:
        (..., 4, 2) corners in counter-clockwise order.
    """
    x, y, w, h, alpha = (boxes5[..., i] for i in range(5))
    # Template corners in box frame (mmcv order: (1,-1),(1,1),(-1,1),(-1,-1))/2.
    tx = jnp.stack([w, w, -w, -w], axis=-1) * 0.5
    ty = jnp.stack([-h, h, h, -h], axis=-1) * 0.5
    c = jnp.cos(alpha)[..., None]
    s = jnp.sin(alpha)[..., None]
    cx = tx * c - ty * s + x[..., None]
    cy = tx * s + ty * c + y[..., None]
    return jnp.stack([cx, cy], axis=-1)


def boxes7_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """Eight 3D corners of (N, 7) gravity-center boxes. Returns (N, 8, 3)."""
    half = boxes[..., 3:6] / 2
    signs = jnp.array(
        [
            [-1, -1, -1],
            [-1, -1, 1],
            [-1, 1, -1],
            [-1, 1, 1],
            [1, -1, -1],
            [1, -1, 1],
            [1, 1, -1],
            [1, 1, 1],
        ],
        dtype=boxes.dtype,
    )
    local = signs[None] * half[..., None, :]
    rot = rotation_matrix_z(boxes[..., 6])
    world = jnp.einsum("...ki,...ij->...kj", local, rot)
    return world + boxes[..., None, :3]
