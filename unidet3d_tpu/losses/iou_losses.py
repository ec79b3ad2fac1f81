"""Axis-aligned and rotated (D)IoU losses.

Parity targets:
  - axis-aligned DIoU -> reference unidet3d/axis_aligned_iou_loss.py:15-53
  - rotated DIoU      -> reference unidet3d/rotated_iou_loss.py:63-82

All functions are elementwise over arbitrary leading dims (the criterion uses
them both one-to-one on matched pairs and pairwise as matching costs), return
unreduced losses, and are differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.boxes import axis_aligned_overlaps_3d
from ..ops.rotated_iou import diff_diou_rotated_3d

_EPS = 1e-8


def axis_aligned_iou_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 − IoU of corner-format boxes (..., 6) = (x1, y1, z1, x2, y2, z2)."""
    return 1.0 - axis_aligned_overlaps_3d(pred, target, aligned=True)


def axis_aligned_diou_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """DIoU loss (1 − IoU + r²/c²) of corner-format boxes (..., 6)."""
    iou_loss = 1.0 - axis_aligned_overlaps_3d(pred, target, aligned=True)

    pc = (pred[..., :3] + pred[..., 3:]) / 2
    tc = (target[..., :3] + target[..., 3:]) / 2
    r2 = jnp.sum((pc - tc) ** 2, axis=-1)

    mins = jnp.minimum(pred[..., :3], target[..., :3])
    maxs = jnp.maximum(pred[..., 3:], target[..., 3:])
    c2 = jnp.sum((maxs - mins) ** 2, axis=-1)

    return iou_loss + r2 / jnp.maximum(c2, _EPS)


def rotated_iou_3d_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 − rotated IoU of (..., 7) boxes (x, y, z, w, l, h, alpha)."""
    from ..ops.rotated_iou import rotated_iou_3d

    return 1.0 - rotated_iou_3d(pred, target)


def rotated_diou_3d_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 − rotated DIoU of (..., 7) boxes (x, y, z, w, l, h, alpha)."""
    return 1.0 - diff_diou_rotated_3d(pred, target)


def make_bbox_loss(mode: str, rotated: bool):
    """Factory mirroring the reference loss registry entries.

    mode: 'iou' | 'diou'; rotated selects the 7-dof branch.
    """
    if rotated:
        return rotated_diou_3d_loss if mode == "diou" else rotated_iou_3d_loss
    return axis_aligned_diou_loss if mode == "diou" else axis_aligned_iou_loss
