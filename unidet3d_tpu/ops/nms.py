"""Static-shape 3D NMS on device.

TPU-native replacement for mmcv `nms3d`/`nms3d_normal` and mmdet3d
`aligned_3d_nms` (reference unidet3d/unidet3d.py:595-650): a precomputed
pairwise IoU matrix + greedy sequential suppression over score-sorted boxes,
restricted to same-class pairs (the reference loops classes; with a
same-class mask the greedy result is identical). Fixed box count
(test_cfg.topk_insts = 1000) keeps every shape static.

The three reference NMS flavours collapse to two IoU kernels:
  * axis-aligned IoU — `nms3d_normal` (ignores yaw) and `aligned_3d_nms`
    are numerically the same overlap.
  * rotated 3D IoU — `nms3d` (BEV polygon clip x z-overlap).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.boxes import axis_aligned_overlaps_3d, boxes_to_corner_format
from .rotated_iou import rotated_iou_3d


def pairwise_iou_aa(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, >=6) center-size boxes -> (N, N) axis-aligned IoU (yaw ignored)."""
    corners = boxes_to_corner_format(boxes[:, :6])
    return axis_aligned_overlaps_3d(corners, corners)


def pairwise_iou_rotated(boxes: jnp.ndarray, chunk: int = 128) -> jnp.ndarray:
    """(N, 7) boxes -> (N, N) rotated 3D IoU, row-chunked to bound memory."""
    n = boxes.shape[0]
    pad = (-n) % chunk
    padded = jnp.pad(boxes, ((0, pad), (0, 0)))
    rows = padded.reshape(-1, chunk, 7)

    def row_block(rb):
        return rotated_iou_3d(rb[:, None, :], boxes[None, :, :])

    out = jax.lax.map(row_block, rows).reshape(-1, n)
    return out[:n]


def greedy_nms(
    iou: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thr: float,
) -> jnp.ndarray:
    """Greedy class-wise NMS. Returns keep mask (N,).

    Boxes are processed in descending score order; a box is suppressed if a
    kept, higher-scoring box of the same class overlaps it above iou_thr.
    """
    n = scores.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -1.0))
    iou_s = iou[order][:, order]
    labels_s = labels[order]
    valid_s = valid[order]
    same = labels_s[:, None] == labels_s[None, :]
    sup_mat = (iou_s > iou_thr) & same  # candidate suppression edges

    def body(i, keep):
        row = sup_mat[i] & (jnp.arange(n) > i) & keep[i] & valid_s[i]
        return keep & ~row

    keep_s = jax.lax.fori_loop(0, n, body, valid_s)
    return jnp.zeros_like(keep_s).at[order].set(keep_s)
