"""Qualitative result export: colored point clouds + box wireframes as .obj.

Mirror of reference unidet3d/show_results.py:14-94,167-188 (`show_result_v2`
and `_write_obj` / `_write_oriented_bbox_v2`): ground-truth boxes drawn green,
predictions red, points with their RGB colors. Pure numpy — viewable in any
mesh viewer.
"""
from __future__ import annotations

import os

import numpy as np

from ..core.boxes import boxes7_corners

# Box wireframe edges over the 8 corners produced by boxes7_corners
# (corner bit order: x sign major, then y, then z).
_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3),  # -x face is 0,1,2,3? see corner order
    (4, 5), (4, 6), (5, 7), (6, 7),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def write_obj(points: np.ndarray, path: str):
    """Write (N, 3) or (N, 6 with rgb in [0, 255] or [0, 1]) points."""
    with open(path, "w") as f:
        for p in points:
            if len(p) >= 6:
                rgb = p[3:6]
                if rgb.max() > 1.0:
                    rgb = rgb / 255.0
                f.write(
                    f"v {p[0]} {p[1]} {p[2]} {rgb[0]} {rgb[1]} {rgb[2]}\n"
                )
            else:
                f.write(f"v {p[0]} {p[1]} {p[2]}\n")


def write_boxes_obj(boxes: np.ndarray, path: str, color=(1.0, 0.0, 0.0)):
    """Write (M, 6|7) gravity-center boxes as wireframes (lines)."""
    boxes = np.asarray(boxes, np.float32)
    if boxes.shape[-1] == 6:
        boxes = np.concatenate(
            [boxes, np.zeros_like(boxes[:, :1])], axis=-1
        )
    import jax.numpy as jnp

    corners = np.asarray(boxes7_corners(jnp.asarray(boxes)))  # (M, 8, 3)
    with open(path, "w") as f:
        for ci, cs in enumerate(corners):
            for p in cs:
                f.write(
                    f"v {p[0]} {p[1]} {p[2]} {color[0]} {color[1]} {color[2]}\n"
                )
            base = ci * 8 + 1
            for a, b in _EDGES:
                f.write(f"l {base + a} {base + b}\n")


def show_result(
    out_dir: str,
    name: str,
    points: np.ndarray | None = None,
    gt_bboxes: np.ndarray | None = None,
    pred_bboxes: np.ndarray | None = None,
):
    """Dump <name>_points.obj / _gt.obj / _pred.obj (ref show_results.py:167)."""
    result_dir = os.path.join(out_dir, name)
    os.makedirs(result_dir, exist_ok=True)
    if points is not None and len(points):
        write_obj(points, os.path.join(result_dir, f"{name}_points.obj"))
    if gt_bboxes is not None and len(gt_bboxes):
        write_boxes_obj(
            gt_bboxes, os.path.join(result_dir, f"{name}_gt.obj"),
            color=(0.0, 1.0, 0.0),
        )
    if pred_bboxes is not None and len(pred_bboxes):
        write_boxes_obj(
            pred_bboxes, os.path.join(result_dir, f"{name}_pred.obj"),
            color=(1.0, 0.0, 0.0),
        )
    return result_dir
