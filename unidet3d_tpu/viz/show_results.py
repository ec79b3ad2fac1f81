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


def show_seg_result(
    out_dir: str,
    name: str,
    points: np.ndarray,  # (N, 3|6)
    gt_seg: np.ndarray | None,
    pred_seg: np.ndarray | None,
    palette: np.ndarray,  # (num_classes, 3) in [0, 255]
    ignore_index: int | None = None,
):
    """Semantic-segmentation variant (ref show_results.py:189-259): points
    recolored by the label palette, gt/pred exported as meshlab-readable
    .obj files; `ignore_index` points are filtered like the reference."""
    points = np.asarray(points)
    if gt_seg is not None and ignore_index is not None:
        keep = gt_seg != ignore_index
        points = points[keep]
        if pred_seg is not None:
            pred_seg = pred_seg[keep]
        gt_seg = gt_seg[keep]

    result_dir = os.path.join(out_dir, name)
    os.makedirs(result_dir, exist_ok=True)
    palette = np.asarray(palette, np.float32)
    if len(points):
        write_obj(points, os.path.join(result_dir, f"{name}_points.obj"))
    for seg, tag in ((gt_seg, "gt"), (pred_seg, "pred")):
        if seg is None:
            continue
        colored = np.concatenate([points[:, :3], palette[seg]], axis=1)
        write_obj(colored, os.path.join(result_dir, f"{name}_{tag}.obj"))
    return result_dir


def show_multi_modality_result(
    img: np.ndarray,  # (H, W, 3) uint8
    gt_bboxes: np.ndarray | None,  # (M, 6|7) depth-frame boxes
    pred_bboxes: np.ndarray | None,
    proj_mat: np.ndarray,  # (4, 4) depth->image projection
    out_dir: str,
    name: str,
    gt_color=(61, 102, 255),
    pred_color=(241, 101, 72),
):
    """Project 3D boxes onto an image and save it (ref
    show_results.py:262-332; the cv2 rasteriser is replaced by
    image_vis._draw_line and PIL does the IO)."""
    from PIL import Image

    from .image_vis import draw_bbox3d_on_img

    result_dir = os.path.join(out_dir, name)
    os.makedirs(result_dir, exist_ok=True)
    if gt_bboxes is not None and len(gt_bboxes):
        shown = draw_bbox3d_on_img(
            gt_bboxes, img.copy(), proj_mat, color=gt_color
        )
        Image.fromarray(shown.astype(np.uint8)).save(
            os.path.join(result_dir, f"{name}_gt.png")
        )
    if pred_bboxes is not None and len(pred_bboxes):
        shown = draw_bbox3d_on_img(
            pred_bboxes, img.copy(), proj_mat, color=pred_color
        )
        Image.fromarray(shown.astype(np.uint8)).save(
            os.path.join(result_dir, f"{name}_pred.png")
        )
    Image.fromarray(np.asarray(img, np.uint8)).save(
        os.path.join(result_dir, f"{name}_img.png")
    )
    return result_dir


def show_online(points: np.ndarray, boxes: np.ndarray | None = None):
    """Interactive viewer (ref show_results.py:96-165 open3d path). open3d
    is not a framework dependency; if unavailable, point the user at the
    .obj exports instead of failing deep in eval."""
    try:
        import open3d as o3d
    except ImportError as e:
        raise ImportError(
            "open3d is not installed; use show_result()'s .obj exports "
            "with any mesh viewer instead"
        ) from e
    geoms = []
    pc = o3d.geometry.PointCloud()
    pc.points = o3d.utility.Vector3dVector(np.asarray(points[:, :3]))
    if points.shape[1] >= 6:
        cols = np.asarray(points[:, 3:6], np.float64)
        if cols.max() > 1.0:
            cols = cols / 255.0
        pc.colors = o3d.utility.Vector3dVector(cols)
    geoms.append(pc)
    if boxes is not None:
        import jax.numpy as jnp

        b = np.asarray(boxes, np.float32)
        if b.shape[-1] == 6:
            b = np.concatenate([b, np.zeros_like(b[:, :1])], -1)
        corners = np.asarray(boxes7_corners(jnp.asarray(b)))
        for cs in corners:
            ls = o3d.geometry.LineSet(
                points=o3d.utility.Vector3dVector(cs),
                lines=o3d.utility.Vector2iVector(np.asarray(_EDGES)),
            )
            ls.paint_uniform_color([1.0, 0.0, 0.0])
            geoms.append(ls)
    o3d.visualization.draw_geometries(geoms)


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
