"""Inference post-processing: top-k selection, class-wise NMS, superpoint
box trimming.

Mirror of reference unidet3d/unidet3d.py:475-650 (`predict_by_feat`,
`_single_scene_multiclass_nms`, `trim_bboxes_by_superpoints`) with static
shapes throughout: predictions are carried as fixed-size (topk_insts,) arrays
with validity masks; the dataset index is a STATIC argument (known on host per
scene), so each dataset's branch combination (rotated NMS / fast NMS /
superpoint trimming, config:40-43,95-100) compiles to its own lean program.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.boxes import get_face_distances
from ..core.config import ModelConfig
from ..ops.nms import greedy_nms, pairwise_iou_aa, pairwise_iou_rotated
from ..ops.segment import segment_mean


class SceneDetections(NamedTuple):
    boxes: jnp.ndarray  # (K, 7)
    labels: jnp.ndarray  # (K,)
    scores: jnp.ndarray  # (K,)
    valid: jnp.ndarray  # (K,)


def select_topk_instances(
    cls_logits: jnp.ndarray,  # (Q, NC+1) padded-gathered logits
    boxes: jnp.ndarray,  # (Q, 7)
    query_valid: jnp.ndarray,  # (Q,)
    k: int,
):
    """softmax -> drop no_obj -> flat (query, class) top-k (ref :498-515)."""
    nc = cls_logits.shape[1] - 1
    probs = jax.nn.softmax(cls_logits, axis=-1)[:, :nc]  # (Q, NC)
    probs = jnp.where(query_valid[:, None], probs, 0.0)
    flat = probs.reshape(-1)
    k = min(k, flat.shape[0])
    scores, idx = jax.lax.top_k(flat, k)
    labels = idx % nc
    qidx = idx // nc
    sel_boxes = boxes[qidx]
    return sel_boxes, labels, scores


def trim_boxes_by_superpoints(
    cfg: ModelConfig,
    boxes: jnp.ndarray,  # (K, 7)
    keep: jnp.ndarray,  # (K,)
    points: jnp.ndarray,  # (P, 3)
    point_valid: jnp.ndarray,  # (P,)
    sp_ids: jnp.ndarray,  # (P,) in [0, S)
    chunk: int = 128,
):
    """Superpoint-vote box trimming (ref :540-593), chunked over boxes.

    Returns refitted axis-aligned (K, 7) boxes (yaw zeroed — the reference
    emits with_yaw=False boxes here) and an updated validity mask (boxes that
    end with no inside points are dropped).
    """
    s = cfg.max_superpoints
    k = boxes.shape[0]
    pad = (-k) % chunk
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))
    blocks = boxes_p.reshape(-1, chunk, 7)
    sp_safe = jnp.where(point_valid, jnp.clip(sp_ids, 0, s - 1), s)

    def block_fn(bb):  # (chunk, 7)
        fd = get_face_distances(points[:, None, :], bb[None, :, :])  # (P,c,6)
        inside = (jnp.min(fd, axis=-1) > 0) & point_valid[:, None]  # (P, c)
        sp_inside = segment_mean(inside.astype(jnp.float32), sp_safe, s)
        # (S, c) fraction of each superpoint inside each box.
        sp_del = sp_inside < cfg.low_sp_thr
        sp_add = sp_inside > cfg.up_sp_thr
        per_point_del = sp_del.at[sp_safe].get(
            mode="fill", fill_value=True
        )  # (P, c)
        per_point_add = sp_add.at[sp_safe].get(mode="fill", fill_value=False)
        inside = (inside & ~per_point_del) | (per_point_add & point_valid[:, None])
        pmax = jnp.max(
            jnp.where(inside[..., None], points[:, None, :], -jnp.inf), axis=0
        )  # (c, 3)
        pmin = jnp.min(
            jnp.where(inside[..., None], points[:, None, :], jnp.inf), axis=0
        )
        has = jnp.any(inside, axis=0)
        center = (pmax + pmin) / 2
        size = pmax - pmin
        nb = jnp.concatenate(
            [center, size, jnp.zeros_like(center[:, :1])], axis=-1
        )
        return jnp.where(has[:, None], nb, 0.0), has

    new_blocks, has_blocks = jax.lax.map(block_fn, blocks)
    new_boxes = new_blocks.reshape(-1, 7)[:k]
    has = has_blocks.reshape(-1)[:k]
    return new_boxes, keep & has


@partial(jax.jit, static_argnums=(0, 1))
def predict_batch(
    cfg: ModelConfig,
    dataset_idx: int,
    cls_logits: jnp.ndarray,  # (B, Q, NC+1)
    boxes: jnp.ndarray,  # (B, Q, 7)
    query_valid: jnp.ndarray,  # (B, Q)
    points: jnp.ndarray,  # (B, P, 3)
    point_valid: jnp.ndarray,  # (B, P)
    sp_ids: jnp.ndarray,  # (B, P)
) -> SceneDetections:
    """Batched post-processing: one dispatch per scene GROUP instead of per
    scene. lax.map (not vmap) keeps the peak memory of the face-distance
    tensor in trim_boxes at one scene's worth."""

    def one(args):
        return predict_scene(cfg, dataset_idx, *args)

    return jax.lax.map(
        one, (cls_logits, boxes, query_valid, points, point_valid, sp_ids)
    )


@partial(jax.jit, static_argnums=(0, 1))
def predict_scene(
    cfg: ModelConfig,
    dataset_idx: int,
    cls_logits: jnp.ndarray,  # (Q, NC+1) last decoder layer, one scene
    boxes: jnp.ndarray,  # (Q, 7)
    query_valid: jnp.ndarray,
    points: jnp.ndarray,  # (P, 3) raw
    point_valid: jnp.ndarray,
    sp_ids: jnp.ndarray,
) -> SceneDetections:
    """Full single-scene post-processing (ref predict_by_feat :475-538)."""
    rotated = cfg.angles[dataset_idx]
    iou_thr = cfg.iou_thr[dataset_idx]

    sel_boxes, labels, scores = select_topk_instances(
        cls_logits, boxes, query_valid, cfg.topk_insts
    )
    valid = scores > cfg.score_thr

    iou = (
        pairwise_iou_rotated(sel_boxes)
        if rotated
        else pairwise_iou_aa(sel_boxes)
    )
    keep = greedy_nms(iou, scores, labels, valid, iou_thr)

    out_boxes = sel_boxes
    if not rotated:
        out_boxes = out_boxes.at[:, 6].set(0.0)
    if cfg.use_superpoints[dataset_idx]:
        out_boxes, keep = trim_boxes_by_superpoints(
            cfg, out_boxes, keep, points, point_valid, sp_ids
        )
    return SceneDetections(
        boxes=out_boxes, labels=labels, scores=scores, valid=keep
    )
