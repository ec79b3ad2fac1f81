"""Top-k cost matcher + multi-dataset detection criterion (vectorised).

TPU-native re-design of the reference criterion/matcher
(unidet3d/criterion.py:7-178 and the `UniMatcher` at :273-320 — NOT Hungarian:
per-GT top-k lowest-cost queries gated by superpoint containment masks).
Everything operates on padded static shapes: Q query slots, G GT slots, with
validity masks; per-scene dynamic top-k is realised as a static top-(MAXK+1)
sort plus a dynamic threshold (the reference's strict `cost < kth_value`
semantics, criterion.py:316-320, ties dropped identically).

Costs (config:76-89): 0.5 * (-softmax class score) + 2.0 * DIoU loss, masked
to queries whose superpoint lies inside the GT (`query_masks`), INF = 1e8.

Per-layer loss (criterion.py:44-143): weighted CE over padded unified-class
columns (no_obj weight 0.1, torch weighted-mean semantics) + DIoU box loss
averaged over matched pairs, scene-averaged with per-dataset weights; summed
over all 7 decoder output sets with per-layer re-matching (iter_matcher).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.boxes import boxes_to_corner_format
from .iou_losses import axis_aligned_diou_loss, rotated_diou_3d_loss

INF = 1e8
MAXK = 6  # max per-dataset topk (config:92)


class SceneGT(NamedTuple):
    """Padded per-scene ground truth (leading batch dim when batched)."""

    labels: jnp.ndarray  # (G,) int32 in [0, NC)
    boxes: jnp.ndarray  # (G, 7) gravity-center, yaw=0 when axis-aligned
    valid: jnp.ndarray  # (G,) bool
    query_masks: jnp.ndarray  # (G, Q) bool: query may match this GT


# numpy on purpose: a module-level jnp.array would initialize the JAX
# backend at import time, before CLI config files can force a platform
# (jnp converts these at trace time inside jit anyway).
_SAFE_BOX = np.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0], np.float32)
_SAFE_BOX2 = np.array([0.3, 0.2, 0.1, 1.0, 1.0, 1.0, 0.4], np.float32)


def _sanitize_rot_inputs(pred, tgt, rotated):
    """Replace the rotated branch's inputs with well-conditioned dummies for
    non-rotated scenes so its (unselected) backward pass stays NaN-free —
    the standard double-where guard."""
    p = jnp.where(rotated, pred, _SAFE_BOX)
    t = jnp.where(rotated, tgt, _SAFE_BOX2)
    return p, t


def _pairwise_bbox_cost(boxes_q, boxes_g, rotated, chunk: int = 128):
    """(Q, 7) x (G, 7) -> (Q, G) DIoU loss, both aa/rotated branches blended
    by the per-scene `rotated` flag.

    The rotated branch (24-candidate polygon clip) is chunked over queries —
    unchunked temporaries are (Q, G, 24, 2) x several, which OOMs at
    production Q*G."""
    bq = boxes_q[:, None, :]
    bg = boxes_g[None, :, :]
    q, g = boxes_q.shape[0], boxes_g.shape[0]
    bq6 = boxes_to_corner_format(jnp.broadcast_to(bq[..., :6], (q, g, 6)))
    bg6 = boxes_to_corner_format(jnp.broadcast_to(bg[..., :6], (q, g, 6)))
    aa = axis_aligned_diou_loss(bq6, bg6)

    pad = (-q) % chunk
    bq_p = jnp.pad(boxes_q, ((0, pad), (0, 0)))
    blocks = bq_p.reshape(-1, chunk, 7)

    def block_cost(blk):  # (chunk, 7) -> (chunk, G)
        rp, rt = _sanitize_rot_inputs(
            jnp.broadcast_to(blk[:, None, :], (chunk, g, 7)),
            jnp.broadcast_to(bg, (chunk, g, 7)),
            rotated,
        )
        return rotated_diou_3d_loss(rp, rt)

    rot = jax.lax.map(block_cost, blocks).reshape(-1, g)[:q]
    return jnp.where(rotated, rot, aa)


def _pairwise_costs_batch(boxes_q, boxes_g, rotated, chunk: int = 128):
    """(B, Q, 7) x (B, G, 7) -> (B, Q, G) matcher DIoU costs.

    The axis-aligned branch is vmapped (cheap). The rotated branch
    (24-candidate polygon clip — by far the most expensive op in the whole
    train step) runs under a sequential lax.map over scenes with a REAL
    lax.cond on the per-scene `rotated` flag: only rotated-dataset scenes
    (ARKitScenes — ~8% of the reference joint mixture, config:539/607-640)
    pay for it. A vmap would turn the cond into a select and compute the
    clip for every scene."""
    b, q, _ = boxes_q.shape
    g = boxes_g.shape[1]

    def scene_aa(bq, bg):
        bq6 = boxes_to_corner_format(
            jnp.broadcast_to(bq[:, None, :6], (q, g, 6))
        )
        bg6 = boxes_to_corner_format(
            jnp.broadcast_to(bg[None, :, :6], (q, g, 6))
        )
        return axis_aligned_diou_loss(bq6, bg6)

    aa = jax.vmap(scene_aa)(boxes_q, boxes_g)

    pad = (-q) % chunk

    def scene_rot(args):
        bq, bg, r = args

        def compute(_):
            blocks = jnp.pad(bq, ((0, pad), (0, 0))).reshape(-1, chunk, 7)

            def block_cost(blk):  # (chunk, 7) -> (chunk, G)
                return rotated_diou_3d_loss(
                    jnp.broadcast_to(blk[:, None, :], (chunk, g, 7)),
                    jnp.broadcast_to(bg[None, :, :], (chunk, g, 7)),
                )

            return jax.lax.map(block_cost, blocks).reshape(-1, g)[:q]

        return jax.lax.cond(r, compute, lambda _: jnp.zeros((q, g)), None)

    rot = jax.lax.map(scene_rot, (boxes_q, boxes_g, rotated))
    return jnp.where(rotated[:, None, None], rot, aa)


def _elementwise_bbox_loss(pred, tgt, rotated):
    """(..., 7) one-to-one DIoU loss, aa/rotated by scene flag."""
    aa = axis_aligned_diou_loss(
        boxes_to_corner_format(pred[..., :6]),
        boxes_to_corner_format(tgt[..., :6]),
    )
    rp, rt = _sanitize_rot_inputs(pred, tgt, rotated)
    rot = rotated_diou_3d_loss(rp, rt)
    return jnp.where(rotated, rot, aa)


class MatchResult(NamedTuple):
    pair_q: jnp.ndarray  # (G, MAXK) int32 query index per match slot
    pair_valid: jnp.ndarray  # (G, MAXK) bool
    cls_target: jnp.ndarray  # (Q,) int32 target column (no_obj = nc_max)
    has_match: jnp.ndarray  # (Q,) bool


def match_scene(
    cls_logits: jnp.ndarray,  # (Q, NC+1), padded cols = -inf
    boxes: jnp.ndarray,  # (Q, 7)
    query_valid: jnp.ndarray,  # (Q,)
    gt: SceneGT,
    rotated: jnp.ndarray,  # () bool
    topk: jnp.ndarray,  # () int32
    cls_weight: float = 0.5,
    bbox_weight: float = 2.0,
    bbox_cost: jnp.ndarray | None = None,  # (Q, G) precomputed (batch path)
) -> MatchResult:
    """Reference UniMatcher (criterion.py:287-320) on padded tensors."""
    q_cap = cls_logits.shape[0]
    g_cap = gt.labels.shape[0]
    nc_max = cls_logits.shape[1] - 1

    scores = jax.nn.softmax(cls_logits, axis=-1)  # (Q, NC+1)
    cls_cost = -scores[:, jnp.clip(gt.labels, 0, nc_max)]  # (Q, G)
    if bbox_cost is None:
        bbox_cost = _pairwise_bbox_cost(boxes, gt.boxes, rotated)
    cost = cls_weight * cls_cost + bbox_weight * bbox_cost
    cost = jax.lax.stop_gradient(cost)

    allowed = (
        gt.query_masks.T & query_valid[:, None] & gt.valid[None, :]
    )  # (Q, G)
    cost = jnp.where(allowed, cost, INF)

    # Per-GT ascending top-(MAXK+1) costs.
    neg_vals, idx = jax.lax.top_k(-cost.T, MAXK + 1)  # (G, MAXK+1)
    sorted_costs = -neg_vals
    thresh = jnp.take_along_axis(
        sorted_costs, jnp.broadcast_to(topk, (g_cap, 1)), axis=1
    )[:, 0]
    pair_q = idx[:, :MAXK]
    pair_cost = sorted_costs[:, :MAXK]
    pair_valid = (
        (pair_cost < thresh[:, None]) & (pair_cost < INF) & gt.valid[:, None]
    )

    # cls target: last (highest-g) matched GT wins, mirroring the row-major
    # argwhere + sequential assignment at reference criterion.py:101.
    matched = (
        jnp.zeros((q_cap, g_cap), bool)
        .at[pair_q, jnp.arange(g_cap)[:, None]]
        .max(pair_valid)
    )
    has_match = jnp.any(matched, axis=1)
    g_last = g_cap - 1 - jnp.argmax(matched[:, ::-1], axis=1)
    cls_target = jnp.where(
        has_match, gt.labels[jnp.clip(g_last, 0)], nc_max
    ).astype(jnp.int32)
    return MatchResult(pair_q, pair_valid, cls_target, has_match)


def layer_loss_scene(
    cls_logits: jnp.ndarray,
    boxes: jnp.ndarray,
    query_valid: jnp.ndarray,
    gt: SceneGT,
    rotated: jnp.ndarray,
    topk: jnp.ndarray,
    non_object_weight: float,
    bbox_cost: jnp.ndarray | None = None,
):
    """One decoder layer, one scene -> (cls_loss, bbox_loss_sum, n_pairs)."""
    nc_max = cls_logits.shape[1] - 1
    m = match_scene(cls_logits, boxes, query_valid, gt, rotated, topk,
                    bbox_cost=bbox_cost)

    # Weighted cross entropy, torch weighted-mean semantics
    # (criterion.py:106-108): sum(w_i * nll_i) / sum(w_i), padded queries out.
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, m.cls_target[:, None], axis=-1)[:, 0]
    w = jnp.where(m.cls_target == nc_max, non_object_weight, 1.0)
    w = jnp.where(query_valid, w, 0.0)
    cls_loss = jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-8)

    # Box loss over matched pairs.
    pred = boxes[m.pair_q.reshape(-1)]  # (G*MAXK, 7)
    tgt = jnp.repeat(gt.boxes, MAXK, axis=0)
    pl = _elementwise_bbox_loss(pred, tgt, rotated)
    pv = m.pair_valid.reshape(-1)
    bbox_sum = jnp.sum(jnp.where(pv, pl, 0.0))
    n_pairs = jnp.sum(pv)
    return cls_loss, bbox_sum, n_pairs


def criterion(
    cls_logits: jnp.ndarray,  # (L, B, Q, NC+1)
    boxes: jnp.ndarray,  # (L, B, Q, 7)
    query_valid: jnp.ndarray,  # (B, Q)
    gt: SceneGT,  # batched: (B, G, ...) leaves
    rotated: jnp.ndarray,  # (B,)
    topk: jnp.ndarray,  # (B,)
    dataset_weights: jnp.ndarray,  # (B,)
    loss_weight=(0.5, 1.0),
    non_object_weight: float = 0.1,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Total detection loss over all decoder layers (criterion.py:145-178).

    Under shard_map DP (`axis_name` bound), the scenes-with-pairs
    normalisation is computed over the GLOBAL batch via psum so the loss —
    and, combined with the outer grad pmean, the gradients — are exactly
    invariant to the mesh size: N devices x B/N scenes reproduces the
    reference's single-process batch-B semantics bit-for-bit (modulo fp
    reorder). Each local term is scaled by axis size so pmean recovers the
    global scene-mean."""
    num_layers = cls_logits.shape[0]
    per_scene = jax.vmap(
        layer_loss_scene, in_axes=(0, 0, 0, 0, 0, 0, None, 0)
    )

    def _global_sum(x):
        if axis_name is None:
            return x
        try:
            return jax.lax.psum(x, axis_name)
        except NameError:  # axis unbound: unmapped call (tests, init)
            return x

    # Mesh size (1 when unmapped).
    n_dev = _global_sum(jnp.ones((), jnp.float32))

    total = 0.0
    for layer in range(num_layers):
        # Matcher box costs precomputed at batch level: the rotated clip
        # only runs for rotated scenes (see _pairwise_costs_batch).
        costs = jax.lax.stop_gradient(
            _pairwise_costs_batch(boxes[layer], gt.boxes, rotated)
        )
        cls_l, bbox_sum, n_pairs = per_scene(
            cls_logits[layer],
            boxes[layer],
            query_valid,
            gt,
            rotated,
            topk,
            non_object_weight,
            costs,
        )
        cls_loss = jnp.mean(dataset_weights * cls_l)
        # Scene-mean over scenes that have matched pairs (reference skips
        # scenes with no gts/matches, criterion.py:114), over the GLOBAL
        # batch. local = n_dev * local_sum / global_count, so that
        # pmean(local) == global_sum / global_count.
        has_pairs = n_pairs > 0
        scene_bbox = dataset_weights * bbox_sum / jnp.maximum(n_pairs, 1)
        global_has = _global_sum(jnp.sum(has_pairs.astype(jnp.float32)))
        bbox_loss = (
            n_dev
            * jnp.sum(jnp.where(has_pairs, scene_bbox, 0.0))
            / jnp.maximum(global_has, 1)
        )
        total = total + loss_weight[0] * cls_loss + loss_weight[1] * bbox_loss
    return total
