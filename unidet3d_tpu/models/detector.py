"""UniDet3D-TPU detector: voxelize -> sparse U-Net -> superpoint pool ->
transformer decoder, plus GT preparation for the criterion.

TPU-native re-design of the reference detector (unidet3d/unidet3d.py:20-473):
  * collate/voxelize (ref :136-176)  -> ops/voxelize (fused, static shapes)
  * extract_feat (ref :113-134)      -> UNetBackbone + segment-mean pooling
  * _select_queries (ref :182-218)   -> static-Q random selection with masks
  * GT prep (ref :220-256, :306-347) -> pure-jnp batched functions below
  * get_targets (ref :371-409)       -> distance-topk targets, vectorised

Geometry frames follow the reference exactly: training shifts every scene so
min(coords) = 0 (boxes shifted identically); inference keeps raw coordinates
for superpoint centers so predictions land in the input frame (ref :444-447).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.class_table import ClassTable
from ..core.config import ModelConfig
from ..losses.criterion import SceneGT, criterion
from ..ops.gridpack import GridPack, build_gridpack_device
from ..ops.segment import segment_mean, segment_sum
from .decoder import DecoderOutput, UniDecoder
from .unet import UNetBackbone

BIG = 1e9


def _axis_index_or_zero(axis_name):
    """lax.axis_index when running under shard_map/pmap over `axis_name`,
    else 0 (single-device jit / eager)."""
    if axis_name is None:
        return jnp.zeros((), jnp.int32)
    try:
        return jax.lax.axis_index(axis_name)
    except NameError:
        return jnp.zeros((), jnp.int32)


class PointBatch(NamedTuple):
    """Padded input batch (host-side pipeline output).

    points: (B, P, 3) raw xyz.
    vox_src: (B, P, 3) coordinates in voxel units — elastic coords when the
        elastic augmentation fired (ref transforms_3d.py:12-83), else
        points / voxel_size.
    features: (B, P, F) voxel features: [normalized colors, xyz - mean(xyz)]
        (ref unidet3d.py:160).
    valid: (B, P) bool.
    sp_ids: (B, P) int32 superpoint id in [0, S), compacted per scene.
    dataset_ids: (B,) int32 index into cfg.datasets.
    """

    points: jnp.ndarray
    vox_src: jnp.ndarray
    features: jnp.ndarray
    valid: jnp.ndarray
    sp_ids: jnp.ndarray
    dataset_ids: jnp.ndarray


class GTBatch(NamedTuple):
    """Padded ground truth (training only).

    labels: (B, G); boxes: (B, G, 7) gravity-center RAW frame; valid: (B, G).
    sp_masks: (B, G, S) host-computed superpoint instance masks (ScanNet/
        S3DIS pipelines); ignored for target_by_distance datasets.
    inst_ids: (B, P) per-point instance id in [-1, G) for bbox-from-mask.
    """

    labels: jnp.ndarray
    boxes: jnp.ndarray
    valid: jnp.ndarray
    sp_masks: jnp.ndarray
    inst_ids: jnp.ndarray


class ForwardAux(NamedTuple):
    sp_centers: jnp.ndarray  # (B, S, 3) in the geometry frame
    sp_valid: jnp.ndarray  # (B, S)
    query_sp: jnp.ndarray  # (B, Q) superpoint slot of each query
    query_valid: jnp.ndarray  # (B, Q)
    shift: jnp.ndarray  # (B, 1, 3) scene shift in metres (train frame)
    geom_points: jnp.ndarray  # (B, P, 3) points in the geometry frame


class UniDet3DTPU(nn.Module):
    """Backbone + decoder; returns per-layer predictions and aux info."""

    cfg: ModelConfig
    table: ClassTable

    @nn.compact
    def __call__(
        self,
        batch: PointBatch,
        train: bool,
        rulebooks: GridPack | None = None,
    ):
        cfg = self.cfg
        b, p, _ = batch.points.shape
        s = cfg.max_superpoints
        # Query capacity padded to a 512 multiple (flash-attention block
        # divisibility); real query count stays query_thr — extra slots are
        # masked invalid.
        q_real = min(cfg.query_thr, s) if train else s
        q = min(-(-q_real // 512) * 512, s) if q_real >= 512 else q_real

        # --- frame shift + quantization (ref unidet3d.py:157-166,295-304).
        vs = jnp.where(batch.valid[..., None], batch.vox_src, BIG)
        pmin = jnp.min(vs, axis=1, keepdims=True)  # (B, 1, 3)
        pmin = jnp.where(pmin >= BIG, 0.0, pmin)  # empty-scene guard
        shifted = batch.vox_src - pmin

        flat_valid = batch.valid.reshape(-1)
        if rulebooks is None:
            # Pure-XLA fallback (tests, dry runs): build rulebooks on device.
            icoords = jnp.floor(shifted).astype(jnp.int32)
            batch_idx = jnp.repeat(
                jnp.arange(b, dtype=jnp.int32)[:, None], p, axis=1
            ).reshape(-1, 1)
            bxyz = jnp.concatenate(
                [batch_idx, icoords.reshape(-1, 3)], axis=-1
            )
            rulebooks, _ = build_gridpack_device(
                bxyz, flat_valid, list(cfg.level_capacities(b))
            )
        pack = rulebooks
        v0 = pack.capacity(0)

        # Voxel features: per-voxel mean of point features (ME TensorField
        # average-dedup semantics, ref :170-174).
        pinv = jnp.where(flat_valid, pack.point_inverse, v0)
        vox_feats = segment_mean(
            batch.features.reshape(b * p, -1), pinv, v0
        )

        # --- backbone (ref :113-129).
        feats = UNetBackbone(
            num_planes=cfg.num_planes,
            axis_name=cfg.axis_name,
            dtype=jnp.dtype(cfg.compute_dtype),
            conv_window=cfg.level_conv_windows(),
            conv_wsub=cfg.level_conv_subwindows(),
            conv_align=cfg.level_pack_align(),
            remat=cfg.backbone_remat,
            name="backbone",
        )(vox_feats, pack, train)

        # --- voxel -> point -> superpoint pooling (ref :130).
        point_feats = feats.at[pinv].get(mode="fill", fill_value=0.0)
        sp_flat = (
            jnp.repeat(jnp.arange(b, dtype=jnp.int32)[:, None], p, axis=1) * s
            + jnp.clip(batch.sp_ids, 0, s - 1)
        ).reshape(-1)
        sp_flat = jnp.where(flat_valid, sp_flat, b * s)  # sentinel dropped
        sp_feats = segment_mean(point_feats, sp_flat, b * s).reshape(b, s, -1)
        sp_counts = segment_sum(
            flat_valid.astype(jnp.float32), sp_flat, b * s
        ).reshape(b, s)
        sp_valid = sp_counts > 0

        # --- superpoint centers (ref :332-333 train / :446-447 test).
        geom = (
            shifted * cfg.voxel_size if train else batch.points
        )  # (B, P, 3)
        sp_centers = segment_mean(
            geom.reshape(b * p, 3), sp_flat, b * s
        ).reshape(b, s, 3)

        # --- query selection (ref :182-218).
        if train:
            rng = self.make_rng("queries")
            # Fold per GLOBAL scene index so the random query subsets are
            # invariant to the mesh size: DP over N devices draws exactly
            # the same subsets as a single-device run on the same global
            # batch (makes DP-vs-single grad equality exactly testable).
            scene_ids = _axis_index_or_zero(cfg.axis_name) * b + jnp.arange(b)
            keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(
                rng, scene_ids
            )
            noise = jax.vmap(
                lambda k: jax.random.uniform(k, (s,))
            )(keys)
            noise = jnp.where(sp_valid, noise, BIG)
            order = jnp.argsort(noise, axis=1)  # valid superpoints first
            query_sp = order[:, :q]
            n_sp = jnp.sum(sp_valid, axis=1)
            query_valid = (
                jnp.arange(q)[None, :]
                < jnp.minimum(n_sp, q_real)[:, None]
            )
        else:
            query_sp = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))
            query_valid = sp_valid

        queries = jnp.take_along_axis(sp_feats, query_sp[..., None], axis=1)
        centers = jnp.take_along_axis(sp_centers, query_sp[..., None], axis=1)

        out = UniDecoder(
            num_layers=cfg.num_layers,
            d_model=cfg.d_model,
            num_heads=cfg.num_heads,
            hidden_dim=cfg.hidden_dim,
            dropout=cfg.dropout,
            activation=cfg.activation,
            cls_gather=self.table.gather,
            angles=cfg.angles,
            dtype=jnp.dtype(cfg.compute_dtype),
            name="decoder",
        )(queries, query_valid, centers, batch.dataset_ids, train)

        aux = ForwardAux(
            sp_centers=sp_centers,
            sp_valid=sp_valid,
            query_sp=query_sp,
            query_valid=query_valid,
            shift=pmin * cfg.voxel_size,
            geom_points=geom,
        )
        return out, aux


def _bboxes_from_masks(geom_points, valid, inst_ids, g_cap):
    """Axis-aligned boxes from per-point instance ids (ref :220-256), one scene.

    geom_points (P, 3); inst_ids (P,) in [-1, G). Returns (G, 7)."""
    gid = jnp.where((inst_ids >= 0) & valid, inst_ids, g_cap)
    pmax = jax.ops.segment_max(
        jnp.where(valid[:, None], geom_points, -BIG), gid, num_segments=g_cap
    )
    pmin = jax.ops.segment_min(
        jnp.where(valid[:, None], geom_points, BIG), gid, num_segments=g_cap
    )
    center = (pmax + pmin) / 2
    size = pmax - pmin
    empty = pmax[:, 0] < -BIG / 2
    boxes = jnp.concatenate(
        [center, size, jnp.zeros_like(center[:, :1])], axis=-1
    )
    return jnp.where(empty[:, None], 0.0, boxes)


def _distance_topk_masks(sp_centers, sp_valid, boxes, gt_valid, topk):
    """Distance-based target assignment (ref :371-409), one scene.

    Returns (G, S) bool: superpoint s assigned to box g."""
    s_cap = sp_centers.shape[0]
    d = jnp.sum(
        (sp_centers[:, None, :] - boxes[None, :, :3]) ** 2, axis=-1
    )  # (S, G)
    d = jnp.where(sp_valid[:, None] & gt_valid[None, :], d, BIG)
    # (topk+1)-th smallest distance per box; k clamped to the actual
    # superpoint count (ref :396-399 min(topk + 1, n_points)).
    k = int(topk) + 1  # static: train_cfg.topk is a config constant
    neg_top, _ = jax.lax.top_k(-d.T, k)  # (G, k) ascending distances
    n_sp = jnp.sum(sp_valid)
    kth = jnp.minimum(k, jnp.maximum(n_sp, 1)) - 1
    thresh = jnp.take_along_axis(
        -neg_top, jnp.broadcast_to(kth, (boxes.shape[0], 1)), axis=1
    )[:, 0]
    cond = d < thresh[None, :]
    dm = jnp.where(cond, d, BIG)
    min_d = jnp.min(dm, axis=1)
    min_g = jnp.argmin(dm, axis=1)
    assigned = min_d < BIG
    g_ids = jnp.arange(boxes.shape[0])
    return (assigned[None, :] & (min_g[None, :] == g_ids[:, None])) & gt_valid[
        :, None
    ]


def prepare_gt(
    cfg: ModelConfig,
    batch: PointBatch,
    gt: GTBatch,
    aux: ForwardAux,
) -> SceneGT:
    """Build the criterion's padded SceneGT (ref unidet3d.py:306-347)."""
    import numpy as np

    g_cap = gt.labels.shape[1]
    bbox_by_mask = jnp.asarray(np.asarray(cfg.bbox_by_mask))[batch.dataset_ids]
    tbd = jnp.asarray(np.asarray(cfg.target_by_distance))[batch.dataset_ids]
    topk_t = cfg.train_topk_targets  # static python int

    # Boxes: recompute from masks OR shift raw boxes into the geometry frame.
    mask_boxes = jax.vmap(_bboxes_from_masks, in_axes=(0, 0, 0, None))(
        aux.geom_points, batch.valid, gt.inst_ids, g_cap
    )
    shifted_boxes = gt.boxes.at[..., :3].add(-aux.shift)
    boxes = jnp.where(bbox_by_mask[:, None, None], mask_boxes, shifted_boxes)

    # Superpoint masks: distance-topk (device) or host-provided votes.
    dist_masks = jax.vmap(_distance_topk_masks, in_axes=(0, 0, 0, 0, None))(
        aux.sp_centers, aux.sp_valid, boxes, gt.valid, topk_t
    )
    sp_masks = jnp.where(tbd[:, None, None], dist_masks, gt.sp_masks)

    # Gather the selected query columns (ref :212 query_masks).
    query_masks = jnp.take_along_axis(
        sp_masks, aux.query_sp[:, None, :], axis=2
    )  # (B, G, Q)
    return SceneGT(
        labels=gt.labels, boxes=boxes, valid=gt.valid, query_masks=query_masks
    )


def detection_loss(
    cfg: ModelConfig,
    out: DecoderOutput,
    aux: ForwardAux,
    batch: PointBatch,
    gt: GTBatch,
) -> jnp.ndarray:
    """Full training loss (ref unidet3d.py:277-364 + criterion)."""
    import numpy as np

    scene_gt = prepare_gt(cfg, batch, gt, aux)
    rotated = jnp.asarray(np.asarray(cfg.angles))[batch.dataset_ids]
    topk = jnp.asarray(np.asarray(cfg.topk))[batch.dataset_ids]
    weights = jnp.asarray(np.asarray(cfg.datasets_weights))[batch.dataset_ids]
    return criterion(
        out.cls_logits,
        out.boxes,
        aux.query_valid,
        scene_gt,
        rotated,
        topk,
        weights,
        loss_weight=cfg.loss_weight,
        non_object_weight=cfg.non_object_weight,
        axis_name=cfg.axis_name,
    )
