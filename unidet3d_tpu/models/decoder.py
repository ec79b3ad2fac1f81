"""Superpoint transformer decoder with unified multi-dataset heads.

TPU-native re-design of the reference decoder (unidet3d/encoder.py:113-283,
confusingly named "UniDet3DEncoder"): instead of looping scenes through
nn.MultiheadAttention one at a time (encoder.py:36-40), queries are batched
(B, Q, d) with key-padding masks — one fused attention per layer across the
whole batch. Heads run after the input projection and after every layer
(7 output sets; last = main, first 6 = aux, encoder.py:217-239).

Per-dataset classification uses the padded gather table from
core/class_table.py; box decode produces BOTH the axis-aligned and rotated
forms and selects per scene by the dataset's `angles` flag (config:62).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NEG_INF = -1e9


class DecoderOutput(NamedTuple):
    """Stacked per-layer outputs. L = num_layers + 1 (proj head + each layer).

    cls_logits: (L, B, Q, NC_MAX + 1) — per-dataset gathered logits, padded
        class columns = NEG_INF, no_obj at column NC_MAX.
    boxes: (L, B, Q, 7) — decoded boxes (yaw = 0 for axis-aligned scenes).
    """

    cls_logits: jnp.ndarray
    boxes: jnp.ndarray


class Attention(nn.Module):
    """Self-attention, parameter-compatible with flax MultiHeadDotProduct-
    Attention (query/key/value/out DenseGeneral children), with an optional
    pallas TPU flash-attention execution path that never materialises the
    (B, H, Q, Q) logits — the decoder's peak-memory hog at Q=2048+."""

    d_model: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, key_mask):
        import jax

        h = self.num_heads
        hd = self.d_model // h
        q = nn.DenseGeneral(features=(h, hd), dtype=self.dtype, name="query")(x)
        k = nn.DenseGeneral(features=(h, hd), dtype=self.dtype, name="key")(x)
        v = nn.DenseGeneral(features=(h, hd), dtype=self.dtype, name="value")(x)

        q_len = x.shape[1]
        flash_ok = (
            self.use_flash
            and jax.default_backend() == "tpu"
            and q_len % 512 == 0
        )
        if flash_ok:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
                flash_attention,
            )

            seg = jnp.where(key_mask, 1, 2).astype(jnp.int32)  # (B, Q)
            o = flash_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=1.0 / (hd**0.5),
            ).transpose(0, 2, 1, 3)
        else:
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / (hd**0.5)
            logits = jnp.where(
                key_mask[:, None, None, :], logits, NEG_INF
            )
            weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            o = jnp.einsum(
                "bhqk,bkhd->bqhd",
                weights,
                v,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
        return nn.DenseGeneral(
            features=self.d_model, axis=(-2, -1), dtype=self.dtype, name="out"
        )(o)


class SelfAttentionLayer(nn.Module):
    """Post-norm MHSA block (reference encoder.py:8-41)."""

    d_model: int
    num_heads: int
    dropout: float
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True

    @nn.compact
    def __call__(self, x, key_mask, train: bool):
        z = Attention(
            self.d_model,
            self.num_heads,
            dtype=self.dtype,
            use_flash=self.use_flash,
            name="attn",
        )(x, key_mask)
        z = z.astype(jnp.float32)
        if self.dropout > 0.0:
            z = nn.Dropout(self.dropout, deterministic=not train)(z)
        return nn.LayerNorm(name="norm")(z + x)


class FFN(nn.Module):
    """Post-norm feed-forward block (reference encoder.py:43-80)."""

    d_model: int
    hidden_dim: int
    dropout: float
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        act = nn.gelu if self.activation == "gelu" else nn.relu
        z = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        z = act(z)
        if self.dropout > 0.0:
            z = nn.Dropout(self.dropout, deterministic=not train)(z)
        z = nn.Dense(self.d_model, dtype=self.dtype, name="fc2")(z)
        z = z.astype(jnp.float32)
        if self.dropout > 0.0:
            z = nn.Dropout(self.dropout, deterministic=not train)(z)
        return nn.LayerNorm(name="norm")(z + x)


def decode_boxes(
    sp_centers: jnp.ndarray, bbox_pred: jnp.ndarray, rotated: jnp.ndarray
) -> jnp.ndarray:
    """Batched FCAF3D-style decode (reference encoder.py:241-283).

    Args:
        sp_centers: (B, Q, 3).
        bbox_pred: (B, Q, 8), first 6 already exp-ed face distances.
        rotated: (B,) bool — per-scene angle flag.

    Returns:
        (B, Q, 7) boxes; yaw = 0 where not rotated.
    """
    x_c = sp_centers[..., 0] + (bbox_pred[..., 1] - bbox_pred[..., 0]) / 2
    y_c = sp_centers[..., 1] + (bbox_pred[..., 3] - bbox_pred[..., 2]) / 2
    z_c = sp_centers[..., 2] + (bbox_pred[..., 5] - bbox_pred[..., 4]) / 2
    dx = bbox_pred[..., 0] + bbox_pred[..., 1]
    dy = bbox_pred[..., 2] + bbox_pred[..., 3]
    dz = bbox_pred[..., 4] + bbox_pred[..., 5]

    scale = dx + dy
    # 1e-20 guards the sqrt/arctan2 gradients at the (s, c) = (0, 0) point.
    s_p, c_p = bbox_pred[..., 6], bbox_pred[..., 7]
    norm2 = s_p**2 + c_p**2
    q = jnp.exp(jnp.sqrt(norm2 + 1e-20))
    safe = norm2 > 1e-20
    alpha = 0.5 * jnp.arctan2(
        jnp.where(safe, s_p, 0.0), jnp.where(safe, c_p, 1.0)
    )

    r = rotated[:, None]
    w = jnp.where(r, scale / (1 + q), dx)
    l = jnp.where(r, scale / (1 + q) * q, dy)
    yaw = jnp.where(r, alpha, 0.0)
    return jnp.stack([x_c, y_c, z_c, w, l, dz, yaw], axis=-1)


class UniDecoder(nn.Module):
    """Input proj + N x (MHSA + FFN) + per-layer cls/box heads."""

    num_layers: int
    d_model: int
    num_heads: int
    hidden_dim: int
    dropout: float
    activation: str
    cls_gather: np.ndarray  # (D, NC_MAX + 1) int32, -1 padding
    angles: tuple  # (D,) python bools
    remat: bool = True  # rematerialise attention/FFN in backward (saves
    # ~B*H*Q^2 per layer of stored attention weights)
    dtype: jnp.dtype = jnp.float32  # attention/FFN compute dtype
    use_flash: bool = True  # pallas flash attention on TPU (Q % 512 == 0)

    @nn.compact
    def __call__(
        self,
        queries: jnp.ndarray,  # (B, Q, C_in)
        query_mask: jnp.ndarray,  # (B, Q) bool
        sp_centers: jnp.ndarray,  # (B, Q, 3)
        dataset_ids: jnp.ndarray,  # (B,) int32
        train: bool,
    ) -> DecoderOutput:
        num_unified = int(self.cls_gather.max()) + 1

        gather_t = jnp.asarray(self.cls_gather)  # (D, NCmax+1)
        angles_t = jnp.asarray(np.asarray(self.angles, dtype=bool))
        scene_gather = gather_t[dataset_ids]  # (B, NCmax+1)
        scene_valid = scene_gather >= 0
        rotated = angles_t[dataset_ids]  # (B,)

        # Head matmuls run in the decoder compute dtype (bf16 in
        # production); logits and box params are cast back to f32 BEFORE
        # the where/exp/decode so masking constants and box sizes keep full
        # precision. fp32 configs (golden-parity tests) are unchanged.
        out_norm = nn.LayerNorm(name="out_norm", dtype=self.dtype)
        cls_fc1 = nn.Dense(self.d_model, name="cls_fc1", dtype=self.dtype)
        cls_fc2 = nn.Dense(num_unified, name="cls_fc2", dtype=self.dtype)
        box_fc = nn.Dense(8, name="box_fc", dtype=self.dtype)

        def head(feats):
            h = out_norm(feats.astype(self.dtype))
            cls_all = cls_fc2(nn.relu(cls_fc1(h))).astype(jnp.float32)
            idx = jnp.clip(scene_gather, 0)[:, None, :]  # (B, 1, NCmax+1)
            idx = jnp.broadcast_to(
                idx, (cls_all.shape[0], cls_all.shape[1], idx.shape[-1])
            )
            cls_sel = jnp.take_along_axis(cls_all, idx, axis=-1)
            cls_sel = jnp.where(scene_valid[:, None, :], cls_sel, NEG_INF)
            bp = box_fc(h).astype(jnp.float32)  # (B, Q, 8)
            bp = jnp.concatenate([jnp.exp(bp[..., :6]), bp[..., 6:]], axis=-1)
            boxes = decode_boxes(sp_centers, bp, rotated)
            return cls_sel, boxes

        x = nn.Dense(self.d_model, name="proj_fc1", dtype=self.dtype)(queries)
        x = nn.relu(x)
        x = nn.Dense(self.d_model, name="proj_fc2", dtype=self.dtype)(x)
        x = x.astype(jnp.float32)

        attn_cls = (
            nn.remat(SelfAttentionLayer, static_argnums=(3,))
            if (self.remat and train)
            else SelfAttentionLayer
        )
        ffn_cls = (
            nn.remat(FFN, static_argnums=(2,))
            if (self.remat and train)
            else FFN
        )

        cls_list, box_list = [], []
        c, b = head(x)
        cls_list.append(c)
        box_list.append(b)
        for i in range(self.num_layers):
            x = attn_cls(
                self.d_model, self.num_heads, self.dropout, self.dtype,
                self.use_flash, name=f"attn{i}",
            )(x, query_mask, train)
            x = ffn_cls(
                self.d_model,
                self.hidden_dim,
                self.dropout,
                self.activation,
                self.dtype,
                name=f"ffn{i}",
            )(x, train)
            c, b = head(x)
            cls_list.append(c)
            box_list.append(b)

        return DecoderOutput(
            cls_logits=jnp.stack(cls_list), boxes=jnp.stack(box_list)
        )
