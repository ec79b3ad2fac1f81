"""Banded monotone gather on the MXU (experimental — see docs/PERF_NOTES.md).

`out[i] = feat[idx[i]]` where idx is monotone over valid entries with a
bounded band |idx[i] - i| <= H (true for sorted-voxel subm-conv neighbor
maps: the drift is at most one x-slab of the scene). XLA row gathers cost
~20 ns/row on TPU regardless of locality; this formulation instead:

  1. splits rows into blocks of B, with STATIC windows [kB-H, kB+B+H) built
     from shifted slices of the (padded) feature array — no gathers at all;
  2. one-hot encodes the in-window relative indices;
  3. performs one batched (nB, B, W) x (nB, W, C) matmul on the MXU.

Out-of-band entries (rare: scene-boundary effects, pathological geometry)
are fixed up by a masked XLA gather guarded by lax.cond, so results are
exact for ANY index vector.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def banded_gather(
    feat: jnp.ndarray,  # (V, C)
    idx: jnp.ndarray,  # (N,) int32; sentinel >= V means "produce zeros"
    half_band: int = 512,
    block: int = 256,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Returns (N, C): feat[idx] with zeros for sentinel/invalid indices."""
    v, c = feat.shape
    n = idx.shape[0]
    b = block
    w = b + 2 * half_band
    pad_n = (-n) % b
    idx_p = jnp.pad(idx, (0, pad_n), constant_values=v)
    nb = idx_p.shape[0] // b

    # Window k covers source rows [k*b - H, k*b + b + H) of feat; build all
    # windows with shifted static slices of the zero-padded features.
    feat_pad = jnp.pad(feat, ((half_band, half_band + pad_n), (0, 0)))
    # windows[k, j] = feat_pad[k*b + j], j in [0, w).
    slices = [feat_pad[s : s + nb * b].reshape(nb, b, c) for s in
              range(0, w, b)]
    rem = w % b
    windows = jnp.concatenate(slices, axis=1)[:, :w]
    del rem

    blocks_idx = idx_p.reshape(nb, b)
    base = (jnp.arange(nb) * b - half_band)[:, None]
    rel = blocks_idx - base  # target position within window
    valid = blocks_idx < v
    in_band = valid & (rel >= 0) & (rel < w)

    onehot = (
        (rel[:, :, None] == jnp.arange(w)[None, None, :]) & in_band[:, :, None]
    ).astype(compute_dtype)
    out = jnp.einsum(
        "kbw,kwc->kbc",
        onehot,
        windows.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ).reshape(-1, c)[:n]

    # Exact fallback for out-of-band rows.
    missed = (valid & ~in_band).reshape(-1)[:n]

    def fix(_):
        g = feat.at[idx].get(mode="fill", fill_value=0.0)
        return jnp.where(missed[:, None], g, 0.0)

    corr = jax.lax.cond(
        jnp.any(missed), fix, lambda _: jnp.zeros_like(out), operand=None
    )
    return out + corr


def subm_conv_banded(
    features: jnp.ndarray,
    neighbors: jnp.ndarray,
    weights: jnp.ndarray,
    half_bands=None,
    block: int = 256,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Submanifold conv with banded-matmul gathers (experimental).

    half_bands: per-offset half band widths (27,); defaults scale with the
    offset's stride class (z-only: 64, y: 512, x: 2048).
    """
    from .sparse_conv import SUBM_OFFSETS

    k = weights.shape[0]
    center = k // 2
    if half_bands is None:
        half_bands = []
        for (dx, dy, dz) in SUBM_OFFSETS:
            if dx != 0:
                half_bands.append(2048)
            elif dy != 0:
                half_bands.append(512)
            else:
                half_bands.append(64)

    out = jnp.dot(
        features, weights[center], preferred_element_type=jnp.float32
    )
    for o in range(k):
        if o == center:
            continue
        g = banded_gather(
            features,
            neighbors[:, o],
            half_band=half_bands[o],
            block=block,
            compute_dtype=compute_dtype,
        )
        out = out + jnp.dot(g, weights[o], preferred_element_type=jnp.float32)
    return out
