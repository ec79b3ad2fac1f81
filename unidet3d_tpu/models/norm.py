"""Masked (sync) batch normalization for padded sparse features.

Replaces torch SyncBatchNorm/BatchNorm1d (reference unidet3d/unidet3d.py:104-111,
spconv_unet.py:119-124; eps=1e-4, momentum=0.1). Statistics are computed over
VALID voxel rows only (padding excluded); when `axis_name` is set the moments
are combined across that mesh axis with psum — the TPU-native SyncBatchNorm.
Running stats follow torch semantics: normalisation uses the biased batch
variance, the running variance stores the unbiased estimate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    features: int
    eps: float = 1e-4
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    axis_name: str | None = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: jnp.ndarray, use_running_average: bool
    ) -> jnp.ndarray:
        """Args: x (N, C); mask (N,) bool; returns normalized (N, C)."""
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,))
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,))
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(x.dtype)[:, None]
            cnt = jnp.sum(m)
            s = jnp.sum(x * m, axis=0)
            ss = jnp.sum((x * x) * m, axis=0)
            # psum only under shard_map (init runs unmapped — axis unbound).
            if self.axis_name is not None and not self.is_initializing():
                cnt = jax.lax.psum(cnt, self.axis_name)
                s = jax.lax.psum(s, self.axis_name)
                ss = jax.lax.psum(ss, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s / cnt
            var = jnp.maximum(ss / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value + self.momentum * unbiased
                )

        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean) * (inv * scale) + bias
