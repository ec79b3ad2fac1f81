"""Sparse-convolutional 3D U-Net backbone (TPU-native SpConvUNet).

Functional re-design of the reference backbone (unidet3d/spconv_unet.py:94-240
plus the detector's input conv / output BN-ReLU, unidet3d/unidet3d.py:95-111):
a 5-level residual U-Net over a sorted sparse voxel pyramid. All convs are
gather-matmul rulebook convs from ops/sparse_conv; all norms are masked
(sync-capable) batch norms. `normalize_before=True` semantics (the config
default): every conv group is norm -> relu -> conv.

Channel schedule (config:45-46): [32, 64, 96, 128, 160].
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.gridpack import GridPack
from ..ops.sparse_conv import inverse_conv, strided_conv, subm_conv
from .norm import MaskedBatchNorm


def _kaiming_subm(key, shape, dtype=jnp.float32):
    """Kaiming-uniform over (K, Cin, Cout) matching torch Conv3d default init."""
    import jax

    fan_in = shape[0] * shape[1]
    bound = (6.0 / fan_in) ** 0.5  # gain sqrt(2) / sqrt(3) folded: a=sqrt(5) init
    return jax.random.uniform(key, shape, dtype, -bound, bound) / (2.0**0.5)


class SubmConv(nn.Module):
    """Submanifold 3x3x3 conv (bias-free), weights (27, Cin, Cout).

    `dtype` is the compute/gather dtype (bf16 halves the dominant HBM gather
    traffic); accumulation stays fp32 inside subm_conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    # Static pallas window width(s): int or (3,) per-GROUP tuple (one
    # shared DMA window per dx slab of 9 offsets; must NOT ride in the
    # banded tuple — remat would turn it into a tracer).
    conv_window: int | tuple = 704
    conv_wsub: int | tuple | None = None  # per-offset onehot width(s)
    # Host rulebook base/sub_offs alignment (16*p enables channel packing
    # up to p — ModelConfig.level_pack_align; must match the pack build).
    pack_align: int = 16

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, neighbors: jnp.ndarray, banded=None
    ) -> jnp.ndarray:
        w = self.param(
            "kernel", _kaiming_subm, (27, x.shape[-1], self.out_channels)
        )
        if banded is not None:
            import jax

            from ..ops.pallas_conv import subm_conv_banded

            bases, sub_offs, rel, active, mrows, mnbrs, moffs = banded
            # rel rides the wire as int16 (fused native builder) — cast on
            # device; the kernel's iota compares want int32.
            rel = rel.astype(jnp.int32)
            # Differentiable fused kernel (custom VJP) — forward AND backward
            # run banded pallas, no XLA row gathers in training.
            return subm_conv_banded(
                self.conv_window, self.conv_wsub,
                jax.default_backend() != "tpu",
                self.pack_align // 16,
                x.astype(self.dtype), w,
                bases, rel, sub_offs, active, mrows, mnbrs, moffs,
            )
        return subm_conv(x.astype(self.dtype), neighbors, w.astype(self.dtype))


class ResidualBlock(nn.Module):
    """Pre-norm residual block (reference spconv_unet.py:13-91).

    norm -> relu -> subm3 -> norm -> relu -> subm3, plus identity branch
    (1x1 conv when channels change).
    """

    out_channels: int
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32
    conv_window: int | tuple = 704  # int or (3,) per-GROUP widths
    conv_wsub: int | tuple | None = None
    pack_align: int = 16  # see SubmConv.pack_align

    @nn.compact
    def __call__(self, x, mask, neighbors, train: bool, banded=None):
        identity = x
        if x.shape[-1] != self.out_channels:
            wi = self.param(
                "i_branch",
                nn.initializers.lecun_uniform(),
                (x.shape[-1], self.out_channels),
            )
            identity = jnp.dot(
                x.astype(self.dtype),
                wi.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )

        h = MaskedBatchNorm(x.shape[-1], axis_name=self.axis_name, name="norm1")(
            x, mask, use_running_average=not train
        )
        h = nn.relu(h)
        h = SubmConv(self.out_channels, dtype=self.dtype,
                     conv_window=self.conv_window, conv_wsub=self.conv_wsub,
                     pack_align=self.pack_align, name="conv1")(
            h, neighbors, banded
        )
        h = MaskedBatchNorm(
            self.out_channels, axis_name=self.axis_name, name="norm2"
        )(h, mask, use_running_average=not train)
        h = nn.relu(h)
        h = SubmConv(self.out_channels, dtype=self.dtype,
                     conv_window=self.conv_window, conv_wsub=self.conv_wsub,
                     pack_align=self.pack_align, name="conv2")(
            h, neighbors, banded
        )
        return h + identity


class SpConvUNet(nn.Module):
    """Recursive U-Net, expressed iteratively over the grid pyramid.

    Mirrors reference spconv_unet.py:205-240: per level 2 pre-blocks, strided
    down, recurse, inverse up, skip-concat, 2 tail blocks (first halves the
    concatenated channels).
    """

    num_planes: Sequence[int]  # e.g. (32, 64, 96, 128, 160)
    block_reps: int = 2
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32
    remat: bool = True  # rematerialise residual blocks in training backward
    # Pallas conv windows (when pack.banded given): int (uniform) or a
    # per-level tuple whose entries are an int or (3,) per-GROUP widths
    # (ModelConfig.level_conv_windows; subwindows stay per-offset) — must
    # match the host pack build.
    conv_window: int | tuple = 704
    conv_wsub: int | tuple | None = None
    conv_align: int | tuple = 16  # per-level pack alignment (see SubmConv)

    @nn.compact
    def __call__(self, x: jnp.ndarray, pack: GridPack, train: bool):
        planes = list(self.num_planes)
        levels = len(planes)
        assert pack.num_levels >= levels
        # ResidualBlock call args: (module, x, mask, neighbors, train, banded).
        block_cls = (
            nn.remat(ResidualBlock, static_argnums=(4,))
            if (self.remat and train)
            else ResidualBlock
        )

        def level_window(lvl):
            w = self.conv_window
            return w[lvl] if isinstance(w, tuple) else w

        def level_wsub(lvl):
            w = self.conv_wsub
            return w[lvl] if isinstance(w, tuple) else w

        def level_align(lvl):
            a = self.conv_align
            return a[lvl] if isinstance(a, tuple) else a

        def level_banded(lvl):
            b = pack.banded
            if b is None:
                return None
            return (
                b.bases[lvl], b.sub_offs[lvl], b.rel[lvl], b.active[lvl],
                b.miss_rows[lvl], b.miss_nbrs[lvl], b.miss_offs[lvl],
            )

        # Down path: pre-blocks then strided conv.
        skips = []
        for lvl in range(levels):
            mask = pack.valid[lvl]
            nbr = pack.neighbors[lvl]
            for i in range(self.block_reps):
                x = block_cls(
                    planes[lvl],
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    conv_window=level_window(lvl),
                    conv_wsub=level_wsub(lvl),
                    pack_align=level_align(lvl),
                    name=f"level{lvl}_block{i}",
                )(x, mask, nbr, train, level_banded(lvl))
            if lvl < levels - 1:
                skips.append(x)
                h = MaskedBatchNorm(
                    planes[lvl],
                    axis_name=self.axis_name,
                    name=f"level{lvl}_down_norm",
                )(x, mask, use_running_average=not train)
                h = nn.relu(h)
                wd = self.param(
                    f"level{lvl}_down_kernel",
                    _kaiming_subm,
                    (8, planes[lvl], planes[lvl + 1]),
                )
                x = strided_conv(
                    h.astype(self.dtype),
                    pack.parent[lvl],
                    pack.offset_code[lvl],
                    pack.capacity(lvl + 1),
                    wd.astype(self.dtype),
                )

        # Up path: inverse conv, concat skip, tail blocks.
        for lvl in range(levels - 2, -1, -1):
            mask_coarse = pack.valid[lvl + 1]
            mask = pack.valid[lvl]
            nbr = pack.neighbors[lvl]
            h = MaskedBatchNorm(
                planes[lvl + 1],
                axis_name=self.axis_name,
                name=f"level{lvl}_up_norm",
            )(x, mask_coarse, use_running_average=not train)
            h = nn.relu(h)
            wu = self.param(
                f"level{lvl}_up_kernel",
                _kaiming_subm,
                (8, planes[lvl + 1], planes[lvl]),
            )
            h = inverse_conv(
                h.astype(self.dtype),
                pack.parent[lvl],
                pack.offset_code[lvl],
                wu.astype(self.dtype),
            )
            x = jnp.concatenate([skips[lvl], h], axis=-1)
            for i in range(self.block_reps):
                # First tail block: 2*planes -> planes (reference
                # spconv_unet.py:194-201, num_planes[0]*(2-i)).
                x = block_cls(
                    planes[lvl],
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    conv_window=level_window(lvl),
                    conv_wsub=level_wsub(lvl),
                    pack_align=level_align(lvl),
                    name=f"level{lvl}_tail{i}",
                )(x, mask, nbr, train, level_banded(lvl))
        return x


class UNetBackbone(nn.Module):
    """Input subm conv + U-Net + output BN/ReLU (unidet3d/unidet3d.py:95-134)."""

    num_planes: Sequence[int]
    axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32
    conv_window: int | tuple = 704  # see SpConvUNet.conv_window
    conv_wsub: int | tuple | None = None
    conv_align: int | tuple = 16  # see SpConvUNet.conv_align
    remat: bool = True  # see SpConvUNet.remat / ModelConfig.backbone_remat

    @nn.compact
    def __call__(self, vox_feats: jnp.ndarray, pack: GridPack, train: bool):
        b0 = None
        if pack.banded is not None:
            bd = pack.banded
            b0 = (
                bd.bases[0], bd.sub_offs[0], bd.rel[0], bd.active[0],
                bd.miss_rows[0], bd.miss_nbrs[0], bd.miss_offs[0],
            )

        def lvl0(w):
            return w[0] if isinstance(w, tuple) else w

        x = SubmConv(self.num_planes[0], dtype=self.dtype,
                     conv_window=lvl0(self.conv_window),
                     conv_wsub=lvl0(self.conv_wsub),
                     pack_align=lvl0(self.conv_align),
                     name="input_conv")(
            vox_feats, pack.neighbors[0], b0
        )
        x = SpConvUNet(
            self.num_planes,
            axis_name=self.axis_name,
            dtype=self.dtype,
            conv_window=self.conv_window,
            conv_wsub=self.conv_wsub,
            conv_align=self.conv_align,
            remat=self.remat,
            name="unet",
        )(x, pack, train)
        x = MaskedBatchNorm(
            self.num_planes[0], axis_name=self.axis_name, name="output_norm"
        )(x, pack.valid[0], use_running_average=not train)
        x = nn.relu(x)
        # Zero out padding rows so downstream pooling stays exact.
        return jnp.where(pack.valid[0][:, None], x, 0.0)
