"""GridPack: the complete sparse-conv rulebook set for one batch.

Design note (the key TPU-native architecture decision of this framework):
XLA-on-TPU executes *scalar* gathers (binary searches) and large sorts far
from speed-of-light, while row gathers, segment-sums and MXU matmuls are
fast. Rulebook construction is pure integer hashing that depends only on the
input coordinates — so, exactly like spconv builds its pair tables in native
code on GPU, we build them on the HOST (numpy here, multithreaded C++ in
unidet3d_tpu/native) inside the input pipeline, overlapped with device
compute. The device-side builder (build_gridpack_device) keeps a pure-XLA
fallback used for tests/dry-runs and single-source semantics.

A GridPack contains, for each U-Net level l:
  * valid[l]: (V_l,) voxel validity
  * neighbors[l]: (V_l, 27) submanifold-conv neighbor table (sentinel V_l)
and for each level transition l -> l+1:
  * parent[l]: (V_l,) fine-voxel -> coarse-voxel row (sentinel V_{l+1})
  * offset_code[l]: (V_l,) 3-bit kernel offset of the strided/inverse conv
plus point_inverse: (N,) point -> level-0 voxel (sentinel V_0).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np


class GridPack(NamedTuple):
    valid: tuple  # per level: (V_l,) bool
    neighbors: tuple  # per level: (V_l, 27) int32
    parent: tuple  # per transition: (V_l,) int32
    offset_code: tuple  # per transition: (V_l,) int32
    point_inverse: object  # (N,) int32
    banded: object = None  # BandedPack for the pallas conv path, or None

    @property
    def num_levels(self) -> int:
        return len(self.valid)

    def capacity(self, level: int) -> int:
        return self.valid[level].shape[0]


def build_gridpack_device(bxyz, point_valid, capacities: Sequence[int]):
    """Pure-XLA GridPack construction (fallback path; jittable).

    Args:
        bxyz: (N, 4) int32 (batch, x, y, z) quantized coords.
        point_valid: (N,) bool.
        capacities: voxel capacity per level.

    Returns:
        (GridPack, VoxelGrid level-0) — the grid is returned for feature
        averaging (counts) by the caller.
    """
    from .pyramid import build_pyramid
    from .voxelize import voxelize

    grid0, _ = voxelize(bxyz, point_valid, capacities[0])
    pyr = build_pyramid(grid0, list(capacities))
    return (
        GridPack(
            valid=tuple(g.valid for g in pyr.grids),
            neighbors=pyr.neighbors,
            parent=tuple(d.parent for d in pyr.ds),
            offset_code=tuple(d.offset_code for d in pyr.ds),
            point_inverse=grid0.inverse,
        ),
        grid0,
    )


# ---------------------------------------------------------------------------
# Host (numpy) builder — reference implementation for the C++ kernel and the
# production input-pipeline path.
# ---------------------------------------------------------------------------

_SUBM_OFFSETS = np.array(
    [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ],
    dtype=np.int64,
)


def _pack64(bxyz: np.ndarray) -> np.ndarray:
    b, x, y, z = (bxyz[:, i].astype(np.int64) for i in range(4))
    return (b << 36) | (x << 24) | (y << 12) | z


def build_gridpack_host(
    bxyz: np.ndarray, point_valid: np.ndarray, capacities: Sequence[int],
    num_threads: int | None = None,
):
    """Numpy GridPack builder with semantics identical to the device path:
    voxels sorted by (batch, x, y, z); overflow beyond capacity dropped.
    `num_threads` feeds the native builder's pfor (C++ releases the GIL, so
    multi-core hosts overlap across loader threads too).

    Returns (GridPack of numpy arrays, counts0 (V_0,) float32 point counts).
    """
    try:
        from ..native import rulebook as _native

        if _native.available():
            return _native.build_gridpack(
                bxyz, point_valid, list(capacities), n_threads=num_threads
            )
    except ImportError:
        pass
    return build_gridpack_numpy(bxyz, point_valid, capacities)


def build_gridpack_numpy(
    bxyz: np.ndarray, point_valid: np.ndarray, capacities: Sequence[int]
):
    n = bxyz.shape[0]
    coords = bxyz.astype(np.int64).copy()
    coords[:, 1:] = np.clip(coords[:, 1:], 0, 4095)

    valids, neighbors, parents, offsets = [], [], [], []

    # Level 0: dedup points -> voxels (sorted by packed key = (b, x, y, z)).
    keys = _pack64(coords)
    keys_v = np.where(point_valid, keys, np.iinfo(np.int64).max)
    order = np.argsort(keys_v, kind="stable")
    ks = keys_v[order]
    new_group = np.empty(n, bool)
    new_group[0] = True
    new_group[1:] = ks[1:] != ks[:-1]
    seg = np.cumsum(new_group) - 1
    valid_s = point_valid[order]
    n_vox = int(new_group[valid_s].sum())

    cap0 = capacities[0]
    n_vox = min(n_vox, cap0)
    seg_ok = valid_s & (seg < cap0)
    seg_c = np.where(seg_ok, seg, cap0)
    point_inverse = np.empty(n, np.int32)
    point_inverse[order] = seg_c.astype(np.int32)

    lvl_keys = np.full(cap0, np.iinfo(np.int64).max, np.int64)
    first = new_group & seg_ok
    lvl_keys[seg_c[first]] = ks[first]
    counts0 = np.bincount(
        seg_c[seg_c < cap0], minlength=cap0
    ).astype(np.float32)

    cur_keys = lvl_keys
    cur_n = n_vox
    for li, cap in enumerate(capacities):
        valids.append(np.arange(cap) < cur_n)
        kk = cur_keys[:cur_n]
        kb = kk >> 36
        kx = (kk >> 24) & 4095
        ky = (kk >> 12) & 4095
        kz = kk & 4095
        # Submanifold neighbors for all 27 offsets at once: the level keys are
        # sorted, so one vectorised np.searchsorted resolves everything.
        d = _SUBM_OFFSETS  # (27, 3)
        qx = kx[:, None] + d[None, :, 0]
        qy = ky[:, None] + d[None, :, 1]
        qz = kz[:, None] + d[None, :, 2]
        ok = (
            (qx >= 0) & (qx <= 4095)
            & (qy >= 0) & (qy <= 4095)
            & (qz >= 0) & (qz <= 4095)
        )
        qk = (
            (kb[:, None] << 36)
            | (np.clip(qx, 0, None) << 24)
            | (np.clip(qy, 0, None) << 12)
            | np.clip(qz, 0, None)
        )
        pos = np.searchsorted(kk, qk)
        posc = np.minimum(pos, max(cur_n - 1, 0))
        found = ok & (pos < cur_n) & (
            kk[posc] == qk if cur_n else np.zeros_like(ok)
        )
        nbr = np.full((cap, 27), cap, np.int32)
        nbr[:cur_n] = np.where(found, posc, cap).astype(np.int32)
        neighbors.append(nbr)

        if li == len(capacities) - 1:
            break
        # Downsample transition (unique over halved coords, sorted order —
        # identical to the device voxelize semantics).
        ncap = capacities[li + 1]
        pk = (kb << 36) | ((kx >> 1) << 24) | ((ky >> 1) << 12) | (kz >> 1)
        uniq, inv = np.unique(pk, return_inverse=True)
        nn = min(len(uniq), ncap)
        par = np.full(cap, ncap, np.int32)
        par[:cur_n] = np.where(inv < ncap, inv, ncap).astype(np.int32)
        off = np.zeros(cap, np.int32)
        off[:cur_n] = ((kx & 1) * 4 + (ky & 1) * 2 + (kz & 1)).astype(np.int32)
        parents.append(par)
        offsets.append(off)
        nk = np.full(ncap, np.iinfo(np.int64).max, np.int64)
        nk[:nn] = uniq[:nn]
        cur_keys = nk
        cur_n = nn

    pack = GridPack(
        valid=tuple(valids),
        neighbors=tuple(neighbors),
        parent=tuple(parents),
        offset_code=tuple(offsets),
        point_inverse=point_inverse,
    )
    return pack, counts0


def quantize_points(vox_src: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Host-side quantization identical to the device path: per-scene
    min-shift over valid points, floor, batch-prefixed int32 coords.

    Args:
        vox_src: (B, P, 3) float32 voxel-unit coords.
        valid: (B, P) bool.

    Returns:
        (B*P, 4) int32 (batch, x, y, z).
    """
    b, p, _ = vox_src.shape
    vs = np.where(valid[..., None], vox_src, 1e9).astype(np.float32)
    pmin = vs.min(axis=1, keepdims=True)
    pmin = np.where(pmin >= 1e9, 0.0, pmin)
    icoords = np.floor(vox_src - pmin).astype(np.int32)
    bidx = np.repeat(np.arange(b, dtype=np.int32)[:, None], p, axis=1)
    return np.concatenate(
        [bidx.reshape(-1, 1), icoords.reshape(-1, 3)], axis=1
    )


def build_fused_pack_host(
    vox_src: np.ndarray,
    valid: np.ndarray,
    cfg,
    num_threads: int | None = None,
    want_neighbors: bool = False,
    pack_rel: bool = False,
):
    """Fused native pack build for the pallas conv path: quantize +
    gridpack + banded rulebooks in one C++ call that never materialises
    the (V, 27) neighbor tables (native/rulebook.cc fused entry) — they
    are dead on the pallas device path, and on single-core pipeline hosts
    their ~110 MB of writes+re-reads WAS the dominant pack cost. Returns
    (GridPack with .banded, counts0) or None when the native library is
    unavailable (callers fall back to the two-phase flow). rel leaves are
    int16 (wire dtype); the model casts on device.
    """
    from ..native import rulebook as native_rb
    from .pallas_conv import (
        n_subgroups, offset_windows, warn_miss_overflow,
    )

    if not native_rb.available():
        return None
    b = vox_src.shape[0]
    caps = list(cfg.level_capacities(b))
    blocks = [min(512, c) for c in caps]
    windows = np.stack(
        [
            np.broadcast_to(np.asarray(w, np.int64), (3,))
            for w in cfg.level_conv_windows()
        ]
    )
    wsubs = np.stack(
        [
            np.minimum(
                np.broadcast_to(np.asarray(ws, np.int64), (27,)),
                offset_windows(windows[lvl], 27),
            )
            for lvl, ws in enumerate(cfg.level_conv_subwindows())
        ]
    )
    # Per-level per-tier caps scaled by the scenes in this shard group;
    # transport = 2 tiers concatenated.
    miss_caps = [m * b for m in cfg.level_miss_caps()]
    pack, counts0, n_miss = native_rb.build_packs_fused(
        vox_src, valid, caps, blocks, windows, wsubs,
        n_subs=[n_subgroups(bl) for bl in blocks],
        miss_caps=[2 * m for m in miss_caps],
        aligns=list(cfg.level_pack_align()),
        want_neighbors=want_neighbors,
        n_threads=num_threads,
        pack_rel=pack_rel,
    )
    for total, mcap in zip(n_miss, miss_caps):
        warn_miss_overflow(total, mcap)
    return pack, counts0


class BandedPack(NamedTuple):
    """Per-level two-level banded rulebooks for the pallas subm conv (see
    ops/pallas_conv.py). All leaves are arrays (pytree-safe):
    bases[l]: (nB_l, 3) GROUP window bases (one shared DMA window per dx
    slab of 9 offsets); sub_offs[l]: (nB_l, nS, 27); rel[l]: (27, V_l);
    active[l]: (nB_l,) block-has-any-valid-neighbor flags (kernel skips
    fully-padded blocks); miss_rows/miss_nbrs/miss_offs[l]: (2, M) compact
    out-of-band lists — tier 0 always applied, tier 1 a lax.cond spill
    (ops/pallas_conv.py MissList)."""

    bases: tuple
    sub_offs: tuple
    rel: tuple
    active: tuple
    miss_rows: tuple
    miss_nbrs: tuple
    miss_offs: tuple


def build_banded_pack(
    pack: GridPack,
    capacities,
    block: int = 512,
    window=704,
    wsub=None,
    miss_cap=16384,
    align=16,
    num_threads: int | None = None,
) -> BandedPack:
    """Host-side: convert every level's neighbor table to banded form.

    `window`: int (uniform), or per-level sequence whose entries are an
    int or a (3,) per-GROUP width tuple (ModelConfig.level_conv_windows —
    one shared DMA window per dx slab of 9 offsets). `wsub`: int or
    per-level entries of int / (27,) per-offset widths
    (ModelConfig.level_conv_subwindows). `miss_cap`: per-tier correction
    capacity — int (uniform) or per-level ints. `align`: int or per-level
    ints — base/sub_offs alignment, 16 * the level's max channel-packing
    factor (ModelConfig.level_pack_align)."""
    from .pallas_conv import (
        build_banded_rulebook,
        build_miss_list,
        warn_miss_overflow,
    )

    def per_level(w):
        if w is None or np.isscalar(w):
            return [w] * len(capacities)
        w = list(w)
        assert len(w) == len(capacities), (len(w), len(capacities))
        return w

    windows = per_level(window)
    wsubs = per_level(wsub)
    aligns = per_level(align)
    miss_caps = per_level(miss_cap)

    from ..native import rulebook as native_rb
    from .pallas_conv import n_subgroups

    use_native = native_rb.available()
    bases, soffs, rel, act, mr, mn, mo = [], [], [], [], [], [], []
    for lvl, cap in enumerate(capacities):
        nbr = np.asarray(pack.neighbors[lvl])
        b = min(block, cap)
        al = int(aligns[lvl] if aligns[lvl] is not None else 16)
        mcap = int(miss_caps[lvl])
        if use_native:
            from .pallas_conv import offset_windows

            w3 = np.broadcast_to(np.asarray(windows[lvl], np.int64), (3,))
            ws27 = (
                offset_windows(w3, 27)
                if wsubs[lvl] is None
                else np.broadcast_to(np.asarray(wsubs[lvl], np.int64), (27,))
            )
            # Collect up to 2*cap entries; Python reshapes into the
            # two-tier (2, cap) transport form (tier 1 = lax.cond spill).
            (bs, so, rl, ac, rows, nbrs, offs, total) = native_rb.build_banded(
                nbr, cap, b, w3, ws27, n_subgroups(b), 2 * mcap,
                align=al, n_threads=num_threads,
            )
            warn_miss_overflow(total, mcap)
            bases.append(bs)
            soffs.append(so)
            rel.append(rl)
            act.append(ac)
            mr.append(rows.reshape(2, mcap))
            mn.append(nbrs.reshape(2, mcap))
            mo.append(offs.reshape(2, mcap))
            continue
        rb = build_banded_rulebook(
            nbr, cap, block=b, window=windows[lvl], wsub=wsubs[lvl], align=al
        )
        ml = build_miss_list(rb.miss_idx, cap, mcap)
        bases.append(rb.bases)
        soffs.append(rb.sub_offs)
        rel.append(rb.rel)
        act.append(rb.active)
        mr.append(ml.rows)
        mn.append(ml.nbrs)
        mo.append(ml.offs)
    return BandedPack(
        bases=tuple(bases),
        sub_offs=tuple(soffs),
        rel=tuple(rel),
        active=tuple(act),
        miss_rows=tuple(mr),
        miss_nbrs=tuple(mn),
        miss_offs=tuple(mo),
    )
