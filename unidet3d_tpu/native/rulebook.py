"""ctypes wrapper for the native (C++) GridPack builder.

Auto-builds libunidet3d_rulebook.so with g++ on first use (cached next to the
source). Falls back gracefully when no compiler is available — callers use
build_gridpack_numpy instead.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rulebook.cc")
def _src_tag() -> str:
    import hashlib

    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


# Cache keyed on the SOURCE HASH (not mtime): a stale or foreign-host binary
# (-march=native!) is never loaded — any source change or fresh checkout
# recompiles into a new filename.
_LIB = os.path.join(_DIR, f"libunidet3d_rulebook.{_src_tag()}.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB):
            # Source changed -> new hash; stale hashed binaries are dead
            # weight (gitignored but they accumulate on long-lived hosts).
            for f in os.listdir(_DIR):
                if f.startswith("libunidet3d_rulebook.") and f.endswith(".so"):
                    try:
                        os.remove(os.path.join(_DIR, f))
                    except OSError:
                        pass
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-std=c++17", "-pthread", _SRC, "-o", _LIB,
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.unidet3d_build_gridpack.restype = None
        lib.unidet3d_build_banded.restype = None
        lib.unidet3d_build_packs_fused.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def build_gridpack(
    bxyz: np.ndarray,
    point_valid: np.ndarray,
    capacities: Sequence[int],
    n_threads: int | None = None,
):
    """Native GridPack build; same return contract as build_gridpack_numpy."""
    from ..ops.gridpack import GridPack

    lib = _load()
    assert lib is not None, "native rulebook library unavailable"
    n = bxyz.shape[0]
    n_levels = len(capacities)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)

    bxyz = np.ascontiguousarray(bxyz, np.int32)
    valid = np.ascontiguousarray(point_valid, np.uint8)
    caps = np.asarray(capacities, np.int64)

    point_inverse = np.empty(n, np.int32)
    counts0 = np.empty(capacities[0], np.float32)
    valids = [np.empty(c, np.uint8) for c in capacities]
    neighbors = [np.empty((c, 27), np.int32) for c in capacities]
    parents = [np.empty(c, np.int32) for c in capacities[:-1]]
    offsets = [np.empty(c, np.int32) for c in capacities[:-1]]

    def ptr_array(arrs, ty):
        return (ctypes.POINTER(ty) * len(arrs))(
            *[a.ctypes.data_as(ctypes.POINTER(ty)) for a in arrs]
        )

    lib.unidet3d_build_gridpack(
        bxyz.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n),
        caps.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int32(n_levels),
        ctypes.c_int32(n_threads),
        point_inverse.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts0.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ptr_array(valids, ctypes.c_uint8),
        ptr_array(neighbors, ctypes.c_int32),
        ptr_array(parents, ctypes.c_int32) if parents else None,
        ptr_array(offsets, ctypes.c_int32) if offsets else None,
    )

    pack = GridPack(
        valid=tuple(v.astype(bool) for v in valids),
        neighbors=tuple(neighbors),
        parent=tuple(parents),
        offset_code=tuple(offsets),
        point_inverse=point_inverse,
    )
    return pack, counts0


def build_packs_fused(
    vox_src: np.ndarray,
    valid: np.ndarray,
    capacities: Sequence[int],
    blocks: Sequence[int],
    windows: np.ndarray,       # (L, 3)
    wsubs: np.ndarray,         # (L, 27)
    n_subs: Sequence[int],
    miss_caps: Sequence[int],  # transport lengths (2 tiers concatenated)
    aligns: Sequence[int],
    want_neighbors: bool = False,
    n_threads: int | None = None,
    pack_rel: bool = False,
):
    """ONE-CALL fused pack build: quantize + gridpack + per-level banded
    rulebooks, skipping the (V, 27) neighbor tables unless asked (they are
    dead weight on the pallas path — see rulebook.cc). Bit-exact with
    quantize_points -> build_gridpack -> per-level build_banded, except rel
    is emitted int16 (the wire dtype; values in [-1, wsub)).

    `pack_rel`: emit rel 9-BIT PACKED — int32 arrays of shape
    (27, nb * ceil(block/3)) per level, entry e = rel + 1 (3 per word,
    lane i at bits [9i, 9i+9); 0 = the rel = -1 sentinel, block-padded) —
    the wire transport form (data/wire.py; decoded on device by
    parallel/train_step.make_eval_step_wire). rel stays the (27, cap)
    int16 plane otherwise.

    Returns (GridPack with .banded set (neighbors = (0, 27) placeholders
    unless want_neighbors), counts0, n_miss_totals (L,))."""
    from ..ops.gridpack import BandedPack, GridPack

    lib = _load()
    assert lib is not None, "native rulebook library unavailable"
    b, p, _ = vox_src.shape
    n_levels = len(capacities)
    # Miss entries pack (o, row, idx) in 5+22+22 bits (rulebook.cc).
    assert max(capacities) < (1 << 22), capacities
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)

    vox_src = np.ascontiguousarray(vox_src, np.float32)
    valid_c = np.ascontiguousarray(valid, np.uint8)
    caps = np.asarray(capacities, np.int64)
    blocks_a = np.asarray(blocks, np.int64)
    windows_a = np.ascontiguousarray(windows, np.int64).reshape(n_levels, 3)
    wsubs_a = np.ascontiguousarray(wsubs, np.int64).reshape(n_levels, 27)
    n_subs_a = np.asarray(n_subs, np.int64)
    mcaps = np.asarray(miss_caps, np.int64)
    aligns_a = np.asarray(aligns, np.int64)

    point_inverse = np.empty(b * p, np.int32)
    counts0 = np.empty(capacities[0], np.float32)
    valids = [np.empty(c, np.uint8) for c in capacities]
    parents = [np.empty(c, np.int32) for c in capacities[:-1]]
    offsets = [np.empty(c, np.int32) for c in capacities[:-1]]
    neighbors = (
        [np.empty((c, 27), np.int32) for c in capacities]
        if want_neighbors
        else [np.empty((1, 27), np.int32) for _ in capacities]
    )
    bases = [np.empty((c // bl, 3), np.int32)
             for c, bl in zip(capacities, blocks_a)]
    sub_offs = [np.empty((c // bl, ns, 27), np.int32)
                for c, bl, ns in zip(capacities, blocks_a, n_subs_a)]
    if pack_rel:
        # Zero-initialised: the zero word IS the rel = -1 sentinel.
        rel = [np.zeros((27, (c // bl) * ((bl + 2) // 3)), np.int32)
               for c, bl in zip(capacities, blocks_a)]
    else:
        rel = [np.empty((27, c), np.int16) for c in capacities]
    active = [np.empty(c // bl, np.int32)
              for c, bl in zip(capacities, blocks_a)]
    miss_rows = [np.empty(m, np.int32) for m in mcaps]
    miss_nbrs = [np.empty(m, np.int32) for m in mcaps]
    miss_offs = [np.empty(m, np.int32) for m in mcaps]
    n_miss = np.zeros(n_levels, np.int64)

    def ptr_array(arrs, ty):
        return (ctypes.POINTER(ty) * len(arrs))(
            *[a.ctypes.data_as(ctypes.POINTER(ty)) for a in arrs]
        )

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    lib.unidet3d_build_packs_fused(
        vox_src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(b), ctypes.c_int64(p),
        p64(caps), ctypes.c_int32(n_levels), ctypes.c_int32(n_threads),
        p64(blocks_a), p64(windows_a), p64(wsubs_a), p64(n_subs_a),
        p64(mcaps), p64(aligns_a),
        ctypes.c_int32(1 if want_neighbors else 0),
        ctypes.c_int32(1 if pack_rel else 0),
        point_inverse.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts0.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ptr_array(valids, ctypes.c_uint8),
        ptr_array(parents, ctypes.c_int32) if parents else None,
        ptr_array(offsets, ctypes.c_int32) if offsets else None,
        ptr_array(neighbors, ctypes.c_int32),
        ptr_array(bases, ctypes.c_int32),
        ptr_array(sub_offs, ctypes.c_int32),
        ptr_array(rel, ctypes.c_int16),
        ptr_array(active, ctypes.c_int32),
        ptr_array(miss_rows, ctypes.c_int32),
        ptr_array(miss_nbrs, ctypes.c_int32),
        ptr_array(miss_offs, ctypes.c_int32),
        n_miss.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    half = [int(m) // 2 for m in mcaps]
    banded = BandedPack(
        bases=tuple(bases),
        sub_offs=tuple(sub_offs),
        rel=tuple(rel),
        active=tuple(active),
        miss_rows=tuple(r.reshape(2, h) for r, h in zip(miss_rows, half)),
        miss_nbrs=tuple(r.reshape(2, h) for r, h in zip(miss_nbrs, half)),
        miss_offs=tuple(r.reshape(2, h) for r, h in zip(miss_offs, half)),
    )
    pack = GridPack(
        valid=tuple(v.astype(bool) for v in valids),
        neighbors=tuple(neighbors) if want_neighbors
        else tuple(np.empty((0, 27), np.int32) for _ in capacities),
        parent=tuple(parents),
        offset_code=tuple(offsets),
        point_inverse=point_inverse,
        banded=banded,
    )
    return pack, counts0, tuple(int(x) for x in n_miss)


def build_banded(
    neighbors: np.ndarray,
    capacity: int,
    block: int,
    windows: np.ndarray,
    wsubs: np.ndarray,
    n_sub: int,
    miss_cap: int,
    align: int = 16,
    n_threads: int | None = None,
):
    """Native two-level banded rulebook + compact miss list for one level.

    Bit-exact twin of ops/pallas_conv.py::build_banded_rulebook +
    build_miss_list (tested in tests/test_native_rulebook.py). `windows`
    is (3,) per-GROUP (one shared DMA window per dx slab of 9 offsets);
    `wsubs` is (27,) per-offset. `align` = base/sub_offs alignment
    (16*pack for channel-packed kernels). Returns (bases (nb, 3),
    sub_offs, rel, active, miss_rows, miss_nbrs, miss_offs,
    n_miss_total)."""
    from ..ops.pallas_conv import GRP, offset_windows

    lib = _load()
    assert lib is not None, "native rulebook library unavailable"
    v, k = neighbors.shape
    assert v % block == 0, (v, block)  # same contract as the numpy twin
    n_grp = k // GRP
    nb = v // block
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    neighbors = np.ascontiguousarray(neighbors, np.int32)
    windows = np.ascontiguousarray(
        np.broadcast_to(np.asarray(windows, np.int64), (n_grp,))
    )
    wsubs = np.ascontiguousarray(
        np.minimum(wsubs, offset_windows(windows, k)), np.int64
    )

    bases = np.empty((nb, n_grp), np.int32)
    sub_offs = np.empty((nb, n_sub, 27), np.int32)
    rel = np.empty((27, v), np.int32)
    active = np.empty(nb, np.int32)
    miss_rows = np.empty(miss_cap, np.int32)
    miss_nbrs = np.empty(miss_cap, np.int32)
    miss_offs = np.empty(miss_cap, np.int32)
    n_miss = ctypes.c_int64(0)

    def p(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    lib.unidet3d_build_banded(
        p(neighbors, ctypes.c_int32),
        ctypes.c_int64(v),
        ctypes.c_int64(capacity),
        ctypes.c_int64(block),
        p(windows, ctypes.c_int64),
        p(wsubs, ctypes.c_int64),
        ctypes.c_int64(n_sub),
        ctypes.c_int64(miss_cap),
        ctypes.c_int64(align),
        ctypes.c_int32(n_threads),
        p(bases, ctypes.c_int32),
        p(sub_offs, ctypes.c_int32),
        p(rel, ctypes.c_int32),
        p(active, ctypes.c_int32),
        p(miss_rows, ctypes.c_int32),
        p(miss_nbrs, ctypes.c_int32),
        p(miss_offs, ctypes.c_int32),
        ctypes.byref(n_miss),
    )
    return (bases, sub_offs, rel, active, miss_rows, miss_nbrs, miss_offs,
            int(n_miss.value))
