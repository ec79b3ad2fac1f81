"""Single-buffer host->device transport for eval groups.

Measured on the bench chip's relay (round 5): every FRESH host array pays a
~45 ms per-transfer fixed cost regardless of size (then ~0.5-1.2 GB/s). An
eval group is ~60 leaves (~30 MB/scene), so per-leaf transfers cost ~2 s per
group — 6x the device step itself, and the reason BENCH_r04's sustained
number sat at 0.87 scenes/s. Concatenating every leaf into ONE uint8 buffer
pays the fixed cost once; the jitted step reconstructs the tree on device
with static slices + bitcasts (one fused HBM pass, ~0.3 ms).

This also helps real (non-relay) hosts: PJRT per-transfer overhead is
smaller but nonzero, and one contiguous DMA beats 60 scattered ones.

The spec is STATIC per capacity bucket (shapes derive from the bucket
config, not the data), so each per-bucket compiled eval step closes over
its spec — no retraces, no dynamic shapes.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

_ALIGN = 8  # max itemsize we ship; keeps every leaf's offset aligned


class WireSpec(NamedTuple):
    """Static (hashable) layout of a packed tree."""
    treedef: Any  # jax PyTreeDef (hashable)
    shapes: Tuple[Tuple[int, ...], ...]
    dtypes: Tuple[str, ...]  # numpy dtype names; bool ships as its own name
    offsets: Tuple[int, ...]  # byte offsets, _ALIGN-aligned
    nbytes: int


def _aligned(n: int) -> int:
    return -(-n // _ALIGN) * _ALIGN


def spec_for(tree) -> WireSpec:
    """Layout for a numpy pytree (shapes/dtypes only — reusable for every
    tree with the same structure, e.g. all groups of one capacity bucket)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    shapes, dtypes, offsets = [], [], []
    off = 0
    for leaf in leaves:
        a = np.asarray(leaf)
        # 64-bit leaves can't be rebuilt on device without jax_enable_x64
        # (bitcast truncates); production transport is f32/i32/i16/bool.
        assert a.dtype.itemsize <= 4, (
            f"wire transport does not carry 64-bit dtypes ({a.dtype}); "
            "downcast on the host first"
        )
        shapes.append(tuple(a.shape))
        dtypes.append(a.dtype.name)
        offsets.append(off)
        off += _aligned(a.nbytes)
    return WireSpec(treedef, tuple(shapes), tuple(dtypes), tuple(offsets),
                    off)


def pack_wire(tree, spec: WireSpec | None = None):
    """Host side: flatten `tree` into one INT32 buffer (byte layout per
    `spec`; offsets are byte offsets, always 4-aligned). Returns
    (buffer, spec). Runs on loader/producer threads (pure memcpy).

    int32 — not uint8 — on purpose: the device-side rebuild then only ever
    bitcasts SAME-width (i32->f32/i32) or NARROWING (i32->(2,)i16 /
    (4,)u8), which are layout no-ops. A widening (4,)u8->f32 bitcast over
    a ~50M-element buffer made the TPU compiler blow memory (SIGKILL in
    the compile helper)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if spec is None:
        spec = spec_for(tree)
    buf = np.zeros(spec.nbytes // 4, np.int32)
    raw8 = buf.view(np.uint8)
    for leaf, shape, dt, off in zip(leaves, spec.shapes, spec.dtypes,
                                    spec.offsets):
        a = np.asarray(leaf)
        assert a.shape == shape and a.dtype.name == dt, (
            (a.shape, a.dtype.name), (shape, dt),
            "tree does not match the bucket's wire spec",
        )
        # reshape(-1) first: 0-d arrays reject dtype-size-changing views.
        raw = np.ascontiguousarray(a).reshape(-1).view(np.uint8)
        raw8[off:off + raw.size] = raw
    return buf, spec


def unpack_wire(buf: jnp.ndarray, spec: WireSpec):
    """Device side (trace-time): rebuild the tree from the packed int32
    buffer with STATIC slices + same-width/narrowing bitcasts. bool leaves
    ship as their raw bytes and come back via `!= 0`."""
    leaves = []
    for shape, dt, off in zip(spec.shapes, spec.dtypes, spec.offsets):
        dtype = np.dtype(dt)
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        nbytes = n * dtype.itemsize
        words = jax.lax.slice(buf, (off // 4,), ((off + _aligned(nbytes))
                                                 // 4,))
        if dtype == np.bool_:
            leaf = (
                jax.lax.bitcast_convert_type(words, jnp.uint8)
                .reshape(-1)[:n] != 0
            ).reshape(shape)
        else:
            # Same-width (4-byte) or narrowing (i32 -> (k,) of 4/itemsize)
            # bitcast — both layout no-ops, then trim the aligned tail.
            leaf = jax.lax.bitcast_convert_type(
                words, dtype
            ).reshape(-1)[:n].reshape(shape)
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)
