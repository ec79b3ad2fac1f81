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
    """Host side: flatten `tree` into one uint8 buffer. Returns
    (buffer, spec). Runs on loader/producer threads (pure memcpy)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if spec is None:
        spec = spec_for(tree)
    buf = np.empty(spec.nbytes, np.uint8)
    for leaf, shape, dt, off in zip(leaves, spec.shapes, spec.dtypes,
                                    spec.offsets):
        a = np.asarray(leaf)
        assert a.shape == shape and a.dtype.name == dt, (
            (a.shape, a.dtype.name), (shape, dt),
            "tree does not match the bucket's wire spec",
        )
        # reshape(-1) first: 0-d arrays reject dtype-size-changing views.
        raw = np.ascontiguousarray(a).reshape(-1).view(np.uint8)
        buf[off:off + raw.size] = raw
    return buf, spec


def unpack_wire(buf: jnp.ndarray, spec: WireSpec):
    """Device side (trace-time): rebuild the tree from the packed buffer
    with STATIC slices + bitcasts. bool leaves ship as their raw bytes and
    come back via `!= 0`."""
    leaves = []
    for shape, dt, off in zip(spec.shapes, spec.dtypes, spec.offsets):
        dtype = np.dtype(dt)
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        raw = jax.lax.slice(buf, (off,), (off + n * dtype.itemsize,))
        if dtype == np.bool_:
            leaf = (raw != 0).reshape(shape)
        elif dtype.itemsize == 1:
            leaf = jax.lax.bitcast_convert_type(raw, dtype).reshape(shape)
        else:
            grouped = raw.reshape(n, dtype.itemsize)
            leaf = jax.lax.bitcast_convert_type(grouped, dtype).reshape(shape)
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)
