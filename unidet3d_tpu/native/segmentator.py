"""ctypes wrapper for the native mesh segmentator (superpoint generation).

Drop-in for the reference's `segmentator.segment_mesh(vertices, faces)`
(used offline in data prep, e.g. data/scannet/batch_load_scannet_data.py:18).
Defaults match the standard ScanNet parameters (kThresh=0.01, minVerts=20).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "segmentator.cc")
def _src_tag() -> str:
    import hashlib

    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


# Cache keyed on the SOURCE HASH (not mtime): a stale or foreign-host binary
# (-march=native!) is never loaded — any source change or fresh checkout
# recompiles into a new filename.
_LIB = os.path.join(_DIR, f"libunidet3d_segmentator.{_src_tag()}.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB):
            # Prune stale hashed binaries from earlier source revisions.
            for f in os.listdir(_DIR):
                if (f.startswith("libunidet3d_segmentator.")
                        and f.endswith(".so")):
                    try:
                        os.remove(os.path.join(_DIR, f))
                    except OSError:
                        pass
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    _SRC, "-o", _LIB,
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.unidet3d_segment_mesh.restype = ctypes.c_int32
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def segment_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    kthr: float = 0.01,
    seg_min_verts: int = 20,
) -> np.ndarray:
    """(V, 3) float32 vertices + (F, 3) int32 faces -> (V,) int32 segments."""
    lib = _load()
    assert lib is not None, "native segmentator unavailable"
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    out = np.empty(len(vertices), np.int32)
    lib.unidet3d_segment_mesh(
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(vertices)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(faces)),
        ctypes.c_float(kthr),
        ctypes.c_int32(seg_min_verts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
