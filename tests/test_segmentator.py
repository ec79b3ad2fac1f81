"""Mesh segmentator: two flat planes meeting at a sharp crease must split."""
import numpy as np
import pytest

from unidet3d_tpu.native import segmentator


def _grid_plane(nx, ny, z_fn, x0=0.0):
    """Triangulated grid plane; returns (verts, faces)."""
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    verts = np.stack(
        [x0 + xs.ravel().astype(np.float32), ys.ravel().astype(np.float32),
         z_fn(xs.ravel(), ys.ravel()).astype(np.float32)], 1)
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            b = (i + 1) * ny + j
            faces.append([a, b, a + 1])
            faces.append([b, b + 1, a + 1])
    return verts, np.asarray(faces, np.int32)


@pytest.mark.skipif(not segmentator.available(), reason="no C++ toolchain")
def test_flat_plane_single_segment():
    verts, faces = _grid_plane(12, 12, lambda x, y: np.zeros_like(x, float))
    seg = segmentator.segment_mesh(verts, faces, kthr=0.01, seg_min_verts=5)
    assert seg.max() == 0  # one segment


@pytest.mark.skipif(not segmentator.available(), reason="no C++ toolchain")
def test_crease_splits_segments():
    # A "tent": plane rising for x<10, falling for x>=10 -> sharp crease.
    def z(x, y):
        return np.where(x < 10, x.astype(float), 20.0 - x)

    verts, faces = _grid_plane(21, 12, z)
    seg = segmentator.segment_mesh(verts, faces, kthr=0.005, seg_min_verts=5)
    n_seg = seg.max() + 1
    assert n_seg >= 2
    # Vertices far on each side belong to different segments.
    left = seg[(verts[:, 0] < 5)]
    right = seg[(verts[:, 0] > 15)]
    assert set(left.tolist()).isdisjoint(set(right.tolist()))


@pytest.mark.skipif(not segmentator.available(), reason="no C++ toolchain")
def test_small_segment_merge():
    verts, faces = _grid_plane(6, 6, lambda x, y: np.zeros_like(x, float))
    # Huge min-verts forces everything into one segment even with tiny kthr.
    seg = segmentator.segment_mesh(verts, faces, kthr=1e-6, seg_min_verts=1000)
    assert seg.max() == 0
