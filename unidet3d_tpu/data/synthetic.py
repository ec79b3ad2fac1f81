"""Synthetic indoor scenes for benchmarks and driver entry points.

Real indoor scans are 2.5-D SURFACES (floors, walls, furniture shells), not
uniform volumes: after 2 cm voxelization their occupancy is dense within
z-runs and the sorted-voxel rulebooks have small per-offset drift — exactly
the structure the banded pallas conv (ops/pallas_conv.py) and the XLA gather
path see in production. A uniform-random volume is adversarial to both
(saturated miss lists, no dedup), so benchmarking on one misrepresents every
real workload. This generator samples points from a room shell (floor +
walls) plus box-shaped "furniture" surfaces, area-weighted, with sensor-like
jitter — matching ScanNet-scale scenes in point count, extent, and surface
density.
"""
from __future__ import annotations

import numpy as np


def _sample_on_box(rng, n, center, size, faces="all"):
    """Uniform area-weighted samples on the surface of an axis-aligned box."""
    half = np.asarray(size, np.float64) / 2
    # Face areas: +-x, +-y, +-z.
    areas = np.array(
        [
            size[1] * size[2], size[1] * size[2],
            size[0] * size[2], size[0] * size[2],
            size[0] * size[1], size[0] * size[1],
        ],
        np.float64,
    )
    if faces == "sides_top":  # furniture: skip the hidden bottom face
        areas[5] = 0.0
    probs = areas / areas.sum()
    face = rng.choice(6, size=n, p=probs)
    u = rng.rand(n) * 2 - 1
    v = rng.rand(n) * 2 - 1
    pts = np.empty((n, 3))
    axis = face // 2  # 0=x, 1=y, 2=z
    sign = np.where(face % 2 == 0, 1.0, -1.0)
    for a in range(3):
        m = axis == a
        o1, o2 = (a + 1) % 3, (a + 2) % 3
        pts[m, a] = sign[m] * half[a]
        pts[m, o1] = u[m] * half[o1]
        pts[m, o2] = v[m] * half[o2]
    return pts + np.asarray(center, np.float64)


def synthetic_scene(
    n_points: int,
    extent=(8.0, 8.0, 3.0),
    n_objects: int = 12,
    noise: float = 0.005,
    seed: int = 0,
):
    """(n_points, 6) float32 [xyz, rgb in [-1, 1]-ish] surface-like scene.

    ~55% of points land on the room shell (floor + 4 walls, ceiling-less
    like most scans), the rest on `n_objects` random furniture boxes.
    """
    rng = np.random.RandomState(seed)
    ex, ey, ez = extent

    n_room = int(n_points * 0.55)
    # Room shell: floor + 4 walls, area-weighted.
    areas = np.array([ex * ey, ey * ez, ey * ez, ex * ez, ex * ez])
    probs = areas / areas.sum()
    which = rng.choice(5, size=n_room, p=probs)
    pts_room = np.empty((n_room, 3))
    u, v = rng.rand(n_room), rng.rand(n_room)
    m = which == 0  # floor
    pts_room[m] = np.stack([u[m] * ex, v[m] * ey, np.zeros(m.sum())], 1)
    for i, (fx, fy) in enumerate([(0.0, None), (ex, None),
                                  (None, 0.0), (None, ey)], start=1):
        m = which == i
        if fx is not None:
            pts_room[m] = np.stack([np.full(m.sum(), fx), u[m] * ey,
                                    v[m] * ez], 1)
        else:
            pts_room[m] = np.stack([u[m] * ex, np.full(m.sum(), fy),
                                    v[m] * ez], 1)

    n_obj = n_points - n_room
    sizes = 0.3 + rng.rand(n_objects, 3) * np.array([1.5, 1.5, 1.2])
    centers = np.stack(
        [
            rng.rand(n_objects) * (ex - 2) + 1,
            rng.rand(n_objects) * (ey - 2) + 1,
            sizes[:, 2] / 2,  # resting on the floor
        ],
        1,
    )
    obj_areas = 2 * (
        sizes[:, 0] * sizes[:, 1]
        + sizes[:, 1] * sizes[:, 2]
        + sizes[:, 0] * sizes[:, 2]
    )
    counts = rng.multinomial(n_obj, obj_areas / obj_areas.sum())
    pts_obj = np.concatenate(
        [
            _sample_on_box(rng, c, centers[k], sizes[k], faces="sides_top")
            for k, c in enumerate(counts)
            if c
        ],
        0,
    )

    xyz = np.concatenate([pts_room, pts_obj], 0)
    xyz += rng.randn(*xyz.shape) * noise  # sensor jitter
    rgb = rng.rand(len(xyz), 3) * 2 - 1
    pts = np.concatenate([xyz, rgb], 1).astype(np.float32)
    return pts[rng.permutation(len(pts))][:n_points]
