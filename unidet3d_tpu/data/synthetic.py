"""Synthetic indoor scenes for benchmarks and driver entry points.

Real indoor scans are 2.5-D SURFACES (floors, walls, furniture shells), not
uniform volumes: after 2 cm voxelization their occupancy is dense within
z-runs and the sorted-voxel rulebooks have small per-offset drift — exactly
the structure the banded pallas conv (ops/pallas_conv.py) and the XLA gather
path see in production. A uniform-random volume is adversarial to both
(saturated miss lists, no dedup), so benchmarking on one misrepresents every
real workload. This generator samples points from a room shell (floor +
walls) plus box-shaped "furniture" surfaces, area-weighted, with sensor-like
jitter.

DENSITY CALIBRATION (round 5). Point density is the property that sets
every downstream cost — voxel counts per U-Net level, rulebook sizes, conv
pair counts — and it must match real scans, not just the surface topology.
ScanNet's `*_vh_clean_2.ply` meshes (the reference's input points,
ref data/scannet/load_scannet_data.py) are the DECIMATED reconstructions
with ~2 cm vertex spacing, i.e. ~2,500 points per m² of scanned surface.
Earlier rounds used a FIXED 8x8x3 m room for every point count, which for a
90k-point scene gives ~470 pts/m² — 5x sparser than real scans. That skews
both cost directions: level-0 voxels barely dedup (ratio ~0.93 vs the
Poisson-expected ~0.63 at 2 cm spacing) and halving merges only ~1.3x per
level (real surfaces: ~2.5-4x), so fine levels carried ~3x the voxels real
scans produce while convs saw far fewer neighbor pairs than real surfaces
have. This generator therefore SCALES THE ROOM to the requested point count
at DENSITY = 2500 pts/m², keeping occupancy statistics (and thus host
rulebook cost and device conv cost) aligned with genuine ScanNet val scans
across the whole size mix. Expected statistics at this density (Poisson
approximation, verified in tests/test_data_pipeline.py):
level-0 voxels ~= 0.63 * points; level merges ~2.5x / ~3.5x / ~4x after.
"""
from __future__ import annotations

import numpy as np

# Real-scan surface point density (see module docstring): ScanNet
# vh_clean_2 decimated meshes ~ 2 cm vertex spacing ~= 2500 pts / m^2.
SURFACE_DENSITY = 2500.0


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
    return pts + np.asarray(center, np.float64), axis


def _room_extent(n_points: int, rng, wall_h: float = 2.6):
    """Floor extent (ex, ey) such that the scene's total sampled surface
    (floor + 4 walls + ~25% furniture overhead) hits SURFACE_DENSITY for
    `n_points`. Aspect ratio drawn in [1, 1.5] like real rooms."""
    target = n_points / SURFACE_DENSITY  # m^2 of surface to cover
    r = 1.0 + rng.rand() * 0.5
    # Solve a*(1.25) + walls for ex with ey = r*ex:
    #   1.25*r*ex^2 + 2*(1+r)*wall_h*ex - target = 0
    a = 1.25 * r
    b = 2.0 * (1.0 + r) * wall_h
    ex = (-b + np.sqrt(b * b + 4 * a * target)) / (2 * a)
    ex = max(ex, 2.0)
    return ex, r * ex, wall_h


def synthetic_scene(
    n_points: int,
    extent=None,
    n_objects: int | None = None,
    noise: float = 0.005,
    seed: int = 0,
):
    """(n_points, 6) float32 [xyz, rgb in [-1, 1]-ish] surface-like scene.

    ~55% of points land on the room shell (floor + 4 walls, ceiling-less
    like most scans), the rest on furniture boxes. `extent=None` (the
    default) sizes the room to the point count at real-scan surface
    density (see module docstring); pass an explicit (ex, ey, ez) to pin
    the geometry instead.
    """
    rng = np.random.RandomState(seed)
    if extent is None:
        extent = _room_extent(n_points, rng)
    ex, ey, ez = extent
    if n_objects is None:
        # Furniture count scales with floor area (~1 object / 2.5 m^2).
        n_objects = max(4, int(ex * ey / 2.5))

    n_room = int(n_points * 0.55)
    # Room shell: floor + 4 walls, area-weighted.
    areas = np.array([ex * ey, ey * ez, ey * ez, ex * ez, ex * ez])
    probs = areas / areas.sum()
    which = rng.choice(5, size=n_room, p=probs)
    pts_room = np.empty((n_room, 3))
    nrm_room = np.empty(n_room, np.int64)  # surface-normal axis per point
    u, v = rng.rand(n_room), rng.rand(n_room)
    m = which == 0  # floor
    pts_room[m] = np.stack([u[m] * ex, v[m] * ey, np.zeros(m.sum())], 1)
    nrm_room[m] = 2
    for i, (fx, fy) in enumerate([(0.0, None), (ex, None),
                                  (None, 0.0), (None, ey)], start=1):
        m = which == i
        if fx is not None:
            pts_room[m] = np.stack([np.full(m.sum(), fx), u[m] * ey,
                                    v[m] * ez], 1)
            nrm_room[m] = 0
        else:
            pts_room[m] = np.stack([u[m] * ex, np.full(m.sum(), fy),
                                    v[m] * ez], 1)
            nrm_room[m] = 1

    n_obj = n_points - n_room
    sizes = 0.3 + rng.rand(n_objects, 3) * np.array([1.5, 1.5, 1.2])
    span_x, span_y = max(ex - 2, 0.1), max(ey - 2, 0.1)
    centers = np.stack(
        [
            rng.rand(n_objects) * span_x + min(1.0, ex / 2),
            rng.rand(n_objects) * span_y + min(1.0, ey / 2),
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
    obj_out = [
        _sample_on_box(rng, c, centers[k], sizes[k], faces="sides_top")
        for k, c in enumerate(counts)
        if c
    ]
    pts_obj = np.concatenate([o[0] for o in obj_out], 0)
    nrm_obj = np.concatenate([o[1] for o in obj_out], 0)

    xyz = np.concatenate([pts_room, pts_obj], 0)
    nrm = np.concatenate([nrm_room, nrm_obj], 0)
    # Sensor jitter, TANGENTIAL to the local surface: real input points are
    # reconstructed-mesh vertices that sit ON the surface (normal-direction
    # error is removed by the reconstruction), so normal jitter — which
    # inflates 2 cm occupancy well past real scans' — stays at 10%.
    jit = rng.randn(*xyz.shape) * noise
    jit[np.arange(len(xyz)), nrm] *= 0.1
    xyz += jit
    rgb = rng.rand(len(xyz), 3) * 2 - 1
    pts = np.concatenate([xyz, rgb], 1).astype(np.float32)
    return pts[rng.permutation(len(pts))][:n_points]
