"""Data-prep tooling tests: PLY round trip, generic export, viz export."""
import os
import struct

import numpy as np

from unidet3d_tpu.tools.create_data import prepare_generic, write_scene, write_infos
from unidet3d_tpu.tools.ply import mesh_points_colors, read_ply
from unidet3d_tpu.data.datasets import IndoorDataset
from unidet3d_tpu.viz.show_results import show_result


def _write_binary_ply(path, verts, colors, faces):
    with open(path, "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        f.write(header.encode())
        for v, c in zip(verts, colors):
            f.write(struct.pack("<fff", *v))
            f.write(struct.pack("<BBB", *c))
        for face in faces:
            f.write(struct.pack("<B", 3))
            f.write(struct.pack("<iii", *face))


def test_read_binary_ply(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    faces = np.array([[0, 1, 2]], np.int32)
    p = str(tmp_path / "mesh.ply")
    _write_binary_ply(p, verts, colors, faces)
    vdata, f = read_ply(p)
    np.testing.assert_allclose(vdata["x"], verts[:, 0])
    np.testing.assert_array_equal(f, faces)
    pts = mesh_points_colors(vdata)
    assert pts.shape == (3, 6)
    np.testing.assert_allclose(pts[0, 3:], [255, 0, 0])


def test_generic_prepare_roundtrip(tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "out"
    os.makedirs(raw)
    rng = np.random.RandomState(0)
    for name in ("sceneA", "sceneB"):
        n = 100
        np.save(raw / f"{name}_point.npy", rng.rand(n, 6).astype(np.float32))
        np.save(raw / f"{name}_sem_label.npy", rng.randint(0, 5, n))
        np.save(raw / f"{name}_ins_label.npy", rng.randint(-1, 3, n))
        np.save(raw / f"{name}_sp.npy", rng.randint(0, 8, n))
        bbox = np.concatenate(
            [rng.rand(2, 6).astype(np.float32), np.array([[0.0], [1.0]])], 1
        )
        np.save(raw / f"{name}_bbox.npy", bbox)

    info_path = prepare_generic(
        str(raw), str(out), ["sceneA", "sceneB"], "infos.pkl", workers=2
    )
    assert os.path.exists(info_path)
    # Round-trip through the dataset reader.
    ds = IndoorDataset(str(out), "infos.pkl", 2, test_mode=True)
    sample = ds[0]
    assert sample["points"].shape == (100, 6)
    assert sample["gt_bboxes_3d"].shape == (2, 6)
    assert sample["sp_pts_mask"].max() < 8
    assert "pts_instance_mask" in sample


def test_show_result_obj_export(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.rand(50, 6).astype(np.float32)
    gt = np.array([[0.5, 0.5, 0.5, 1, 1, 1]], np.float32)
    pred = np.array([[0.4, 0.5, 0.5, 1, 1, 1, 0.3]], np.float32)
    d = show_result(str(tmp_path), "scene0", pts, gt, pred)
    files = os.listdir(d)
    assert "scene0_points.obj" in files
    assert "scene0_gt.obj" in files
    assert "scene0_pred.obj" in files
    # Wireframe file has 8 vertices + 12 lines per box.
    lines = open(os.path.join(d, "scene0_pred.obj")).readlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 8
    assert sum(1 for l in lines if l.startswith("l ")) == 12
