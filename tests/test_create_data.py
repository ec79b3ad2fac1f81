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


def _write_fake_scannet_scan(scans_dir, scene, rng):
    """Synthetic raw ScanNet scene: mesh ply + aggregation/segs jsons +
    meta txt (90-deg axis alignment) + labels tsv."""
    import json

    d = scans_dir / scene
    os.makedirs(d)
    n = 300
    verts = (rng.rand(n, 3) * 4).astype(np.float32)
    # Object 0 ("chair") occupies x in [10, 11); object 1 ("table") x in
    # [20, 21.5); rest is wall background.
    verts[100:150, 0] = 10 + rng.rand(50)
    verts[150:200, 0] = 20 + 1.5 * rng.rand(50)
    colors = rng.randint(0, 255, (n, 3)).astype(np.uint8)
    faces = rng.randint(0, n, (80, 3)).astype(np.int32)
    _write_binary_ply(str(d / f"{scene}_vh_clean_2.ply"), verts, colors, faces)

    # Each vertex its own segment; objects own their vertex-segments.
    seg_ids = np.arange(n)
    with open(d / f"{scene}_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": seg_ids.tolist()}, f)
    agg = {
        "segGroups": [
            {"objectId": 0, "label": "chair",
             "segments": list(range(100, 150))},
            {"objectId": 1, "label": "table",
             "segments": list(range(150, 200))},
            {"objectId": 2, "label": "wall",
             "segments": list(range(0, 100))},
        ]
    }
    with open(d / f"{scene}.aggregation.json", "w") as f:
        json.dump(agg, f)

    # 90-degree rotation about z as the axis-align matrix.
    aa = np.array(
        [[0, -1, 0, 0], [1, 0, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], float
    )
    with open(d / f"{scene}.txt", "w") as f:
        f.write("axisAlignment = " + " ".join(
            str(v) for v in aa.reshape(-1)) + "\n")
    return verts, aa


def test_scannet_prepare_end_to_end(tmp_path):
    """Raw ScanNet scan -> tsv label map -> bins + infos -> train pipeline:
    nyu40 semantics, 1-indexed instances, aligned det boxes + labels."""
    from unidet3d_tpu.tools.create_data import prepare_scannet
    from unidet3d_tpu.data.pipelines import train_pipeline

    rng = np.random.RandomState(3)
    scans = tmp_path / "scans"
    os.makedirs(scans)
    verts, aa = _write_fake_scannet_scan(scans, "scene0000_00", rng)

    tsv = tmp_path / "labels.tsv"
    tsv.write_text(
        "id\traw_category\tcategory\tcount\tnyu40id\n"
        "1\twall\twall\t1\t1\n"
        "2\tchair\tchair\t1\t5\n"
        "3\ttable\ttable\t1\t7\n"
    )
    out = tmp_path / "out"
    prepare_scannet(
        str(scans), str(out), ["scene0000_00"], "infos.pkl", str(tsv),
        workers=1,
    )

    ds = IndoorDataset(str(out), "infos.pkl", 0, test_mode=True)
    raw = ds[0]
    # Semantic bins carry raw nyu40 ids (0 = unannotated verts 200..299).
    assert set(np.unique(raw["pts_semantic_mask"])) == {0, 1, 5, 7}
    # Det boxes: chair -> class 2, table -> class 4 (positions of nyu40
    # 5 / 7 in SCANNET_DET_CAT_IDS); wall produces no box.
    assert sorted(raw["gt_labels_3d"].tolist()) == [2, 4]
    # Boxes live in the AA frame: chair x in [10,11) maps to y; check the
    # chair box center y ~ 10.5-ish and x-extent came from original y.
    chair = raw["gt_bboxes_3d"][raw["gt_labels_3d"] == 2][0]
    assert 10.0 < chair[1] < 11.0

    # Train pipeline end-to-end: sem->train ids->det labels match box labels.
    ds_tr = IndoorDataset(
        str(out), "infos.pkl", 0, pipeline=train_pipeline("scannet"), seed=0
    )
    s = ds_tr[0]
    assert sorted(s["gt_labels_3d"].tolist()) == [2, 4]
    assert s["gt_sp_masks"].shape[0] == 2


def test_prepare_scannet_requires_tsv(tmp_path):
    from unidet3d_tpu.tools.create_data import prepare_scannet

    try:
        prepare_scannet(str(tmp_path), str(tmp_path), [], "i.pkl", None)
        raised = False
    except AssertionError:
        raised = True
    assert raised
