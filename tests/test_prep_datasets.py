"""Bespoke raw converters: multiscan .pth, 3rscan mesh+jsons, scannetpp,
arkitscenes frames, and mmdet3d-v2 info conversion — each end-to-end into
the dataset reader."""
import json
import os
import pickle

import numpy as np

from unidet3d_tpu.data.datasets import IndoorDataset
from unidet3d_tpu.tools.prep_datasets import (
    boxes_from_instance_ids,
    prepare_3rscan,
    prepare_multiscan,
    prepare_scannetpp,
    read_3rscan_label_map,
    read_obj_mesh,
)


def test_boxes_from_instance_ids():
    xyz = np.array(
        [[0, 0, 0], [2, 2, 2], [5, 5, 5], [7, 5, 5], [9, 9, 9]], np.float32
    )
    inst = np.array([0, 0, 1, 1, -1])
    boxes, labels = boxes_from_instance_ids(xyz, inst, {0: 7, 1: 9})
    np.testing.assert_allclose(boxes[0], [1, 1, 1, 2, 2, 2])
    np.testing.assert_allclose(boxes[1], [6, 5, 5, 2, 0, 0])
    assert labels.tolist() == [7, 9]
    # Unlabelled instances are skipped.
    b2, l2 = boxes_from_instance_ids(xyz, inst, {0: 7})
    assert len(b2) == 1


def test_read_obj_mesh(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(
        "v 0 0 0 0.1 0.2 0.3\nv 1 0 0 0.4 0.5 0.6\nv 0 1 0\nv 1 1 0\n"
        "f 1 2 3\nf 1/1 2/2 3/3 4/4\n"
    )
    pts, faces = read_obj_mesh(str(p))
    assert pts.shape == (4, 6)
    np.testing.assert_allclose(pts[0, 3:], [0.1, 0.2, 0.3])
    np.testing.assert_allclose(pts[2, 3:], 0)
    # Quad fan-triangulated into 2 triangles -> 3 faces total.
    assert faces.shape == (3, 3)
    np.testing.assert_array_equal(faces[1], [0, 1, 2])
    np.testing.assert_array_equal(faces[2], [0, 2, 3])


def test_read_obj_mesh_mtl_atlas(tmp_path):
    """No vertex colors -> colors come from the .mtl texture atlas sampled
    at each vertex's UV (ref data/3rscan/utils.py:47-85 read_objmesh)."""
    from PIL import Image

    # 4x4 atlas: left half red, right half green; rows constant.
    img = np.zeros((4, 4, 3), np.uint8)
    img[:, :2] = [200, 10, 20]
    img[:, 2:] = [10, 200, 20]
    Image.fromarray(img).save(tmp_path / "atlas.png")
    (tmp_path / "m.mtl").write_text(
        "newmtl mat0\nmap_Kd atlas.png\n"
    )
    (tmp_path / "m.obj").write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0.0 0.5\nvt 1.0 0.5\nvt 0.0 0.5\n"
        "f 1/1 2/2 3/3\n"
    )
    pts, faces = read_obj_mesh(str(tmp_path / "m.obj"))
    assert pts.shape == (3, 6) and faces.shape == (1, 3)
    # u=0 -> left half (red), u=1.0 wraps to pixel w-1... but %1.0 of 1.0
    # is 0.0; sample a clearly-right pixel via u close to 1 instead.
    np.testing.assert_allclose(pts[0, 3:], [200, 10, 20])
    np.testing.assert_allclose(pts[2, 3:], [200, 10, 20])


def test_read_obj_mesh_mtl_right_half(tmp_path):
    from PIL import Image

    img = np.zeros((4, 4, 3), np.uint8)
    img[:, :2] = [200, 10, 20]
    img[:, 2:] = [10, 200, 20]
    Image.fromarray(img).save(tmp_path / "t.png")
    (tmp_path / "m.mtl").write_text("map_Kd t.png\n")
    (tmp_path / "m.obj").write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0.9 0.5\nvt 0.9 0.1\nvt 0.9 0.9\n"
        "f 1/1 2/2 3/3\n"
    )
    pts, _ = read_obj_mesh(str(tmp_path / "m.obj"))
    np.testing.assert_allclose(pts[:, 3:], [[10, 200, 20]] * 3)


def _grid_mesh(n_side, rng, scale=4.0):
    """Connected triangulated grid (segmentator needs real adjacency)."""
    xs, ys = np.meshgrid(np.arange(n_side), np.arange(n_side))
    xyz = np.stack(
        [xs.ravel() * scale / n_side, ys.ravel() * scale / n_side,
         rng.rand(n_side * n_side) * 0.05], 1
    ).astype(np.float32)
    faces = []
    for i in range(n_side - 1):
        for j in range(n_side - 1):
            a = i * n_side + j
            faces.append([a, a + 1, a + n_side])
            faces.append([a + 1, a + n_side + 1, a + n_side])
    return xyz, np.asarray(faces, np.int64)


def test_prepare_multiscan(tmp_path):
    import torch

    rng = np.random.RandomState(0)
    xyz, faces = _grid_mesh(12, rng)
    n = len(xyz)
    sem = np.full(n, 2, np.int64)  # wall background
    inst = np.full(n, -1, np.int64)
    sem[:30] = 5  # chair
    inst[:30] = 4
    sem[30:50] = 17  # bed
    inst[30:50] = 9
    sem[50:55] = -1  # unannotated -> instance forced to -1
    inst[50:55] = 11
    scene = {
        "xyz": xyz, "rgb": rng.rand(n, 3).astype(np.float32) * 255,
        "faces": faces, "instance_ids": inst, "sem_labels": sem,
        "inst2obj": {4: "chair.1", 9: "bed.2"},
    }
    pth_dir = tmp_path / "pths"
    os.makedirs(pth_dir)
    torch.save(scene, pth_dir / "sceneM.pth")

    out = str(tmp_path / "out")
    prepare_multiscan(str(pth_dir), out, "infos.pkl", workers=1)
    # multiscan reader remaps valid ids 3..19 -> 0..16: chair 5 -> 2,
    # bed 17 -> 14.
    from unidet3d_tpu.data.dataset_specs import DEFAULT_LABEL_MAPPINGS

    ds = IndoorDataset(out, "infos.pkl", 2, test_mode=True,
                       label_mapping=DEFAULT_LABEL_MAPPINGS["multiscan"])
    s = ds[0]
    assert sorted(s["gt_labels_3d"].tolist()) == [2, 14]
    assert s["points"].shape == (n, 6)
    assert s["sp_pts_mask"].shape == (n,)
    chair_box = s["gt_bboxes_3d"][s["gt_labels_3d"] == 2][0]
    m = inst == 4
    np.testing.assert_allclose(
        chair_box[:3], (xyz[m].min(0) + xyz[m].max(0)) / 2, atol=1e-5
    )


def test_prepare_3rscan(tmp_path):
    rng = np.random.RandomState(1)
    xyz, faces = _grid_mesh(10, rng)
    n = len(xyz)
    scene_id = "abc-123"
    d = tmp_path / "raw" / scene_id
    os.makedirs(d)
    # obj mesh with vertex colors
    with open(d / "mesh.refined.v2.obj", "w") as f:
        for v in xyz:
            f.write(f"v {v[0]} {v[1]} {v[2]} 0.5 0.5 0.5\n")
        for fc in faces:
            f.write(f"f {fc[0]+1} {fc[1]+1} {fc[2]+1}\n")
    seg_indices = np.arange(n) // 10  # 10 verts per segment
    with open(d / "mesh.refined.0.010000.segs.v2.json", "w") as f:
        json.dump({"segIndices": seg_indices.tolist()}, f)
    with open(d / "semseg.v2.json", "w") as f:
        json.dump({"segGroups": [
            {"label": "chair", "segments": [0, 1]},
            {"label": "bed", "segments": [2]},
        ]}, f)
    meta = [{"reference": scene_id, "scans": []}]
    with open(tmp_path / "3RScan.json", "w") as f:
        json.dump(meta, f)
    csv_path = tmp_path / "labels.csv"
    csv_path.write_text(
        "title line\nGlobal,Label,,y\n1,chair,5,z\n2,bed,4,z\n"
    )
    lm = read_3rscan_label_map(str(csv_path))
    assert lm == {"chair": 5, "bed": 4}

    out = str(tmp_path / "out")
    prepare_3rscan(str(tmp_path / "raw"), out, [scene_id],
                   str(tmp_path / "3RScan.json"), str(csv_path),
                   filename="infos.pkl", workers=1)
    from unidet3d_tpu.data.dataset_specs import DEFAULT_LABEL_MAPPINGS

    ds = IndoorDataset(out, "infos.pkl", 3, test_mode=True,
                       label_mapping=DEFAULT_LABEL_MAPPINGS["3rscan"])
    s = ds[0]
    # nyu40 chair=5 -> class 2, bed=4 -> class 1 in the 18-class remap.
    assert sorted(s["gt_labels_3d"].tolist()) == [1, 2]
    # superpoints = compacted mesh segment ids
    assert s["sp_pts_mask"].max() + 1 == len(np.unique(seg_indices))


def test_prepare_scannetpp(tmp_path):
    import struct

    rng = np.random.RandomState(2)
    xyz, faces = _grid_mesh(10, rng)
    n = len(xyz)
    scene_id = "spp0"
    scans = tmp_path / "raw" / "data" / scene_id / "scans"
    os.makedirs(scans)
    colors = rng.randint(0, 255, (n, 3)).astype(np.uint8)
    # binary ply
    with open(scans / "mesh_aligned_0.05.ply", "wb") as f:
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        f.write(header.encode())
        for v, c in zip(xyz, colors):
            f.write(struct.pack("<fff", *v))
            f.write(struct.pack("<BBB", *c))
        for fc in faces:
            f.write(struct.pack("<B", 3))
            f.write(struct.pack("<iii", *fc))
    with open(scans / "segments_anno.json", "w") as f:
        json.dump({"segGroups": [
            {"label": "office chair", "segments": list(range(0, 25))},
            {"label": "table", "segments": list(range(25, 50))},
            {"label": "unknown junk", "segments": list(range(50, 60))},
        ]}, f)
    meta = tmp_path / "raw" / "metadata" / "semantic_benchmark"
    os.makedirs(meta)
    (meta / "top100.txt").write_text("wall\nfloor\ntable\nchair\n")
    (meta / "map_benchmark.csv").write_text(
        "class,semantic_map_to,instance_map_to\noffice chair,chair,chair\n"
    )

    out = str(tmp_path / "out")
    prepare_scannetpp(str(tmp_path / "raw"), out, [scene_id],
                      filename="infos.pkl", workers=1)
    ds = IndoorDataset(out, "infos.pkl", 4, test_mode=True)
    s = ds[0]
    # office chair -> chair (id 3), table -> 2; junk dropped.
    assert sorted(s["gt_labels_3d"].tolist()) == [2, 3]
    sem = s["pts_semantic_mask"]
    assert set(np.unique(sem)) == {-1, 2, 3}


def test_convert_mmdet3d_infos(tmp_path):
    from unidet3d_tpu.tools.convert_mmdet3d_infos import convert_infos

    v2 = {
        "metainfo": {"categories": {"chair": 0}},
        "data_list": [
            {
                "lidar_points": {"lidar_path": "scene0.bin",
                                 "num_pts_feats": 6},
                "pts_semantic_mask_path": "scene0.bin",
                "pts_instance_mask_path": "scene0.bin",
                "super_pts_path": "scene0.bin",
                "axis_align_matrix": np.eye(4),
                "instances": [
                    {"bbox_3d": [0, 0, 0, 1, 1, 1], "bbox_label_3d": 3},
                    {"bbox_3d": [0, 0, 0, 1, 1, 1], "bbox_label_3d": -1},
                ],
            },
            {  # arkitscenes-style: no masks, no super_pts_path
                "lidar_points": {"lidar_path": "41069021_point.bin",
                                 "num_pts_feats": 6},
                "instances": [],
            },
        ],
    }
    src = tmp_path / "v2.pkl"
    with open(src, "wb") as f:
        pickle.dump(v2, f)
    out = convert_infos(str(src), str(tmp_path / "ours.pkl"))
    e0, e1 = out["data_list"]
    assert e0["lidar_points"]["lidar_path"] == "points/scene0.bin"
    assert e0["pts_semantic_mask_path"] == "semantic_mask/scene0.bin"
    assert e0["super_pts_path"] == "super_points/scene0.bin"
    assert len(e0["instances"]) == 1  # label -1 dropped
    assert e1["super_pts_path"] == "super_points/41069021_point.bin"
    # Round-trips through pickle + reader schema expectations.
    with open(tmp_path / "ours.pkl", "rb") as f:
        again = pickle.load(f)
    assert again["data_list"][0]["axis_align_matrix"][0][0] == 1.0


def test_arkitscenes_frame_loader(tmp_path):
    from PIL import Image

    from unidet3d_tpu.tools.arkitscenes_loader import (
        FrameLoader,
        accumulate_scene,
        extract_gt_boxes,
        parse_traj_line,
    )

    # Pose round trip: traj stores world->cam; loader returns cam->world.
    ts, pose = parse_traj_line("1.001 0 0 0 1.0 2.0 3.0")
    assert ts == "1.001"
    np.testing.assert_allclose(pose[:3, 3], [-1, -2, -3], atol=1e-9)

    vid = "41069021"
    frames = tmp_path / f"{vid}_frames"
    for sub in ("lowres_depth", "lowres_wide", "lowres_wide_intrinsics"):
        os.makedirs(frames / sub)
    h, w = 24, 32
    depth_mm = np.full((h, w), 2000, np.uint16)  # 2 m everywhere
    for fid in ("1.001", "1.101"):
        Image.fromarray(depth_mm).save(
            frames / "lowres_depth" / f"{vid}_{fid}.png"
        )
        Image.fromarray(
            np.full((h, w, 3), 128, np.uint8)
        ).save(frames / "lowres_wide" / f"{vid}_{fid}.png")
    # Intrinsics: exact for frame 1, offset by -0.001 for frame 2 (tests
    # the +-1 ms fallback).
    k = f"{w} {h} 20.0 20.0 {w/2} {h/2}"
    (frames / "lowres_wide_intrinsics" / f"{vid}_1.001.pincam").write_text(k)
    (frames / "lowres_wide_intrinsics" / f"{vid}_1.100.pincam").write_text(k)
    with open(frames / "lowres_wide.traj", "w") as f:
        f.write("1.001 0 0 0 0 0 0\n")
        f.write("1.103 0 0 0 0 0 0\n")  # within 5 ms of frame 1.101

    loader = FrameLoader(str(frames), subsample=2)
    assert len(loader) == 2
    fr = loader[0]
    assert fr["depth"].shape == (h // 2, w // 2)
    pts = accumulate_scene(loader, grid=0.25)
    assert pts.shape[1] == 6
    assert len(pts) > 0
    # All depths 2 m with identity pose -> z == 2 everywhere.
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=0.01)
    # Colors kept in [0, 1] (ARKitScenes convention).
    assert 0.45 < pts[:, 3].mean() < 0.55

    ann = {
        "skipped": False,
        "data": [
            {"label": "tv monitor", "segments": {"obbAligned": {
                "centroid": [1, 2, 3], "axesLengths": [1, 1, 1],
                "normalizedAxes": list(np.eye(3).reshape(-1)),
            }}},
            {"label": "unknowncat", "segments": {"obbAligned": {
                "centroid": [0, 0, 0], "axesLengths": [1, 1, 1],
                "normalizedAxes": list(np.eye(3).reshape(-1)),
            }}},
        ],
    }
    p = tmp_path / "ann.json"
    with open(p, "w") as f:
        json.dump(ann, f)
    boxes, labels, skipped = extract_gt_boxes(str(p))
    assert not skipped
    assert len(boxes) == 1  # unknown category dropped
    assert labels[0] == 15  # tv_monitor
