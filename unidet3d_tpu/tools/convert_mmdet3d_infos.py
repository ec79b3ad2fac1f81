"""Convert genuine mmdet3d-v2 info pkls to this framework's info format.

The reference trains/evaluates from OpenMMLab v2 infos produced by
tools/update_infos_to_v2.py (ref :18-151, :188-260): `lidar_path` et al. are
bare FILENAMES that mmdet3d joins with per-dataset `data_prefix` dirs
(points/, semantic_mask/, instance_mask/, super_points/ — ref config
data_prefix blocks). Our IndoorDataset reads paths relative to data_root, so
this converter re-anchors every path under the standard prefixes, drops
ignored instances (bbox_label_3d == -1), and passes boxes through unchanged
(geometric-center convention on both sides). Running it on already-prepared
reference data is the cheapest route to checkpoint-parity evaluation.
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

_PREFIXES = {
    "lidar": "points",
    "pts_semantic_mask_path": "semantic_mask",
    "pts_instance_mask_path": "instance_mask",
    "super_pts_path": "super_points",
}


def convert_entry(entry: dict) -> dict:
    out = {}
    lp = entry["lidar_points"]
    fname = os.path.basename(lp["lidar_path"])
    out["lidar_points"] = {
        "lidar_path": f"points/{fname}",
        "num_pts_feats": lp.get("num_pts_feats", 6),
    }
    for key in ("pts_semantic_mask_path", "pts_instance_mask_path"):
        if entry.get(key):
            out[key] = f"{_PREFIXES[key]}/{os.path.basename(entry[key])}"
    # ARKitScenes v2 infos carry no super_pts_path: the reference dataset
    # reads super_points/<lidar filename> (arkitscenes_dataset.py:75-78).
    sp = entry.get("super_pts_path") or fname
    out["super_pts_path"] = f"super_points/{os.path.basename(sp)}"
    if entry.get("axis_align_matrix") is not None:
        out["axis_align_matrix"] = np.asarray(
            entry["axis_align_matrix"]
        ).tolist()
    out["instances"] = [
        {
            "bbox_3d": [float(v) for v in inst["bbox_3d"]],
            "bbox_label_3d": int(inst["bbox_label_3d"]),
        }
        for inst in entry.get("instances", [])
        if int(inst.get("bbox_label_3d", -1)) >= 0
    ]
    return out


def convert_infos(in_path: str, out_path: str) -> dict:
    with open(in_path, "rb") as f:
        info = pickle.load(f)
    assert "data_list" in info, (
        f"{in_path} is not a v2 info pkl (no data_list); v1 infos must first "
        "go through mmdet3d's update_infos_to_v2"
    )
    converted = {
        "metainfo": info.get("metainfo", {}),
        "data_list": [convert_entry(e) for e in info["data_list"]],
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(converted, f)
    return converted


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("in_pkl")
    ap.add_argument("out_pkl")
    args = ap.parse_args()
    info = convert_infos(args.in_pkl, args.out_pkl)
    print(f"wrote {args.out_pkl} ({len(info['data_list'])} scenes)")


if __name__ == "__main__":
    main()
