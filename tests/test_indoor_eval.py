"""Hand-checked cases for the VOC-style indoor evaluator."""
import numpy as np

from unidet3d_tpu.train.indoor_eval import (
    average_precision,
    box_overlaps,
    indoor_eval,
)
from unidet3d_tpu.train.metric import IndoorMetric
from unidet3d_tpu.core.config import default_config


def _box(x, y, z, s=1.0, yaw=0.0):
    return np.array([x, y, z, s, s, s, yaw], np.float32)


def test_average_precision_perfect():
    assert average_precision(np.array([1.0]), np.array([1.0])) == 1.0


def test_box_overlaps_aa_and_rotated():
    p = _box(0, 0, 0)[None]
    g = _box(0.5, 0, 0)[None]
    iou = box_overlaps(p, g, with_yaw=False)
    np.testing.assert_allclose(iou, [[1 / 3]], rtol=1e-5)
    iou_r = box_overlaps(p, g, with_yaw=True)
    np.testing.assert_allclose(iou_r, [[1 / 3]], rtol=1e-4)


def test_indoor_eval_perfect_detection():
    gt = [{"gt_boxes": _box(0, 0, 0)[None], "gt_labels": np.array([0])}]
    dt = [
        {
            "boxes": _box(0, 0, 0)[None],
            "labels": np.array([0]),
            "scores": np.array([0.9]),
        }
    ]
    ret = indoor_eval(gt, dt, [0.25, 0.5], ["chair"], logger=None)
    assert ret["mAP_0.25"] == 1.0
    assert ret["mAP_0.50"] == 1.0
    assert ret["mAR_0.25"] == 1.0


def test_indoor_eval_false_positive_and_duplicate():
    gt = [{"gt_boxes": _box(0, 0, 0)[None], "gt_labels": np.array([0])}]
    # Two detections on the same GT: second (lower score) is FP.
    dt = [
        {
            "boxes": np.stack([_box(0, 0, 0), _box(0.05, 0, 0)]),
            "labels": np.array([0, 0]),
            "scores": np.array([0.9, 0.8]),
        }
    ]
    ret = indoor_eval(gt, dt, [0.25], ["chair"], logger=None)
    # AP: first det TP at recall 1.0 precision 1.0; duplicate FP after.
    assert ret["mAP_0.25"] == 1.0
    # Miss case: detection far away.
    dt2 = [
        {
            "boxes": _box(5, 5, 5)[None],
            "labels": np.array([0]),
            "scores": np.array([0.9]),
        }
    ]
    ret2 = indoor_eval(gt, dt2, [0.25], ["chair"], logger=None)
    assert ret2["mAP_0.25"] == 0.0


def test_indoor_eval_half_recall():
    gt = [
        {
            "gt_boxes": np.stack([_box(0, 0, 0), _box(5, 5, 5)]),
            "gt_labels": np.array([0, 0]),
        }
    ]
    dt = [
        {
            "boxes": _box(0, 0, 0)[None],
            "labels": np.array([0]),
            "scores": np.array([0.9]),
        }
    ]
    ret = indoor_eval(gt, dt, [0.25], ["chair"], logger=None)
    np.testing.assert_allclose(ret["mAP_0.25"], 0.5, atol=1e-6)
    np.testing.assert_allclose(ret["mAR_0.25"], 0.5, atol=1e-6)


def test_metric_routing():
    cfg = default_config()
    classes = [["a"], ["b"]] + [["c"]] * 4
    m = IndoorMetric(cfg, classes)
    m.process(
        0,
        _box(0, 0, 0)[None],
        np.array([0]),
        np.array([0.9]),
        np.array([True]),
        _box(0, 0, 0)[None],
        np.array([0]),
    )
    res = m.compute(logger=None)
    assert "scannet" in res
    assert res["scannet"]["mAP_0.25"] == 1.0
    assert "s3dis" not in res
