"""Per-dataset detection metric accumulator.

Mirror of reference unidet3d/indoor_metric.py: predictions are routed to
their dataset (the reference greps the lidar_path; here dataset ids are
explicit), accumulated on host, and evaluated per dataset with indoor_eval
at IoU thresholds 0.25 / 0.50.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.class_table import ClassTable
from ..core.config import ModelConfig
from .indoor_eval import indoor_eval


class IndoorMetric:
    def __init__(
        self,
        cfg: ModelConfig,
        datasets_classes,
        iou_thrs=(0.25, 0.5),
    ):
        self.cfg = cfg
        self.datasets_classes = datasets_classes
        self.iou_thrs = tuple(iou_thrs)
        self._gt = {i: [] for i in range(cfg.num_datasets)}
        self._dt = {i: [] for i in range(cfg.num_datasets)}

    def process(
        self,
        dataset_idx: int,
        det_boxes: np.ndarray,  # (K, 7)
        det_labels: np.ndarray,
        det_scores: np.ndarray,
        det_valid: np.ndarray,
        gt_boxes: np.ndarray,  # (M, 7)
        gt_labels: np.ndarray,
    ):
        v = np.asarray(det_valid, bool)
        self._dt[dataset_idx].append(
            {
                "boxes": np.asarray(det_boxes)[v].reshape(-1, 7),
                "labels": np.asarray(det_labels)[v],
                "scores": np.asarray(det_scores)[v],
            }
        )
        self._gt[dataset_idx].append(
            {
                "gt_boxes": np.asarray(gt_boxes).reshape(-1, 7),
                "gt_labels": np.asarray(gt_labels),
            }
        )

    def compute(self, logger=print) -> Dict[str, Dict[str, float]]:
        results = {}
        for d in range(self.cfg.num_datasets):
            if not self._dt[d]:
                continue
            name = self.cfg.datasets[d]
            if logger is not None:
                logger(f"==== {name} ====")
            results[name] = indoor_eval(
                self._gt[d],
                self._dt[d],
                self.iou_thrs,
                list(self.datasets_classes[d]),
                with_yaw=self.cfg.angles[d],
                logger=logger,
            )
        return results
