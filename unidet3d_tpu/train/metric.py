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


def _pad_pickle(obj, length: int | None = None) -> np.ndarray:
    """pickle -> uint8 array, optionally zero-padded to `length` with a
    leading int64 size header (process_allgather needs equal shapes)."""
    import pickle

    raw = np.frombuffer(pickle.dumps(obj), np.uint8)
    header = np.frombuffer(
        np.int64(len(raw)).tobytes(), np.uint8
    )
    body = raw if length is None else np.pad(raw, (0, length - len(raw)))
    return np.concatenate([header, body])


def _unpad_pickle(arr: np.ndarray):
    import pickle

    n = int(np.frombuffer(np.asarray(arr[:8], np.uint8).tobytes(), np.int64))
    return pickle.loads(np.asarray(arr[8 : 8 + n], np.uint8).tobytes())


def _allgather_object(obj) -> list:
    """All-gather an arbitrary picklable object across JAX processes: gather
    per-process byte lengths first, then equal-shape padded byte buffers
    (the jax-native analog of torch.distributed.all_gather_object)."""
    from jax.experimental import multihost_utils

    raw_len = len(_pad_pickle(obj)) - 8
    lengths = np.asarray(
        multihost_utils.process_allgather(np.int64(raw_len))
    ).reshape(-1)
    buf = _pad_pickle(obj, int(lengths.max()))
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    return [_unpad_pickle(gathered[i]) for i in range(gathered.shape[0])]


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

    def gather_across_processes(self):
        """Multi-host eval gather (the reference's collect_device='cpu'
        mmengine evaluator gather, indoor_metric.py:35-37): every process
        contributes its accumulated CPU results; afterwards each process
        holds the union (ordered by process index) and compute() is
        identical everywhere. No-op in single-process runs."""
        import jax

        if jax.process_count() == 1:
            return
        payload = _allgather_object((self._gt, self._dt))
        gt = {i: [] for i in self._gt}
        dt = {i: [] for i in self._dt}
        for proc_gt, proc_dt in payload:
            for i in gt:
                gt[i].extend(proc_gt[i])
                dt[i].extend(proc_dt[i])
        self._gt, self._dt = gt, dt

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
