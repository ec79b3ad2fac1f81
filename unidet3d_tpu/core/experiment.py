"""Experiment configuration: the full training/eval definition.

Replaces the mmengine python-file config system (reference configs/*.py +
Config.fromfile + registries): an experiment is a python file defining
`get_config() -> ExperimentConfig`; `load_experiment(path)` imports and calls
it. CLI overrides use dotted `key=value` pairs like the reference's
`--cfg-options` (tools/train.py:38-47).
"""
from __future__ import annotations

import dataclasses
import importlib.util
import os
from typing import Optional, Sequence, Tuple

from .config import DATASETS_CLASSES, ModelConfig


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    name: str  # must match ModelConfig.datasets entry
    data_root: str
    ann_train: Optional[str] = None  # info pkl path (relative to data_root)
    ann_val: Optional[str] = None
    partition: float = 1.0
    label_mapping: Optional[dict] = None
    # False drops the random transforms (flip/rot-scale-trans/elastic) from
    # the train pipeline, keeping the deterministic ones (alignment, class
    # mapping, color norm). For overfit/convergence tests — the reference
    # has no such switch (its configs always augment).
    augment: bool = True


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig
    datasets: Tuple[DatasetSpec, ...]
    datasets_classes: Tuple = DATASETS_CLASSES
    # Schedule (reference config:716-730).
    batch_size: int = 8
    epochs: int = 1024
    # 0 = derive from data: ceil(len(ConcatDataset)/batch_size), i.e. one
    # pass over the partition-scaled concat mixture per epoch (reference
    # mmengine EpochBasedTrainLoop semantics; lengths at ref
    # s3dis_dataset.py:102-106, joint mixture config:600-645). An explicit
    # value overrides (fixed-length epochs).
    steps_per_epoch: int = 0
    lr: float = 2e-4
    # Denominator for tools/train.py --auto-scale-lr (linear scaling rule):
    # 8, inferred from the reference recipe's '1xb8' config naming (1 GPU x
    # batch 8; its configs define no auto_scale_lr block themselves — the
    # reference CLI would actually error on --auto-scale-lr).
    base_batch_size: int = 8
    weight_decay: float = 0.05
    lr_power: float = 0.9
    clip_norm: float = 10.0
    # Checkpointing / validation (reference config:724-730).
    work_dir: str = "work_dirs/default"
    ckpt_interval_epochs: int = 1
    ckpt_max_keep: int = 16
    val_interval_epochs: int = 16
    val_last_epochs: int = 16  # val every epoch for the last K epochs
    # 0 = 4 scenes per mesh device (batched inference amortises the
    # decoder/fixed costs — measured 108 vs 122.6 ms/scene on a v5e;
    # the reference TestLoop is bs=1). Set explicitly to trade memory.
    eval_batch_size: int = 0
    # Per-iteration logging interval (reference mmengine LoggerHook default
    # 50): every K steps log loss EMA, step time, scenes/s and ETA, plus a
    # WARN line when the interval saw capacity drops (data/telemetry.py).
    log_interval: int = 50
    seed: int = 0
    load_from: Optional[str] = None  # params checkpoint for (partial) init
    load_prefix: str = "backbone"  # subtree restored from load_from

    @property
    def total_steps(self) -> int:
        assert self.steps_per_epoch > 0, (
            "steps_per_epoch=0 means derive-from-data: call "
            "resolve_steps_per_epoch(exp, dataset_len) first"
        )
        return self.epochs * self.steps_per_epoch


def resolve_steps_per_epoch(exp: ExperimentConfig, dataset_len: int):
    """Fill in data-derived epoch length (reference epoch semantics: one
    pass over the partition-scaled concat dataset). No-op when the config
    sets an explicit steps_per_epoch."""
    if exp.steps_per_epoch > 0:
        return exp
    steps = max(1, -(-dataset_len // exp.batch_size))
    return dataclasses.replace(exp, steps_per_epoch=steps)


def load_experiment(path: str) -> ExperimentConfig:
    spec = importlib.util.spec_from_file_location(
        "exp_config_" + os.path.basename(path).replace(".", "_"), path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_config()


def apply_overrides(cfg: ExperimentConfig, options: Sequence[str]):
    """Apply `a.b=value` overrides (values parsed as python literals)."""
    import ast

    for opt in options:
        key, _, raw = opt.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        parts = key.split(".")

        def set_in(obj, parts, value):
            if len(parts) == 1:
                return dataclasses.replace(obj, **{parts[0]: value})
            sub = getattr(obj, parts[0])
            return dataclasses.replace(
                obj, **{parts[0]: set_in(sub, parts[1:], value)}
            )

        cfg = set_in(cfg, parts, value)
    return cfg
