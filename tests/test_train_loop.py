"""Full-stack smoke: config -> datasets -> train loop -> checkpoint -> eval."""
import dataclasses
import logging
import os

import numpy as np
import pytest

from tests.test_data_pipeline import write_fake_dataset
from tests.test_detector import small_config
from unidet3d_tpu.core.experiment import (
    DatasetSpec,
    ExperimentConfig,
    apply_overrides,
)
from unidet3d_tpu.train.loop import evaluate, train


import pytest as _pytest

pytestmark = _pytest.mark.slow


def _experiment(tmp_path):
    root = str(tmp_path / "scannet")
    write_fake_dataset(root, n_scenes=3)
    cfg = small_config(
        axis_name="data",
        max_points=1024,
        voxel_capacity=1024,
        max_superpoints=48,
        max_gts=8,
        query_thr=24,
        num_planes=(4, 8),
        d_model=16,
        num_heads=2,
        hidden_dim=32,
        num_layers=1,
        topk_insts=32,
    )
    return ExperimentConfig(
        model=cfg,
        datasets=(
            DatasetSpec(
                name="scannet",
                data_root=root,
                ann_train="infos.pkl",
                ann_val="infos.pkl",
            ),
        ),
        batch_size=8,
        epochs=2,
        steps_per_epoch=2,
        work_dir=str(tmp_path / "work"),
        val_interval_epochs=100,  # skip val inside train() for speed
        val_last_epochs=0,
        ckpt_interval_epochs=1,
    )


def test_train_checkpoint_eval(tmp_path, caplog):
    caplog.set_level(logging.INFO, logger="unidet3d_tpu")
    exp = _experiment(tmp_path)
    state = train(exp)
    assert int(state.step) == 4
    # Checkpoints written.
    ckpt_dir = os.path.join(exp.work_dir, "checkpoints")
    assert os.path.isdir(ckpt_dir)

    # Resume continues from saved step.
    exp2 = dataclasses.replace(exp, epochs=3)
    state2 = train(exp2, resume="auto")
    assert int(state2.step) == 6

    # Eval produces finite metrics.
    results = evaluate(exp, state, logger=None)
    assert "scannet" in results
    assert np.isfinite(results["scannet"]["mAP_0.25"])


def test_apply_overrides(tmp_path):
    exp = _experiment(tmp_path)
    exp2 = apply_overrides(
        exp, ["epochs=5", "model.query_thr=16", "lr=0.001"]
    )
    assert exp2.epochs == 5
    assert exp2.model.query_thr == 16
    assert exp2.lr == 0.001
