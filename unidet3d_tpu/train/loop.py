"""Training + evaluation runners.

Replaces mmengine Runner / EpochBasedTrainLoop / ValLoop / TestLoop
(reference tools/train.py:121-131, SURVEY.md §3.1): epoch-based training over
the mixed-dataset loader with DP sharding, periodic checkpointing (keep-16),
dynamic validation intervals (every 16 epochs, then every epoch for the last
16 — config:730), and per-dataset mAP evaluation.
"""
from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.class_table import build_class_table
from ..core.experiment import ExperimentConfig
from ..data.datasets import ConcatDataset, IndoorDataset
from ..data.loader import EvalLoader, TrainLoader
from ..data.pipelines import test_pipeline, train_pipeline
from ..models.detector import UniDet3DTPU
from ..models.postprocess import predict_batch
from ..parallel.distributed import (
    is_primary,
    local_batch_size,
    local_to_global,
    replicate_global,
)
from ..parallel.train_step import (
    TrainState,
    create_mesh,
    init_state,
    make_eval_step,
    make_train_step,
)
from ..train.checkpoint import CheckpointManager, merge_by_prefix, restore_params
from ..train.metric import IndoorMetric
from ..train.optim import make_optimizer

log = logging.getLogger("unidet3d_tpu")


def build_model(exp: ExperimentConfig):
    table = build_class_table(exp.datasets_classes)
    return UniDet3DTPU(cfg=exp.model, table=table), table


def build_datasets(exp: ExperimentConfig, split: str):
    from ..data.dataset_specs import DEFAULT_LABEL_MAPPINGS

    out = []
    for spec in exp.datasets:
        ann = spec.ann_train if split == "train" else spec.ann_val
        if ann is None:
            continue
        didx = exp.model.datasets.index(spec.name)
        pipe = (
            train_pipeline(spec.name, augment=spec.augment)
            if split == "train"
            else test_pipeline(spec.name)
        )
        mapping = spec.label_mapping
        if mapping is None:
            mapping = DEFAULT_LABEL_MAPPINGS.get(spec.name)
        out.append(
            IndoorDataset(
                spec.data_root,
                ann,
                didx,
                pipeline=pipe,
                test_mode=split != "train",
                partition=spec.partition if split == "train" else 1.0,
                label_mapping=mapping,
                seed=exp.seed + didx,
            )
        )
    return out


def _val_epochs(exp: ExperimentConfig):
    every = set(range(exp.val_interval_epochs, exp.epochs + 1,
                      exp.val_interval_epochs))
    every |= set(range(max(1, exp.epochs - exp.val_last_epochs + 1),
                       exp.epochs + 1))
    return every


def train(exp: ExperimentConfig, resume: str | None = None):
    os.makedirs(exp.work_dir, exist_ok=True)
    model, table = build_model(exp)
    mesh = create_mesh()
    log.info("backend=%s devices=%s", jax.default_backend(),
             [str(d) for d in mesh.devices.flat])
    n_dev = mesh.devices.size
    assert exp.batch_size % n_dev == 0, (
        f"batch_size {exp.batch_size} must divide over {n_dev} devices"
    )
    # Multi-process SPMD (parallel/distributed.py): every process runs this
    # same loop over the GLOBAL mesh; each loads only its slice of the
    # global batch, disjoint via a process-folded loader seed (the
    # reference's random-draw sampler needs no cross-rank coordination).
    local_bs = local_batch_size(exp.batch_size)
    n_local = jax.local_device_count()
    assert local_bs % n_local == 0, (local_bs, n_local)
    train_sets = build_datasets(exp, "train")
    assert train_sets, "no training datasets configured"
    concat = ConcatDataset(train_sets)
    # Data-derived epoch length (reference EpochBasedTrainLoop: one pass
    # over the partition-scaled concat mixture) unless the config pins it.
    from ..core.experiment import resolve_steps_per_epoch

    exp = resolve_steps_per_epoch(exp, len(concat))
    log.info("steps_per_epoch=%d (dataset %d scenes, bs %d)",
             exp.steps_per_epoch, len(concat), exp.batch_size)
    optimizer = make_optimizer(
        base_lr=exp.lr,
        weight_decay=exp.weight_decay,
        total_steps=exp.total_steps,
        power=exp.lr_power,
        clip_norm=exp.clip_norm,
    )
    loader = TrainLoader(
        concat, exp.model, local_bs,
        seed=exp.seed + 7919 * jax.process_index(),
        n_shards=n_local,
    )

    # Init from one prefetched batch.
    batch_np, gt_np, pack_np = next(loader)
    ex_batch = jax.tree_util.tree_map(lambda x: jnp.asarray(x[:1]), batch_np)
    state = init_state(model, exp.model, optimizer, ex_batch,
                       jax.random.PRNGKey(exp.seed))

    if exp.load_from:
        donor = restore_params(exp.load_from, None)
        state = state._replace(
            params=merge_by_prefix(state.params, donor, exp.load_prefix)
        )
        log.info("initialized %s from %s", exp.load_prefix, exp.load_from)

    mngr = CheckpointManager(
        os.path.join(exp.work_dir, "checkpoints"), exp.ckpt_max_keep
    )
    if resume:
        step = None if resume == "auto" else int(resume)
        restored = mngr.restore(state, step)
        if restored is not None:
            state = TrainState(*restored)
            log.info("resumed from step %d", int(state.step))
    state = replicate_global(mesh, state)

    step_fn = make_train_step(model, exp.model, optimizer, mesh)
    val_epochs = _val_epochs(exp)
    rng = jax.random.PRNGKey(exp.seed + 1)

    from ..data.telemetry import DROPS

    start_epoch = int(state.step) // exp.steps_per_epoch
    total_steps = exp.total_steps
    ema = None  # loss EMA for iteration lines (reference LoggerHook UX)
    for epoch in range(start_epoch + 1, exp.epochs + 1):
        t0 = time.time()
        t_int = t0
        losses = []
        for it in range(1, exp.steps_per_epoch + 1):
            batch_np, gt_np, pack_np = next(loader)
            # Per-process local slices -> global mesh-sharded arrays
            # (single-process: a plain device transfer).
            batch, gt, pack = local_to_global(
                mesh, (batch_np, gt_np, pack_np)
            )
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, gt, pack, sub)
            losses.append(metrics["loss"])
            if (it % exp.log_interval == 0 or it == exp.steps_per_epoch
                    ) and is_primary():
                # One host sync per interval (losses stay device-side
                # between intervals so steps pipeline freely).
                loss = float(losses[-1])
                ema = loss if ema is None else 0.9 * ema + 0.1 * loss
                now = time.time()
                spstep = (now - t_int) / min(exp.log_interval, it)
                t_int = now
                done = (epoch - 1) * exp.steps_per_epoch + it
                eta = int(max(total_steps - done, 0) * spstep)
                log.info(
                    "epoch %d iter %d/%d loss %.4f (ema %.4f) "
                    "%.2f s/step %.2f scenes/s eta %d:%02d:%02d",
                    epoch, it, exp.steps_per_epoch, loss, ema, spstep,
                    exp.batch_size / spstep,
                    eta // 3600, eta % 3600 // 60, eta % 60,
                )
                drops = DROPS.snapshot(reset=True)
                if drops:
                    log.warning(
                        "capacity drops this interval: %s — inputs exceeded "
                        "static caps (see data/telemetry.py; raise the "
                        "relevant ModelConfig capacity if unexpected)",
                        DROPS.format(drops),
                    )
        mean_loss = float(jnp.mean(jnp.stack(losses)))
        dt = time.time() - t0
        if is_primary():
            log.info(
                "epoch %d/%d loss %.4f (%.1f s, %.2f scenes/s)",
                epoch, exp.epochs, mean_loss, dt,
                exp.steps_per_epoch * exp.batch_size / dt,
            )
        if epoch % exp.ckpt_interval_epochs == 0 and is_primary():
            # Rank-0 write, every process restores the same file (shared
            # filesystem — the reference's torch.save convention).
            mngr.save(int(state.step), state)
        if epoch in val_epochs:
            results = evaluate(exp, state, model, table)
            for name, res in results.items():
                log.info(
                    "[val %s] mAP@0.25 %.4f mAP@0.50 %.4f",
                    name, res.get("mAP_0.25", 0), res.get("mAP_0.50", 0),
                )
    loader.close()
    mngr.close()
    return state


def evaluate(exp: ExperimentConfig, state, model=None, table=None,
             logger=None, show_dir: str | None = None, show: bool = False):
    """Run per-dataset validation (reference TestLoop semantics,
    SURVEY.md §3.2 — which is bs=1 only, unidet3d.py:475-538).

    This path batches + shards instead: scenes are collated and rulebook-
    built on a prefetch thread (EvalLoader), the forward is pjit-sharded
    over the mesh `data` axis, and post-processing runs one device dispatch
    per scene GROUP (predict_batch). In multi-process runs every process
    evaluates its dataset shard and results are all-gathered before
    compute(). `show_dir` dumps .obj visualizations per scene; `show`
    opens each scene in the interactive open3d viewer (reference
    tools/test.py:124-126 --show / --show-dir) and degrades to a one-time
    warning when open3d is unavailable."""
    if model is None:
        model, table = build_model(exp)
    cfg = exp.model
    metric = IndoorMetric(cfg, exp.datasets_classes)
    # Eval uses a PROCESS-LOCAL mesh: capacity bucketing picks a compiled
    # step from each group's actual sizes — a data-dependent choice that
    # would deadlock a global-mesh program when processes hold different
    # scenes. Each process evaluates a strided shard of every dataset; the
    # metric all-gathers before compute() (parallel/distributed.py).
    mesh = create_mesh(local=True)
    n_dev = mesh.devices.size
    n_proc = jax.process_count()
    if n_proc > 1:
        # Pull the (fully-replicated) global state to host once so the
        # local-mesh jit can consume it without cross-mesh resharding.
        state = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), state
        )
    eval_bs = exp.eval_batch_size or 4 * n_dev
    assert eval_bs % n_dev == 0, (eval_bs, n_dev)

    # One compiled eval step per capacity BUCKET actually encountered
    # (EvalLoader pads each scene group to the smallest covering bucket —
    # parameters are capacity-independent, so the same state serves all).
    # Single-device eval uses the WIRE transport: the whole group crosses
    # host->device as ONE buffer (data/wire.py — the per-array transfer
    # fixed cost otherwise dominates sustained throughput).
    use_wire = n_dev == 1
    _steps = {}

    def fwd_for(cfg_b, spec=None):
        key = (cfg_b.max_points, cfg_b.max_superpoints)
        if key not in _steps:
            model_b = (
                model
                if cfg_b is cfg
                else UniDet3DTPU(cfg=cfg_b, table=model.table)
            )
            if use_wire:
                from ..parallel.train_step import make_eval_step_wire

                _steps[key] = make_eval_step_wire(model_b, cfg_b, spec)
            else:
                _steps[key] = make_eval_step(model_b, cfg_b, mesh)
        return _steps[key]

    n_scenes = 0
    t0 = time.time()

    def drain(pending):
        """Host half of one group: pull det to numpy (the only sync) and
        feed the metric/visualizers. Runs with a LAG of one group behind
        the device dispatch so the AP accumulation, .obj dumps and the
        NEXT group's wire transfer all overlap device compute."""
        nonlocal show
        det, samples, n_real, didx, scene_base = pending
        det = jax.tree_util.tree_map(np.asarray, det)
        for i in range(n_real):
            sample = samples[i]
            gt_boxes = sample["gt_bboxes_3d"]
            if gt_boxes.shape[1] == 6:
                gt_boxes = np.concatenate(
                    [gt_boxes,
                     np.zeros((len(gt_boxes), 1), np.float32)], 1
                )
            metric.process(
                didx,
                det.boxes[i], det.labels[i], det.scores[i],
                det.valid[i],
                gt_boxes, sample["gt_labels_3d"],
            )
            if show_dir or show:
                keep = np.asarray(det.valid[i], bool)
                pred = det.boxes[i][keep]
            if show_dir:
                from ..viz.show_results import show_result

                name = (f"{cfg.datasets[didx]}_"
                        f"scene{scene_base + i:05d}")
                show_result(
                    show_dir, name,
                    np.asarray(sample["points"], np.float32),
                    gt_boxes, pred,
                )
            if show:
                # Interactive per-scene viewer (reference --show,
                # tools/test.py:124-126). Gated gracefully: without
                # open3d warn ONCE and keep evaluating.
                try:
                    from ..viz.show_results import show_online

                    show_online(
                        np.asarray(sample["points"], np.float32), pred
                    )
                except ImportError as e:
                    log.warning("--show disabled: %s", e)
                    show = False

    pending = None
    for ds in build_datasets(exp, "val"):
        didx = ds.dataset_idx
        loader = EvalLoader(
            ds, cfg, eval_bs, n_shards=n_dev,
            shard_idx=jax.process_index(), shard_count=n_proc,
            wire=use_wire,
        )
        scene_base = 0
        for samples, batch_np, gt_np, pack_np, n_real, cfg_b in loader:
            if use_wire:
                # buf is already device-resident: EvalLoader device_puts on
                # the worker thread so the relay transfer overlaps compute.
                buf, spec = pack_np
                (cls_logits, boxes, qvalid, pts_dev, pvalid_dev,
                 spids_dev) = fwd_for(cfg_b, spec)(
                    state.params, state.batch_stats, buf
                )
            else:
                # Multi-device path: per-leaf staging. vox_src is DEAD in
                # the eval trace (inference keeps raw point coordinates —
                # models/detector.py geometry frames) and jit prunes unused
                # args, so leaving it as numpy skips its transfer.
                batch = batch_np._replace(**{
                    k: jnp.asarray(v)
                    for k, v in batch_np._asdict().items() if k != "vox_src"
                })
                pack = jax.tree_util.tree_map(jnp.asarray, pack_np)
                cls_logits, boxes, qvalid = fwd_for(cfg_b)(
                    state.params, state.batch_stats, batch, pack
                )
                pts_dev, pvalid_dev, spids_dev = (
                    batch.points, batch.valid, batch.sp_ids
                )
            det = predict_batch(
                cfg_b, didx, cls_logits, boxes, qvalid,
                pts_dev, pvalid_dev, spids_dev,
            )
            if pending is not None:
                drain(pending)
            pending = (det, samples, n_real, didx, scene_base)
            scene_base += n_real
            n_scenes += n_real
    if pending is not None:
        drain(pending)
    dt = max(time.time() - t0, 1e-9)
    log.info("eval: %d scenes in %.1f s (%.2f scenes/s)",
             n_scenes, dt, n_scenes / dt)
    metric.gather_across_processes()
    return metric.compute(logger=logger if logger is not None else print)
