"""Data-parallel training/eval steps over a jax.sharding.Mesh.

TPU-native replacement for the reference's DDP + SyncBN + NCCL story
(SURVEY.md §2c; mmengine MMDistributedDataParallel, tools/train.py:48-52):
one mesh axis `data` over ICI; the per-device step runs the full local model
(local voxel sort — no cross-device sort traffic) inside `shard_map`;
gradients and BN moments cross devices via psum/pmean only. Scaling to
multi-slice (DCN) is the same mesh with more devices.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.config import ModelConfig
from ..models.detector import GTBatch, PointBatch, detection_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_mesh(n_devices: int | None = None, local: bool = False) -> Mesh:
    """One `data` axis over all global devices (training), or over this
    process's local devices (`local=True` — eval, whose data-dependent
    capacity bucketing cannot be a cross-process program; see
    parallel/distributed.py)."""
    devs = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), axis_names=("data",))


def init_state(model, cfg: ModelConfig, optimizer, example_batch, rng):
    rngs = {"params": rng, "queries": jax.random.fold_in(rng, 1)}
    # jit the init: eager init would be thousands of device round-trips on
    # remote-relay platforms.
    variables = jax.jit(lambda: model.init(rngs, example_batch, True))()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32))


def make_train_step(
    model, cfg: ModelConfig, optimizer, mesh: Mesh, with_grads: bool = False
):
    """Build the jitted DP train step:
    (state, batch, gt, packs, rng) -> (state, metrics).

    `batch`/`gt` leading (global batch) dim must be divisible by the mesh
    size; state is replicated, data sharded over `data`. `packs` is the
    host-built rulebook transport form (data.batcher.build_packs with
    n_shards = mesh size): leading dim = mesh size, each slice a flat
    GridPack local to that device's scenes — the production path; device-side
    rulebook rebuild (the slow lexsort fallback) is never traced here.
    """
    assert cfg.axis_name == "data", (
        "multi-device training requires cfg.axis_name='data' so BN moments "
        "sync across the mesh"
    )

    def local_step(
        state: TrainState, batch: PointBatch, gt: GTBatch, packs, rng
    ):
        # The model folds the query rng per GLOBAL scene (detector.py query
        # selection), so the same replicated key gives every device distinct,
        # mesh-size-invariant subsets — no per-device fold here.
        my = rng
        # Unwrap this device's (1, ...) slice of the stacked packs.
        pack = jax.tree_util.tree_map(lambda x: x[0], packs)

        def loss_fn(params):
            (out, aux), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                True,
                pack,
                rngs={"queries": my},
                mutable=["batch_stats"],
            )
            loss = detection_loss(cfg, out, aux, batch, gt)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        # BN stats are identical across devices already (moments are psum'd
        # inside MaskedBatchNorm when cfg.axis_name == 'data').
        updates, new_opt = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(
            new_params, new_bs, new_opt, state.step + 1
        )
        metrics = {"loss": loss, "grad_norm": gnorm}
        if with_grads:  # test/debug only: expose the pmean'd grad tree
            metrics["grads"] = grads
        return new_state, metrics

    mapped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(),  # state replicated
            P("data"),  # batch sharded on scenes
            P("data"),
            P("data"),  # host rulebooks: one flat pack per device
            P(),  # rng replicated (folded per device)
        ),
        out_specs=(P(), P()),
        check_vma=False,  # pallas flash-attention outputs carry no vma info
    )
    return jax.jit(mapped, donate_argnums=(0,))


def make_eval_step(model, cfg: ModelConfig, mesh: Mesh | None = None):
    """Jitted inference forward:
    (params, batch_stats, batch, packs) -> (cls_logits, boxes, query_valid)
    — last decoder layer only, (B, Q, ...) shapes.

    `packs` is the stacked host-rulebook transport form (leading dim = mesh
    size, batcher.build_packs), same as the train step — eval never traces
    the device-side rulebook rebuild. Pass a mesh to shard scenes over the
    `data` axis; without one the single-device form still consumes the
    stacked (1, ...) pack.
    """

    def fwd(params, batch_stats, batch: PointBatch, packs):
        pack = jax.tree_util.tree_map(lambda x: x[0], packs)
        out, aux = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch, False,
            pack,
        )
        return out.cls_logits[-1], out.boxes[-1], aux.query_valid

    if mesh is None or mesh.devices.size == 1:
        return jax.jit(fwd)

    mapped = shard_map(
        fwd,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(mapped)


def _decode_rel_plane(packed: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Inverse of the builder's 9-bit rel packing (native/rulebook.py
    build_packs_fused pack_rel): (27, nb*ceil(block/3)) int32 words, lane i
    at bits [9i, 9i+9) holding e = rel + 1 (0 = the -1 sentinel,
    block-padded) -> the (27, cap) int32 rel plane. Pure elementwise
    shifts + a reshape — one cheap fused pass."""
    block = min(512, cap)
    nb = cap // block
    wpb = (block + 2) // 3
    w = packed.reshape(27, nb, wpb, 1)
    shifts = jnp.array([0, 9, 18], jnp.int32)
    e = (w >> shifts) & 511  # (27, nb, wpb, 3)
    return (e.reshape(27, nb, wpb * 3)[:, :, :block]
            .reshape(27, cap) - 1)


def make_eval_step_wire(model, cfg: ModelConfig, spec):
    """Single-device eval step over a WIRE-PACKED group (data/wire.py):
    (params, batch_stats, int32 buffer) ->
        (cls_logits, boxes, query_valid, points, point_valid, sp_ids).

    One host->device transfer per group instead of ~60 (the relay pays a
    ~45 ms fixed cost per fresh array — see data/wire.py). The trailing
    outputs are the device-resident batch fields the batched post-process
    consumes (models/postprocess.py predict_batch), so nothing else ever
    crosses the wire. `spec` is the bucket's static layout for the wire
    tree (batch-with-colors-only, flat pack, per-scene mean) built by
    EvalLoader wire=True; this step reverses its size trims bit-exactly:
      * vox_src (dead in the eval trace, but must TRACE with the right
        shape) is rebuilt from points;
      * features = [colors, where(valid, points - mean, 0)] — the same
        f32 arithmetic collate used on the host;
      * 9-bit packed rel planes decode via _decode_rel_plane (int16 rel
        from the two-phase fallback passes through untouched)."""
    from ..data.wire import unpack_wire

    def fwd(params, batch_stats, buf):
        batch, pack, mean = unpack_wire(buf, spec)
        banded = pack.banded
        if banded is not None and banded.rel and \
                banded.rel[0].dtype == jnp.int32:
            rel = tuple(
                _decode_rel_plane(p, v.shape[0])
                for p, v in zip(banded.rel, pack.valid)
            )
            pack = pack._replace(banded=banded._replace(rel=rel))
        xyz = jnp.where(
            batch.valid[..., None], batch.points - mean, 0.0
        )
        batch = batch._replace(
            vox_src=batch.points / cfg.voxel_size,
            features=jnp.concatenate([batch.features, xyz], axis=-1),
        )
        out, aux = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch, False,
            pack,
        )
        return (out.cls_logits[-1], out.boxes[-1], aux.query_valid,
                batch.points, batch.valid, batch.sp_ids)

    return jax.jit(fwd)
