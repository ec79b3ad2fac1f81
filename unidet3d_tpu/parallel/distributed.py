"""Multi-process (multi-host) training support.

TPU-native replacement for the reference's multi-node launch story
(mmengine DDP launchers + torch.distributed init, reference
tools/train.py:48-60 and mmengine runner internals): JAX's multi-controller
SPMD model instead of a parameter-server or DDP wrapper. Every process runs
the SAME program over a GLOBAL `jax.sharding.Mesh`; each process feeds its
own slice of the global batch, `jax.make_array_from_process_local_data`
assembles the global arrays, and the jitted `shard_map` train step's
psum/pmean collectives ride ICI within a slice and DCN across slices —
there is no wrapper class and no explicit gradient bucketing to port.

Launch recipe (one command per host, same as `jax.distributed` docs):

    JAX_COORDINATOR_ADDRESS=host0:8476 \
    JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=<0..3> \
    python -m unidet3d_tpu.tools.train configs/unidet3d_joint.py

On Cloud TPU pods the three variables are auto-detected by
`jax.distributed.initialize()` from the TPU metadata server, so plain
`python -m unidet3d_tpu.tools.train ...` on every worker is enough.

Division of labour in a multi-process run:
  * train step: GLOBAL mesh over all devices; per-process loaders draw
    disjoint random scene subsets (seed folded with process_index — the
    reference's random-draw sampler semantics, s3dis_dataset.py:63-68,
    need no coordination); batches are assembled with
    `local_to_global(mesh, tree, P('data'))`.
  * eval: PROCESS-LOCAL mesh. Capacity bucketing (data/loader.py) picks a
    compiled step per group from the group's actual sizes — a
    data-dependent choice that would deadlock a global-mesh program when
    processes see different data — so each process evaluates a strided
    shard of the dataset on its own devices and the metric all-gathers
    results at the end (train/metric.py:92-109).
  * checkpoints: process 0 writes; every process restores the same file
    (shared filesystem assumed, as with the reference's torch.save rank-0
    convention).

Verified by tests/test_distributed.py: a real two-process
`jax.distributed.initialize` run on CPU devices executes one global-mesh
train step and matches the single-process loss bit-for-bit.
"""
from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger("unidet3d_tpu")


def maybe_initialize() -> None:
    """`jax.distributed.initialize` when a multi-process launch is
    requested via the standard env triplet (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) or JAX_AUTO_DISTRIBUTED=1 (TPU
    pods: all three are discovered from the metadata server). No-op —
    single-process — otherwise, so the CLI works unchanged on one host."""
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    auto = os.environ.get("JAX_AUTO_DISTRIBUTED", "") == "1"
    if not coord and not auto:
        return
    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
        n = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        if n is not None:
            kwargs["num_processes"] = int(n)
        if pid is not None:
            kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    log.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global "
        "devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def is_primary() -> bool:
    return jax.process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    """This process's share of the global batch."""
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch size {global_batch_size} must divide over "
        f"{n} processes"
    )
    return global_batch_size // n


def local_to_global(mesh: Mesh, tree, spec: P = P("data")):
    """Assemble per-process host-local numpy leaves into global jax.Arrays
    sharded `spec` over `mesh`.

    Single-process: a plain device transfer (the historical fast path).
    Multi-process: `jax.make_array_from_process_local_data` — each process
    contributes its rows of the leading (batch) axis; no host ever
    materialises the global batch.
    """
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(jnp.asarray, tree)
    sharding = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


def replicate_global(mesh: Mesh, tree):
    """Replicate host-identical leaves across every device of a (possibly
    multi-process) mesh. All processes MUST pass the same values (same init
    rng / same restored checkpoint) — standard SPMD contract."""
    if jax.process_count() == 1:
        sharding = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree
        )
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )
