"""Worker for tests/test_distributed.py: one process of a REAL two-process
`jax.distributed` run on CPU devices.

Each process has 2 local CPU devices (XLA_FLAGS set by the parent), joins a
2-process cluster (4 global devices), builds ITS half of a deterministic
4-scene global batch, assembles global arrays with
parallel.distributed.local_to_global, and runs ONE global-mesh train step.
Prints `LOSS <pid> <loss>` — the parent asserts both processes agree with
its own single-process run on the same global batch.

Usage: python -m tests._dist_worker <process_id> <port>
"""
import os
import sys


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    # XLA_FLAGS must be in the env before the backend is created (the
    # parent sets it for the subprocess; re-assert for manual runs).
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
    )
    import jax

    # The environment's sitecustomize force-registers the TPU PJRT plugin
    # and overrides JAX_PLATFORMS, so (like tests/conftest.py) CPU must be
    # forced via jax.config AFTER import.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from unidet3d_tpu.core.class_table import build_class_table
    from unidet3d_tpu.core.config import DATASETS_CLASSES
    from unidet3d_tpu.data.batcher import build_packs
    from unidet3d_tpu.models.detector import UniDet3DTPU
    from unidet3d_tpu.parallel.distributed import (
        local_batch_size,
        local_to_global,
        replicate_global,
    )
    from unidet3d_tpu.parallel.train_step import (
        create_mesh,
        init_state,
        make_train_step,
    )
    from unidet3d_tpu.train.optim import make_optimizer
    from tests.test_distributed import dist_cfg, global_batch4

    cfg = dist_cfg()
    table = build_class_table(DATASETS_CLASSES)
    model = UniDet3DTPU(cfg=cfg, table=table)
    mesh = create_mesh()  # GLOBAL: 4 devices across 2 processes
    opt = make_optimizer(total_steps=100)

    # Both processes generate the same global batch deterministically, then
    # keep only their own half — exactly what per-process loaders do.
    batch_np, gt_np = global_batch4(cfg)
    lo = pid * local_batch_size(4)
    hi = lo + local_batch_size(4)
    my_batch = jax.tree_util.tree_map(lambda x: np.asarray(x)[lo:hi],
                                      batch_np)
    my_gt = jax.tree_util.tree_map(lambda x: np.asarray(x)[lo:hi], gt_np)
    # Host rulebooks over the LOCAL scenes, one shard per local device.
    my_pack = build_packs(
        my_batch.vox_src, my_batch.valid, cfg,
        n_shards=jax.local_device_count(),
    )

    state = init_state(
        model, cfg, opt,
        jax.tree_util.tree_map(lambda x: jnp.asarray(x[:1]), my_batch),
        jax.random.PRNGKey(0),
    )
    state = replicate_global(mesh, state)
    batch, gt, pack = local_to_global(
        mesh, (my_batch, my_gt, my_pack), P("data")
    )

    step_fn = make_train_step(model, cfg, opt, mesh)
    _, metrics = step_fn(state, batch, gt, pack, jax.random.PRNGKey(1))
    print(f"LOSS {pid} {float(metrics['loss']):.10f}", flush=True)


if __name__ == "__main__":
    main()
