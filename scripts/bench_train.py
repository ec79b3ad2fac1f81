"""Train-step benchmark at production scale (single chip, batch 8)."""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as ge
from unidet3d_tpu.core.config import default_config
from unidet3d_tpu.data.batcher import build_packs
from unidet3d_tpu.parallel.train_step import (
    create_mesh,
    init_state,
    make_train_step,
)
from unidet3d_tpu.train.optim import make_optimizer


def main(subm_impl: str = "xla", remat: bool = True):
    cfg = default_config(
        axis_name="data",
        max_points=65536,
        voxel_capacity=65536,  # per scene (covers max_points exactly)
        max_superpoints=2048,
        max_gts=64,
        subm_impl=subm_impl,
        backbone_remat=remat,
    )
    model = ge._build(cfg)
    mesh = create_mesh(1)
    opt = make_optimizer(total_steps=100)
    # Host arrays: the pack build runs from loader-thread numpy in
    # production; fetching device buffers back over the relay costs minutes.
    batch_np, gt_np = ge._synthetic_inputs(cfg, b=8, as_numpy=True)
    t0 = time.perf_counter()
    pack_np = build_packs(batch_np.vox_src, batch_np.valid, cfg, n_shards=1)
    print(f"host rulebooks: {time.perf_counter()-t0:.2f} s", flush=True)
    import jax.numpy as jnp

    batch = jax.tree_util.tree_map(jnp.asarray, batch_np)
    gt = jax.tree_util.tree_map(jnp.asarray, gt_np)
    # Single-device mesh still uses the stacked transport form (n_shards
    # leading dim == mesh size).
    pack = jax.tree_util.tree_map(lambda x: np.asarray(x)[None], pack_np)

    t0 = time.perf_counter()
    state = init_state(
        model,
        cfg,
        opt,
        jax.tree_util.tree_map(lambda x: x[:1], batch),
        jax.random.PRNGKey(0),
    )
    print(f"init: {time.perf_counter()-t0:.1f} s", flush=True)
    step = make_train_step(model, cfg, opt, mesh)
    t0 = time.perf_counter()
    state, m = step(state, batch, gt, pack, jax.random.PRNGKey(1))
    print(
        f"first step (compile): {time.perf_counter()-t0:.1f} s "
        f"loss {float(m['loss']):.4f}",
        flush=True,
    )
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            state, m = step(state, batch, gt, pack, jax.random.PRNGKey(2))
            _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / 3
        print(f"train step: {dt*1000:.1f} ms -> {8/dt:.2f} scenes/s", flush=True)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "xla",
        remat=not (len(sys.argv) > 2 and sys.argv[2] == "noremat"),
    )
