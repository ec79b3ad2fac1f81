"""Probe: where does SUSTAINED eval time go on the relay?

Per bucket group: (a) device_put+block of the wire buffer, (b) step with a
device-resident buffer, (c) the serialized asarray+step+sync pattern the
round-4 sustained loop used, (d) a pipelined loop (producer thread does
device_put, consumer syncs with lag 2). Prints one line per measurement.
"""
import os
import sys
import time
import threading
import queue

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench  # noqa: E402  (wires the persistent compile cache)


def main():
    from unidet3d_tpu.core.config import default_config
    from unidet3d_tpu.data.batcher import build_packs
    from unidet3d_tpu.parallel.train_step import make_eval_step_wire
    import __graft_entry__ as ge

    cfg = default_config()
    variables = bench._tiny_init(cfg)
    counts = np.sort(bench._scene_mix(24))[::-1]
    groups = [counts[i : i + 4] for i in range(0, 24, 4)]

    steps, staged = {}, []
    for gi, grp in enumerate(groups):
        cfg_b = bench._bucket_for(cfg, grp)
        batch_np = bench._make_group_inputs(cfg_b, grp, seed0=11 + gi)
        packs = build_packs(batch_np.vox_src, batch_np.valid, cfg_b,
                            n_shards=1, pack_rel=True)
        key = (cfg_b.max_points, cfg_b.max_superpoints)
        buf, spec = bench._wire_group(batch_np, packs,
                                      steps[key][1] if key in steps else None)
        if key not in steps:
            steps[key] = (make_eval_step_wire(ge._build(cfg_b), cfg_b, spec),
                          spec)
        staged.append((key, steps[key][0], batch_np, cfg_b, buf))

    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    # Compile + warm every step once.
    for key, step, _, _, buf in staged[:1] + [
        s for s in staged if s[0] != staged[0][0]
    ][:2]:
        out = step(params, bstats, jnp.asarray(buf))
        float(jnp.sum(out[0]))

    seen = set()
    for key, step, _, _, buf in staged:
        if key in seen:
            continue
        seen.add(key)
        mb = buf.nbytes / 1e6
        # (a) device_put + block
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(buf)
            d.block_until_ready()
            ts.append(time.perf_counter() - t0)
        t_put = min(ts)
        # (b) step with device-resident input
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = step(params, bstats, d)
            float(jnp.sum(out[0]))
            ts.append(time.perf_counter() - t0)
        t_dev = min(ts)
        # (c) serialized asarray+step+sync
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = step(params, bstats, jnp.asarray(buf))
            float(jnp.sum(out[0]))
            ts.append(time.perf_counter() - t0)
        t_ser = min(ts)
        print(
            f"bucket {key}: buf {mb:6.1f} MB  put+block {t_put*1e3:7.1f} ms "
            f"({mb/max(t_put,1e-9):6.0f} MB/s)  step(dev) {t_dev*1e3:7.1f} ms"
            f"  serial {t_ser*1e3:7.1f} ms",
            flush=True,
        )

    # (d) pipelined sustained: producer thread device_puts, consumer lag-2.
    def run_pipelined(lag):
        q = queue.Queue(maxsize=3)

        def producer():
            for key, step, batch_np, cfg_b, _ in staged:
                packs = build_packs(batch_np.vox_src, batch_np.valid, cfg_b,
                                    n_shards=1, pack_rel=True)
                buf, _ = bench._wire_group(batch_np, packs, steps[key][1])
                q.put((step, jax.device_put(buf)))
            q.put(None)

        th = threading.Thread(target=producer, daemon=True)
        t0 = time.perf_counter()
        th.start()
        inflight = []
        scenes = 0
        while True:
            item = q.get()
            if item is None:
                break
            step, dbuf = item
            inflight.append(step(params, bstats, dbuf))
            if len(inflight) > lag:
                float(jnp.sum(inflight.pop(0)[0]))
            scenes += 4
        for out in inflight:
            float(jnp.sum(out[0]))
        dt = time.perf_counter() - t0
        print(f"pipelined lag={lag}: {scenes} scenes in {dt:.2f} s = "
              f"{scenes/dt:.2f} scenes/s", flush=True)

    # serialized baseline for the same mix (round-4 pattern, threads=1 host)
    def run_serial():
        t0 = time.perf_counter()
        scenes = 0
        for key, step, batch_np, cfg_b, _ in staged:
            packs = build_packs(batch_np.vox_src, batch_np.valid, cfg_b,
                                n_shards=1, pack_rel=True)
            buf, _ = bench._wire_group(batch_np, packs, steps[key][1])
            out = step(params, bstats, jnp.asarray(buf))
            float(jnp.sum(out[0]))
            scenes += 4
        dt = time.perf_counter() - t0
        print(f"serial: {scenes} scenes in {dt:.2f} s = "
              f"{scenes/dt:.2f} scenes/s", flush=True)

    run_serial()
    run_pipelined(0)
    run_pipelined(2)
    run_pipelined(2)


if __name__ == "__main__":
    main()
