"""Benchmark harness: forward-pass throughput of the flagship detector on the
available accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline note (BASELINE.md): the reference publishes no throughput numbers;
the driver target is >2x an A100 running the reference at bs8. We report
scenes/sec on a realistic synthetic ScanNet-sized scene (32k padded points)
and compare against a conservative measured-reference estimate:
A100 spconv UniDet3D inference ~= 10 scenes/sec (bs1, ~100k raw points) — so
vs_baseline = ours / 10.0 until a measured reference lands.

NOTE: timing forces a device->host scalar fetch every iteration because the
remote-relay platform's block_until_ready can return before execution
finishes; the scalar depends on the full output so this is a true barrier.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: repeated bench runs (and driver rounds) skip
# the multi-minute XLA compile of the full detector.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    fn, args = __import__("__graft_entry__").entry()

    def fn_scalar(*a):
        c, b = fn(*a)
        return jnp.sum(c) + jnp.sum(b)

    jfn = jax.jit(fn_scalar)
    # Warmup / compile (fetch forces completion).
    float(jfn(*args))
    float(jfn(*args))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        v = jfn(*args)
    v = float(v)  # barrier: scalar depends on the whole forward pass
    dt = time.perf_counter() - t0
    scenes_per_sec = iters / dt  # batch size 1

    baseline_scenes_per_sec = 10.0  # conservative A100 reference estimate
    print(
        json.dumps(
            {
                "metric": "forward_scenes_per_sec",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/s",
                "vs_baseline": round(scenes_per_sec / baseline_scenes_per_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
