"""Worker for tests/test_distributed.py::test_two_process_eval_gather.

One process of a REAL two-process `jax.distributed` eval run on CPU
devices: joins the cluster, restores nothing (deterministic seeded init —
both processes produce identical params), then calls the PRODUCTION
`train.loop.evaluate` on a shared on-disk dataset. evaluate() internally
takes this process's strided scene shard (EvalLoader shard_idx/shard_count)
and all-gathers metric results before compute()
(train/metric.py gather_across_processes) — the path under test.

Prints `RESULTS <pid> <json>`; the parent asserts both processes print the
IDENTICAL, COMPLETE union (equal to a single-process evaluate on the same
data).

Usage: python -m tests._dist_eval_worker <process_id> <port> <data_root>
"""
import json
import os
import sys


def main():
    pid, port, data_root = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2

    from tests.test_distributed import eval_exp, eval_state

    exp = eval_exp(data_root)
    state, model, table = eval_state(exp)

    from unidet3d_tpu.train.loop import evaluate

    results = evaluate(exp, state, model, table, logger=None)
    digest = {
        name: {k: round(float(v), 6) for k, v in sorted(res.items())}
        for name, res in sorted(results.items())
    }
    print(f"RESULTS {pid} {json.dumps(digest, sort_keys=True)}", flush=True)


if __name__ == "__main__":
    main()
