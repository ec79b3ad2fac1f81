"""Persistent XLA compilation cache for the product CLIs.

Eval compiles one step per (point bucket x superpoint rung) pair actually
seen — up to ~20 variants (data/loader.py) — and a cold start would pay the
full multi-minute compile bill on every fresh `tools/test.py` run
(VERDICT r4 weak #7). bench.py has wired this cache since round 2; this
makes train/test/evaluate use the same one, so a second run reuses every
compiled executable.
"""
from __future__ import annotations

import logging
import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `cache_dir`
    (default: $UNIDET3D_CACHE_DIR, else <repo>/.jax_cache). Idempotent;
    returns the directory used."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("UNIDET3D_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    logging.getLogger("unidet3d_tpu").info(
        "persistent compilation cache: %s", cache_dir
    )
    return cache_dir
