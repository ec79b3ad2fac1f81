"""Test config: force CPU with 8 virtual devices so sharding/collective tests
run without a real TPU slice (standard JAX trick, SURVEY.md §4c).

Note: the environment's sitecustomize force-registers the TPU PJRT plugin and
overrides JAX_PLATFORMS, so we must use jax.config after import. Set
UNIDET3D_TEST_TPU=1 to run the suite on the real chip instead.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not os.environ.get("UNIDET3D_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
# Unit tests compare against fp32 numpy brute force; keep matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")
