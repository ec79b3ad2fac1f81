"""Recorded-activation fixtures pin the forward's NUMERICS across rounds.

Two tiers (tools/record_activations.py):
  * seeded fixture (committed): seeded-init weights + deterministic probe
    scene -> the full eval forward's intermediates must match bit-for-bit
    (up to float tolerance) what round 5 recorded. Any semantic change to
    voxelization, the U-Net, pooling, or the decoder trips this.
  * real-checkpoint fixture (absent until `unidet3d.pth` lands): the same
    machinery, recorded once with converted released weights — numeric
    ground truth for checkpoint parity WITHOUT needing the .pth again
    (VERDICT r4 missing #1 follow-through).
"""
import os

import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
SEEDED = os.path.join(FIXTURE_DIR, "activations_seed0.npz")
REAL = os.path.join(FIXTURE_DIR, "real_ckpt_activations.npz")


def _record(seed=0, n_points=4096, params_dir=None):
    import jax

    from unidet3d_tpu.core.config import default_config
    from unidet3d_tpu.core.experiment import DatasetSpec, ExperimentConfig
    from unidet3d_tpu.tools.record_activations import (
        build_fixture_inputs,
        record_activations,
    )
    from unidet3d_tpu.train.loop import build_model

    exp = ExperimentConfig(
        model=default_config(
            max_points=n_points, voxel_capacity=n_points, max_superpoints=512
        ),
        datasets=(DatasetSpec(name="scannet", data_root="."),),
    )
    model, _ = build_model(exp)
    batch_np, pack_np = build_fixture_inputs(exp.model, seed=seed,
                                             n_points=n_points)
    batch = jax.tree_util.tree_map(jax.numpy.asarray, batch_np)
    pack = jax.tree_util.tree_map(jax.numpy.asarray, pack_np)
    rngs = {"params": jax.random.PRNGKey(seed),
            "queries": jax.random.PRNGKey(seed + 1)}
    if params_dir is None:
        variables = jax.jit(lambda: model.init(rngs, batch, False, pack))()
    else:
        from unidet3d_tpu.train.checkpoint import restore_params

        template = jax.eval_shape(lambda: model.init(rngs, batch, False, pack))
        variables = restore_params(params_dir, template)
    return record_activations(model, variables, batch, pack)


def _compare(rec: dict, fixture_path: str):
    fx = np.load(fixture_path)
    assert sorted(fx.files) == sorted(rec.keys()), (
        "probe set changed — regenerate the fixture INTENTIONALLY via "
        "python -m unidet3d_tpu.tools.record_activations "
        f"{fixture_path} --seed 0\n"
        f"fixture: {sorted(fx.files)[:8]}...\nrecorded: "
        f"{sorted(rec.keys())[:8]}..."
    )
    for name in fx.files:
        np.testing.assert_allclose(
            rec[name], fx[name], rtol=2e-4, atol=2e-4,
            err_msg=f"probe {name} drifted from the recorded fixture",
        )


@pytest.mark.slow
def test_seeded_fixture_pins_forward():
    if not os.path.exists(SEEDED):
        pytest.fail(
            "committed fixture missing; generate with\n"
            "  python -m unidet3d_tpu.tools.record_activations "
            f"{SEEDED} --seed 0"
        )
    _compare(_record(seed=0), SEEDED)


@pytest.mark.slow
def test_real_ckpt_fixture_if_present():
    """Runs only once someone records with converted unidet3d.pth weights:
    record_activations --params <converted> + copy the params dir to
    tests/fixtures/real_ckpt_params. Until then: skipped, not failed."""
    params_dir = os.path.join(FIXTURE_DIR, "real_ckpt_params")
    if not (os.path.exists(REAL) and os.path.isdir(params_dir)):
        pytest.skip("released-checkpoint fixture not recorded yet")
    _compare(_record(seed=0, params_dir=params_dir), REAL)
