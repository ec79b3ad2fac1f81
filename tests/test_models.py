"""Smoke + invariance tests for the UNet backbone and decoder modules."""
import numpy as np
import jax
import jax.numpy as jnp

from unidet3d_tpu.core.class_table import build_class_table
from unidet3d_tpu.models.decoder import UniDecoder, decode_boxes
from unidet3d_tpu.models.unet import UNetBackbone
from unidet3d_tpu.ops.gridpack import build_gridpack_device
from unidet3d_tpu.ops.voxelize import voxelize

RNG = np.random.RandomState(7)


import pytest as _pytest

pytestmark = _pytest.mark.slow


def _make_grid(n=200, extent=16, batch=2, capacity=256):
    coords = RNG.randint(0, extent, size=(n, 3))
    b = RNG.randint(0, batch, size=(n, 1))
    bxyz = np.concatenate([b, coords], axis=1).astype(np.int32)
    feats = RNG.randn(n, 6).astype(np.float32)
    grid, vf = voxelize(
        jnp.array(bxyz), jnp.ones(n, bool), capacity, jnp.array(feats)
    )
    pack, _ = build_gridpack_device(
        jnp.array(bxyz), jnp.ones(n, bool), [capacity, 128, 64, 32, 16]
    )
    return grid, vf, pack


def test_unet_forward_shapes_and_padding():
    grid, vf, pack = _make_grid()
    model = UNetBackbone(num_planes=(8, 16, 24, 32, 40))
    params = model.init(jax.random.PRNGKey(0), vf, pack, False)
    out = model.apply(params, vf, pack, False)
    assert out.shape == (256, 8)
    nv = int(grid.n_voxels)
    out = np.asarray(out)
    assert np.isfinite(out[:nv]).all()
    np.testing.assert_allclose(out[nv:], 0.0, atol=1e-6)


def test_unet_train_mode_updates_batch_stats():
    grid, vf, pack = _make_grid()
    model = UNetBackbone(num_planes=(8, 16, 24, 32, 40))
    variables = model.init(jax.random.PRNGKey(0), vf, pack, True)
    out, mutated = model.apply(
        variables, vf, pack, True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated
    # Running stats must have moved away from init.
    leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])[0]
    assert np.abs(np.asarray(leaf)).max() > 0


def _decoder_setup(b=2, q=16, cin=8):
    table = build_class_table([["a", "b", "c"], ["b", "d"]])
    model = UniDecoder(
        num_layers=2,
        d_model=32,
        num_heads=4,
        hidden_dim=64,
        dropout=0.0,
        activation="gelu",
        cls_gather=table.gather,
        angles=(False, True),
    )
    queries = jnp.array(RNG.randn(b, q, cin).astype(np.float32))
    mask = jnp.array(RNG.rand(b, q) > 0.2)
    centers = jnp.array(RNG.randn(b, q, 3).astype(np.float32))
    ds_ids = jnp.array([0, 1], dtype=jnp.int32)
    return table, model, queries, mask, centers, ds_ids


def test_decoder_output_shapes():
    table, model, queries, mask, centers, ds_ids = _decoder_setup()
    params = model.init(jax.random.PRNGKey(1), queries, mask, centers, ds_ids, False)
    out = model.apply(params, queries, mask, centers, ds_ids, False)
    # L = num_layers + 1 output sets.
    assert out.cls_logits.shape == (3, 2, 16, table.nc_max + 1)
    assert out.boxes.shape == (3, 2, 16, 7)
    # Dataset 0 (3 classes): columns 0..2 valid + no_obj at nc_max; col 3.. -inf pad.
    cl = np.asarray(out.cls_logits[0, 0])
    assert (cl[:, 3 : table.nc_max] <= -1e8).all()
    assert np.isfinite(cl[:, :3]).all() and np.isfinite(cl[:, table.nc_max]).all()
    # Dataset 0 is axis-aligned: yaw all zero. Dataset 1 rotated: yaw varies.
    boxes = np.asarray(out.boxes[-1])
    np.testing.assert_allclose(boxes[0, :, 6], 0.0, atol=1e-6)
    assert np.abs(boxes[1, :, 6]).max() > 1e-6
    # Sizes positive.
    assert (boxes[..., 3:6] > 0).all()


def test_decoder_padding_invariance():
    """Padded (masked) queries must not affect valid query outputs."""
    table, model, queries, mask, centers, ds_ids = _decoder_setup()
    params = model.init(jax.random.PRNGKey(1), queries, mask, centers, ds_ids, False)
    out1 = model.apply(params, queries, mask, centers, ds_ids, False)
    # Perturb features of masked-out queries.
    noise = jnp.array(RNG.randn(*queries.shape).astype(np.float32)) * 10
    queries2 = jnp.where(mask[..., None], queries, queries + noise)
    out2 = model.apply(params, queries2, mask, centers, ds_ids, False)
    m = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(out1.cls_logits)[:, m],
        np.asarray(out2.cls_logits)[:, m],
        atol=1e-4,
    )


def test_decode_boxes_rotated_branch():
    centers = jnp.zeros((1, 1, 3))
    pred = jnp.array([[[1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.0, 1.0]]])
    out_rot = decode_boxes(centers, pred, jnp.array([True]))
    q = np.exp(1.0)
    np.testing.assert_allclose(
        np.asarray(out_rot[0, 0]),
        [0, 0, 0, 4 / (1 + q), 4 * q / (1 + q), 2.0, 0.0],
        rtol=1e-5,
    )
    out_aa = decode_boxes(centers, pred, jnp.array([False]))
    np.testing.assert_allclose(
        np.asarray(out_aa[0, 0]), [0, 0, 0, 2, 2, 2, 0], rtol=1e-5
    )
