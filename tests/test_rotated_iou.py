"""Tests for the differentiable rotated IoU (polygon clipping) ops."""
import numpy as np
import jax
import jax.numpy as jnp

from unidet3d_tpu.ops.rotated_iou import (
    diff_diou_rotated_3d,
    rotated_intersection_area_2d,
    rotated_iou_3d,
)
from unidet3d_tpu.losses.iou_losses import (
    axis_aligned_diou_loss,
    rotated_diou_3d_loss,
)
from unidet3d_tpu.core.boxes import boxes_to_corner_format


def test_identical_boxes_area():
    b = jnp.array([1.0, 2.0, 3.0, 4.0, 0.3])
    area = rotated_intersection_area_2d(b, b)
    np.testing.assert_allclose(area, 12.0, rtol=1e-5)


def test_disjoint_boxes_area():
    b1 = jnp.array([0.0, 0.0, 1.0, 1.0, 0.0])
    b2 = jnp.array([10.0, 0.0, 1.0, 1.0, 0.5])
    np.testing.assert_allclose(rotated_intersection_area_2d(b1, b2), 0.0, atol=1e-7)


def test_axis_aligned_overlap_area():
    # Two unit squares offset by 0.5 in x: overlap = 0.5.
    b1 = jnp.array([0.0, 0.0, 1.0, 1.0, 0.0])
    b2 = jnp.array([0.5, 0.0, 1.0, 1.0, 0.0])
    np.testing.assert_allclose(
        rotated_intersection_area_2d(b1, b2), 0.5, rtol=1e-5
    )


def test_crossed_squares_45deg():
    # Unit square and the same square rotated by 45 degrees, same center.
    # Known intersection: regular octagon with area 2*(sqrt(2)-1) ≈ 0.8284.
    b1 = jnp.array([0.0, 0.0, 1.0, 1.0, 0.0])
    b2 = jnp.array([0.0, 0.0, 1.0, 1.0, np.pi / 4])
    np.testing.assert_allclose(
        rotated_intersection_area_2d(b1, b2), 2 * (np.sqrt(2) - 1), rtol=1e-4
    )


def test_contained_box():
    b1 = jnp.array([0.0, 0.0, 4.0, 4.0, 0.2])
    b2 = jnp.array([0.0, 0.0, 1.0, 1.0, 1.0])
    np.testing.assert_allclose(rotated_intersection_area_2d(b1, b2), 1.0, rtol=1e-5)


def test_rotated_iou_3d_identical():
    b = jnp.array([[1.0, 2.0, 3.0, 2.0, 3.0, 4.0, 0.7]])
    np.testing.assert_allclose(rotated_iou_3d(b, b), [1.0], rtol=1e-5)


def test_rotated_iou_3d_axis_aligned_matches_aabb():
    b1 = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b2 = jnp.array([[1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 0.0]])
    iou = rotated_iou_3d(b1, b2)
    np.testing.assert_allclose(iou, [1.0 / 15.0], rtol=1e-4)


def test_diou_identical_is_iou():
    b = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.5]])
    np.testing.assert_allclose(diff_diou_rotated_3d(b, b), [1.0], rtol=1e-5)
    np.testing.assert_allclose(rotated_diou_3d_loss(b, b), [0.0], atol=1e-5)


def test_axis_aligned_diou_loss_zero_for_identical():
    b = boxes_to_corner_format(jnp.array([[1.0, 2.0, 3.0, 2.0, 2.0, 2.0]]))
    np.testing.assert_allclose(axis_aligned_diou_loss(b, b), [0.0], atol=1e-6)


def test_axis_aligned_diou_loss_disjoint():
    b1 = boxes_to_corner_format(jnp.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0]]))
    b2 = boxes_to_corner_format(jnp.array([[3.0, 0.0, 0.0, 1.0, 1.0, 1.0]]))
    # iou = 0; r2 = 9; enclosing c2 = 4^2 + 1 + 1 = 18 -> loss = 1 + 0.5
    np.testing.assert_allclose(axis_aligned_diou_loss(b1, b2), [1.5], rtol=1e-5)


def test_rotated_iou_differentiable():
    def f(x):
        b1 = jnp.array([0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]).at[0].set(x)
        b2 = jnp.array([[0.5, 0.2, 0.1, 2.0, 2.0, 2.0, 0.3]])
        return jnp.sum(rotated_diou_3d_loss(b1[None], b2))

    g = jax.grad(f)(0.0)
    assert np.isfinite(float(g))
    assert abs(float(g)) > 1e-6  # gradient actually flows


def test_pairwise_batched_shapes():
    q, g = 5, 3
    b1 = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]), (q, g, 1))
    b2 = jnp.tile(jnp.array([0.2, 0.0, 0.0, 1.0, 1.0, 1.0, 0.1]), (q, g, 1))
    out = diff_diou_rotated_3d(b1, b2)
    assert out.shape == (q, g)
    assert bool(jnp.all(jnp.isfinite(out)))
