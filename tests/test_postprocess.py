"""NMS + top-k selection + superpoint trimming vs brute-force references."""
import numpy as np
import jax.numpy as jnp

from unidet3d_tpu.core.boxes import boxes_to_corner_format
from unidet3d_tpu.ops.nms import greedy_nms, pairwise_iou_aa, pairwise_iou_rotated
from unidet3d_tpu.models.postprocess import (
    select_topk_instances,
    trim_boxes_by_superpoints,
)
from tests.test_detector import small_config

RNG = np.random.RandomState(11)


def _np_aa_iou_matrix(boxes):
    c = np.asarray(boxes_to_corner_format(jnp.asarray(boxes[:, :6])))
    lt = np.maximum(c[:, None, :3], c[None, :, :3])
    rb = np.minimum(c[:, None, 3:], c[None, :, 3:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh.prod(-1)
    vol = np.clip(c[:, 3:] - c[:, :3], 0, None).prod(-1)
    return inter / np.maximum(vol[:, None] + vol[None, :] - inter, 1e-8)


def _brute_greedy_nms(iou, scores, labels, valid, thr):
    order = np.argsort(-np.where(valid, scores, -1))
    keep = np.zeros(len(scores), bool)
    for i in order:
        if not valid[i]:
            continue
        ok = True
        for j in range(len(scores)):
            if keep[j] and labels[j] == labels[i] and iou[i, j] > thr:
                ok = False
                break
        if ok:
            keep[i] = True
    return keep


def test_greedy_nms_matches_bruteforce():
    n = 60
    centers = RNG.rand(n, 3) * 3
    sizes = 0.5 + RNG.rand(n, 3)
    boxes = np.concatenate([centers, sizes, np.zeros((n, 1))], 1).astype(
        np.float32
    )
    scores = RNG.rand(n).astype(np.float32)
    labels = RNG.randint(0, 3, n)
    valid = RNG.rand(n) > 0.1
    iou = np.asarray(pairwise_iou_aa(jnp.asarray(boxes)))
    keep = np.asarray(
        greedy_nms(
            jnp.asarray(iou), jnp.asarray(scores), jnp.asarray(labels),
            jnp.asarray(valid), 0.3,
        )
    )
    expected = _brute_greedy_nms(iou, scores, labels, valid, 0.3)
    np.testing.assert_array_equal(keep, expected)


def test_pairwise_rotated_iou_chunking():
    n = 10
    boxes = np.concatenate(
        [RNG.rand(n, 3) * 2, 0.5 + RNG.rand(n, 3), RNG.rand(n, 1)], 1
    ).astype(np.float32)
    full = np.asarray(pairwise_iou_rotated(jnp.asarray(boxes), chunk=4))
    assert full.shape == (n, n)
    np.testing.assert_allclose(np.diag(full), 1.0, rtol=1e-4)
    # Zero-yaw boxes must agree with the axis-aligned matrix.
    boxes0 = boxes.copy()
    boxes0[:, 6] = 0
    r = np.asarray(pairwise_iou_rotated(jnp.asarray(boxes0), chunk=4))
    a = _np_aa_iou_matrix(boxes0)
    np.testing.assert_allclose(r, a, rtol=1e-3, atol=1e-4)


def test_select_topk():
    q, nc = 6, 3
    logits = np.full((q, nc + 1), -1e9, np.float32)
    logits[:4, :nc] = RNG.randn(4, nc)
    logits[:4, nc] = RNG.randn(4)  # no_obj col
    boxes = RNG.rand(q, 7).astype(np.float32)
    qvalid = np.arange(q) < 4
    sel_boxes, labels, scores = select_topk_instances(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(qvalid), k=8
    )
    import jax

    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))[:4, :nc]
    flat = probs.reshape(-1)
    order = np.argsort(-flat)[:8]
    np.testing.assert_allclose(
        np.asarray(scores), flat[order], rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(labels), order % nc)


def test_trim_boxes_by_superpoints():
    """Points of superpoint 0 fill a cube; an oversized box must shrink to
    the points it contains after the superpoint vote."""
    cfg = small_config(max_superpoints=8)
    p = 200
    pts = RNG.rand(p, 3).astype(np.float32)  # inside unit cube
    sp = np.zeros(p, np.int32)
    sp[100:] = 1
    pts[100:] += 5.0  # superpoint 1 far away
    boxes = np.zeros((4, 7), np.float32)
    boxes[0] = [0.5, 0.5, 0.5, 4.0, 4.0, 4.0, 0]  # oversized around sp 0
    keep = np.zeros(4, bool)
    keep[0] = True
    new_boxes, new_keep = trim_boxes_by_superpoints(
        cfg,
        jnp.asarray(boxes),
        jnp.asarray(keep),
        jnp.asarray(pts),
        jnp.ones(p, bool),
        jnp.asarray(sp),
        chunk=2,
    )
    nb = np.asarray(new_boxes[0])
    assert bool(new_keep[0])
    # Refit to the contained points (sp 0 cube only; sp1 far outside).
    sub = pts[:100]
    np.testing.assert_allclose(
        nb[:3], (sub.max(0) + sub.min(0)) / 2, atol=1e-5
    )
    np.testing.assert_allclose(nb[3:6], sub.max(0) - sub.min(0), atol=1e-5)
