"""Matcher + criterion vs. a numpy brute-force of the reference algorithm."""
import numpy as np
import jax.numpy as jnp

from unidet3d_tpu.losses.criterion import (
    SceneGT,
    criterion,
    layer_loss_scene,
    match_scene,
)

RNG = np.random.RandomState(42)
NEG_INF = -1e9


def _np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _np_aa_diou(pred, tgt):
    """Corner-format DIoU loss, numpy, broadcasting."""
    lt = np.maximum(pred[..., :3], tgt[..., :3])
    rb = np.minimum(pred[..., 3:], tgt[..., 3:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1] * wh[..., 2]
    v1 = np.prod(pred[..., 3:] - pred[..., :3], axis=-1)
    v2 = np.prod(tgt[..., 3:] - tgt[..., :3], axis=-1)
    iou = inter / np.maximum(v1 + v2 - inter, 1e-8)
    pc = (pred[..., :3] + pred[..., 3:]) / 2
    tc = (tgt[..., :3] + tgt[..., 3:]) / 2
    r2 = ((pc - tc) ** 2).sum(-1)
    mins = np.minimum(pred[..., :3], tgt[..., :3])
    maxs = np.maximum(pred[..., 3:], tgt[..., 3:])
    c2 = ((maxs - mins) ** 2).sum(-1)
    return 1 - iou + r2 / np.maximum(c2, 1e-8)


def _to_corner(b):
    return np.concatenate([b[..., :3] - b[..., 3:6] / 2, b[..., :3] + b[..., 3:6] / 2], -1)


def _reference_match_and_loss(logits, boxes, labels, gt_boxes, qmask, topk, now=0.1):
    """Direct numpy port of reference UniMatcher + get_layer_loss (one scene,
    axis-aligned)."""
    q, nc1 = logits.shape
    g = len(labels)
    scores = _np_softmax(logits)
    cls_cost = -scores[:, labels]
    bbox_cost = _np_aa_diou(
        _to_corner(boxes)[:, None, :], _to_corner(gt_boxes)[None, :, :]
    )
    cost = 0.5 * cls_cost + 2.0 * bbox_cost
    cost = np.where(qmask.T, cost, 1e8)
    pairs = []
    for j in range(g):
        col = np.sort(cost[:, j])
        thresh = col[topk]
        for i in range(q):
            if cost[i, j] < thresh:
                pairs.append((i, j))
    pairs.sort()  # row-major like argwhere
    cls_target = np.full(q, nc1 - 1)
    for i, j in pairs:
        cls_target[i] = labels[j]
    w = np.where(cls_target == nc1 - 1, now, 1.0)
    logp = np.log(_np_softmax(logits))
    nll = -logp[np.arange(q), cls_target]
    cls_loss = (w * nll).sum() / w.sum()
    if pairs:
        bl = np.mean(
            [
                _np_aa_diou(_to_corner(boxes[i]), _to_corner(gt_boxes[j]))
                for i, j in pairs
            ]
        )
    else:
        bl = 0.0
    return set(pairs), cls_loss, bl


def _make_scene(q=8, g=3, nc=4, q_cap=12, g_cap=5):
    logits = RNG.randn(q, nc + 1).astype(np.float32)
    centers = RNG.rand(q, 3).astype(np.float32) * 4
    sizes = 0.5 + RNG.rand(q, 3).astype(np.float32)
    boxes = np.concatenate([centers, sizes], 1)
    labels = RNG.randint(0, nc, g)
    gcent = RNG.rand(g, 3).astype(np.float32) * 4
    gsize = 0.5 + RNG.rand(g, 3).astype(np.float32)
    gt_boxes = np.concatenate([gcent, gsize], 1)
    qmask = RNG.rand(g, q) > 0.3

    # Padded versions.
    logits_p = np.full((q_cap, nc + 1), NEG_INF, np.float32)
    logits_p[:q] = logits
    boxes_p = np.zeros((q_cap, 7), np.float32)
    boxes_p[:q, :6] = boxes
    qvalid = np.arange(q_cap) < q
    labels_p = np.zeros(g_cap, np.int32)
    labels_p[:g] = labels
    gt_boxes_p = np.zeros((g_cap, 7), np.float32)
    gt_boxes_p[:g, :6] = gt_boxes
    gvalid = np.arange(g_cap) < g
    qmask_p = np.zeros((g_cap, q_cap), bool)
    qmask_p[:g, :q] = qmask
    return (
        (logits, boxes, labels, gt_boxes, qmask),
        (logits_p, boxes_p, labels_p, gt_boxes_p, qmask_p, qvalid, gvalid),
    )


def test_matcher_matches_reference():
    (logits, boxes, labels, gt_boxes, qmask), padded = _make_scene()
    logits_p, boxes_p, labels_p, gt_boxes_p, qmask_p, qvalid, gvalid = padded
    topk = 3
    ref_pairs, _, _ = _reference_match_and_loss(
        logits, boxes, labels, gt_boxes, qmask, topk
    )
    gt = SceneGT(
        labels=jnp.array(labels_p),
        boxes=jnp.array(gt_boxes_p),
        valid=jnp.array(gvalid),
        query_masks=jnp.array(qmask_p),
    )
    m = match_scene(
        jnp.array(logits_p),
        jnp.array(boxes_p),
        jnp.array(qvalid),
        gt,
        jnp.array(False),
        jnp.array(topk),
    )
    got = {
        (int(m.pair_q[j, k]), j)
        for j in range(5)
        for k in range(6)
        if bool(m.pair_valid[j, k])
    }
    assert got == ref_pairs


def test_layer_loss_matches_reference():
    (logits, boxes, labels, gt_boxes, qmask), padded = _make_scene()
    logits_p, boxes_p, labels_p, gt_boxes_p, qmask_p, qvalid, gvalid = padded
    topk = 3
    _, ref_cls, ref_bbox = _reference_match_and_loss(
        logits, boxes, labels, gt_boxes, qmask, topk
    )
    gt = SceneGT(
        labels=jnp.array(labels_p),
        boxes=jnp.array(gt_boxes_p),
        valid=jnp.array(gvalid),
        query_masks=jnp.array(qmask_p),
    )
    cls_l, bbox_sum, n_pairs = layer_loss_scene(
        jnp.array(logits_p),
        jnp.array(boxes_p),
        jnp.array(qvalid),
        gt,
        jnp.array(False),
        jnp.array(topk),
        0.1,
    )
    np.testing.assert_allclose(float(cls_l), ref_cls, rtol=1e-4)
    np.testing.assert_allclose(
        float(bbox_sum) / max(float(n_pairs), 1), ref_bbox, rtol=1e-4
    )


def test_criterion_batched_runs():
    b, layers, q_cap, g_cap, nc = 2, 3, 12, 5, 4
    scenes = [_make_scene() for _ in range(b)]
    cls_logits = jnp.stack(
        [jnp.array(np.stack([s[1][0] for s in scenes])) for _ in range(layers)]
    )
    boxes = jnp.stack(
        [jnp.array(np.stack([s[1][1] for s in scenes])) for _ in range(layers)]
    )
    gt = SceneGT(
        labels=jnp.array(np.stack([s[1][2] for s in scenes])),
        boxes=jnp.array(np.stack([s[1][3] for s in scenes])),
        valid=jnp.array(np.stack([s[1][6] for s in scenes])),
        query_masks=jnp.array(np.stack([s[1][4] for s in scenes])),
    )
    qvalid = jnp.array(np.stack([s[1][5] for s in scenes]))
    loss = criterion(
        cls_logits,
        boxes,
        qvalid,
        gt,
        rotated=jnp.zeros(b, bool),
        topk=jnp.full(b, 3),
        dataset_weights=jnp.ones(b),
    )
    assert np.isfinite(float(loss))
    # Per-layer mean losses match the manual scene references summed.
    refs = []
    for s in scenes:
        logits, bx, lb, gb, qm = s[0]
        _, cl, bl = _reference_match_and_loss(logits, bx, lb, gb, qm, 3)
        refs.append((cl, bl))
    expected_layer = 0.5 * np.mean([r[0] for r in refs]) + 1.0 * np.mean(
        [r[1] for r in refs]
    )
    np.testing.assert_allclose(float(loss), layers * expected_layer, rtol=1e-4)
