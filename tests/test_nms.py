import numpy as np
import pytest

import jax.numpy as jnp

from iqc_tpu.ops import nms as nms_ops


def greedy_nms_oracle(boxes, scores, classes, iou_thresh, score_thresh, class_aware=True):
    """Plain numpy greedy NMS (the semantics inside Ultralytics/torchvision)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    for i in order:
        if scores[i] <= score_thresh:
            continue
        ok = True
        for j in keep:
            if class_aware and classes[i] != classes[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / max(a1 + a2 - inter, 1e-9)
            if iou > iou_thresh:
                ok = False
                break
        if ok:
            keep.append(i)
    return keep


def _random_problem(rng, n=60, nc=5, size=200):
    cx = rng.uniform(20, size - 20, n)
    cy = rng.uniform(20, size - 20, n)
    w = rng.uniform(5, 60, n)
    h = rng.uniform(5, 60, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    classes = rng.integers(0, nc, n).astype(np.int32)
    return boxes, scores, classes


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("iterations", [16, None])
def test_nms_matches_oracle(seed, iterations):
    rng = np.random.default_rng(seed)
    boxes, scores, classes = _random_problem(rng)
    out = nms_ops.nms_single(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.ones(len(scores), dtype=bool),
        max_detections=60, iou_threshold=0.5, score_threshold=0.3,
        iterations=iterations,
    )
    got = set(
        tuple(np.round(np.asarray(out.boxes)[i], 3))
        for i in range(60) if bool(np.asarray(out.valid)[i])
    )
    keep = greedy_nms_oracle(boxes, scores, classes, 0.5, 0.3)
    want = set(tuple(np.round(boxes[i], 3)) for i in keep)
    assert got == want


def test_nms_capacity_and_ordering():
    rng = np.random.default_rng(9)
    boxes, scores, classes = _random_problem(rng, n=100)
    out = nms_ops.nms_single(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.ones(100, dtype=bool),
        max_detections=10, iou_threshold=0.5, score_threshold=0.0,
    )
    s = np.asarray(out.scores)
    v = np.asarray(out.valid)
    # valid slots compacted to the front, score-descending
    assert v[: v.sum()].all()
    assert not v[v.sum():].any()
    sv = s[: v.sum()]
    assert (np.diff(sv) <= 1e-6).all()


def test_dfl_decode_uniform_bins():
    reg_max = 16
    # logits strongly peaked at bin 4 -> distance 4
    logits = np.full((1, 4 * reg_max), -20.0, dtype=np.float32)
    for side in range(4):
        logits[0, side * reg_max + 4] = 20.0
    d = nms_ops.dfl_decode(jnp.asarray(logits), reg_max)
    np.testing.assert_allclose(np.asarray(d), 4.0, atol=1e-3)


def test_decode_boxes_geometry():
    anchors = jnp.asarray([[100.0, 80.0]])
    strides = jnp.asarray([8.0])
    reg_max = 16
    logits = np.full((1, 4 * reg_max), -20.0, dtype=np.float32)
    dists = [2, 3, 4, 5]  # l,t,r,b in stride units
    for side, dbin in enumerate(dists):
        logits[0, side * reg_max + dbin] = 20.0
    box = nms_ops.decode_boxes(jnp.asarray(logits)[None], anchors, strides, reg_max)
    x1, y1, x2, y2 = np.asarray(box)[0, 0]
    assert np.isclose(x1, 100 - 2 * 8, atol=0.1)
    assert np.isclose(y1, 80 - 3 * 8, atol=0.1)
    assert np.isclose(x2, 100 + 4 * 8, atol=0.1)
    assert np.isclose(y2, 80 + 5 * 8, atol=0.1)


def test_make_anchors():
    pts, strs = nms_ops.make_anchors([(2, 2), (1, 1)], [8, 16])
    assert pts.shape == (5, 2)
    np.testing.assert_allclose(np.asarray(pts[0]), [4.0, 4.0])
    np.testing.assert_allclose(np.asarray(pts[-1]), [8.0, 8.0])
    np.testing.assert_allclose(np.asarray(strs), [8, 8, 8, 8, 16])


def test_batched_nms_shapes():
    rng = np.random.default_rng(5)
    b, a, c = 3, 50, 5
    boxes = rng.uniform(0, 100, (b, a, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 20, (b, a, 2)).astype(np.float32)
    scores = rng.uniform(0, 1, (b, a, c)).astype(np.float32)
    out = nms_ops.batched_nms(jnp.asarray(boxes), jnp.asarray(scores), 20, 0.5, 0.25)
    assert out.boxes.shape == (b, 20, 4)
    assert out.valid.shape == (b, 20)
