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


def test_box_voting_semantics():
    """Merge-NMS: keep set/scores/classes unchanged; each kept box becomes
    the score*IoU-weighted mean of its overlapping same-class candidates."""
    boxes = np.array([
        [10, 10, 50, 50],     # kept (class 0)
        [12, 12, 52, 52],     # suppressed by box 0, votes for it
        [200, 200, 240, 240], # kept (class 1), isolated
        [11, 11, 51, 51],     # class 1: overlaps box 0 spatially, must NOT vote
    ], np.float32)
    scores = np.array([0.9, 0.6, 0.8, 0.5], np.float32)
    classes = np.array([0, 0, 1, 1], np.int32)
    mask = np.ones(4, bool)

    plain = nms_ops.nms_single(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(mask), max_detections=4, iou_threshold=0.5,
        score_threshold=0.05, use_pallas=False)
    voted = nms_ops.nms_single(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.asarray(mask), max_detections=4, iou_threshold=0.5,
        score_threshold=0.05, use_pallas=False, box_voting=True)

    np.testing.assert_array_equal(np.asarray(plain.valid), np.asarray(voted.valid))
    np.testing.assert_array_equal(np.asarray(plain.scores), np.asarray(voted.scores))
    np.testing.assert_array_equal(np.asarray(plain.classes), np.asarray(voted.classes))

    v = np.asarray(voted.valid)
    vb = np.asarray(voted.boxes)[v]
    pb = np.asarray(plain.boxes)[v]
    # kept class-0 box moved toward its suppressed voter (weighted mean
    # strictly between the two source boxes on every coordinate)
    i0 = int(np.argmax(np.asarray(voted.scores)))
    assert np.all(vb[i0] > boxes[0]) and np.all(vb[i0] < boxes[1])
    # hand-computed expectation: weights s_j * iou(0, j)
    def iou(a, b):
        x1, y1 = max(a[0], b[0]), max(a[1], b[1])
        x2, y2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        ua = (a[2]-a[0])*(a[3]-a[1]) + (b[2]-b[0])*(b[3]-b[1]) - inter
        return inter / ua
    w0, w1 = 0.9 * 1.0, 0.6 * iou(boxes[0], boxes[1])
    expect = (w0 * boxes[0] + w1 * boxes[1]) / (w0 + w1)
    np.testing.assert_allclose(vb[i0], expect, rtol=1e-4)
    # isolated class-1 box is unchanged (class-3 overlap was cross-class,
    # box 3 itself was suppressed... box 3 is class 1 overlapping box 0
    # only spatially; the class-1 kept box at (200,200) has no voters)
    i1 = int(np.argmin(np.abs(np.asarray(voted.scores) - 0.8)))
    np.testing.assert_allclose(vb[i1], boxes[2], rtol=1e-5)
    # class isolation: the class-0 voted box ignored the class-1 box 3
    assert not np.allclose(vb[i0], (0.9*boxes[0]+0.6*iou(boxes[0],boxes[1])*boxes[1]+0.5*iou(boxes[0],boxes[3])*boxes[3])/(0.9+0.6*iou(boxes[0],boxes[1])+0.5*iou(boxes[0],boxes[3])))


def test_capacity_larger_than_anchor_count_pads():
    """max_detections > #anchors must clamp the top_k pool and pad outputs
    back to capacity (tiny input resolutions: 96px = 189 anchors < the
    default 300-slot capacity — previously a top_k ValueError)."""
    rng = np.random.default_rng(0)
    boxes, scores, classes = _random_problem(rng, n=20)
    det = nms_ops.nms_single(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        jnp.ones((20,), bool), max_detections=64, iou_threshold=0.5,
        score_threshold=0.3,
    )
    assert det.boxes.shape == (64, 4) and det.valid.shape == (64,)
    v = np.asarray(det.valid)
    assert v.sum() <= 20 and not v[20:].any()
    # survivors match the oracle exactly despite the padding
    keep = greedy_nms_oracle(boxes, scores, classes, 0.5, 0.3)
    got = set(map(tuple, np.asarray(det.boxes)[v].round(3)))
    want = set(map(tuple, boxes[keep].round(3)))
    assert got == want
