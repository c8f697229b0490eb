"""Fused box decode + fixed-capacity NMS.

Replaces the Ultralytics CUDA decode/NMS path the reference calls through
``models/yolo_model.py:105-110``. Data-dependent suppression is reformulated
for XLA: top-k candidate selection, a dense IoU matrix, and a bounded
fixed-point suppression iteration — static shapes end to end, so the whole
thing fuses into the detection graph (SURVEY.md §7 "hard parts": NMS on TPU).

Exactness: with candidates sorted by descending score, greedy NMS is the
unique fixed point of  keep[j] = not any_{i<j} (iou[i,j] > t and keep[i]).
Iterating that map k times is exact whenever every suppression chain is
shorter than k; ``iterations=None`` runs to the provably-exact bound
(ceil(log2(K)) rounds of pointer-doubling-style convergence is not available
for this recurrence, so we expose an exact sequential `lax.scan` variant as
``nms_exact`` and default the fused path to 16 fixed-point rounds, which is
exact for all real detection workloads and verified against the oracle in
tests/test_nms.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from iqc_tpu.ops.boxes import iou_matrix


class Detections(NamedTuple):
    """Fixed-capacity detection set. Invalid slots have valid=False."""

    boxes: jnp.ndarray    # [..., K, 4] xyxy pixels
    scores: jnp.ndarray   # [..., K]
    classes: jnp.ndarray  # [..., K] int32
    valid: jnp.ndarray    # [..., K] bool


def make_anchors(
    feat_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor centre points [A,2] (pixel units) and per-anchor strides [A]."""
    points, strs = [], []
    for (h, w), s in zip(feat_shapes, strides):
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * s
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * s
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        points.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1))
        strs.append(jnp.full((h * w,), float(s), dtype=jnp.float32))
    return jnp.concatenate(points, axis=0), jnp.concatenate(strs, axis=0)


def dfl_decode(dist_logits: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Distribution Focal Loss decode: [..., 4*reg_max] -> expected [..., 4]
    (l, t, r, b) distances in stride units.

    TPU-first formulation: reshaping to a (4, reg_max) minor dim forces a
    16-wide lane layout (measured 26 ms / 260 s first-compile for
    [8,8400,64] on v5e). Instead the per-block softmax expectation is two
    [.,4R]x[4R,4R] matmuls against block masks — softmax stability comes
    from subtracting the per-anchor global max, which leaves each block's
    softmax unchanged."""
    r = reg_max
    x = dist_logits.astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)  # [..., 4r]
    # masks built in-graph from iota (a host literal here would be embedded
    # in the executable — catastrophic on the tunnel backend, see jit_utils)
    ii = jax.lax.broadcasted_iota(jnp.int32, (4 * r, 4 * r), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (4 * r, 4 * r), 1)
    same_block = (ii // r) == (jj // r)
    den_w = same_block.astype(jnp.float32)                      # [4r,4r]
    num_w = den_w * (ii % r).astype(jnp.float32)
    den = jnp.einsum("...i,ij->...j", e, den_w,
                     preferred_element_type=jnp.float32)
    num = jnp.einsum("...i,ij->...j", e, num_w,
                     preferred_element_type=jnp.float32)
    exp_full = num / jnp.maximum(den, 1e-20)  # [..., 4r]; constant per block
    return exp_full[..., ::r]                 # block representatives -> [..., 4]


def decode_boxes(
    dist_logits: jnp.ndarray,
    anchor_points: jnp.ndarray,
    strides: jnp.ndarray,
    reg_max: int,
) -> jnp.ndarray:
    """Decode DFL distances to xyxy pixel boxes. [..., A, 4*reg_max] -> [..., A, 4]."""
    ltrb = dfl_decode(dist_logits, reg_max) * strides[..., None]
    x1 = anchor_points[..., 0] - ltrb[..., 0]
    y1 = anchor_points[..., 1] - ltrb[..., 1]
    x2 = anchor_points[..., 0] + ltrb[..., 2]
    y2 = anchor_points[..., 1] + ltrb[..., 3]
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def _suppression_fixed_point(
    iou: jnp.ndarray, iou_threshold: float, iterations: int
) -> jnp.ndarray:
    """Greedy-NMS keep mask over score-sorted candidates via fixed-point
    iteration of the suppression recurrence (all matrix ops, VPU-friendly)."""
    k = iou.shape[-1]
    idx = jnp.arange(k)
    overlap = (iou > iou_threshold) & (idx[:, None] < idx[None, :])  # i suppresses j, i<j

    def body(_, keep):
        suppressed = jnp.any(overlap & keep[:, None], axis=0)
        return ~suppressed

    return lax.fori_loop(0, iterations, body, jnp.ones((k,), dtype=bool))


def _suppression_exact(iou: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """Reference-exact greedy NMS via sequential scan over candidates."""
    k = iou.shape[-1]
    overlap = iou > iou_threshold

    def step(keep, i):
        suppress = overlap[i] & (jnp.arange(k) > i) & keep[i]
        return keep & ~suppress, None

    keep, _ = lax.scan(step, jnp.ones((k,), dtype=bool), jnp.arange(k))
    return keep


def _pallas_suppression_default() -> bool:
    """Use the Pallas VMEM suppression kernel when it can lower natively.

    Measured on TPU v5e (batch 32, K=304, 16 iterations): 2.27 ms vs
    15.75 ms for the XLA fixed-point — 7x, bit-identical keep masks
    (/tmp bench recorded in RESULTS.md). Overridable per call with
    ``use_pallas`` and globally with IQC_DISABLE_PALLAS_NMS=1.
    """
    import os

    if os.environ.get("IQC_DISABLE_PALLAS_NMS"):
        return False
    from iqc_tpu.ops.pallas_nms import suppression_available

    return suppression_available()


def nms_single(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    mask: jnp.ndarray,
    max_detections: int,
    iou_threshold: float,
    score_threshold: float,
    class_aware: bool = True,
    iterations: Optional[int] = 16,
    use_pallas: Optional[bool] = None,
    box_voting: bool = False,
) -> Detections:
    """Fixed-capacity NMS for one image.

    boxes [A,4], scores [A], classes [A] int, mask [A] bool (pre-filter).
    Returns Detections with K=max_detections slots, score-descending.
    ``use_pallas``: None = auto (Pallas VMEM kernel on TPU, XLA elsewhere).
    ``box_voting``: replace each kept box with the score*IoU-weighted mean
    of its overlapping same-class candidates (merge-NMS — the Ultralytics
    stack's ``merge=True`` weighted-box option the reference inherits via
    its YOLO wrapper, models/yolo_model.py:105-110). Pure localization
    refinement: scores, classes and the keep set are unchanged. One extra
    [K,K]x[K,4] matmul — MXU noise at K=100-300.
    """
    neg = jnp.asarray(-1.0, dtype=scores.dtype)
    s = jnp.where(mask & (scores > score_threshold), scores, neg)
    # clamp the candidate pool to the anchor count (tiny input resolutions
    # have fewer anchors than the configured capacity — top_k would throw);
    # outputs pad back to max_detections slots below so the capacity
    # contract holds regardless of input size
    pool = min(max_detections, int(scores.shape[-1]))
    top_scores, top_idx = lax.top_k(s, pool)
    top_boxes = boxes[top_idx]
    top_classes = classes[top_idx]
    cand_valid = top_scores > 0.0

    if class_aware:
        # offset boxes per class so IoU across classes is zero
        offset = top_classes.astype(boxes.dtype)[:, None] * 1e5
        iou_boxes = top_boxes + offset
    else:
        iou_boxes = top_boxes

    pallas = use_pallas if use_pallas is not None else _pallas_suppression_default()
    iou = None
    if iterations is None:
        iou = iou_matrix(iou_boxes, iou_boxes)
        keep = _suppression_exact(iou, iou_threshold)
    elif pallas:
        from iqc_tpu.ops.pallas_nms import pallas_suppression

        keep = pallas_suppression(
            iou_boxes.astype(jnp.float32),
            jnp.asarray(iou_threshold, jnp.float32),
            iterations=iterations,
        )
    else:
        iou = iou_matrix(iou_boxes, iou_boxes)
        keep = _suppression_fixed_point(iou, iou_threshold, iterations)
    valid = cand_valid & keep

    if box_voting:
        # weighted box fusion over the candidate pool: candidate j votes for
        # kept box i with weight score_j * iou(i,j), gated at the NMS overlap
        # threshold (every kept box votes for itself with weight score_i).
        # iou_boxes carry the per-class offset, so cross-class weights are 0.
        # XLA branches already computed this matrix — only the Pallas
        # branch (suppression in VMEM, no materialized IoU) recomputes.
        iou_full = iou if iou is not None else iou_matrix(iou_boxes, iou_boxes)
        w = jnp.where(
            (iou_full >= iou_threshold) & cand_valid[None, :],
            top_scores[None, :] * iou_full, 0.0,
        )
        voted = jnp.einsum("ij,jk->ik", w, top_boxes,
                           preferred_element_type=jnp.float32)
        voted = voted / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
        top_boxes = jnp.where(valid[:, None], voted.astype(top_boxes.dtype),
                              top_boxes)

    # compact survivors to the front, preserving score order
    order = jnp.argsort(~valid, stable=True)
    det = Detections(
        boxes=top_boxes[order],
        scores=jnp.where(valid, top_scores, 0.0)[order],
        classes=jnp.where(valid, top_classes, -1)[order],
        valid=valid[order],
    )
    if pool < max_detections:  # pad invalid slots up to capacity
        pad = max_detections - pool
        det = Detections(
            boxes=jnp.concatenate(
                [det.boxes, jnp.zeros((pad, 4), det.boxes.dtype)]),
            scores=jnp.concatenate(
                [det.scores, jnp.zeros((pad,), det.scores.dtype)]),
            classes=jnp.concatenate(
                [det.classes, jnp.full((pad,), -1, det.classes.dtype)]),
            valid=jnp.concatenate([det.valid, jnp.zeros((pad,), bool)]),
        )
    return det


def batched_nms(
    boxes: jnp.ndarray,
    scores_all: jnp.ndarray,
    max_detections: int,
    iou_threshold: float,
    score_threshold: float,
    class_aware: bool = True,
    iterations: Optional[int] = 16,
    use_pallas: Optional[bool] = None,
    box_voting: bool = False,
) -> Detections:
    """Batched class-aware NMS.

    boxes [B,A,4]; scores_all [B,A,C] per-class scores (post-sigmoid).
    Uses the max-class score per anchor (Ultralytics multi_label=False
    semantics, the mode the reference runs).

    ``score_threshold`` may be a scalar OR a traced [C] vector — the
    per-class confidence floors the reference declares but never reads
    (``qc_specific.confidence_thresholds``, yolo_config.yaml:206-212).
    With a vector, each anchor is gated by its argmax class's threshold,
    selected through a one-hot masked sum (no data-dependent gather —
    CLAUDE.md rule 4).
    """
    scores = jnp.max(scores_all, axis=-1)
    classes = jnp.argmax(scores_all, axis=-1).astype(jnp.int32)
    thr = jnp.asarray(score_threshold)
    if thr.ndim == 1:
        c = scores_all.shape[-1]
        sel = classes[..., None] == lax.broadcasted_iota(
            jnp.int32, (*classes.shape, c), classes.ndim
        )
        per_anchor_thr = jnp.sum(
            jnp.where(sel, thr.astype(scores.dtype)[None, None, :], 0.0), axis=-1
        )
        mask = scores > per_anchor_thr
        # sigmoid scores are strictly positive, so a 0.0 scalar floor keeps
        # nms_single's `scores > score_threshold` a no-op under the mask
        score_threshold = jnp.zeros((), scores.dtype)
    else:
        mask = jnp.ones(scores.shape, dtype=bool)

    fn = lambda b, s, c, m: nms_single(
        b, s, c, m,
        max_detections=max_detections,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        class_aware=class_aware,
        iterations=iterations,
        use_pallas=use_pallas,
        box_voting=box_voting,
    )
    return jax.vmap(fn)(boxes, scores, classes, mask)


def decode_and_nms(
    dist_logits: jnp.ndarray,
    cls_logits: jnp.ndarray,
    anchor_points: jnp.ndarray,
    strides: jnp.ndarray,
    reg_max: int,
    max_detections: int,
    iou_threshold: float,
    score_threshold: float,
    iterations: Optional[int] = 16,
    use_pallas: Optional[bool] = None,
    box_voting: bool = False,
) -> Detections:
    """The fused kernel: DFL decode -> sigmoid scores -> class-aware NMS.

    One XLA program, no host round-trip between the YOLO head and the
    detection set (BASELINE north-star requirement).
    dist_logits [B,A,4*reg_max]; cls_logits [B,A,C].
    ``score_threshold``: traced scalar, or a traced [C] vector of per-class
    confidence floors (qc_specific.confidence_thresholds — see batched_nms).
    """
    boxes = decode_boxes(dist_logits, anchor_points, strides, reg_max)
    scores_all = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    return batched_nms(
        boxes.astype(jnp.float32),
        scores_all,
        max_detections=max_detections,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        iterations=iterations,
        use_pallas=use_pallas,
        box_voting=box_voting,
    )
