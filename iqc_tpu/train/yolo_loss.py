"""YOLOv8 training losses: task-aligned assignment + CIoU + DFL + BCE.

The reference delegates its whole detection-training loop to Ultralytics
(``train/train_yolo.py:117-179``; loss gains box=7.5 cls=0.5 dfl=1.5 at
``config/yolo_config.yaml:84-90``). Here the loss is owned natively as a
pure, fully-vectorized function over fixed-capacity padded targets:

- Task-aligned assigner (TAL): alignment = score^alpha * IoU^beta over
  anchors whose centre lies inside the gt box; top-k anchors per gt;
  conflicts resolved by highest IoU. No data-dependent shapes — masks all
  the way down, so the whole thing jits into the train step.
- Classification: BCE against alignment-normalized soft targets.
- Box: CIoU loss on assigned anchors.
- DFL: cross-entropy against the two integer bins bracketing each target
  ltrb distance (in stride units), clamped to reg_max - 1.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from iqc_tpu.ops.boxes import ciou


class YoloLossConfig(NamedTuple):
    box_gain: float = 7.5
    cls_gain: float = 0.5
    dfl_gain: float = 1.5
    tal_alpha: float = 0.5
    tal_beta: float = 6.0
    tal_topk: int = 10


def _pairwise_iou(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """IoU between [M,4] gts and [A,4] preds -> [M,A]."""
    x1 = jnp.maximum(gt[:, None, 0], pred[None, :, 0])
    y1 = jnp.maximum(gt[:, None, 1], pred[None, :, 1])
    x2 = jnp.minimum(gt[:, None, 2], pred[None, :, 2])
    y2 = jnp.minimum(gt[:, None, 3], pred[None, :, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    ag = jnp.clip(gt[:, 2] - gt[:, 0], 0) * jnp.clip(gt[:, 3] - gt[:, 1], 0)
    ap = jnp.clip(pred[:, 2] - pred[:, 0], 0) * jnp.clip(pred[:, 3] - pred[:, 1], 0)
    union = ag[:, None] + ap[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def assign_targets(
    pred_boxes: jnp.ndarray,   # [A,4] decoded xyxy (stop-gradient copy)
    pred_scores: jnp.ndarray,  # [A,C] sigmoid class scores
    anchors: jnp.ndarray,      # [A,2] centre points (pixels)
    gt_boxes: jnp.ndarray,     # [M,4] xyxy
    gt_classes: jnp.ndarray,   # [M] int
    gt_valid: jnp.ndarray,     # [M] bool
    cfg: YoloLossConfig,
) -> Dict[str, jnp.ndarray]:
    """Task-aligned assignment for one image.

    Returns per-anchor: fg mask [A], assigned gt index [A], target class
    [A], target box [A,4], soft target score [A].
    """
    m = gt_boxes.shape[0]
    a = anchors.shape[0]

    inside = (
        (anchors[None, :, 0] > gt_boxes[:, None, 0])
        & (anchors[None, :, 0] < gt_boxes[:, None, 2])
        & (anchors[None, :, 1] > gt_boxes[:, None, 1])
        & (anchors[None, :, 1] < gt_boxes[:, None, 3])
    )  # [M,A]
    candidate = inside & gt_valid[:, None]

    iou = _pairwise_iou(gt_boxes, pred_boxes)  # [M,A]
    # Row-select pred_scores.T[gt_classes] WITHOUT a data-dependent gather
    # (CLAUDE.md rule 4: dynamic gathers are pathological on this backend).
    # A boolean one-hot mask + masked sum picks exactly one row per gt, so
    # the result is bit-identical to the gather (each output element is
    # value * 1.0 summed with zeros).
    cls_sel = (
        jnp.clip(gt_classes, 0, pred_scores.shape[1] - 1)[:, None]
        == jnp.arange(pred_scores.shape[1])[None, :]
    )  # [M,C]
    cls_score = jnp.sum(
        jnp.where(cls_sel[:, :, None], pred_scores.T[None, :, :], 0.0), axis=1
    )  # [M,A]
    align = (cls_score**cfg.tal_alpha) * (iou**cfg.tal_beta)
    align = jnp.where(candidate, align, 0.0)

    # top-k anchors per gt as an exact scatter-free mask: one-hot compare of
    # the top_k INDICES (ties resolved deterministically by top_k itself, so
    # rows of equal alignments admit exactly k anchors — a >=kth threshold
    # admits unboundedly more). The floor is relative (align > 0), not an
    # absolute 1e-9: early in training score^0.5 * iou^6 is ~1e-14 and an
    # absolute floor would zero every foreground anchor, killing the box/DFL
    # gradient (ADVICE r1). No scatter in fwd, no gather in bwd.
    k = min(cfg.tal_topk, a)
    _, topk_idx = jax.lax.top_k(align, k)  # [M,k]
    topk_mask = jnp.any(
        topk_idx[:, :, None] == jnp.arange(a)[None, None, :], axis=1
    )  # [M,A]
    mask = topk_mask & (align > 0.0) & candidate

    # conflict resolution: anchor claimed by the gt with highest IoU
    iou_masked = jnp.where(mask, iou, -1.0)
    best_gt = jnp.argmax(iou_masked, axis=0)                     # [A]
    fg = jnp.max(iou_masked, axis=0) > -0.5                       # [A]

    # Everything indexed by best_gt is selected through a boolean one-hot
    # mask + masked sum instead of gathers: `gt_boxes[best_gt]`,
    # `align[best_gt, arange(a)]` etc. are data-dependent (2-D) gathers,
    # which this backend lowers pathologically (CLAUDE.md rule 4 — the same
    # pattern cost crop_and_resize ~300 ms before its matmul rewrite).
    # Exactly one mask element per anchor column is hot, so each masked sum
    # reproduces the gather bit-for-bit (value * 1.0 + zeros).
    sel = best_gt[None, :] == jnp.arange(m)[:, None]              # [M,A]
    tgt_class = jnp.where(
        fg, jnp.sum(jnp.where(sel, gt_classes[:, None], 0), axis=0), 0
    )
    tgt_box = jnp.sum(
        jnp.where(sel[:, :, None], gt_boxes[:, None, :], 0.0), axis=0
    )  # [A,4]
    # soft score: alignment normalized per gt so its max matches its max IoU
    align_sel = jnp.sum(jnp.where(sel, align, 0.0), axis=0)       # [A]
    gt_max_align = jnp.max(align, axis=1)
    gt_max_iou = jnp.max(jnp.where(mask, iou, 0.0), axis=1)
    norm = jnp.sum(jnp.where(sel, gt_max_iou[:, None], 0.0), axis=0) / jnp.maximum(
        jnp.sum(jnp.where(sel, gt_max_align[:, None], 0.0), axis=0), 1e-9
    )
    tgt_score = jnp.where(fg, align_sel * norm, 0.0)

    return {
        "fg": fg,
        "gt_index": best_gt,
        "target_class": tgt_class,
        "target_box": tgt_box,
        "target_score": jnp.clip(tgt_score, 0.0, 1.0),
    }


def dfl_loss(
    dist_logits: jnp.ndarray,  # [A,4*reg_max]
    target_ltrb: jnp.ndarray,  # [A,4] distances in stride units
    reg_max: int,
) -> jnp.ndarray:
    """Distribution focal loss: CE against the two bracketing bins. [A]."""
    a = dist_logits.shape[0]
    logits = dist_logits.reshape(a, 4, reg_max)
    t = jnp.clip(target_ltrb, 0.0, reg_max - 1 - 1e-3)
    lo = jnp.floor(t).astype(jnp.int32)
    hi = lo + 1
    w_hi = t - lo
    w_lo = 1.0 - w_hi
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # bin selection as a one-hot masked sum, not take_along_axis: the
    # data-dependent gather on the minor axis lowers badly on TPU
    # (CLAUDE.md rule 4); exactly one bin is hot so this is bit-identical.
    bins = jnp.arange(reg_max)
    lp_lo = jnp.sum(jnp.where(lo[..., None] == bins, logp, 0.0), axis=-1)
    lp_hi = jnp.sum(jnp.where(hi[..., None] == bins, logp, 0.0), axis=-1)
    return jnp.mean(-(w_lo * lp_lo + w_hi * lp_hi), axis=-1)


def yolo_loss(
    dist_logits: jnp.ndarray,  # [B,A,4*reg_max]
    cls_logits: jnp.ndarray,   # [B,A,C]
    anchors: jnp.ndarray,      # [A,2]
    strides: jnp.ndarray,      # [A]
    gt_boxes: jnp.ndarray,     # [B,M,4]
    gt_classes: jnp.ndarray,   # [B,M]
    gt_valid: jnp.ndarray,     # [B,M]
    reg_max: int,
    cfg: YoloLossConfig = YoloLossConfig(),
    class_weights: Optional[jnp.ndarray] = None,  # [C] traced (qc_specific)
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total loss (scalar) + per-term metrics, fully batched.

    ``class_weights``: optional traced [C] per-class BCE weights — the
    reference's declared-but-unread ``qc_specific.class_weights`` block
    (yolo_config.yaml:214-220, for imbalanced defect classes). Each class
    column of the classification BCE is scaled by its weight (both the
    positive soft-target term and the negatives pushing that class down);
    box/DFL terms are unweighted. Pass as a runtime argument, never a
    closed-over constant (ops/jit_utils.py). None = unweighted."""
    from iqc_tpu.ops.nms import decode_boxes

    pred_boxes = decode_boxes(dist_logits, anchors, strides, reg_max)  # [B,A,4]
    pred_scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))

    assign = jax.vmap(
        lambda pb, ps, gb, gc, gv: assign_targets(
            jax.lax.stop_gradient(pb), jax.lax.stop_gradient(ps),
            anchors, gb, gc, gv, cfg,
        )
    )(pred_boxes, pred_scores, gt_boxes, gt_classes, gt_valid)

    fg = assign["fg"]                        # [B,A]
    tgt_score = assign["target_score"]       # [B,A]
    n_fg = jnp.maximum(jnp.sum(tgt_score), 1.0)

    # --- classification: BCE vs soft targets over all anchors -----------------
    c = cls_logits.shape[-1]
    onehot = jax.nn.one_hot(assign["target_class"], c) * tgt_score[..., None]
    logits32 = cls_logits.astype(jnp.float32)
    bce = optax_sigmoid_bce(logits32, onehot)
    if class_weights is not None:
        bce = bce * class_weights.astype(jnp.float32)[None, None, :]
    cls_l = jnp.sum(bce) / n_fg

    # --- box: CIoU on foreground, weighted by target score --------------------
    ciou_val = ciou(pred_boxes, assign["target_box"])
    box_l = jnp.sum(jnp.where(fg, (1.0 - ciou_val) * tgt_score, 0.0)) / n_fg

    # --- dfl -------------------------------------------------------------------
    tl = (anchors[None, :, 0] - assign["target_box"][..., 0]) / strides
    tt = (anchors[None, :, 1] - assign["target_box"][..., 1]) / strides
    tr = (assign["target_box"][..., 2] - anchors[None, :, 0]) / strides
    tb = (assign["target_box"][..., 3] - anchors[None, :, 1]) / strides
    target_ltrb = jnp.stack([tl, tt, tr, tb], axis=-1)  # [B,A,4]
    dfl_each = jax.vmap(lambda dl, t: dfl_loss(dl, t, reg_max))(
        dist_logits, target_ltrb
    )
    dfl_l = jnp.sum(jnp.where(fg, dfl_each * tgt_score, 0.0)) / n_fg

    total = cfg.box_gain * box_l + cfg.cls_gain * cls_l + cfg.dfl_gain * dfl_l
    return total, {
        "box_loss": box_l,
        "cls_loss": cls_l,
        "dfl_loss": dfl_l,
        "num_fg": jnp.sum(fg.astype(jnp.float32)),
    }


def optax_sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable sigmoid BCE (elementwise)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
