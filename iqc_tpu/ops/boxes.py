"""Box geometry kernels: IoU matrices, format conversion, clamping.

Replaces the reference's O(n^2) Python IoU loop (``inference/postprocess.py:
262-271,859-877``) with batched tensor ops that XLA maps onto the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [..., 4] xyxy boxes."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of [N,4] x [M,4] xyxy boxes -> [N,M].

    Matches postprocess.py:859-877 semantics (zero when no overlap).
    """
    a = a[:, None, :]
    b = b[None, :, :]
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    union = box_area(a) + box_area(b) - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def ciou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete-IoU between matched boxes [..., 4] (training loss term,
    reference delegates this to Ultralytics box_loss, yolo_config.yaml:85)."""
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    union = box_area(a) + box_area(b) - inter + eps
    iou = inter / union

    # enclosing box diagonal
    cx1 = jnp.minimum(a[..., 0], b[..., 0])
    cy1 = jnp.minimum(a[..., 1], b[..., 1])
    cx2 = jnp.maximum(a[..., 2], b[..., 2])
    cy2 = jnp.maximum(a[..., 3], b[..., 3])
    c2 = (cx2 - cx1) ** 2 + (cy2 - cy1) ** 2 + eps

    # center distance
    rho2 = (
        ((a[..., 0] + a[..., 2]) - (b[..., 0] + b[..., 2])) ** 2
        + ((a[..., 1] + a[..., 3]) - (b[..., 1] + b[..., 3])) ** 2
    ) / 4.0

    # aspect-ratio consistency
    wa = a[..., 2] - a[..., 0]
    ha = a[..., 3] - a[..., 1] + eps
    wb = b[..., 2] - b[..., 0]
    hb = b[..., 3] - b[..., 1] + eps
    v = (4 / jnp.pi**2) * (jnp.arctan(wb / hb) - jnp.arctan(wa / ha)) ** 2
    alpha = v / (v - iou + 1 + eps)
    return iou - rho2 / c2 - alpha * v


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def clamp_boxes(boxes: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Clamp xyxy boxes into image bounds with x2>x1, y2>y1
    (postprocess.py:377-389 validation semantics)."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width - 1.0)
    y1 = jnp.clip(boxes[..., 1], 0.0, height - 1.0)
    x2 = jnp.clip(boxes[..., 2], x1 + 1.0, float(width))
    y2 = jnp.clip(boxes[..., 3], y1 + 1.0, float(height))
    return jnp.stack([x1, y1, x2, y2], axis=-1)
