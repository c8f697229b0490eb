"""Pallas TPU kernel: fused IoU matrix + greedy-NMS suppression.

The XLA path (ops/nms.py) materializes the [K,K] IoU matrix in HBM and
runs the suppression fixed-point as K-sized vector ops per step. This
kernel keeps everything in VMEM: compute the IoU matrix once on the VPU,
then iterate the suppression recurrence as a [1,K]x[K,K] mat-vec on the
MXU — zero HBM traffic between iterations.

Recurrence (score-sorted candidates): keep_j <- not any_{i<j}
(iou[i,j] > t and keep_i). Fixed point == greedy NMS; ``iterations``
bounds chain depth exactly like the XLA variant.

CPU/interpret fallback makes the kernel testable without hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _suppress_kernel(boxes_ref, thresh_ref, keep_ref, *, iterations: int):
    boxes = boxes_ref[:]  # [K, 4] f32, score-descending
    k = boxes.shape[0]
    x1 = boxes[:, 0]
    y1 = boxes[:, 1]
    x2 = boxes[:, 2]
    y2 = boxes[:, 3]

    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    union = area[:, None] + area[None, :] - inter
    iou = jnp.where(union > 0.0, inter / jnp.maximum(union, 1e-9), 0.0)

    ii = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    jj = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    overlap = jnp.where(
        (iou > thresh_ref[0, 0]) & (ii < jj), 1.0, 0.0
    )  # [K,K] f32: i suppresses j

    def body(_, keep_row):  # keep_row [1,K] f32 in {0,1}
        suppressed = jnp.dot(
            keep_row, overlap, preferred_element_type=jnp.float32
        )  # [1,K]: weight of live suppressors per candidate
        return jnp.where(suppressed > 0.0, 0.0, 1.0)

    keep = lax.fori_loop(0, iterations, body, jnp.ones((1, k), jnp.float32))
    keep_ref[:] = keep


@functools.partial(jax.jit, static_argnames=("iterations", "interpret"))
def pallas_suppression(
    boxes: jnp.ndarray,
    iou_threshold: jnp.ndarray,
    iterations: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Keep mask [K] for score-sorted boxes [K,4] (class-offset upstream).

    K is padded up to a multiple of 8 for Mosaic tiling; pad slots are
    zero boxes (zero area -> zero IoU with everything, so they neither
    suppress nor get suppressed — the result is sliced back to K).
    """
    k = boxes.shape[0]
    k_pad = (-k) % 8
    if k_pad:
        boxes = jnp.concatenate(
            [boxes, jnp.zeros((k_pad, 4), boxes.dtype)], axis=0
        )
    thresh = jnp.reshape(iou_threshold.astype(jnp.float32), (1, 1))
    kernel = functools.partial(_suppress_kernel, iterations=iterations)
    if _HAS_PLTPU and not interpret:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        in_specs = [pl.BlockSpec(), pl.BlockSpec()]
        out_specs = pl.BlockSpec()
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, k + k_pad), jnp.float32),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(boxes.astype(jnp.float32), thresh)
    return keep[0, :k] > 0.5


def suppression_available() -> bool:
    """True when the Pallas TPU backend can lower the kernel natively:
    pltpu importable AND the default device is a TPU (the axon tunnel
    platform reports device_kind "TPU v5 lite" with platform "axon")."""
    if not _HAS_PLTPU:
        return False
    try:
        d = jax.devices()[0]
        return d.platform == "tpu" or "TPU" in getattr(d, "device_kind", "")
    except Exception:  # pragma: no cover
        return False
