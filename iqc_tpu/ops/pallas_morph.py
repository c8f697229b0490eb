"""Pallas TPU kernels: in-VMEM iterative binary morphology.

The segmentation stage's cost is NOT compute — it is ~56 sequential
elementwise passes over the [N,R,R] mask batch (24 geodesic-dilation
iterations for region growing + 16-iteration hole fills inside each
``_clean_mask``), each reading and writing HBM. The r4 per-stage profile
(docs/profile_int8_r4.json) shows the stage at 12.5 ms / 397 GB/s — half
the chip's HBM roofline, because each pass moves only ~8 MB.

These kernels keep one ROI resident in VMEM for the WHOLE iteration
sequence (the same restructuring ops/pallas_nms.py applies to NMS
suppression): one HBM read per input, one write per output, all
iterations on-chip.

Formulation notes:
- masks are f32 in {0,1}; OR = max, AND = min/multiply.
- the radius-1 disk (5-point cross) dilate/erode uses one-hot SHIFT
  MATMULS on the MXU instead of pad+slice: a [R,R]x[R,R] matmul against a
  one-hot shift matrix is an exact row/column shift with zero boundary
  fill (matching ops/image._cross_step's zero-padded semantics), and
  jnp.dot is the operation Mosaic lowers most reliably (pallas_nms
  precedent).
- algorithms mirror ops/image.py bit-for-bit: ``_clean_kernel_body`` is
  open(1) -> fill_holes(K) -> close(2) -> open(2) exactly as
  ``segmentation._clean_mask``; geodesic dilation matches
  ``_region_growing_segment``'s fori_loop. Equality is pinned in
  tests/test_pallas_morph.py (interpret mode on CPU, hardware on TPU).
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


def _shift_mats(r: int):
    """One-hot shift matrices built in-kernel from iota (no literals)."""
    ii = lax.broadcasted_iota(jnp.int32, (r, r), 0)
    jj = lax.broadcasted_iota(jnp.int32, (r, r), 1)
    up = (jj == ii + 1).astype(jnp.float32)     # (up @ v)[i] = v[i+1]
    down = (jj == ii - 1).astype(jnp.float32)   # (down @ v)[i] = v[i-1]
    # (v @ left)[: , j] = v[:, j+1] ; (v @ right)[:, j] = v[:, j-1]
    left = (ii == jj + 1).astype(jnp.float32)
    right = (ii == jj - 1).astype(jnp.float32)
    return up, down, left, right


def _make_cross_ops(r: int):
    up_m, dn_m, lf_m, rt_m = _shift_mats(r)

    def shifts(m):
        u = jnp.dot(up_m, m, preferred_element_type=jnp.float32)
        d = jnp.dot(dn_m, m, preferred_element_type=jnp.float32)
        l = jnp.dot(m, lf_m, preferred_element_type=jnp.float32)
        rgt = jnp.dot(m, rt_m, preferred_element_type=jnp.float32)
        return u, d, l, rgt

    def dilate(m):
        u, d, l, rgt = shifts(m)
        return jnp.maximum(jnp.maximum(jnp.maximum(m, u), jnp.maximum(d, l)),
                           rgt)

    def erode(m):
        u, d, l, rgt = shifts(m)
        return jnp.minimum(jnp.minimum(jnp.minimum(m, u), jnp.minimum(d, l)),
                           rgt)

    return dilate, erode


def _clean_body(m, dilate, erode, fill_iterations: int):
    """segmentation._clean_mask in {0,1} f32: open(1), fill_holes(K),
    close(2), open(2)."""
    r = m.shape[0]
    m = dilate(erode(m))  # open(1)
    # fill_holes: flood the background from the border; result = ~outside
    ii = lax.broadcasted_iota(jnp.int32, (r, r), 0)
    jj = lax.broadcasted_iota(jnp.int32, (r, r), 1)
    border = ((ii == 0) | (ii == r - 1) | (jj == 0)
              | (jj == r - 1)).astype(jnp.float32)
    inv = 1.0 - m
    outside = border * inv

    def fill_step(_, o):
        return dilate(o) * inv

    outside = lax.fori_loop(0, fill_iterations, fill_step, outside)
    m = 1.0 - outside  # mask | ~(mask | outside): outside is already & ~mask
    # close(2) = dilate^2 then erode^2 (disk_2 = cross (+) cross)
    m = erode(erode(dilate(dilate(m))))
    # open(2)
    m = dilate(dilate(erode(erode(m))))
    return m


def _grow_clean_kernel(seeds_ref, allow_ref, out_ref, *, grow_iterations: int,
                       fill_iterations: int):
    seeds = seeds_ref[0].astype(jnp.float32)
    allow = allow_ref[0].astype(jnp.float32)
    dilate, erode = _make_cross_ops(seeds.shape[0])

    def grow(_, m):
        return dilate(m) * allow

    m = lax.fori_loop(0, grow_iterations, grow, seeds)
    if fill_iterations:
        m = _clean_body(m, dilate, erode, fill_iterations)
    out_ref[0] = m


def _clean_kernel(mask_ref, out_ref, *, fill_iterations: int):
    m = mask_ref[0].astype(jnp.float32)
    dilate, erode = _make_cross_ops(m.shape[0])
    out_ref[0] = _clean_body(m, dilate, erode, fill_iterations)


def _roi_call(kernel, n: int, r: int, n_inputs: int, interpret: bool):
    block = pl.BlockSpec((1, r, r), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[block] * n_inputs,
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((n, r, r), jnp.float32),
        interpret=interpret,
    )


@functools.partial(jax.jit,
                   static_argnames=("grow_iterations", "fill_iterations",
                                    "interpret"))
def pallas_grow_clean(seeds: jnp.ndarray, allow: jnp.ndarray,
                      grow_iterations: int = 24, fill_iterations: int = 16,
                      interpret: bool = False) -> jnp.ndarray:
    """Geodesic dilation (seeds constrained by allow, ``grow_iterations``
    radius-1 steps) followed by the _clean_mask sequence, one VMEM-resident
    kernel instance per ROI. seeds/allow [N,R,R] bool -> mask [N,R,R] bool."""
    n, r, _ = seeds.shape
    kern = functools.partial(_grow_clean_kernel,
                             grow_iterations=grow_iterations,
                             fill_iterations=fill_iterations)
    out = _roi_call(kern, n, r, 2, interpret)(
        seeds.astype(jnp.float32), allow.astype(jnp.float32))
    return out > 0.5


@functools.partial(jax.jit,
                   static_argnames=("fill_iterations", "interpret"))
def pallas_clean(mask: jnp.ndarray, fill_iterations: int = 16,
                 interpret: bool = False) -> jnp.ndarray:
    """segmentation._clean_mask over a [N,R,R] bool batch, in VMEM."""
    n, r, _ = mask.shape
    kern = functools.partial(_clean_kernel, fill_iterations=fill_iterations)
    out = _roi_call(kern, n, r, 1, interpret)(mask.astype(jnp.float32))
    return out > 0.5


def morph_available() -> bool:
    """True when the Pallas TPU backend can lower these kernels natively
    (same gate as ops/pallas_nms.suppression_available)."""
    if not _HAS_PLTPU:
        return False
    try:
        d = jax.devices()[0]
        return d.platform == "tpu" or "TPU" in getattr(d, "device_kind", "")
    except Exception:  # pragma: no cover
        return False
