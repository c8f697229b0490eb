"""Pallas TPU kernels: in-VMEM iterative binary morphology.

The segmentation stage's cost is NOT compute — it is ~56 sequential
elementwise passes over the [N,R,R] mask batch (24 geodesic-dilation
iterations for region growing + 16-iteration hole fills inside each
``_clean_mask``), each reading and writing HBM. The r4 per-stage profile
(docs/profile_int8_r4.json) shows the stage at 12.5 ms / 397 GB/s — half
the chip's HBM roofline, because each pass moves only ~8 MB.

These kernels keep a GROUP of ROIs resident in VMEM for the WHOLE
iteration sequence (the same restructuring ops/pallas_nms.py applies to
NMS suppression): one HBM read per input, one write per output, all
iterations on-chip.

Kernel geometry (v2 — the v1 single-ROI/one-hot-matmul form measured
SLOWER than XLA, 17.1 vs 12.5 ms: fifty serially-dependent 128^3 matmuls
are MXU-latency-bound):
- each kernel instance stacks ``group`` ROIs into one [group*R, R] sheet,
  so every step does group× the work per serial dependency.
- row (sublane) shifts: static slice + concatenate, with an iota mask
  zeroing the G ROI boundaries (a shift must not leak between stacked
  ROIs).
- column (lane) shifts: either slice+concat (``shift_mode="slice"``,
  pure VPU) or one [G*R,R]x[R,R] one-hot matmul (``shift_mode="matmul"``,
  tall-matmul MXU form) — selectable because Mosaic's lane-dim concat
  support varies by toolchain; IQC_PALLAS_MORPH_SHIFT overrides.

Algorithms mirror ops/image.py bit-for-bit: ``_clean_body`` is
open(1) -> fill_holes(K) -> close(2) -> open(2) exactly as
``segmentation._clean_mask``; geodesic dilation matches
``_region_growing_segment``'s fori_loop. Equality is pinned in
tests/test_pallas_morph.py (interpret mode on CPU, hardware on TPU).
"""

from __future__ import annotations

import functools
import os

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

DEFAULT_GROUP = 16


def _shift_mode() -> str:
    # "matmul" (default): lane shifts as tall one-hot matmuls — the form
    # Mosaic is known to lower (pallas_nms precedent). "slice": lane
    # shifts as concat+slice (pure VPU) — faster where supported; flip
    # with IQC_PALLAS_MORPH_SHIFT=slice and compare on hardware.
    return os.environ.get("IQC_PALLAS_MORPH_SHIFT", "matmul")


def _make_cross_ops(gr: int, r: int, shift_mode: str):
    """Cross dilate/erode over a [gr*r, r] sheet of gr stacked ROIs.

    Row shifts must not cross ROI boundaries: rows i with i % r == r-1
    (for up-shift sources) receive 0 instead of the next ROI's row.
    """
    n = gr * r
    row = lax.broadcasted_iota(jnp.int32, (n, r), 0)
    # valid-source masks for the row shifts (zero at ROI boundaries)
    up_ok = ((row % r) != (r - 1)).astype(jnp.float32)    # out[i] = v[i+1]
    dn_ok = ((row % r) != 0).astype(jnp.float32)          # out[i] = v[i-1]

    if shift_mode == "matmul":
        ii = lax.broadcasted_iota(jnp.int32, (r, r), 0)
        jj = lax.broadcasted_iota(jnp.int32, (r, r), 1)
        lf_m = (ii == jj + 1).astype(jnp.float32)   # (v @ lf)[.,j] = v[.,j+1]
        rt_m = (ii == jj - 1).astype(jnp.float32)

        def col_shifts(v):
            l = jnp.dot(v, lf_m, preferred_element_type=jnp.float32)
            rr = jnp.dot(v, rt_m, preferred_element_type=jnp.float32)
            return l, rr
    else:
        zc = None

        def col_shifts(v):
            z = jnp.zeros((n, 1), jnp.float32)
            l = jnp.concatenate([v[:, 1:], z], axis=1)
            rr = jnp.concatenate([z, v[:, :-1]], axis=1)
            return l, rr

    zr = None

    def row_shifts(v):
        z = jnp.zeros((1, r), jnp.float32)
        u = jnp.concatenate([v[1:, :], z], axis=0) * up_ok
        d = jnp.concatenate([z, v[:-1, :]], axis=0) * dn_ok
        return u, d

    def dilate(v):
        u, d = row_shifts(v)
        l, rr = col_shifts(v)
        return jnp.maximum(jnp.maximum(jnp.maximum(v, u), jnp.maximum(d, l)),
                           rr)

    def erode(v):
        # out-of-bounds counts as empty (matches the zero-padded conv /
        # _cross_step semantics); the boundary masks already zero the
        # cross-ROI rows, and col_shifts zero-fill the edge columns
        u, d = row_shifts(v)
        l, rr = col_shifts(v)
        return jnp.minimum(jnp.minimum(jnp.minimum(v, u), jnp.minimum(d, l)),
                           rr)

    return dilate, erode


def _clean_body(m, dilate, erode, gr: int, r: int, fill_iterations: int):
    """segmentation._clean_mask in {0,1} f32 over the stacked sheet:
    open(1), fill_holes(K), close(2), open(2). The fill's border seed is
    PER ROI (each r-row band has its own border ring)."""
    n = gr * r
    m = dilate(erode(m))  # open(1)
    row = lax.broadcasted_iota(jnp.int32, (n, r), 0)
    col = lax.broadcasted_iota(jnp.int32, (n, r), 1)
    border = (((row % r) == 0) | ((row % r) == r - 1)
              | (col == 0) | (col == r - 1)).astype(jnp.float32)
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


def _grow_clean_kernel(seeds_ref, allow_ref, out_ref, *, gr: int, r: int,
                       grow_iterations: int, fill_iterations: int,
                       shift_mode: str):
    seeds = seeds_ref[:].astype(jnp.float32).reshape(gr * r, r)
    allow = allow_ref[:].astype(jnp.float32).reshape(gr * r, r)
    dilate, erode = _make_cross_ops(gr, r, shift_mode)

    def grow(_, m):
        return dilate(m) * allow

    m = lax.fori_loop(0, grow_iterations, grow, seeds)
    if fill_iterations:
        m = _clean_body(m, dilate, erode, gr, r, fill_iterations)
    out_ref[:] = m.reshape(gr, r, r)


def _clean_kernel(mask_ref, out_ref, *, gr: int, r: int,
                  fill_iterations: int, shift_mode: str):
    m = mask_ref[:].astype(jnp.float32).reshape(gr * r, r)
    dilate, erode = _make_cross_ops(gr, r, shift_mode)
    out_ref[:] = _clean_body(m, dilate, erode, gr, r,
                             fill_iterations).reshape(gr, r, r)


def _pad_group(x: jnp.ndarray, gr: int):
    n = x.shape[0]
    pad = (-n) % gr
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, *x.shape[1:]), x.dtype)], axis=0)
    return x, n


def _roi_call(kernel, n: int, gr: int, r: int, n_inputs: int,
              interpret: bool):
    block = pl.BlockSpec((gr, r, r), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(n // gr,),
        in_specs=[block] * n_inputs,
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((n, r, r), jnp.float32),
        interpret=interpret,
    )


@functools.partial(jax.jit,
                   static_argnames=("grow_iterations", "fill_iterations",
                                    "group", "shift_mode", "interpret"))
def pallas_grow_clean(seeds: jnp.ndarray, allow: jnp.ndarray,
                      grow_iterations: int = 24, fill_iterations: int = 16,
                      group: int = DEFAULT_GROUP, shift_mode: str = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Geodesic dilation (seeds constrained by allow, ``grow_iterations``
    radius-1 steps) followed by the _clean_mask sequence, ``group`` ROIs
    VMEM-resident per kernel instance. seeds/allow [N,R,R] bool ->
    mask [N,R,R] bool."""
    shift_mode = shift_mode or _shift_mode()
    seeds_p, n = _pad_group(seeds.astype(jnp.float32), group)
    allow_p, _ = _pad_group(allow.astype(jnp.float32), group)
    r = seeds.shape[-1]
    kern = functools.partial(_grow_clean_kernel, gr=group, r=r,
                             grow_iterations=grow_iterations,
                             fill_iterations=fill_iterations,
                             shift_mode=shift_mode)
    out = _roi_call(kern, seeds_p.shape[0], group, r, 2, interpret)(
        seeds_p, allow_p)
    return out[:n] > 0.5


@functools.partial(jax.jit,
                   static_argnames=("fill_iterations", "group", "shift_mode",
                                    "interpret"))
def pallas_clean(mask: jnp.ndarray, fill_iterations: int = 16,
                 group: int = DEFAULT_GROUP, shift_mode: str = None,
                 interpret: bool = False) -> jnp.ndarray:
    """segmentation._clean_mask over a [N,R,R] bool batch, in VMEM."""
    shift_mode = shift_mode or _shift_mode()
    mask_p, n = _pad_group(mask.astype(jnp.float32), group)
    r = mask.shape[-1]
    kern = functools.partial(_clean_kernel, gr=group, r=r,
                             fill_iterations=fill_iterations,
                             shift_mode=shift_mode)
    out = _roi_call(kern, mask_p.shape[0], group, r, 1, interpret)(mask_p)
    return out[:n] > 0.5


def morph_available() -> bool:
    """True when the Pallas TPU backend can lower these kernels natively
    (same gate as ops/pallas_nms.suppression_available).
    IQC_DISABLE_PALLAS_MORPH=1 is honored by the segmentation callers."""
    if not _HAS_PLTPU:
        return False
    try:
        d = jax.devices()[0]
        return d.platform == "tpu" or "TPU" in getattr(d, "device_kind", "")
    except Exception:  # pragma: no cover
        return False
