"""In-VMEM Pallas morphology kernels vs the XLA formulation
(ops/pallas_morph.py vs ops/segmentation._clean_mask / geodesic growth).

The kernels must be BIT-IDENTICAL to the XLA path — they are a memory-
locality restructuring, not an algorithm change (same contract as
tests/test_pallas_nms.py). Interpret mode makes them testable on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from iqc_tpu.ops import image as imops
from iqc_tpu.ops.pallas_morph import pallas_clean, pallas_grow_clean
from iqc_tpu.ops.segmentation import _clean_mask


def _random_masks(seed, n=4, r=64, p=0.3):
    rng = np.random.default_rng(seed)
    return rng.random((n, r, r)) < p


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_clean_matches_xla(seed):
    masks = _random_masks(seed)
    want = np.asarray(_clean_mask(jnp.asarray(masks)))
    got = np.asarray(pallas_clean(jnp.asarray(masks), fill_iterations=16,
                                  interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_clean_structured_shapes():
    """Blobs with holes: the fill/open/close sequence agrees exactly."""
    r = 64
    m = np.zeros((2, r, r), bool)
    m[0, 10:40, 10:40] = True
    m[0, 20:30, 20:30] = False          # hole -> filled
    m[1, 5:9, 5:60] = True              # thin bar -> survives opening r2? 4px
    m[1, 50, 50] = True                 # speck -> removed by opening
    want = np.asarray(_clean_mask(jnp.asarray(m)))
    got = np.asarray(pallas_clean(jnp.asarray(m), interpret=True))
    np.testing.assert_array_equal(got, want)
    assert want[0, 25, 25]              # the hole really was filled


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("iterations", [8, 24])
def test_pallas_grow_clean_matches_xla(seed, iterations):
    rng = np.random.default_rng(seed)
    r = 64
    seeds = rng.random((3, r, r)) < 0.01
    allow = rng.random((3, r, r)) < 0.7

    def xla_ref(s, a):
        def body(_, m):
            return imops.binary_dilate(m, 1) & a

        grown = lax.fori_loop(0, iterations, body, s)
        return _clean_mask(grown)

    want = np.asarray(xla_ref(jnp.asarray(seeds), jnp.asarray(allow)))
    got = np.asarray(pallas_grow_clean(
        jnp.asarray(seeds), jnp.asarray(allow), grow_iterations=iterations,
        fill_iterations=16, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_grow_respects_allow_barrier():
    """Growth must not cross a 1-px forbidden line (geodesic semantics)."""
    r = 64
    seeds = np.zeros((1, r, r), bool)
    seeds[0, 16, 16] = True
    allow = np.ones((1, r, r), bool)
    allow[0, :, 32] = False  # vertical barrier
    got = np.asarray(pallas_grow_clean(
        jnp.asarray(seeds), jnp.asarray(allow), grow_iterations=40,
        fill_iterations=0, interpret=True))
    assert got[0, 16, 20]          # grew on the seed side
    assert not got[0, :, 33:].any()  # never crossed the barrier


def test_segment_rois_pallas_toggle_equality():
    """segment_rois(use_pallas interpret-shim) == segment_rois(XLA).

    The public entry's two code paths must agree bit-for-bit on masks and
    to float tolerance on the derived stats."""
    from iqc_tpu.ops import segmentation as seg

    rng = np.random.default_rng(0)
    n, r = 4, 64
    rois = rng.random((n, r, r)).astype(np.float32)
    # paint structured defects so masks are non-trivial
    rois[0, 20:40, 20:40] *= 0.2
    rois[2, 10:20, 10:50] = 0.95
    cids = np.asarray([0, 2, 3, 4], np.int32)
    valid = np.asarray([True, True, True, False])
    sx = np.full((n,), 2.0, np.float32)
    sy = np.full((n,), 1.5, np.float32)

    base = seg.segment_rois(jnp.asarray(rois), jnp.asarray(cids),
                            jnp.asarray(valid), jnp.asarray(sx),
                            jnp.asarray(sy))

    # shim the pallas route through interpret mode on CPU
    import iqc_tpu.ops.pallas_morph as pm

    orig_clean, orig_grow = pm.pallas_clean, pm.pallas_grow_clean
    pm_clean = lambda m, fill_iterations=16: orig_clean(
        m, fill_iterations=fill_iterations, interpret=True)
    pm_grow = lambda s, a, grow_iterations=24, fill_iterations=16: orig_grow(
        s, a, grow_iterations=grow_iterations,
        fill_iterations=fill_iterations, interpret=True)
    orig_avail = pm.morph_available
    pm.pallas_clean, pm.pallas_grow_clean = pm_clean, pm_grow
    pm.morph_available = lambda: True
    try:
        via_pallas = seg.segment_rois(jnp.asarray(rois), jnp.asarray(cids),
                                      jnp.asarray(valid), jnp.asarray(sx),
                                      jnp.asarray(sy))
    finally:
        pm.pallas_clean, pm.pallas_grow_clean = orig_clean, orig_grow
        pm.morph_available = orig_avail

    np.testing.assert_array_equal(np.asarray(base.masks),
                                  np.asarray(via_pallas.masks))
    np.testing.assert_allclose(np.asarray(base.area),
                               np.asarray(via_pallas.area), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(base.confidence),
                               np.asarray(via_pallas.confidence), rtol=1e-6)


@pytest.mark.parametrize("shift_mode", ["slice", "matmul"])
def test_shift_modes_and_grouping_match_xla(shift_mode):
    """v2 kernel geometry: ROI grouping + both shift strategies must stay
    bit-identical to the XLA path, including when N is not a multiple of
    the group (padding) and across group sizes."""
    rng = np.random.default_rng(5)
    r = 64
    seeds = rng.random((5, r, r)) < 0.01  # 5 % 4 != 0 -> pad path
    allow = rng.random((5, r, r)) < 0.7

    def xla_ref(s, a):
        def body(_, m):
            return imops.binary_dilate(m, 1) & a

        grown = lax.fori_loop(0, 12, body, s)
        return _clean_mask(grown)

    want = np.asarray(xla_ref(jnp.asarray(seeds), jnp.asarray(allow)))
    for group in (1, 4):
        got = np.asarray(pallas_grow_clean(
            jnp.asarray(seeds), jnp.asarray(allow), grow_iterations=12,
            fill_iterations=16, group=group, shift_mode=shift_mode,
            interpret=True))
        np.testing.assert_array_equal(got, want)

    masks = _random_masks(7, n=5, r=r)
    want_c = np.asarray(_clean_mask(jnp.asarray(masks)))
    got_c = np.asarray(pallas_clean(jnp.asarray(masks), group=4,
                                    shift_mode=shift_mode, interpret=True))
    np.testing.assert_array_equal(got_c, want_c)
