import numpy as np
import pytest

import jax.numpy as jnp

from iqc_tpu.inference.segmentation import ImageSegmentator
from iqc_tpu.ops import segmentation as segops


def make_detection(x1, y1, x2, y2, cls="discoloration", conf=0.9):
    return {
        "class": cls,
        "confidence": conf,
        "bbox": {
            "x1": x1, "y1": y1, "x2": x2, "y2": y2,
            "width": x2 - x1, "height": y2 - y1,
            "center_x": (x1 + x2) / 2, "center_y": (y1 + y2) / 2,
        },
    }


@pytest.fixture(scope="module")
def segmentator():
    return ImageSegmentator(capacity=8, roi_size=64)


def bright_blob_image(h=160, w=160, cx=60, cy=60, r=18):
    img = np.full((h, w, 3), 60, np.uint8)
    yy, xx = np.mgrid[:h, :w]
    blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    img[blob] = 220
    return img, blob


def test_threshold_segments_bright_blob(segmentator):
    img, blob = bright_blob_image()
    det = make_detection(30, 30, 92, 92, cls="discoloration")
    out = segmentator.segment_defects(img, [det])
    assert len(out["segmented_regions"]) == 1
    region = out["segmented_regions"][0]
    assert region["segmentation_method"] == "threshold"
    # recovered area should approximate the blob area inside the box
    true_area = blob[30:92, 30:92].sum()
    assert region["area_pixels"] == pytest.approx(true_area, rel=0.35)
    # circle compactness is high
    assert region["compactness"] > 0.5
    assert region["confidence_score"] > 0.5
    # global mask covers the blob centre
    assert region["mask"][60, 60] > 0
    assert region["mask"][10, 10] == 0
    assert out["total_defect_area"] > 0
    assert out["defect_density"] > 0


def test_adaptive_segments_dark_crack(segmentator):
    img = np.full((160, 160, 3), 180, np.uint8)
    img[78:82, 20:140] = 30  # dark crack line
    det = make_detection(10, 60, 150, 100, cls="crack")
    out = segmentator.segment_defects(img, [det])
    region = out["segmented_regions"][0]
    assert region["segmentation_method"] == "adaptive"
    assert region["area_pixels"] > 0
    # crack is elongated -> low compactness
    assert region["compactness"] < 0.5


def test_region_growing_contamination(segmentator):
    img, blob = bright_blob_image(cx=80, cy=80, r=12)
    det = make_detection(50, 50, 110, 110, cls="contamination")
    out = segmentator.segment_defects(img, [det])
    region = out["segmented_regions"][0]
    assert region["segmentation_method"] == "region_growing"
    assert region["area_pixels"] > 0
    assert region["confidence_score"] > 0


def test_watershed_dent(segmentator):
    rng = np.random.default_rng(0)
    img = (120 + 30 * rng.random((160, 160, 3))).astype(np.uint8)
    det = make_detection(40, 40, 100, 100, cls="dent")
    out = segmentator.segment_defects(img, [det])
    region = out["segmented_regions"][0]
    assert region["segmentation_method"] == "watershed"


def test_empty_detections(segmentator):
    img = np.zeros((64, 64, 3), np.uint8)
    out = segmentator.segment_defects(img, [])
    assert out["segmented_regions"] == []
    assert out["total_defect_area"] == 0


def test_area_analysis_buckets(segmentator):
    img, _ = bright_blob_image()
    dets = [
        make_detection(30, 30, 92, 92, cls="discoloration"),
        make_detection(100, 100, 140, 140, cls="discoloration"),
    ]
    out = segmentator.segment_defects(img, dets)
    aa = out["area_analysis"]
    assert aa["total_regions"] == 2
    buckets = aa["size_distribution"]
    assert buckets["small_defects"] + buckets["medium_defects"] + buckets["large_defects"] == 2


def test_mask_stats_square():
    m = jnp.zeros((32, 32), bool).at[8:24, 8:24].set(True)
    area, perim = segops.mask_stats(m)
    assert float(area) == 256.0
    # 16x16 square boundary = 60 pixels
    assert float(perim) == pytest.approx(60, abs=4)


def test_region_growing_tight_box(segmentator):
    """A detection box tight around the blob (ROI mostly defect) must still
    segment it — the reference's whole-ROI seed statistics yield an empty
    mask here; border-ring statistics fix it."""
    img, blob = bright_blob_image(cx=80, cy=80, r=20)
    det = make_detection(58, 58, 102, 102, cls="contamination")  # tight box
    out = segmentator.segment_defects(img, [det])
    region = out["segmented_regions"][0]
    assert region["segmentation_method"] == "region_growing"
    assert region["area_pixels"] > 300


def test_table_lookup_matches_numpy_tables():
    """table_lookup (the jit-safe where-chain) must agree with direct numpy
    indexing for every class table — one source of truth (VERDICT r1 #8)."""
    import jax
    import jax.numpy as jnp

    from iqc_tpu.ops.segmentation import (
        CLASS_IS_DARK, CLASS_THRESH_ADJUST, CLASS_TO_METHOD, table_lookup,
    )

    idx = np.arange(len(CLASS_TO_METHOD))
    for table in (CLASS_TO_METHOD, CLASS_THRESH_ADJUST, CLASS_IS_DARK):
        got = np.asarray(jax.jit(lambda i, t=table: table_lookup(t, i))(jnp.asarray(idx)))
        np.testing.assert_array_equal(got, table[idx])
    # vectorized form too
    got = np.asarray(table_lookup(CLASS_TO_METHOD, jnp.asarray([[4, 0], [2, 3]])))
    np.testing.assert_array_equal(got, CLASS_TO_METHOD[[[4, 0], [2, 3]]])
