import numpy as np

from iqc_tpu.inference.visualize import (
    draw_detections,
    draw_quality_overlay,
    draw_segmentation,
)


def det(x1, y1, x2, y2, cls="crack", sev="major"):
    return {
        "class": cls, "confidence": 0.9, "severity": sev,
        "final_severity": sev,
        "bbox": {"x1": x1, "y1": y1, "x2": x2, "y2": y2,
                 "width": x2 - x1, "height": y2 - y1,
                 "center_x": (x1 + x2) / 2, "center_y": (y1 + y2) / 2},
    }


def test_draw_detections_marks_boxes():
    img = np.zeros((64, 64, 3), np.uint8)
    out = draw_detections(img, [det(10, 10, 30, 30, cls="crack")])
    assert out.shape == img.shape
    # crack box drawn in red on the top edge
    assert tuple(out[10, 20]) == (255, 0, 0)
    # original untouched (copy semantics)
    assert img.sum() == 0


def test_draw_detections_clamps_out_of_bounds():
    img = np.zeros((32, 32, 3), np.uint8)
    out = draw_detections(img, [det(-5, -5, 100, 100)])
    assert out.shape == img.shape  # no crash, no resize


def test_quality_overlay_appends_strip():
    img = np.zeros((32, 32, 3), np.uint8)
    out = draw_quality_overlay(img, {"quality_grade": "C", "pass_fail_status": "FAIL"})
    assert out.shape[0] == 32 + 24
    # FAIL -> red status square
    assert tuple(out[32 + 10, 10]) == (255, 0, 0)


def test_draw_segmentation_blends_masks():
    img = np.full((16, 16, 3), 100, np.uint8)
    mask = np.zeros((16, 16), np.uint8)
    mask[4:8, 4:8] = 255
    out = draw_segmentation(img, [mask], alpha=0.5)
    assert not np.array_equal(out[5, 5], img[5, 5])
    assert np.array_equal(out[0, 0], img[0, 0])
