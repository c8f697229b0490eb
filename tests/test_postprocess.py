import numpy as np
import pytest

from iqc_tpu.config import SystemConfig
from iqc_tpu.inference.postprocess import PostProcessor, connected_components, iou_matrix_np


def det(x1, y1, x2, y2, cls="crack", conf=0.9, sev="minor", **kw):
    d = {
        "class": cls,
        "confidence": conf,
        "ensemble_confidence": conf,
        "severity": sev,
        "bbox": {
            "x1": x1, "y1": y1, "x2": x2, "y2": y2,
            "width": x2 - x1, "height": y2 - y1,
            "center_x": (x1 + x2) / 2, "center_y": (y1 + y2) / 2,
        },
    }
    d.update(kw)
    return d


@pytest.fixture
def pp():
    return PostProcessor(SystemConfig())


def test_iou_matrix_np():
    boxes = np.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], dtype=np.float32)
    iou = iou_matrix_np(boxes)
    assert iou[0, 1] == pytest.approx(1.0)
    assert iou[0, 2] == 0.0


def test_connected_components():
    adj = np.zeros((4, 4), bool)
    adj[0, 1] = adj[1, 0] = True
    adj[2, 3] = adj[3, 2] = True
    labels = connected_components(adj)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_filter_low_confidence(pp):
    dets = [det(10, 10, 60, 60, conf=0.95), det(10, 10, 60, 60, conf=0.1)]
    out = pp.filter(dets)
    assert len(out) == 1 and out[0]["confidence"] == 0.95


def test_filter_extreme_aspect_and_size(pp):
    dets = [
        det(0, 0, 200, 10),   # aspect 20 -> dropped
        det(0, 0, 3, 3),      # tiny -> dropped
        det(0, 0, 50, 50),    # kept
    ]
    assert len(pp.filter(dets)) == 1


def test_merge_overlapping_same_class(pp):
    dets = [
        det(10, 10, 50, 50, conf=0.9, sev="minor"),
        det(15, 15, 55, 55, conf=0.7, sev="major"),
        det(200, 200, 250, 250, conf=0.8),
    ]
    out = pp.merge_overlapping(dets)
    assert len(out) == 2
    merged = next(d for d in out if d.get("merged_from"))
    assert merged["merged_from"] == 2
    # union bbox, mean confidence, max severity
    assert merged["bbox"]["x1"] == 10 and merged["bbox"]["x2"] == 55
    assert merged["ensemble_confidence"] == pytest.approx(0.8)
    assert merged["final_severity"] == "major"


def test_merge_keeps_distinct_classes(pp):
    dets = [det(10, 10, 50, 50, cls="crack"), det(12, 12, 52, 52, cls="dent")]
    assert len(pp.merge_overlapping(dets)) == 2


def test_validate_clamps_and_scores(pp):
    d = det(-10, -10, 700, 700, conf=0.9)
    out = pp.validate([d], (640, 640))
    assert len(out) == 1
    b = out[0]["bbox"]
    assert b["x1"] == 0 and b["x2"] == 640
    assert 0 < out[0]["validation_score"] <= 1.0


def test_quality_rules_thresholds():
    cfg = SystemConfig.from_dict(
        {"quality_control": {"thresholds": {"major_defect_limit": 1, "minor_defect_limit": 3, "critical_defect_limit": 0}}}
    )
    pp = PostProcessor(cfg)
    assert pp.quality_rules({"critical": 1, "major": 0, "minor": 0}) == ("F", "FAIL", "high")
    assert pp.quality_rules({"critical": 0, "major": 2, "minor": 0}) == ("D", "FAIL", "high")
    assert pp.quality_rules({"critical": 0, "major": 0, "minor": 4}) == ("C", "CONDITIONAL", "medium")
    assert pp.quality_rules({"critical": 0, "major": 1, "minor": 0}) == ("B", "CONDITIONAL", "low")
    assert pp.quality_rules({"critical": 0, "major": 0, "minor": 1}) == ("A", "PASS", "low")


def test_quality_score(pp):
    # no defects with full confidence = 100
    assert pp.quality_score({"critical": 0, "major": 0, "minor": 0}, 1.0) == 100.0
    # 1 critical at conf 0.8 -> 70
    assert pp.quality_score({"critical": 1, "major": 0, "minor": 0}, 0.8) == pytest.approx(70.0)
    # floor at 0
    assert pp.quality_score({"critical": 4, "major": 0, "minor": 0}, 1.0) == 0.0


def test_severity_escalation(pp):
    d = det(0, 0, 50, 50, cls="crack", sev="minor")
    region = {"area_percentage": 6.0, "compactness": 0.8}
    assert pp.escalate_severity(d, region) == "major"
    region2 = {"area_percentage": 1.0, "compactness": 0.1}
    assert pp.escalate_severity(d, region2) == "major"  # irregular crack
    d2 = det(0, 0, 50, 50, cls="dent", sev="minor")
    assert pp.escalate_severity(d2, region2) == "minor"


def test_spatial_clustering(pp):
    # three nearby + one isolated
    dets = [
        det(0, 0, 10, 10), det(20, 0, 30, 10), det(40, 0, 50, 10),
        det(500, 500, 510, 510),
    ]
    c = pp.spatial_clustering(dets)
    assert c["has_clusters"] and c["cluster_count"] == 1
    assert c["clustered_defects"] == 3 and c["isolated_defects"] == 1


def test_full_pipeline_schema(pp):
    ens = {
        "detections": [
            det(10, 10, 80, 80, cls="crack", conf=0.92, sev="major"),
            det(15, 15, 85, 85, cls="crack", conf=0.88, sev="minor"),
            det(300, 300, 380, 360, cls="contamination", conf=0.75, sev="minor"),
        ]
    }
    seg = {"segmented_regions": [], "defect_density": 0.5}
    out = pp.process_results(ens, seg, (640, 640, 3))
    assert set(out) >= {"detections", "quality_assessment", "risk_analysis", "recommendations", "metadata"}
    qa = out["quality_assessment"]
    assert qa["quality_grade"] in "ABCDF"
    assert isinstance(out["recommendations"], list)
    # overlapping same-class pair merged
    assert len(out["detections"]) == 2
    # defect-specific advice present
    assert any("stress" in r or "cleaning" in r for r in out["recommendations"])


def test_empty_detections(pp):
    out = pp.process_results({"detections": []}, {}, (640, 640))
    assert out["quality_assessment"]["quality_grade"] == "A"
    assert out["quality_assessment"]["quality_score"] == 100.0
