import json

import numpy as np
import pytest

from iqc_tpu.analytics import AnomalyDetector, SPCAnalyzer


def results_with(n_dets, conf=0.9, sev="minor"):
    return {
        "detections": [
            {
                "ensemble_confidence": conf,
                "final_severity": sev,
                "bbox": {"width": 20, "height": 20},
            }
            for _ in range(n_dets)
        ]
    }


def test_extract_metrics():
    m = SPCAnalyzer.extract_metrics(results_with(3, conf=0.8, sev="critical"))
    assert m["defect_count"] == 3
    assert m["critical_defects"] == 3
    assert m["avg_confidence"] == pytest.approx(0.8)
    assert m["total_area_affected"] == 1200
    assert m["critical_rate"] == 1.0


def test_control_limits_poisson():
    spc = SPCAnalyzer(window_size=50)
    rng = np.random.default_rng(0)
    for _ in range(30):
        spc.analyze(results_with(int(rng.poisson(4))))
    limits = spc.control_limits
    c = limits["defect_count"]
    assert c["chart_type"] == "c-chart"
    cbar = c["center_line"]
    assert c["upper_control_limit"] == pytest.approx(cbar + 3 * np.sqrt(cbar))
    assert c["lower_control_limit"] >= 0
    x = limits["confidence"]
    assert x["chart_type"] == "X-chart"


def test_violation_detected():
    spc = SPCAnalyzer(window_size=50)
    for _ in range(20):
        spc.analyze(results_with(2))
    out = spc.analyze(results_with(30))  # massive spike
    assert not out["control_status"]["in_control"]
    assert any(v["metric"] == "defect_count" for v in out["control_status"]["violations"])
    assert any(a["type"] == "control_violation" for a in out["alerts"])


def test_run_rule_trend():
    spc = SPCAnalyzer(window_size=50)
    out = None
    for i in range(12):
        out = spc.analyze(results_with(i))  # strictly increasing
    rules = [v["rule"] for v in out["control_status"]["rule_violations"]]
    assert "rule3" in rules


def test_capability_and_interpretation():
    spc = SPCAnalyzer(window_size=100)
    rng = np.random.default_rng(1)
    for _ in range(40):
        spc.analyze(results_with(int(np.clip(rng.normal(1.0, 0.5), 0, 4))))
    cap = spc.process_capability
    assert "cpk" in cap
    assert cap["specification_limits"]["upper"] == 5.0
    assert isinstance(cap["interpretation"], str)
    assert SPCAnalyzer.interpret_capability(2.5).startswith("Excellent")
    assert SPCAnalyzer.interpret_capability(0.1).startswith("Unacceptable")


def test_critical_alert_and_high_rate():
    spc = SPCAnalyzer()
    out = spc.analyze(results_with(4, sev="critical"))
    types = {a["type"] for a in out["alerts"]}
    assert "critical_defects" in types
    assert "high_defect_rate" in types  # rate 4 > 3.0


def test_report_export_and_summary(tmp_path):
    spc = SPCAnalyzer()
    for i in range(15):
        spc.analyze(results_with(i % 3))
    path = tmp_path / "spc.json"
    assert spc.export_spc_report(str(path))
    report = json.loads(path.read_text())
    assert report["data_summary"]["total_samples"] == 15
    assert len(report["recent_data"]) == 15
    summary = spc.get_summary_statistics()
    assert summary["sample_count"] == 15
    spc.reset_data()
    assert spc.get_summary_statistics() == {"no_data": True}


def test_trend_analysis_directions():
    spc = SPCAnalyzer()
    for i in range(20):
        spc.analyze(results_with(i))
    assert spc.analyze_trends()["trend_direction"] == "increasing"


# --- anomaly detector -------------------------------------------------------


def test_anomaly_warmup_is_nominal():
    ad = AnomalyDetector(min_samples=5)
    for _ in range(5):
        assert ad.detect(results_with(2)) == 0.0
    assert ad.get_state()["warmed_up"]


def test_anomaly_spike_scores_high():
    ad = AnomalyDetector(min_samples=10)
    rng = np.random.default_rng(0)
    for _ in range(30):
        ad.detect(results_with(int(rng.poisson(2))))
    nominal = ad.detect(results_with(2))
    spike = ad.detect(results_with(60, sev="critical"))
    assert spike > nominal
    assert spike > 0.5
    assert ad.is_anomalous(0.5)


def test_anomaly_reset():
    ad = AnomalyDetector()
    ad.detect(results_with(2))
    ad.reset()
    assert ad.count == 0 and ad.history == []


def test_run_rule_stratification_and_mixture():
    # rule 7: 15 consecutive points hugging the centerline of a noisy series
    spc = SPCAnalyzer(window_size=50)
    vals = [0, 8] * 3 + [4] * 15  # volatile start, then stratified
    out = None
    for v in vals:
        out = spc.analyze(results_with(v))
    rules = {r["rule"] for r in out["control_status"]["rule_violations"]}
    assert "rule7" in rules


def test_run_rules_quiet_on_constant_process():
    spc = SPCAnalyzer(window_size=50)
    out = None
    for _ in range(20):
        out = spc.analyze(results_with(2))
    assert out["control_status"]["rule_violations"] == []
    assert out["control_status"]["in_control"]
