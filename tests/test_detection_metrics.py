import numpy as np
import pytest

from iqc_tpu.train.detection_metrics import (
    average_precision,
    evaluate_detections,
    match_predictions,
)


def test_perfect_predictions_map_1():
    gt = [{"boxes": np.asarray([[10, 10, 50, 50], [100, 100, 150, 150]]),
           "classes": np.asarray([0, 1])}]
    pred = [{"boxes": gt[0]["boxes"].copy(),
             "scores": np.asarray([0.9, 0.8]),
             "classes": np.asarray([0, 1])}]
    out = evaluate_detections(pred, gt, num_classes=2)
    assert out["mAP50"] == pytest.approx(1.0, abs=0.02)
    assert out["mAP50_95"] == pytest.approx(1.0, abs=0.02)
    assert out["precision"] == 1.0
    assert out["recall"] == 1.0


def test_no_predictions_map_0():
    gt = [{"boxes": np.asarray([[10, 10, 50, 50]]), "classes": np.asarray([0])}]
    pred = [{"boxes": np.zeros((0, 4)), "scores": np.zeros(0), "classes": np.zeros(0)}]
    out = evaluate_detections(pred, gt, num_classes=1)
    assert out["mAP50"] == 0.0
    assert out["recall"] == 0.0


def test_false_positive_lowers_precision():
    gt = [{"boxes": np.asarray([[10, 10, 50, 50]]), "classes": np.asarray([0])}]
    pred = [{
        "boxes": np.asarray([[10, 10, 50, 50], [200, 200, 240, 240]]),
        "scores": np.asarray([0.9, 0.8]),
        "classes": np.asarray([0, 0]),
    }]
    out = evaluate_detections(pred, gt, num_classes=1)
    assert out["recall"] == 1.0
    assert out["precision"] == 0.5
    assert 0.9 < out["mAP50"] <= 1.0  # high-scored TP first -> AP stays high


def test_localization_quality_affects_map5095():
    gt = [{"boxes": np.asarray([[0, 0, 100, 100]]), "classes": np.asarray([0])}]
    # IoU 0.76 box: passes thresholds .50-.75 (6 of 10) -> mAP50-95 = 0.6
    pred = [{
        "boxes": np.asarray([[0, 0, 100, 76]]),
        "scores": np.asarray([0.9]),
        "classes": np.asarray([0]),
    }]
    out = evaluate_detections(pred, gt, num_classes=1)
    assert out["mAP50"] > 0.9
    assert out["mAP50_95"] == pytest.approx(0.6, abs=0.05)


def test_match_predictions_greedy_by_score():
    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    preds = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    # higher-score pred claims the gt
    tp, n = match_predictions(preds, np.asarray([0.5, 0.9]), gt, 0.5)
    assert n == 1
    assert tp[1] and not tp[0]


def test_average_precision_empty():
    assert np.isnan(average_precision(np.zeros(0, bool), np.zeros(0), 0))
    assert average_precision(np.zeros(0, bool), np.zeros(0), 3) == 0.0
