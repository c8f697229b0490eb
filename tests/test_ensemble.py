import numpy as np
import pytest

from iqc_tpu.models.ensemble import EnsemblePredictor, assess_overall_quality


@pytest.fixture(scope="module")
def predictor(tiny_config):
    return EnsemblePredictor(config=tiny_config)


def test_quality_grade_truth_table():
    """Grade table parity with ensemble.py:282-337 (and the reference's
    table-driven test, test_models.py:330-345)."""
    cases = [
        # (minor, major, critical) -> grade, pass_fail
        ((0, 0, 0), "A", "PASS"),
        ((1, 0, 0), "A", "PASS"),
        ((3, 0, 0), "A", "PASS"),
        ((4, 0, 0), "B", "CONDITIONAL"),
        ((0, 1, 0), "C", "CONDITIONAL"),
        ((0, 2, 0), "C", "CONDITIONAL"),
        ((0, 3, 0), "D", "FAIL"),
        ((0, 0, 1), "F", "FAIL"),
        ((5, 3, 2), "F", "FAIL"),
    ]
    for (mi, ma, cr), grade, pf in cases:
        qa = assess_overall_quality(mi, ma, cr)
        assert qa["quality_grade"] == grade, (mi, ma, cr)
        assert qa["pass_fail"] == pf


def test_predict_schema(predictor, rng):
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    result = predictor.predict(img)
    assert set(result) >= {
        "detections", "global_classification", "detection_summary",
        "quality_assessment", "ensemble_confidence", "total_inference_time_ms",
    }
    gc = result["global_classification"]
    assert gc["predicted_class"] in predictor.class_names
    probs = gc["class_probabilities"]
    assert abs(sum(probs.values()) - 1.0) < 1e-3
    qa = result["quality_assessment"]
    assert qa["quality_grade"] in "ABCDF"
    for det in result["detections"]:
        assert det["final_severity"] in ("minor", "major", "critical")
        assert 0 <= det["ensemble_confidence"] <= 1
        assert det["bbox"]["x2"] >= det["bbox"]["x1"]


def test_batch_predict_consistent(predictor, rng):
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    single = predictor.predict(img)
    batch = predictor.batch_predict([img, img])
    assert len(batch) == 2
    assert batch[0]["batch_index"] == 0
    assert (
        batch[0]["detection_summary"]["total_defects"]
        == single["detection_summary"]["total_defects"]
    )
    # identical inputs -> identical outputs (deterministic graph)
    assert batch[0]["ensemble_confidence"] == batch[1]["ensemble_confidence"]


def test_weight_update_changes_fusion_without_recompile(predictor, rng):
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    predictor.update_ensemble_weights(0.9, 0.1)
    assert abs(predictor.ensemble_weights["yolo"] - 0.9) < 1e-9
    r1 = predictor.predict(img)
    predictor.update_ensemble_weights(0.6, 0.4)
    r2 = predictor.predict(img)
    # weights renormalize (ensemble.py:371-378)
    predictor.update_ensemble_weights(3, 2)
    assert abs(predictor.ensemble_weights["yolo"] - 0.6) < 1e-9
    # compiled once: second call much faster is hard to assert robustly;
    # instead assert outputs differ appropriately when dets exist
    if r1["detections"]:
        assert r1["detections"][0]["ensemble_confidence"] != r2["detections"][0]["ensemble_confidence"]


def test_fused_graph_detects_planted_defect(tiny_config, rng):
    """End-to-end sanity on the device outputs with a low threshold: the
    graph must produce valid, in-bounds, score-sorted detections."""
    pred = EnsemblePredictor(config=tiny_config)
    pred.confidence_threshold = 0.004  # below the cls-head bias prior ~0.01
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    out = pred.run(img[None])
    v = np.asarray(out.valid[0])
    assert v.any(), "expected candidate detections at near-zero threshold"
    s = np.asarray(out.yolo_scores[0])[v]
    assert (np.diff(s) <= 1e-6).all()
    boxes = np.asarray(out.boxes[0])[v]
    assert (boxes[:, 2] >= boxes[:, 0]).all()
    # crop classification ran for the top slots
    assert np.asarray(out.crop_classified[0])[:1].all()
    # fused confidence = 0.6*yolo + 0.4*crop for valid slots
    ec = np.asarray(out.ensemble_conf[0])[v]
    yc = np.asarray(out.yolo_scores[0])[v]
    cc = np.asarray(out.crop_conf[0])[v]
    np.testing.assert_allclose(ec, 0.6 * yc + 0.4 * cc, rtol=1e-4, atol=1e-5)


def test_model_info(predictor):
    info = predictor.get_model_info()
    assert info["fused_graph"] is True
    assert info["models_loaded"] == {"yolo": True, "resnet": True}


def test_full_forward_segmentation_matches_standalone(tiny_config, rng):
    """The fused graph's segmentation outputs must equal the standalone
    ImageSegmentator kernel on the same boxes (both call segment_rois)."""
    from iqc_tpu.inference.segmentation import ImageSegmentator

    pred = EnsemblePredictor(config=tiny_config)
    pred.confidence_threshold = 0.004
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    out, masks, seg_stats = pred.run_full_host(img[None])
    v = out.valid[0]
    if not v.any():
        import pytest

        pytest.skip("no detections at this seed")
    s = masks.shape[1]
    m = tiny_config.model

    seg = ImageSegmentator(tiny_config, capacity=s, roi_size=m.seg_roi_size)
    dets = []
    for j in range(min(int(v.sum()), s)):
        x1, y1, x2, y2 = out.boxes[0, j]
        cid = int(out.classes[0, j])
        dets.append({
            "class": seg.class_names[cid],
            "confidence": float(out.yolo_scores[0, j]),
            "bbox": {"x1": float(x1), "y1": float(y1), "x2": float(x2), "y2": float(y2),
                     "width": float(x2 - x1), "height": float(y2 - y1),
                     "center_x": float(x1 + x2) / 2, "center_y": float(y1 + y2) / 2},
        })
    standalone = seg.segment_defects(img, dets)
    for j, region in enumerate(standalone["segmented_regions"]):
        # areas agree within resample tolerance (fused uses the same ROI
        # grid but float boxes; standalone re-packs via numpy)
        np.testing.assert_allclose(
            seg_stats[0, j, 0], region["area_pixels"], rtol=0.05, atol=16.0
        )
        assert int(seg_stats[0, j, 4]) == (
            {"threshold": 0, "adaptive": 1, "watershed": 2, "region_growing": 3}[
                region["segmentation_method"]
            ]
        )


def test_int8_serving_precision(tiny_config, rng):
    """edge.precision="int8" lowers both models' weights through the
    XLAOptimizer at init (TensorRT-equivalent serving variant,
    config.yaml:139-150) and surfaces the size report."""
    import copy

    cfg = copy.deepcopy(tiny_config)
    cfg.edge.precision = "int8"
    pred = EnsemblePredictor(config=cfg)
    assert pred.precision_report is not None
    assert pred.precision_report["resnet"].startswith("true-int8")
    assert pred.precision_report["resnet_size_reduction_percent"] > 50.0
    assert pred.precision_report["yolo_size_reduction_percent"] > 60.0
    info = pred.get_model_info()
    assert info["serving_precision"] == "int8"
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    result = pred.predict(img)
    assert result["quality_assessment"]["quality_grade"] in "ABCDF"
