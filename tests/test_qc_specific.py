"""qc_specific block: the reference declares it and never reads it
(/root/reference/config/yolo_config.yaml:204-236); here it is real.

- per-class confidence thresholds vectorized inside decode+NMS
- per-class BCE weights in the YOLO training loss
- config-driven severity rules as traced scalars
- max_detections_per_image host-side cap
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iqc_tpu.config import DEFECT_CLASSES, QCSpecificConfig, SystemConfig


REFERENCE_QC_BLOCK = {
    # verbatim values from the reference's declared block
    # (yolo_config.yaml:205-236)
    "confidence_thresholds": {
        "crack": 0.7, "scratch": 0.6, "dent": 0.8,
        "discoloration": 0.5, "contamination": 0.6,
    },
    "class_weights": {
        "crack": 1.2, "scratch": 1.0, "dent": 1.5,
        "discoloration": 0.8, "contamination": 1.1,
    },
    "nms_threshold": 0.45,
    "max_detections_per_image": 50,
    "severity_rules": {
        "critical": {"min_confidence": 0.8, "min_area_ratio": 0.05},
        "major": {"min_confidence": 0.6, "min_area_ratio": 0.02},
        "minor": {"min_confidence": 0.4, "min_area_ratio": 0.001},
    },
}


# ---------------------------------------------------------------------------
# config parsing + helpers
# ---------------------------------------------------------------------------


def test_qc_specific_parses_reference_block():
    cfg = SystemConfig.from_dict({"qc_specific": REFERENCE_QC_BLOCK})
    qc = cfg.qc_specific
    assert qc.confidence_thresholds["dent"] == 0.8
    assert qc.class_weights["discoloration"] == 0.8
    assert qc.nms_threshold == 0.45
    assert qc.max_detections_per_image == 50

    vec = qc.conf_vector(DEFECT_CLASSES, default=0.25)
    assert vec == [0.7, 0.6, 0.8, 0.5, 0.6]
    w = qc.weight_vector(DEFECT_CLASSES)
    assert w == [1.2, 1.0, 1.5, 0.8, 1.1]
    sev = qc.severity_array()
    # col 2 = classifier tier confidences: stay at the reference's
    # hard-coded classifier constants (0.6/0.8) even when the detection
    # columns are overridden (ADVICE r4: a partial block must not shift
    # classifier tiers to the detection defaults)
    assert sev == [[0.6, 0.02, 0.6], [0.8, 0.05, 0.8]]

    # round trip through to_dict/update
    again = SystemConfig.from_dict(cfg.to_dict())
    assert again.qc_specific == qc


def test_qc_specific_defaults_are_inert():
    qc = SystemConfig().qc_specific
    assert qc.conf_vector(DEFECT_CLASSES, 0.5) is None
    assert qc.weight_vector(DEFECT_CLASSES) is None
    assert qc.severity_array() is None
    assert qc.nms_threshold is None and qc.max_detections_per_image is None


def test_qc_specific_missing_class_falls_back_to_default():
    qc = QCSpecificConfig(confidence_thresholds={"crack": 0.9})
    assert qc.conf_vector(DEFECT_CLASSES, 0.3) == [0.9, 0.3, 0.3, 0.3, 0.3]
    qc2 = QCSpecificConfig(class_weights={"dent": 2.0})
    assert qc2.weight_vector(DEFECT_CLASSES) == [1.0, 1.0, 2.0, 1.0, 1.0]


@pytest.mark.parametrize("bad", [
    {"confidence_thresholds": {"crack": 1.5}},
    {"class_weights": {"crack": -1.0}},
    {"nms_threshold": 2.0},
    {"max_detections_per_image": 0},
    {"severity_rules": {"catastrophic": {"min_confidence": 0.5}}},
    {"severity_rules": {"major": {"min_conf": 0.5}}},
])
def test_qc_specific_validation_rejects(bad):
    with pytest.raises(ValueError):
        SystemConfig.from_dict({"qc_specific": bad})


# ---------------------------------------------------------------------------
# per-class confidence thresholds in NMS
# ---------------------------------------------------------------------------


def _nms_problem():
    """4 disjoint boxes, one per class 0..3, scores 0.65 each."""
    boxes = np.asarray(
        [[10, 10, 30, 30], [50, 50, 70, 70], [90, 90, 110, 110],
         [130, 130, 150, 150]], np.float32,
    )[None]
    scores_all = np.full((1, 4, 4), 0.01, np.float32)
    for a in range(4):
        scores_all[0, a, a] = 0.65
    return jnp.asarray(boxes), jnp.asarray(scores_all)


def test_vector_threshold_gates_per_class():
    from iqc_tpu.ops.nms import batched_nms

    boxes, scores_all = _nms_problem()
    # classes 0,1 pass (thr below 0.65); classes 2,3 filtered
    thr = jnp.asarray([0.5, 0.6, 0.7, 0.9], jnp.float32)
    det = batched_nms(boxes, scores_all, max_detections=4,
                      iou_threshold=0.5, score_threshold=thr)
    kept = sorted(np.asarray(det.classes[0])[np.asarray(det.valid[0])].tolist())
    assert kept == [0, 1]


def test_uniform_vector_threshold_matches_scalar():
    from iqc_tpu.ops.nms import batched_nms

    rng = np.random.default_rng(7)
    n, c = 40, 5
    cx = rng.uniform(20, 180, n)
    cy = rng.uniform(20, 180, n)
    w = rng.uniform(5, 40, n)
    boxes = np.stack([cx - w / 2, cy - w / 2, cx + w / 2, cy + w / 2],
                     axis=-1).astype(np.float32)[None]
    scores_all = rng.uniform(0, 1, (1, n, c)).astype(np.float32)
    scalar = batched_nms(jnp.asarray(boxes), jnp.asarray(scores_all),
                         max_detections=10, iou_threshold=0.5,
                         score_threshold=0.4)
    vector = batched_nms(jnp.asarray(boxes), jnp.asarray(scores_all),
                         max_detections=10, iou_threshold=0.5,
                         score_threshold=jnp.full((c,), 0.4, jnp.float32))
    np.testing.assert_array_equal(np.asarray(scalar.valid),
                                  np.asarray(vector.valid))
    np.testing.assert_array_equal(np.asarray(scalar.classes),
                                  np.asarray(vector.classes))
    np.testing.assert_allclose(np.asarray(scalar.boxes),
                               np.asarray(vector.boxes), rtol=1e-6)


def test_vector_threshold_through_decode_and_nms():
    """The fused kernel accepts the [C] vector end to end."""
    from iqc_tpu.ops.nms import decode_and_nms, make_anchors

    anchors, strides = make_anchors([(8, 8), (4, 4), (2, 2)], [8, 16, 32])
    a = anchors.shape[0]
    rng = np.random.default_rng(0)
    dist = jnp.asarray(rng.normal(0, 1, (1, a, 32)).astype(np.float32))
    cls = jnp.asarray(rng.normal(-2, 2, (1, a, 5)).astype(np.float32))
    det = decode_and_nms(
        dist, cls, anchors, strides, reg_max=8, max_detections=8,
        iou_threshold=0.5,
        score_threshold=jnp.asarray([0.3, 0.4, 0.5, 0.6, 0.7], jnp.float32),
    )
    v = np.asarray(det.valid[0])
    kept_cls = np.asarray(det.classes[0])[v]
    kept_scores = np.asarray(det.scores[0])[v]
    thr = np.asarray([0.3, 0.4, 0.5, 0.6, 0.7])
    for c_, s_ in zip(kept_cls, kept_scores):
        assert s_ > thr[c_]


# ---------------------------------------------------------------------------
# severity rules as traced scalars
# ---------------------------------------------------------------------------


def test_detection_severity_rules_default_matches_constants():
    from iqc_tpu.models.yolo import detection_severity

    conf = jnp.asarray([0.5, 0.85, 0.95, 0.2], jnp.float32)
    area = jnp.asarray([100.0, 100.0, 100.0, 0.11 * 1024 * 1024], jnp.float32)
    base = detection_severity(conf, area)
    # reference-constant rules passed explicitly must be identical
    rules = jnp.asarray([[0.8, 0.05], [0.9, 0.1]], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(base), np.asarray(detection_severity(conf, area, rules))
    )
    np.testing.assert_array_equal(np.asarray(base), [0, 1, 2, 2])


def test_detection_severity_configured_rules_change_tiers():
    from iqc_tpu.models.yolo import detection_severity

    # the reference's DECLARED defaults (looser than its code constants)
    rules = jnp.asarray([[0.6, 0.02], [0.8, 0.05]], jnp.float32)
    conf = jnp.asarray([0.65, 0.85], jnp.float32)
    area = jnp.asarray([10.0, 10.0], jnp.float32)
    sev = np.asarray(detection_severity(conf, area, rules))
    np.testing.assert_array_equal(sev, [1, 2])  # major at .65, critical at .85


def test_classifier_severity_rules():
    from iqc_tpu.models.resnet import classifier_severity

    ids = jnp.asarray([0, 0, 1, 4], jnp.int32)      # crack, crack, scratch, contamination
    conf = jnp.asarray([0.7, 0.9, 0.9, 0.95], jnp.float32)
    base = np.asarray(classifier_severity(ids, conf))
    np.testing.assert_array_equal(base, [1, 2, 1, 0])
    # explicit reference constants = identical
    rules = jnp.asarray([[0.6, 0.0], [0.8, 0.0]], jnp.float32)
    np.testing.assert_array_equal(
        base, np.asarray(classifier_severity(ids, conf, rules))
    )
    # raise the critical bar past 0.9: crack@0.9 drops to major
    strict = jnp.asarray([[0.6, 0.0], [0.95, 0.0]], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(classifier_severity(ids, conf, strict)), [1, 1, 0, 0]
    )
    # [2,3] severity_array form: classifier tiers read col 2, so a block
    # that only raises DETECTION confidences leaves classifier tiers at
    # the reference constants (ADVICE r4 regression)
    from iqc_tpu.config import SystemConfig

    qc = SystemConfig.from_dict({"qc_specific": {"severity_rules": {
        "critical": {"min_confidence": 0.99}}}}).qc_specific
    arr = jnp.asarray(qc.severity_array(), jnp.float32)
    np.testing.assert_array_equal(
        base, np.asarray(classifier_severity(ids, conf, arr))
    )
    # explicit classifier override via classifier_min_confidence
    qc2 = SystemConfig.from_dict({"qc_specific": {"severity_rules": {
        "critical": {"classifier_min_confidence": 0.95}}}}).qc_specific
    arr2 = jnp.asarray(qc2.severity_array(), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(classifier_severity(ids, conf, arr2)), [1, 1, 0, 0]
    )


# ---------------------------------------------------------------------------
# per-class loss weights
# ---------------------------------------------------------------------------


def _loss_problem(seed=0):
    from iqc_tpu.ops.nms import make_anchors

    anchors, strides = make_anchors([(8, 8), (4, 4)], [8, 16])
    a = anchors.shape[0]
    rng = np.random.default_rng(seed)
    dist = jnp.asarray(rng.normal(0, 1, (2, a, 32)).astype(np.float32))
    cls = jnp.asarray(rng.normal(0, 1, (2, a, 5)).astype(np.float32))
    gt_boxes = jnp.asarray(
        [[[8, 8, 40, 40], [20, 30, 60, 62]]] * 2, jnp.float32
    )
    gt_classes = jnp.asarray([[2, 2]] * 2, jnp.int32)
    gt_valid = jnp.ones((2, 2), bool)
    return dist, cls, anchors, strides, gt_boxes, gt_classes, gt_valid


def test_yolo_loss_unit_weights_identical_to_none():
    from iqc_tpu.train.yolo_loss import yolo_loss

    dist, cls, anchors, strides, gb, gc, gv = _loss_problem()
    t0, p0 = yolo_loss(dist, cls, anchors, strides, gb, gc, gv, reg_max=8)
    t1, p1 = yolo_loss(dist, cls, anchors, strides, gb, gc, gv, reg_max=8,
                       class_weights=jnp.ones((5,), jnp.float32))
    np.testing.assert_allclose(float(t0), float(t1), rtol=1e-6)
    np.testing.assert_allclose(float(p0["cls_loss"]), float(p1["cls_loss"]),
                               rtol=1e-6)


def test_yolo_loss_upweighting_gt_class_raises_cls_loss():
    from iqc_tpu.train.yolo_loss import yolo_loss

    dist, cls, anchors, strides, gb, gc, gv = _loss_problem()
    w = jnp.asarray([1.0, 1.0, 3.0, 1.0, 1.0], jnp.float32)  # gt class = 2
    _, p_base = yolo_loss(dist, cls, anchors, strides, gb, gc, gv, reg_max=8)
    _, p_up = yolo_loss(dist, cls, anchors, strides, gb, gc, gv, reg_max=8,
                        class_weights=w)
    assert float(p_up["cls_loss"]) > float(p_base["cls_loss"])
    # box/DFL are unweighted
    np.testing.assert_allclose(float(p_up["box_loss"]),
                               float(p_base["box_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(p_up["dfl_loss"]),
                               float(p_base["dfl_loss"]), rtol=1e-6)


def test_trainer_accepts_class_weights_dict():
    """The trainer maps {class_name: w} onto the [C] vector and trains."""
    from iqc_tpu.config import MeshConfig
    from iqc_tpu.data.yolo_dataset import DetectionLoader, SyntheticDefectDataset
    from iqc_tpu.train.train_yolo import YOLOTrainer

    ds = SyntheticDefectDataset(n=8, image_size=96, max_boxes=8)
    loader = DetectionLoader(ds, batch_size=4, mosaic_prob=0.0,
                             mixup_prob=0.0, seed=0)
    trainer = YOLOTrainer({
        "num_classes": 5, "image_size": 96, "batch_size": 4, "epochs": 1,
        "width_mult": 0.125, "reg_max": 8, "max_boxes": 8,
        "compute_dtype": "float32", "warmup_epochs": 1, "ema_decay": 0.9,
        "device_mosaic": False, "staged_host_epochs": False,
        "checkpoint_dir": "/tmp/iqc_yolo_qc_test",
        "class_weights": {"crack": 1.2, "dent": 1.5, "discoloration": 0.8},
    }, mesh_config=MeshConfig(data_parallel=1, model_parallel=1))
    trainer.build(steps_per_epoch=len(loader))
    np.testing.assert_allclose(trainer._class_weights,
                               [1.2, 1.0, 1.5, 0.8, 1.0])
    report = trainer.train(loader, val_loader=None, epochs=1)
    assert np.isfinite(report["final"]["train_loss"])


# ---------------------------------------------------------------------------
# ensemble integration
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def qc_predictor():
    from iqc_tpu.models.ensemble import EnsemblePredictor

    cfg = SystemConfig.from_dict({
        "model": {
            "yolo_weights": "", "resnet_weights": "",
            "width_mult": 0.125, "max_detections": 16, "max_classified": 4,
            "confidence_threshold": 0.25, "compute_dtype": "float32",
            "classifier_input": 64, "resnet_stages": [1, 1, 1, 1],
        },
        "processing": {"batch_size": 2, "input_size": [96, 96],
                       "preprocessing": {"resize": [96, 96]}},
        "qc_specific": {
            "confidence_thresholds": {
                "crack": 0.3, "scratch": 0.3, "dent": 0.3,
                "discoloration": 0.3, "contamination": 0.3,
            },
            "max_detections_per_image": 2,
            "severity_rules": {
                "major": {"min_confidence": 0.6, "min_area_ratio": 0.02},
                "critical": {"min_confidence": 0.8, "min_area_ratio": 0.05},
            },
        },
    })
    return EnsemblePredictor(config=cfg)


def test_ensemble_runs_with_qc_specific(qc_predictor, rng):
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    out = qc_predictor.run(img[None])
    v = np.asarray(out.valid[0])
    scores = np.asarray(out.yolo_scores[0])[v]
    # every survivor cleared its per-class floor (all floors 0.3 here)
    assert np.all(scores > 0.3)


def test_max_detections_per_image_caps_results(qc_predictor, rng):
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    out = qc_predictor.run_host(img[None])
    result = qc_predictor.build_result(out, 0, img.shape)
    assert len(result["detections"]) <= 2
    # grading is consistent with the reported detections
    qa = result["quality_assessment"]
    if result["detections"]:
        breakdown = qa.get("defect_breakdown")
        if breakdown:
            assert sum(breakdown.values()) == len(result["detections"])


def test_yolo_detector_update_thresholds_per_class():
    """update_thresholds accepts the qc_specific per-class dict shape and
    swaps between scalar/vector without recompiling surprises."""
    from iqc_tpu.models.yolo import YOLODetector

    det = YOLODetector(input_size=(96, 96), width_mult=0.125,
                       confidence_threshold=0.4)
    det.update_thresholds(confidence={"crack": 0.9, "dent": 0.7})
    assert det.class_conf_thresholds == [0.9, 0.4, 0.7, 0.4, 0.4]
    det.update_thresholds(confidence=[0.1, 0.2, 0.3, 0.4, 0.5])
    assert det.class_conf_thresholds == [0.1, 0.2, 0.3, 0.4, 0.5]
    det.update_thresholds(confidence=0.25)
    assert det.class_conf_thresholds is None
    assert det.confidence_threshold == 0.25


def test_run_sharded_honors_qc_specific(qc_predictor, rng):
    """The data-parallel path applies the same per-class floors/severity
    rules as the single-device path (VERDICT r3: run_sharded must not
    silently drop qc_specific)."""
    imgs = rng.integers(0, 255, (8, 96, 96, 3), dtype=np.uint8)
    single = qc_predictor.run(imgs)
    sharded = qc_predictor.run_sharded(imgs)
    np.testing.assert_array_equal(np.asarray(single.valid),
                                  np.asarray(sharded.valid))
    np.testing.assert_allclose(np.asarray(single.yolo_scores),
                               np.asarray(sharded.yolo_scores), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(single.yolo_severity),
                                  np.asarray(sharded.yolo_severity))
