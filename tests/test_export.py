"""Portable export round-trip (VERDICT r2 #8) — the ONNX-equivalent of
/root/reference/train/train_yolo.py:246-280: the fused ensemble serializes
to a StableHLO artifact and reloads to detection-identical outputs."""

import numpy as np
import pytest

from iqc_tpu.models.ensemble import EnsemblePredictor
from iqc_tpu.models.export import export_ensemble, load_exported


@pytest.fixture(scope="module")
def predictor(tiny_config):
    return EnsemblePredictor(config=tiny_config)


def test_export_reload_detection_equality(predictor, rng, tmp_path):
    path = str(tmp_path / "ensemble.iqc")
    meta = export_ensemble(predictor, path, batch_size=2)
    assert meta["kind"] == "iqc_tpu.fused_ensemble"
    assert meta["batch_size"] == 2

    engine = load_exported(path)
    assert engine.meta["class_names"] == predictor.class_names

    images = rng.integers(0, 255, (2, 96, 96, 3), dtype=np.uint8)
    live = predictor.run(images)
    out = engine.outputs(images)

    np.testing.assert_array_equal(np.asarray(live.valid), out.valid)
    np.testing.assert_array_equal(np.asarray(live.classes), out.classes)
    v = out.valid
    np.testing.assert_allclose(
        np.asarray(live.boxes)[v], out.boxes[v], rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(live.ensemble_conf, np.float32), out.ensemble_conf,
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(live.global_probs, np.float32), out.global_probs,
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(live.severity_counts), out.severity_counts
    )


def test_export_threshold_is_runtime_arg(predictor, rng, tmp_path):
    """Thresholds are traced args in the artifact: changing them at call
    time must not require a new export."""
    path = str(tmp_path / "ensemble.iqc")
    export_ensemble(predictor, path, batch_size=1)
    engine = load_exported(path)
    images = rng.integers(0, 255, (1, 96, 96, 3), dtype=np.uint8)
    strict = engine.outputs(images, confidence_threshold=0.99)
    loose = engine.outputs(images, confidence_threshold=0.001)
    assert strict.valid.sum() <= loose.valid.sum()


def test_export_batch_mismatch_raises(predictor, rng, tmp_path):
    path = str(tmp_path / "ensemble.iqc")
    export_ensemble(predictor, path, batch_size=1)
    engine = load_exported(path)
    with pytest.raises(ValueError, match="batch"):
        engine(rng.integers(0, 255, (3, 96, 96, 3), dtype=np.uint8))


def test_export_reload_int8_mode(tiny_config, rng, tmp_path):
    """The int8 serving profile (true-int8 ResNet + true-int8 YOLO) exports
    and reloads to detection-identical outputs — the quantized graph and
    its q/scales trees ride the artifact like any other weights."""
    import copy

    cfg = copy.deepcopy(tiny_config)
    cfg.edge.precision = "int8"
    pred = EnsemblePredictor(config=cfg)
    assert pred.precision_report["yolo"].startswith("true-int8")

    path = str(tmp_path / "ensemble_int8.iqc")
    export_ensemble(pred, path, batch_size=1)
    engine = load_exported(path)

    images = rng.integers(0, 255, (1, 96, 96, 3), dtype=np.uint8)
    live = pred.run(images)
    out = engine.outputs(images)
    np.testing.assert_array_equal(np.asarray(live.valid), out.valid)
    np.testing.assert_array_equal(np.asarray(live.classes), out.classes)
    v = out.valid
    np.testing.assert_allclose(
        np.asarray(live.boxes)[v], out.boxes[v], rtol=1e-5, atol=1e-4
    )
