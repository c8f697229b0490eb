import io

import numpy as np
import pytest

from iqc_tpu.inference.detector import QualityControlDetector


@pytest.fixture(scope="module")
def detector(tiny_config):
    return QualityControlDetector(config=tiny_config)


def test_validate_image(detector):
    assert not detector._validate_image(None)
    assert not detector._validate_image("nope")
    assert detector._validate_image(np.zeros((64, 64, 3), np.uint8))
    assert detector._validate_image(np.zeros((64, 64), np.uint8))
    # encoded JPEG buffer (detector.py:208-224 decode path)
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(buf, format="JPEG")
    encoded = np.frombuffer(buf.getvalue(), dtype=np.uint8)
    assert detector._validate_image(encoded)
    assert not detector._validate_image(np.asarray([1, 2, 3], np.uint8))


def test_predict_full_schema(detector, rng):
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    out = detector.predict(img)
    assert "error" not in out
    assert set(out) >= {
        "detections", "quality_assessment", "risk_analysis", "recommendations",
        "metadata", "total_inference_time_ms", "processing_pipeline",
        "image_metadata", "ensemble_confidence", "global_classification",
    }
    assert out["image_metadata"]["original_shape"] == (96, 96, 3)


def test_predict_invalid_input(detector):
    assert detector.predict(None)["error"]
    assert detector.predict(np.asarray([1, 2, 3], np.uint8))["error"]


def test_predict_grayscale(detector, rng):
    img = rng.integers(0, 255, (96, 96), dtype=np.uint8)
    out = detector.predict(img)
    assert "error" not in out


def test_predict_batch_device_batched(detector, rng):
    imgs = [rng.integers(0, 255, (96, 96, 3), dtype=np.uint8) for _ in range(3)]
    results = detector.predict_batch(imgs)
    assert len(results) == 3
    for i, r in enumerate(results):
        assert r["batch_index"] == i
        assert r["batch_statistics"]["batch_size"] == 3
        assert r["batch_statistics"]["throughput_images_per_second"] > 0


def test_predict_stream(detector, rng):
    imgs = (rng.integers(0, 255, (96, 96, 3), dtype=np.uint8) for _ in range(2))
    results = list(detector.predict_stream(imgs))
    assert len(results) == 2
    assert results[0]["stream_index"] == 0
    assert "timestamp" in results[1]
    collected = []
    imgs2 = (rng.integers(0, 255, (96, 96, 3), dtype=np.uint8) for _ in range(2))
    detector.predict_stream(imgs2, callback=collected.append)
    assert len(collected) == 2


def test_performance_stats(detector, rng):
    detector.reset_performance_stats()
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    detector.predict(img)
    stats = detector.get_performance_stats()
    assert stats["total_predictions"] == 1
    assert stats["average_time_ms"] > 0
    assert stats["throughput_images_per_second"] > 0
    detector.reset_performance_stats()
    assert detector.get_performance_stats()["total_predictions"] == 0


def test_update_config_propagates(detector):
    detector.update_config({"model": {"confidence_threshold": 0.33}})
    assert detector.config.model.confidence_threshold == 0.33
    assert detector.ensemble_predictor.confidence_threshold == 0.33
    assert detector.postprocessor.config.model.confidence_threshold == 0.33


def test_system_info(detector):
    info = detector.get_system_info()
    assert info["detector_status"] == "operational"
    assert all(info["components_loaded"].values())
    assert info["devices"]


def test_benchmark(detector, rng):
    imgs = [rng.integers(0, 255, (96, 96, 3), dtype=np.uint8) for _ in range(2)]
    bench = detector.benchmark(imgs, iterations=2)
    assert bench["total_images"] == 4
    ts = bench["timing_statistics"]
    assert ts["p95_ms"] >= ts["median_ms"] >= 0
    assert bench["throughput"]["images_per_minute"] > 0
    assert 0 <= bench["accuracy_metrics"]["success_rate"] <= 1


def test_concurrent_predict_no_errors(detector, rng):
    """5-thread concurrency smoke test, parity with the reference
    (test_models.py:611-649)."""
    import threading

    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    errors = []

    def worker():
        try:
            r = detector.predict(img)
            if "error" in r:
                errors.append(r["error"])
        except Exception as e:  # pragma: no cover
            errors.append(str(e))

    threads = [threading.Thread(target=worker) for _ in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []


def test_predict_stream_micro_batched(detector, rng):
    imgs = (rng.integers(0, 255, (96, 96, 3), dtype=np.uint8) for _ in range(5))
    results = list(detector.predict_stream(imgs, micro_batch=2))
    assert len(results) == 5
    assert [r["stream_index"] for r in results] == list(range(5))
    # micro-batched results came through the batch path
    assert "batch_statistics" in results[0]
