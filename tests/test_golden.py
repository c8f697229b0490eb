"""Golden numeric-regression tests.

SURVEY.md §4: the reference has no numeric tests; the TPU build adds
fixed-seed golden outputs so kernel/model refactors that change numerics
are caught. Goldens are recorded on the CPU backend (f32) and compared
with fp tolerance; regenerate deliberately with
``python tests/test_golden.py --regenerate`` after an intentional change.
"""

import json
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _fixed_image(size=96):
    # deterministic structured image: gradient + bright blob + dark line
    yy, xx = np.mgrid[:size, :size]
    img = (60 + 0.5 * xx + 0.3 * yy).astype(np.float32)
    blob = (yy - 30) ** 2 + (xx - 30) ** 2 <= 120
    img[blob] = 230
    img[70:73, 10:80] = 20
    return np.clip(np.stack([img] * 3, -1), 0, 255).astype(np.uint8)


def compute_outputs(tiny_config):
    from iqc_tpu.models.ensemble import EnsemblePredictor

    pred = EnsemblePredictor(config=tiny_config)
    pred.confidence_threshold = 0.004
    out = pred.run(_fixed_image()[None])
    v = np.asarray(out.valid[0])
    return {
        "n_valid": int(v.sum()),
        "boxes": np.asarray(out.boxes[0])[v].round(2).tolist(),
        "scores": np.asarray(out.yolo_scores[0])[v].round(5).tolist(),
        "classes": np.asarray(out.classes[0])[v].tolist(),
        "severity_counts": np.asarray(out.severity_counts[0]).tolist(),
        "global_probs": np.asarray(out.global_probs[0]).round(5).tolist(),
        "image_confidence": round(float(out.image_confidence[0]), 5),
    }


def golden_path():
    return os.path.join(GOLDEN_DIR, "ensemble_tiny.json")


def test_ensemble_matches_golden(tiny_config):
    path = golden_path()
    if not os.path.exists(path):
        pytest.skip("golden file not recorded")
    want = json.load(open(path))
    got = compute_outputs(tiny_config)
    assert got["n_valid"] == want["n_valid"]
    assert got["classes"] == want["classes"]
    np.testing.assert_allclose(got["scores"], want["scores"], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(got["boxes"], want["boxes"], rtol=1e-3, atol=0.5)
    np.testing.assert_allclose(
        got["global_probs"], want["global_probs"], rtol=1e-3, atol=1e-5
    )
    assert got["severity_counts"] == want["severity_counts"]


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import conftest  # noqa: F401  (forces CPU + 8 devices)
    from conftest import tiny_config as _  # noqa

    from iqc_tpu.config import SystemConfig

    cfg = SystemConfig.from_dict(
        {
            "model": {
                # match conftest.tiny_config: never load shipped checkpoints
                # (tiny arch; goldens are recorded vs seed-0 init)
                "yolo_weights": "", "resnet_weights": "",
                "width_mult": 0.125, "depth_mult": 0.334, "max_detections": 16,
                "max_classified": 4, "confidence_threshold": 0.25,
                "compute_dtype": "float32", "classifier_input": 64,
                "resnet_stages": [1, 1, 1, 1],
            },
            "processing": {"batch_size": 2, "input_size": [96, 96],
                           "preprocessing": {"resize": [96, 96]}},
        }
    )
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    outputs = compute_outputs(cfg)  # compute BEFORE truncating the file
    with open(golden_path(), "w") as f:
        json.dump(outputs, f, indent=2)
    print("wrote", golden_path())
