"""Test environment: fake an 8-device TPU mesh on CPU.

The TPU-native analog of testing multi-node without a cluster (SURVEY.md §4):
``xla_force_host_platform_device_count`` gives jax 8 virtual CPU devices so
every sharding/pjit path is exercised without hardware.

Must run before jax initializes its backends, hence module-level in conftest.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the real-TPU
# tunnel (axon) and a sitecustomize.py pre-imports jax, so env vars alone
# are too late — update jax config directly (backends are created lazily,
# so this works as long as it runs before the first device access).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def sample_image(rng):
    """Random uint8 RGB image, reference fixture parity (test_models.py:41-45)."""
    return rng.integers(0, 255, size=(640, 640, 3), dtype=np.uint8)


@pytest.fixture(scope="session")
def small_image(rng):
    return rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)


@pytest.fixture(scope="session")
def tiny_config():
    """A scaled-down SystemConfig so jit compiles stay fast on CPU."""
    from iqc_tpu.config import SystemConfig

    return SystemConfig.from_dict(
        {
            "model": {
                # never load repo-shipped checkpoints in tests: shapes don't
                # match the tiny arch, and goldens are recorded vs seed-0 init
                "yolo_weights": "",
                "resnet_weights": "",
                "width_mult": 0.125,
                "depth_mult": 0.334,
                "max_detections": 16,
                "max_classified": 4,
                "confidence_threshold": 0.25,
                "compute_dtype": "float32",
                "classifier_input": 64,
                "resnet_stages": [1, 1, 1, 1],
            },
            "processing": {
                "batch_size": 2,
                "input_size": [96, 96],
                "preprocessing": {"resize": [96, 96]},
            },
        }
    )
