import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iqc_tpu.config import MeshConfig
from iqc_tpu.parallel.mesh import (
    create_mesh,
    data_parallel_sharding,
    replicate,
    shard_batch,
)


def test_mesh_uses_all_devices():
    spec = create_mesh(MeshConfig())
    assert spec.data_size == len(jax.devices()) == 8
    assert spec.model_size == 1


def test_mesh_model_parallel_split():
    spec = create_mesh(MeshConfig(model_parallel=2))
    assert spec.data_size == 4
    assert spec.model_size == 2


def test_shard_batch_places_on_data_axis():
    spec = create_mesh(MeshConfig())
    batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    sharded = shard_batch(spec, batch)
    sh = sharded["x"].sharding
    assert sh.spec[0] == spec.data_axis
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_shard_batch_pads_ragged():
    spec = create_mesh(MeshConfig())
    sharded = shard_batch(spec, {"x": np.ones((10, 2), np.float32)})
    assert sharded["x"].shape[0] == 16  # padded to multiple of 8


def test_replicate():
    spec = create_mesh(MeshConfig())
    tree = replicate(spec, {"w": jnp.ones((4, 4))})
    assert tree["w"].sharding.is_fully_replicated


def test_sharded_ensemble_matches_single_device(tiny_config, rng):
    """The fused graph under batch sharding over 8 virtual devices must
    produce the same detections as the unsharded run (GSPMD correctness)."""
    from iqc_tpu.models.ensemble import EnsemblePredictor

    pred = EnsemblePredictor(config=tiny_config)
    pred.confidence_threshold = 0.004
    images = rng.integers(0, 255, (8, 96, 96, 3), dtype=np.uint8)

    out_single = pred.run(images)
    out_sharded = pred.run_sharded(images)

    np.testing.assert_allclose(
        np.asarray(out_single.severity_counts),
        np.asarray(out_sharded.severity_counts),
    )
    np.testing.assert_allclose(
        np.asarray(out_single.global_probs),
        np.asarray(out_sharded.global_probs),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(out_single.valid), np.asarray(out_sharded.valid)
    )
    v = np.asarray(out_single.valid)
    np.testing.assert_allclose(
        np.asarray(out_single.boxes)[v],
        np.asarray(out_sharded.boxes)[v],
        rtol=1e-3, atol=0.1,
    )
