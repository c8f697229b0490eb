"""Streaming int8 ResNet (models/resnet_int8_stream.py) vs v1 and fp32.

v2 reuses v1's quantized tree AND calibrated scale vector verbatim; its
only numerical divergence from v1 is the residual shortcut, which reads
the block input back through its int8 codes instead of v1's unquantized
bf16 copy. These tests pin: closeness to v1 and fp32, top-1 agreement,
exactness of the quantize/max-pool commutation, jit-ability, and the
static-scales requirement.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iqc_tpu.models.resnet import ResNet50
from iqc_tpu.models import resnet_int8
from iqc_tpu.models import resnet_int8_stream as st

STAGES = (1, 1, 1, 1)


@pytest.fixture(scope="module")
def setup():
    module = ResNet50(num_classes=5, stage_sizes=STAGES, dtype=jnp.float32)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        train=False,
    )
    bs = jax.tree_util.tree_map(
        lambda x: x + 0.05 * np.random.default_rng(1)
        .standard_normal(x.shape).astype(x.dtype),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    q = resnet_int8.quantize_resnet(variables, stage_sizes=STAGES)
    cal = jax.random.normal(jax.random.PRNGKey(9), (8, 64, 64, 3),
                            jnp.float32)
    scales = resnet_int8.calibrate_activation_scales(q, [cal],
                                                     stage_sizes=STAGES)
    return module, variables, q, scales


def test_stream_matches_v1_closely(setup):
    """Same tree, same scales: v2 must track v1 to residual-requant noise
    and agree on every top-1 prediction."""
    module, variables, q, scales = setup
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 64, 64, 3), jnp.float32)
    v1 = np.asarray(resnet_int8.apply(q, x, stage_sizes=STAGES,
                                      act_scales=scales))
    v2 = np.asarray(st.apply(q, x, scales, stage_sizes=STAGES))
    assert v2.shape == v1.shape
    np.testing.assert_array_equal(np.argmax(v2, -1), np.argmax(v1, -1))
    corr = np.corrcoef(v1.ravel(), v2.ravel())[0, 1]
    assert corr > 0.999, corr


def test_stream_matches_fp32_predictions(setup):
    module, variables, q, scales = setup
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 64, 64, 3), jnp.float32)
    want = np.asarray(module.apply(variables, x, train=False))
    got = np.asarray(st.apply(q, x, scales, stage_sizes=STAGES))
    np.testing.assert_array_equal(np.argmax(got, -1), np.argmax(want, -1))
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.995, corr


def test_quantize_maxpool_commute_exactly():
    """The stem reorders v1's pool-then-quantize into quantize-then-pool;
    monotonicity makes that bit-exact for the non-negative relu output."""
    x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(4),
                                      (2, 16, 16, 8), jnp.float32)
                    ).astype(jnp.bfloat16)
    s = jnp.float32(0.037)
    a = st._quant(resnet_int8.nn_max_pool(x), s)          # v1 order
    b = resnet_int8.nn_max_pool(st._quant(x, s))          # v2 order
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stream_requires_static_scales(setup):
    _, _, q, _ = setup
    with pytest.raises(AssertionError):
        st.apply(q, jnp.ones((1, 64, 64, 3), jnp.float32), None,
                 stage_sizes=STAGES)


def test_stream_jits_and_is_finite(setup):
    _, _, q, scales = setup
    f = jax.jit(lambda qq, ss, x: st.apply(qq, x, ss, stage_sizes=STAGES))
    out = f(q, scales, jnp.ones((2, 64, 64, 3), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_stream_wires_into_int8_ensemble(tiny_config, monkeypatch):
    """IQC_RESNET_INT8_STREAM=1 under int8 serving swaps the classifier to
    the streaming walk and still serves the full predict chain."""
    monkeypatch.setenv("IQC_RESNET_INT8_STREAM", "1")
    cfg = tiny_config.update({"edge": {"precision": "int8"}})
    from iqc_tpu.inference.detector import QualityControlDetector

    det = QualityControlDetector(config=cfg)
    ens = det.ensemble_predictor
    assert "streaming v2" in ens.precision_report["resnet"]
    img = np.random.default_rng(0).integers(0, 255, (96, 96, 3),
                                            dtype=np.uint8)
    out = det.predict(img)
    assert "quality_assessment" in out
