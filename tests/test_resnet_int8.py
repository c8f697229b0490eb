"""int8 MXU ResNet inference vs the fp32 reference forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iqc_tpu.models.resnet import ResNet50
from iqc_tpu.models import resnet_int8


@pytest.fixture(scope="module")
def tiny_resnet():
    module = ResNet50(num_classes=5, stage_sizes=(1, 1, 1, 1), dtype=jnp.float32)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
    )
    # perturb batch_stats so BN folding is non-trivial (init stats are 0/1)
    bs = jax.tree_util.tree_map(
        lambda x: x + 0.05 * np.random.default_rng(1).standard_normal(x.shape).astype(x.dtype),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    return module, variables


def test_int8_logits_match_fp32(tiny_resnet):
    module, variables = tiny_resnet
    q = resnet_int8.quantize_resnet(variables, stage_sizes=(1, 1, 1, 1))
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 64, 64, 3), jnp.float32)
    want = module.apply(variables, x, train=False)
    got = resnet_int8.apply(q, x, stage_sizes=(1, 1, 1, 1))
    assert got.shape == want.shape
    # top-1 agreement and close logits (PTQ tolerance)
    np.testing.assert_array_equal(
        np.argmax(np.asarray(got), -1), np.argmax(np.asarray(want), -1)
    )
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(want).ravel())[0, 1]
    assert corr > 0.995, corr


def test_int8_weights_are_int8_and_smaller(tiny_resnet):
    module, variables = tiny_resnet
    q = resnet_int8.quantize_resnet(variables, stage_sizes=(1, 1, 1, 1))
    assert q["stem"]["w_q"].dtype == jnp.int8
    assert q["stages"][0][0]["conv2"]["w_q"].dtype == jnp.int8
    from iqc_tpu.models.optimizer import _tree_size_bytes

    fp_bytes = _tree_size_bytes(variables)
    q_bytes = resnet_int8.tree_size_bytes(q)
    assert q_bytes < 0.45 * fp_bytes  # convs ~4x smaller; head/dequant in f32


def test_int8_apply_jits(tiny_resnet):
    module, variables = tiny_resnet
    q = resnet_int8.quantize_resnet(variables, stage_sizes=(1, 1, 1, 1))
    f = jax.jit(lambda qq, x: resnet_int8.apply(qq, x, stage_sizes=(1, 1, 1, 1)))
    out = f(q, jnp.ones((2, 64, 64, 3), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


def test_int8_static_scales_match_dynamic(tiny_resnet):
    module, variables = tiny_resnet
    q = resnet_int8.quantize_resnet(variables, stage_sizes=(1, 1, 1, 1))
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 64, 64, 3), jnp.float32)
    scales = resnet_int8.calibrate_activation_scales(q, [x], stage_sizes=(1, 1, 1, 1))
    assert scales.shape == (resnet_int8.n_convs((1, 1, 1, 1)),)
    dyn = resnet_int8.apply(q, x, stage_sizes=(1, 1, 1, 1))
    stat = resnet_int8.apply(q, x, stage_sizes=(1, 1, 1, 1), act_scales=scales)
    # calibrated on the same batch -> identical quantization decisions
    np.testing.assert_allclose(np.asarray(stat), np.asarray(dyn), rtol=0.05, atol=0.1)
    want = module.apply(variables, x, train=False)
    np.testing.assert_array_equal(
        np.argmax(np.asarray(stat), -1), np.argmax(np.asarray(want), -1)
    )
