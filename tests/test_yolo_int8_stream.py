"""Streaming int8 YOLOv8 path (models/yolo_int8_stream.py): plan/calib/quant
tensor-id agreement, fp parity, code-level invariants, and the fused-builder
hook. Mirrors tests/test_yolo_int8.py; hardware mAP parity runs via
``INT8_STREAM=1 scripts/eval_yolo.py``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iqc_tpu.models import yolo_int8_stream as st
from iqc_tpu.models.yolo import YOLOv8


def _trained_like_variables(m, rng, x):
    """init + non-trivial batch_stats so BN folding is actually exercised."""
    import flax

    v = m.init(rng, x, train=False)
    flat = flax.traverse_util.flatten_dict(v["batch_stats"])
    out = {}
    for k, a in flat.items():
        key = jax.random.PRNGKey(abs(hash(k)) % (2**31))
        if k[-1] == "var":
            out[k] = jnp.abs(jax.random.normal(key, a.shape)) * 0.5 + 0.5
        else:
            out[k] = jax.random.normal(key, a.shape) * 0.1
    return {"params": v["params"],
            "batch_stats": flax.traverse_util.unflatten_dict(out)}


@pytest.fixture(scope="module")
def small_yolo():
    m = YOLOv8(num_classes=5, width_mult=0.25, depth_mult=0.334)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (1, 64, 64, 3))
    v = _trained_like_variables(m, rng, x)
    return m, v, x


@pytest.fixture(scope="module")
def quantized(small_yolo):
    m, v, x = small_yolo
    fp = st.fold_fp(v)
    scales = st.calibrate(fp, [x])
    q = st.quantize(v, scales)
    return q, scales


def test_n_tensors_matches_plan(small_yolo):
    m, v, x = small_yolo
    fp = st.fold_fp(v)
    ctx = {"mode": "plan", "t": 0, "plans": {}}
    st._forward(fp, None, ctx, 16, 5)
    assert ctx["t"] == st.n_tensors()
    scales = st.calibrate(fp, [x])
    assert scales.shape == (st.n_tensors(),)


def test_calib_matches_fp_forward(small_yolo):
    """The BN-folded calib forward IS the fp model (bf16 tolerance)."""
    m, v, x = small_yolo
    dist_fp, cls_fp = m.apply(v, x, train=False)
    fp = st.fold_fp(v)
    ctx = {"mode": "calib", "t": 0, "collect": []}
    dist_c, cls_c = st._forward(
        jax.tree_util.tree_map(jnp.asarray, fp), x, ctx, 16, 5)
    np.testing.assert_allclose(np.asarray(dist_c), np.asarray(dist_fp),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(cls_c), np.asarray(cls_fp),
                               rtol=0.05, atol=0.08)


def test_stream_forward_matches_fp(small_yolo, quantized):
    m, v, x = small_yolo
    q, scales = quantized
    dist_fp, cls_fp = m.apply(v, x, train=False)
    dist_q, cls_q = st.apply(q, x, scales)
    assert dist_q.shape == dist_fp.shape and cls_q.shape == cls_fp.shape
    for a, b in ((dist_q, dist_fp), (cls_q, cls_fp)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.99, f"stream int8 forward diverged (corr={corr:.4f})"


def test_stream_close_to_v1(small_yolo, quantized):
    """v2 must track the v1 int8 path at least as well as v1 tracks fp —
    they share every quantization point on pure chains."""
    from iqc_tpu.models import yolo_int8

    m, v, x = small_yolo
    q2, scales2 = quantized
    q1 = yolo_int8.quantize_yolo(v)
    s1 = yolo_int8.calibrate_activation_scales(q1, [x])
    dist1, cls1 = yolo_int8.apply(q1, x, act_scales=s1)
    dist2, cls2 = st.apply(q2, x, scales2)
    corr = np.corrcoef(np.asarray(cls1, np.float64).ravel(),
                       np.asarray(cls2, np.float64).ravel())[0, 1]
    assert corr > 0.99, f"v2 diverged from v1 (corr={corr:.4f})"


def test_weights_are_int8_activation_codes_int8(quantized):
    """All conv kernels are int8; the tree is a pure array pytree (jit arg
    safe), and the jitted forward runs with scales as a traced argument."""
    q, scales = quantized
    n_int8 = 0
    for leaf in jax.tree_util.tree_leaves(q):
        assert hasattr(leaf, "dtype"), f"non-array leaf {type(leaf)}"
        n_int8 += leaf.dtype == jnp.int8
    assert n_int8 > 50  # every ConvBN kernel
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    f = jax.jit(lambda qq, ss, xx: st.apply(qq, xx, ss))
    dist, cls = f(q, scales, x)
    assert np.isfinite(np.asarray(dist)).all()
    assert np.isfinite(np.asarray(cls)).all()


def test_s2d_stem_structure():
    m = YOLOv8(num_classes=5, width_mult=0.25, depth_mult=0.334,
               stem_mode="s2d")
    rng = jax.random.PRNGKey(1)
    x = jax.random.uniform(rng, (1, 64, 64, 3))
    v = _trained_like_variables(m, rng, x)
    fp = st.fold_fp(v, stem_mode="s2d")
    assert "stem_s2d" in fp and "stem" not in fp
    scales = st.calibrate(fp, [x])
    assert scales.shape == (st.n_tensors(stem_mode="s2d"),)
    q = st.quantize(v, scales, stem_mode="s2d")
    dist_fp, cls_fp = m.apply(v, x, train=False)
    dist_q, _ = st.apply(q, x, scales)
    assert dist_q.shape == dist_fp.shape
    assert st.n_tensors(stem_mode="s2d") == st.n_tensors() - 1


def test_pool_and_upsample_commute_with_quantization():
    """The int8-resident claims this path rests on: max-pool and 2x nearest
    upsample commute with absmax quantization bit-exactly."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32))
    s = float(jnp.max(jnp.abs(x))) / 127.0
    codes = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
    pooled_codes, _ = st._qpool5((codes, [(0, 4)]))
    pooled_vals, _ = st._qpool5((x, [(0, 4)]))
    q_of_pooled = jnp.clip(jnp.round(pooled_vals / s), -127, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(pooled_codes),
                                  np.asarray(q_of_pooled))
    up_codes, _ = st._qup2((codes, [(0, 4)]))
    up_vals, _ = st._qup2((x, [(0, 4)]))
    q_of_up = jnp.clip(jnp.round(up_vals / s), -127, 127).astype(jnp.int8)
    np.testing.assert_array_equal(np.asarray(up_codes), np.asarray(q_of_up))


def test_fused_builder_yolo_apply_hook(small_yolo, quantized):
    """build_ensemble_forward(yolo_apply=...) runs the streaming detector
    inside the fused graph and produces finite outputs."""
    from iqc_tpu.models.ensemble import build_ensemble_forward
    from iqc_tpu.models.resnet import ResNet50
    from iqc_tpu.models.yolo import STRIDES, feature_shapes
    from iqc_tpu.ops.nms import make_anchors

    m, v, x = small_yolo
    q, scales = quantized
    resnet = ResNet50(num_classes=5, stage_sizes=(1, 1, 1, 1))
    rng = jax.random.PRNGKey(2)
    rv = resnet.init(rng, jnp.zeros((1, 48, 48, 3)), train=False)
    yolo_vars = {"q": q, "scales": scales}
    fwd = build_ensemble_forward(
        m, resnet, (64, 64), 16, 4, classifier_input=48,
        yolo_apply=lambda vv, xx: st.apply(vv["q"], xx, vv["scales"]),
    )
    anc, strd = make_anchors(feature_shapes((64, 64)), STRIDES)
    out = fwd(yolo_vars, rv, jnp.zeros((2, 64, 64, 3), jnp.float32),
              jnp.float32(0.25), jnp.float32(0.45),
              jnp.float32(0.6), jnp.float32(0.4), anc, strd)
    for leaf in jax.tree_util.tree_leaves(out):
        if leaf.dtype != jnp.bool_:
            assert np.isfinite(np.asarray(leaf, np.float32)).all()
