"""int8 YOLOv8 path (models/yolo_int8.py): structure, parity with the fp
forward, calibration, and the fused-builder yolo_apply hook.

The fp-parity bound matters: the int8 detector must produce the same
detections the bf16 one does (mAP parity is measured on hardware via
``INT8=1 scripts/eval_yolo.py``; this pins the kernel-level agreement).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iqc_tpu.models import yolo_int8
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


def test_n_convs_matches_apply_order(small_yolo):
    m, v, x = small_yolo
    q = yolo_int8.quantize_yolo(v)
    collect = []
    yolo_int8.apply(q, x, _collect=collect)
    assert yolo_int8.n_convs() == len(collect)


def test_int8_forward_matches_fp(small_yolo):
    m, v, x = small_yolo
    dist_fp, cls_fp = m.apply(v, x, train=False)
    q = yolo_int8.quantize_yolo(v)
    scales = yolo_int8.calibrate_activation_scales(q, [x])
    dist_q, cls_q = yolo_int8.apply(q, x, act_scales=scales)
    assert dist_q.shape == dist_fp.shape and cls_q.shape == cls_fp.shape
    for a, b in ((dist_q, dist_fp), (cls_q, cls_fp)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.99, f"int8 forward diverged (corr={corr:.4f})"


def test_int8_tree_is_jit_safe(small_yolo):
    """The quantized tree must be a pure array pytree (the stem flavor is
    encoded structurally, not as a string leaf) so it can be a jit arg."""
    m, v, x = small_yolo
    q = yolo_int8.quantize_yolo(v)
    for leaf in jax.tree_util.tree_leaves(q):
        assert hasattr(leaf, "dtype"), f"non-array leaf {type(leaf)}"
    scales = yolo_int8.calibrate_activation_scales(q, [x])
    f = jax.jit(lambda qq, ss, xx: yolo_int8.apply(qq, xx, act_scales=ss))
    dist, cls = f(q, scales, x)
    assert np.isfinite(np.asarray(dist)).all()


def test_s2d_stem_structure():
    m = YOLOv8(num_classes=5, width_mult=0.25, depth_mult=0.334,
               stem_mode="s2d")
    rng = jax.random.PRNGKey(1)
    x = jax.random.uniform(rng, (1, 64, 64, 3))
    v = _trained_like_variables(m, rng, x)
    q = yolo_int8.quantize_yolo(v, stem_mode="s2d")
    assert "stem_s2d" in q and "stem" not in q
    dist_fp, cls_fp = m.apply(v, x, train=False)
    dist_q, cls_q = yolo_int8.apply(q, x)
    assert dist_q.shape == dist_fp.shape
    assert yolo_int8.n_convs(stem_mode="s2d") == yolo_int8.n_convs() - 1


def test_fused_builder_yolo_apply_hook(small_yolo):
    """build_ensemble_forward(yolo_apply=...) runs the int8 detector inside
    the fused graph and produces finite outputs."""
    from iqc_tpu.models.ensemble import build_ensemble_forward
    from iqc_tpu.models.resnet import ResNet50
    from iqc_tpu.models.yolo import STRIDES, feature_shapes
    from iqc_tpu.ops.nms import make_anchors

    m, v, x = small_yolo
    resnet = ResNet50(num_classes=5, stage_sizes=(1, 1, 1, 1))
    rng = jax.random.PRNGKey(2)
    rv = resnet.init(rng, jnp.zeros((1, 48, 48, 3)), train=False)
    q = yolo_int8.quantize_yolo(v)
    scales = yolo_int8.calibrate_activation_scales(q, [x])
    yolo_vars = {"q": q, "scales": scales}
    fwd = build_ensemble_forward(
        m, resnet, (64, 64), 16, 4, classifier_input=48,
        yolo_apply=lambda vv, xx: yolo_int8.apply(
            vv["q"], xx, act_scales=vv["scales"]),
    )
    anc, strd = make_anchors(feature_shapes((64, 64)), STRIDES)
    out = fwd(yolo_vars, rv, jnp.zeros((2, 64, 64, 3), jnp.float32),
              jnp.float32(0.25), jnp.float32(0.45),
              jnp.float32(0.6), jnp.float32(0.4), anc, strd)
    for leaf in jax.tree_util.tree_leaves(out):
        if leaf.dtype != jnp.bool_:
            assert np.isfinite(np.asarray(leaf, np.float32)).all()
