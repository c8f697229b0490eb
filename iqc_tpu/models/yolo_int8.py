"""True-int8 YOLOv8 inference path.

Why: the per-stage profile (RESULTS.md round 3) shows the yolov8n forward
pinned at the HBM bandwidth roofline — 15.85 GB accessed per batch-32 at
~800 GB/s, 6.8% MFU — because its small-channel high-resolution
activations must round-trip HBM in bf16. int8 halves the bytes the convs
read AND lets the MXU run at 2x rate, so unlike the compute-bound ResNet
case (models/resnet_int8.py) the win here is bandwidth first.

Scheme mirrors ``resnet_int8``: per-output-channel symmetric int8 weights
with the inference BatchNorm folded into the dequant affine; per-tensor
statically-calibrated activation scales; SiLU epilogues in bf16. The two
1x1 output projections (box_out / cls_out) stay bf16 — they are a
negligible FLOP/byte fraction and keep the DFL/cls logits exact.

Replaces the TensorRT-int8 engine the reference declares for its detector
but never ships (``/root/reference/config/config.yaml:139-150``,
``models/tensorrt_optimizer.py`` phantom).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from iqc_tpu.models.resnet_int8 import (
    _dyn_scale,
    _fold_bn,
    _quant_conv_weights,
    tree_size_bytes,
)
from iqc_tpu.models.yolo import _depth, _make_divisible, space_to_depth


def _pack_convbn(tree_p: Dict, tree_s: Dict) -> Dict:
    """One ConvBN submodule {Conv_0, BatchNorm_0} -> int8 pack."""
    w_q, w_scale = _quant_conv_weights(np.asarray(tree_p["Conv_0"]["kernel"]))
    # ConvBN's BatchNorm runs eps=1e-3 (models/yolo.py:58), not ResNet's 1e-5
    a, b = _fold_bn(tree_p["BatchNorm_0"], tree_s["BatchNorm_0"], eps=1e-3)
    return {
        "w_q": jnp.asarray(w_q),
        "mult": jnp.asarray(w_scale * a),
        "bias": jnp.asarray(b),
    }


def _pack_c2f(tree_p: Dict, tree_s: Dict) -> Dict:
    # numeric sort: lexicographic breaks at >=10 bottlenecks
    # ('C2fBottleneck_10' < 'C2fBottleneck_2') and silently corrupts the
    # packed order at user-set DEPTH_MULT
    bn = sorted((k for k in tree_p if k.startswith("C2fBottleneck_")),
                key=lambda k: int(k.rsplit("_", 1)[1]))
    return {
        "in": _pack_convbn(tree_p["ConvBN_0"], tree_s["ConvBN_0"]),
        "bottlenecks": [
            {
                "conv1": _pack_convbn(tree_p[k]["ConvBN_0"], tree_s[k]["ConvBN_0"]),
                "conv2": _pack_convbn(tree_p[k]["ConvBN_1"], tree_s[k]["ConvBN_1"]),
            }
            for k in bn
        ],
        "out": _pack_convbn(tree_p["ConvBN_1"], tree_s["ConvBN_1"]),
    }


def _pack_head(tree_p: Dict, tree_s: Dict) -> Dict:
    return {
        "box1": _pack_convbn(tree_p["ConvBN_0"], tree_s["ConvBN_0"]),
        "box2": _pack_convbn(tree_p["ConvBN_1"], tree_s["ConvBN_1"]),
        "cls1": _pack_convbn(tree_p["ConvBN_2"], tree_s["ConvBN_2"]),
        "cls2": _pack_convbn(tree_p["ConvBN_3"], tree_s["ConvBN_3"]),
        # output projections stay bf16 (exact logits, negligible cost)
        "box_out": {
            "kernel": jnp.asarray(tree_p["box_out"]["kernel"], jnp.float32),
            "bias": jnp.asarray(tree_p["box_out"]["bias"], jnp.float32),
        },
        "cls_out": {
            "kernel": jnp.asarray(tree_p["cls_out"]["kernel"], jnp.float32),
            "bias": jnp.asarray(tree_p["cls_out"]["bias"], jnp.float32),
        },
    }


def quantize_yolo(variables: Dict, stem_mode: str = "conv") -> Dict:
    """Trained YOLOv8 variables -> int8 inference tree (host-side, once)."""
    p, s = variables["params"], variables["batch_stats"]
    # NOTE: the stem flavor is encoded by which keys exist (stem_s2d vs
    # stem/down2) — tree structure is static under jit, so no string leaf.
    q: Dict[str, Any] = {}
    if stem_mode == "s2d":
        q["stem_s2d"] = _pack_convbn(p["stem_s2d"], s["stem_s2d"])
    else:
        q["stem"] = _pack_convbn(p["stem"], s["stem"])
        q["down2"] = _pack_convbn(p["down2"], s["down2"])
    for name in ("down3", "down4", "down5", "neck_down4", "neck_down5"):
        q[name] = _pack_convbn(p[name], s[name])
    for name in ("c2f_2", "c2f_3", "c2f_4", "c2f_5",
                 "neck_td4", "neck_td3", "neck_bu4", "neck_bu5"):
        q[name] = _pack_c2f(p[name], s[name])
    q["sppf"] = {
        "in": _pack_convbn(p["sppf"]["ConvBN_0"], s["sppf"]["ConvBN_0"]),
        "out": _pack_convbn(p["sppf"]["ConvBN_1"], s["sppf"]["ConvBN_1"]),
    }
    for name in ("head_p3", "head_p4", "head_p5"):
        q[name] = _pack_head(p[name], s[name])
    return q


def _qconvbn(x, layer, ctx, stride: int = 1, kernel: int = 3):
    """int8 conv + folded BN + SiLU -> bf16 NHWC (ConvBN mirror)."""
    i = ctx["i"]
    ctx["i"] = i + 1
    if ctx.get("scales") is not None:
        s_x = ctx["scales"][i]
    else:
        s_x = _dyn_scale(x)
    if ctx.get("collect") is not None:
        ctx["collect"].append(_dyn_scale(x))
    x_q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s_x), -127, 127
    ).astype(jnp.int8)
    p = kernel // 2
    dn = lax.conv_dimension_numbers(x_q.shape, layer["w_q"].shape,
                                    ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        x_q, layer["w_q"], (stride, stride), [(p, p), (p, p)],
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    mult = (s_x * layer["mult"]).astype(jnp.bfloat16)
    y = acc.astype(jnp.bfloat16) * mult + layer["bias"].astype(jnp.bfloat16)
    return jax.nn.silu(y)


def _bf16_conv1x1(x, layer):
    dn = lax.conv_dimension_numbers(
        x.shape, layer["kernel"].shape, ("NHWC", "HWIO", "NHWC")
    )
    y = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), layer["kernel"].astype(jnp.bfloat16),
        (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return y + layer["bias"]


def _c2f(x, block, ctx, shortcut: bool):
    y = _qconvbn(x, block["in"], ctx, kernel=1)
    c = y.shape[-1] // 2
    parts = [y[..., :c], y[..., c:]]
    for b in block["bottlenecks"]:
        z = _qconvbn(parts[-1], b["conv1"], ctx)
        z = _qconvbn(z, b["conv2"], ctx)
        if shortcut:
            z = parts[-1] + z
        parts.append(z)
    y = jnp.concatenate(parts, axis=-1)
    return _qconvbn(y, block["out"], ctx, kernel=1)


def _sppf(x, block, ctx):
    x = _qconvbn(x, block["in"], ctx, kernel=1)
    pool = lambda z: lax.reduce_window(
        z, jnp.array(-jnp.inf, z.dtype), lax.max,
        (1, 5, 5, 1), (1, 1, 1, 1), [(0, 0), (2, 2), (2, 2), (0, 0)],
    )
    p1 = pool(x)
    p2 = pool(p1)
    p3 = pool(p2)
    return _qconvbn(jnp.concatenate([x, p1, p2, p3], axis=-1),
                    block["out"], ctx, kernel=1)


def _upsample2x(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


def _head(x, block, ctx, reg_max: int, num_classes: int):
    b = _qconvbn(x, block["box1"], ctx)
    b = _qconvbn(b, block["box2"], ctx)
    dist = _bf16_conv1x1(b, block["box_out"])
    c = _qconvbn(x, block["cls1"], ctx)
    c = _qconvbn(c, block["cls2"], ctx)
    cls = _bf16_conv1x1(c, block["cls_out"])
    n, h, w, _ = dist.shape
    return (dist.reshape(n, h * w, 4 * reg_max),
            cls.reshape(n, h * w, num_classes))


def apply(
    q: Dict,
    images: jnp.ndarray,
    reg_max: int = 16,
    num_classes: int = 5,
    act_scales: Any = None,
    _collect: Any = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int8 forward, mirror of YOLOv8.__call__ eval mode
    (models/yolo.py:177-225). images: f32 NHWC (same preprocessing as the
    fp path) -> (dist_logits [B,A,4*reg_max], cls_logits [B,A,C]) f32."""
    ctx = {"i": 0, "scales": act_scales, "collect": _collect}
    x = images.astype(jnp.bfloat16)
    if "stem_s2d" in q:
        x = space_to_depth(x, 4)
        x = _qconvbn(x, q["stem_s2d"], ctx)
    else:
        x = _qconvbn(x, q["stem"], ctx, stride=2)
        x = _qconvbn(x, q["down2"], ctx, stride=2)
    x = _c2f(x, q["c2f_2"], ctx, True)
    x = _qconvbn(x, q["down3"], ctx, stride=2)
    p3 = _c2f(x, q["c2f_3"], ctx, True)
    x = _qconvbn(p3, q["down4"], ctx, stride=2)
    p4 = _c2f(x, q["c2f_4"], ctx, True)
    x = _qconvbn(p4, q["down5"], ctx, stride=2)
    x = _c2f(x, q["c2f_5"], ctx, True)
    p5 = _sppf(x, q["sppf"], ctx)

    n4 = _c2f(jnp.concatenate([_upsample2x(p5), p4], axis=-1),
              q["neck_td4"], ctx, False)
    o3 = _c2f(jnp.concatenate([_upsample2x(n4), p3], axis=-1),
              q["neck_td3"], ctx, False)
    d4 = _qconvbn(o3, q["neck_down4"], ctx, stride=2)
    o4 = _c2f(jnp.concatenate([d4, n4], axis=-1), q["neck_bu4"], ctx, False)
    d5 = _qconvbn(o4, q["neck_down5"], ctx, stride=2)
    o5 = _c2f(jnp.concatenate([d5, p5], axis=-1), q["neck_bu5"], ctx, False)

    dists, clss = [], []
    for feat, name in ((o3, "head_p3"), (o4, "head_p4"), (o5, "head_p5")):
        dist, cls = _head(feat, q[name], ctx, reg_max, num_classes)
        dists.append(dist)
        clss.append(cls)
    return (jnp.concatenate(dists, axis=1).astype(jnp.float32),
            jnp.concatenate(clss, axis=1).astype(jnp.float32))


def n_convs(depth_mult: float = 0.334, stem_mode: str = "conv") -> int:
    """Number of quantized convs in apply() call order (for scale arrays)."""
    n = _depth(3, depth_mult)      # c2f_2/c2f_5/neck blocks inner count
    n6 = _depth(6, depth_mult)     # c2f_3/c2f_4
    c2f = lambda k: 2 + 2 * k
    total = 1 if stem_mode == "s2d" else 2
    total += c2f(n) + 1 + c2f(n6) + 1 + c2f(n6) + 1 + c2f(n)  # backbone+downs
    total += 2                      # sppf in/out
    total += c2f(n) * 4             # 4 neck C2f blocks
    total += 2                      # neck downsamples
    total += 4 * 3                  # 3 heads x 4 ConvBN
    return total


def calibrate_activation_scales(q: Dict, sample_batches,
                                reg_max: int = 16, num_classes: int = 5):
    """Per-layer running absmax/127 over calibration batches (the TensorRT
    calibration-dataset step, config.yaml:148-150). Returns [n_convs] f32."""

    # q passes as an ARGUMENT: closing over the ~12 MB weight tree embeds
    # it as jit constants — the pathological pattern on the tunnel backend
    # (CLAUDE.md rule 1: ~300 s compiles), and this now runs on the
    # default int8 serving startup path
    def one(qq, batch):
        collect: list = []
        apply(qq, batch, reg_max, num_classes, act_scales=None,
              _collect=collect)
        return jnp.stack(collect)

    f = jax.jit(one)
    q_dev = jax.device_put(q)
    scales = None
    for batch in sample_batches:
        s = f(q_dev, jnp.asarray(batch))
        scales = s if scales is None else jnp.maximum(scales, s)
    return scales
