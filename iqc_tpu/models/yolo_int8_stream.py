"""Streaming (int8-resident) YOLOv8 inference path — v2 of the int8 detector.

Why v2: the v1 path (``models/yolo_int8.py``) quantizes each conv's INPUT
with a per-call scale, so between two convs the activation round-trips HBM
as bf16 (producer epilogue writes bf16, consumer's quantize reads bf16 and
writes int8): up to 6 bytes/element of inter-layer traffic. The hardware
profile pins yolov8n at the HBM roofline (12.45 GB/batch-32 at ~790 GB/s,
docs/profile_int8_r4.json), so bytes ARE the runtime. v2 assigns every
activation tensor ONE static scale and quantizes it once, in the producer's
epilogue — activations live in HBM as int8 codes end-to-end:

- concats / slices / 2x nearest-neighbour upsampling / SPPF max-pooling all
  operate directly on the codes (quantization is monotonic and elementwise,
  so max-pool, nearest resize, slicing and concatenation commute with it
  bit-exactly);
- each conv consumes raw codes: the per-input-channel dequant scales are
  folded into the conv WEIGHTS before weight quantization (the per-tensor
  scale composition of every conv input — including mixed-scale concats —
  is recovered by a symbolic "plan" pass over the same forward);
- C2f residual shortcuts add the (not-yet-quantized) conv output to the
  dequantized skip codes in bf16, then the sum is quantized once;
- the two head output projections (box_out / cls_out) stay bf16 exactly as
  in v1: their inputs (box2/cls2 outputs) are never quantized.

Numerics vs v1: on pure single-consumer chains the quantization points and
scales are identical (per-tensor absmax == v1's per-call input absmax, and
scalar scale folding commutes with per-output-channel weight quantization),
so those layers agree to weight-rounding; at concat consumers v2 quantizes
each part with its own (tighter) scale instead of one joint concat scale,
and at residual shortcuts the skip branch is read back through its codes —
both are plain absmax/127 quantizations. fp-parity is pinned by
``tests/test_yolo_int8_stream.py`` and mAP parity on hardware via
``INT8_STREAM=1 scripts/eval_yolo.py``.

Replaces the TensorRT-int8 engine the reference declares for its detector
but never ships (``/root/reference/config/config.yaml:139-150``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from iqc_tpu.models.yolo import _depth, space_to_depth

Comp = List[Tuple[int, int]]  # [(tensor_id, n_channels), ...] of a value
QT = Tuple[Optional[jnp.ndarray], Comp]  # (codes|float|None, composition)

_NO_TID = -1  # composition marker for never-quantized (float) values


# --------------------------------------------------------------------------
# fp folding (host, once)
# --------------------------------------------------------------------------

def _fold_convbn_fp(tree_p: Dict, tree_s: Dict) -> Dict:
    """ConvBN {Conv_0, BatchNorm_0} -> {w_f: W*bn_slope (HWIO f32), bias}.

    Folding the BN slope into the kernel BEFORE weight quantization is
    equivalent to v1's post-hoc ``mult = w_scale * a``: a per-output-channel
    scalar scales that column's absmax linearly, so the int8 codes match up
    to the sign of the slope, which the dequant multiplier carries too.
    """
    w = np.asarray(tree_p["Conv_0"]["kernel"], np.float32)
    gamma = np.asarray(tree_p["BatchNorm_0"]["scale"], np.float32)
    beta = np.asarray(tree_p["BatchNorm_0"]["bias"], np.float32)
    mean = np.asarray(tree_s["BatchNorm_0"]["mean"], np.float32)
    var = np.asarray(tree_s["BatchNorm_0"]["var"], np.float32)
    a = gamma / np.sqrt(var + 1e-3)  # ConvBN runs eps=1e-3 (models/yolo.py:75)
    return {"w_f": w * a[None, None, None, :], "bias": beta - mean * a}


def _fold_c2f_fp(tree_p: Dict, tree_s: Dict) -> Dict:
    # numeric sort: lexicographic breaks at >=10 bottlenecks
    # ('C2fBottleneck_10' < 'C2fBottleneck_2') and silently corrupts the
    # folded order at user-set DEPTH_MULT
    bn = sorted((k for k in tree_p if k.startswith("C2fBottleneck_")),
                key=lambda k: int(k.rsplit("_", 1)[1]))
    return {
        "in": _fold_convbn_fp(tree_p["ConvBN_0"], tree_s["ConvBN_0"]),
        "bottlenecks": [
            {
                "conv1": _fold_convbn_fp(tree_p[k]["ConvBN_0"], tree_s[k]["ConvBN_0"]),
                "conv2": _fold_convbn_fp(tree_p[k]["ConvBN_1"], tree_s[k]["ConvBN_1"]),
            }
            for k in bn
        ],
        "out": _fold_convbn_fp(tree_p["ConvBN_1"], tree_s["ConvBN_1"]),
    }


def _fold_head_fp(tree_p: Dict, tree_s: Dict) -> Dict:
    return {
        "box1": _fold_convbn_fp(tree_p["ConvBN_0"], tree_s["ConvBN_0"]),
        "box2": _fold_convbn_fp(tree_p["ConvBN_1"], tree_s["ConvBN_1"]),
        "cls1": _fold_convbn_fp(tree_p["ConvBN_2"], tree_s["ConvBN_2"]),
        "cls2": _fold_convbn_fp(tree_p["ConvBN_3"], tree_s["ConvBN_3"]),
        # output projections stay bf16 (exact logits, negligible cost)
        "box_out": {
            "kernel": np.asarray(tree_p["box_out"]["kernel"], np.float32),
            "bias": np.asarray(tree_p["box_out"]["bias"], np.float32),
        },
        "cls_out": {
            "kernel": np.asarray(tree_p["cls_out"]["kernel"], np.float32),
            "bias": np.asarray(tree_p["cls_out"]["bias"], np.float32),
        },
    }


def fold_fp(variables: Dict, stem_mode: str = "conv") -> Dict:
    """Trained YOLOv8 variables -> BN-folded fp32 tree (calibration form).

    Mirrors ``yolo_int8.quantize_yolo``'s tree shape (yolo_int8.py:84-106)
    with {w_f, bias} conv leaves instead of int8 packs.
    """
    p, s = variables["params"], variables["batch_stats"]
    fp: Dict[str, Any] = {}
    if stem_mode == "s2d":
        fp["stem_s2d"] = _fold_convbn_fp(p["stem_s2d"], s["stem_s2d"])
    else:
        fp["stem"] = _fold_convbn_fp(p["stem"], s["stem"])
        fp["down2"] = _fold_convbn_fp(p["down2"], s["down2"])
    for name in ("down3", "down4", "down5", "neck_down4", "neck_down5"):
        fp[name] = _fold_convbn_fp(p[name], s[name])
    for name in ("c2f_2", "c2f_3", "c2f_4", "c2f_5",
                 "neck_td4", "neck_td3", "neck_bu4", "neck_bu5"):
        fp[name] = _fold_c2f_fp(p[name], s[name])
    fp["sppf"] = {
        "in": _fold_convbn_fp(p["sppf"]["ConvBN_0"], s["sppf"]["ConvBN_0"]),
        "out": _fold_convbn_fp(p["sppf"]["ConvBN_1"], s["sppf"]["ConvBN_1"]),
    }
    for name in ("head_p3", "head_p4", "head_p5"):
        fp[name] = _fold_head_fp(p[name], s[name])
    return fp


# --------------------------------------------------------------------------
# the three-mode forward: "plan" (symbolic), "calib" (float), "quant" (int8)
# --------------------------------------------------------------------------

def _out_channels(layer: Dict) -> int:
    key = "w_f" if "w_f" in layer else "w_q"
    return int(layer[key].shape[-1])


def _emit(ctx: Dict, y, channels: int) -> QT:
    """Assign the next tensor id and quantize y with its static scale."""
    tid = ctx["t"]
    ctx["t"] = tid + 1
    if ctx["mode"] == "plan":
        return None, [(tid, channels)]
    if ctx["mode"] == "calib":
        ctx["collect"].append(jnp.maximum(
            jnp.max(jnp.abs(y.astype(jnp.float32))) / 127.0, 1e-12))
        return y, [(tid, channels)]
    s = ctx["scales"][tid]
    codes = jnp.clip(
        jnp.round(y.astype(jnp.float32) / s), -127, 127
    ).astype(jnp.int8)
    return codes, [(tid, channels)]


def _deq(qt: QT, ctx: Dict):
    """Codes -> bf16 values (calib mode already carries float values)."""
    val, comp = qt
    if ctx["mode"] == "calib":
        return val.astype(jnp.bfloat16)
    (tid, _), = comp  # single-tensor values only (slices keep their tid)
    s = ctx["scales"][tid].astype(jnp.bfloat16)
    return val.astype(jnp.bfloat16) * s


def _qcb(qt: QT, layer: Dict, ctx: Dict, stride: int = 1, kernel: int = 3,
         emit: bool = True, add_qt: Optional[QT] = None) -> QT:
    """Quantized ConvBN + SiLU (+ optional residual add) -> next tensor.

    In quant mode the input is raw int8 codes — the per-input-channel
    dequant scales were folded into ``w_q`` at pack time — and the output
    is re-quantized in the same epilogue fusion (int8 in HBM both sides).
    ``emit=False`` returns the bf16 SiLU output unquantized (head tails).
    ``add_qt`` applies the C2f shortcut: y = deq(add_qt) + silu_out, then
    the SUM is quantized once (models/yolo.py:89-91 adds after SiLU).
    """
    x, comp = qt
    co = _out_channels(layer)
    if ctx["mode"] == "plan":
        ctx["plans"][id(layer)] = list(comp)
        if not emit:
            return None, [(_NO_TID, co)]
        return _emit(ctx, None, co)
    p = kernel // 2
    if ctx["mode"] == "calib":
        w = layer["w_f"].astype(jnp.bfloat16)
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        acc = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w, (stride, stride), [(p, p), (p, p)],
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
        y = acc.astype(jnp.bfloat16) + layer["bias"].astype(jnp.bfloat16)
    else:
        dn = lax.conv_dimension_numbers(x.shape, layer["w_q"].shape,
                                        ("NHWC", "HWIO", "NHWC"))
        acc = lax.conv_general_dilated(
            x, layer["w_q"], (stride, stride), [(p, p), (p, p)],
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.bfloat16) * layer["mult"].astype(jnp.bfloat16)
             + layer["bias"].astype(jnp.bfloat16))
    y = jax.nn.silu(y)
    if add_qt is not None:
        y = y + _deq(add_qt, ctx)
    if not emit:
        return y, [(_NO_TID, co)]
    return _emit(ctx, y, co)


def _qconcat(qts: List[QT]) -> QT:
    comp: Comp = []
    for _, c in qts:
        comp.extend(c)
    vals = [v for v, _ in qts]
    if vals[0] is None:  # plan
        return None, comp
    return jnp.concatenate(vals, axis=-1), comp


def _comp_slice(comp: Comp, lo: int, hi: int) -> Comp:
    out: Comp = []
    pos = 0
    for tid, n in comp:
        s, e = max(lo, pos), min(hi, pos + n)
        if e > s:
            out.append((tid, e - s))
        pos += n
    return out


def _qslice(qt: QT, lo: int, hi: int) -> QT:
    val, comp = qt
    sliced = None if val is None else val[..., lo:hi]
    return sliced, _comp_slice(comp, lo, hi)


def _qpool5(qt: QT) -> QT:
    """5x5/1 max-pool on the codes: quantization is monotonic, so pooling
    codes == pooling values, bit-exactly (SPPF, models/yolo.py:123)."""
    val, comp = qt
    if val is None:
        return None, comp
    init = (jnp.array(-jnp.inf, val.dtype) if jnp.issubdtype(val.dtype, jnp.floating)
            else jnp.array(jnp.iinfo(val.dtype).min, val.dtype))
    out = lax.reduce_window(
        val, init, lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)],
    )
    return out, comp


def _qup2(qt: QT) -> QT:
    """2x nearest-neighbour upsample as a dtype-agnostic broadcast (exact
    on codes; jax.image.resize would force a float path)."""
    val, comp = qt
    if val is None:
        return None, comp
    b, h, w, c = val.shape
    out = jnp.broadcast_to(val[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return out.reshape(b, 2 * h, 2 * w, c), comp


def _qs2d(qt: QT) -> QT:
    val, comp = qt
    # channel comp quadruples in interleaved (hw-block, channel) order; all
    # our s2d inputs are single-tensor (the quantized image), so the comp
    # stays one run with 16x the channels.
    (tid, n), = qt[1]
    comp2 = [(tid, 16 * n)]
    if val is None:
        return None, comp2
    return space_to_depth(val, 4), comp2


def _quant_input(images, ctx: Dict) -> QT:
    """The network input is tensor id 0 (v1 quantizes it the same way as
    every conv input; here the scale is calibrated per-tensor)."""
    tid = ctx["t"]
    ctx["t"] = tid + 1
    if ctx["mode"] == "plan":
        return None, [(tid, 3)]
    if ctx["mode"] == "calib":
        ctx["collect"].append(jnp.maximum(
            jnp.max(jnp.abs(images.astype(jnp.float32))) / 127.0, 1e-12))
        return images.astype(jnp.bfloat16), [(tid, 3)]
    s = ctx["scales"][tid]
    codes = jnp.clip(
        jnp.round(images.astype(jnp.float32) / s), -127, 127
    ).astype(jnp.int8)
    return codes, [(tid, 3)]


def _c2f(qt: QT, block: Dict, ctx: Dict, shortcut: bool) -> QT:
    y = _qcb(qt, block["in"], ctx, kernel=1)
    c = sum(n for _, n in y[1]) // 2
    parts = [_qslice(y, 0, c), _qslice(y, c, 2 * c)]
    for b in block["bottlenecks"]:
        z1 = _qcb(parts[-1], b["conv1"], ctx)
        if shortcut:
            z = _qcb(z1, b["conv2"], ctx, add_qt=parts[-1])
        else:
            z = _qcb(z1, b["conv2"], ctx)
        parts.append(z)
    return _qcb(_qconcat(parts), block["out"], ctx, kernel=1)


def _sppf(qt: QT, block: Dict, ctx: Dict) -> QT:
    x = _qcb(qt, block["in"], ctx, kernel=1)
    p1 = _qpool5(x)
    p2 = _qpool5(p1)
    p3 = _qpool5(p2)
    return _qcb(_qconcat([x, p1, p2, p3]), block["out"], ctx, kernel=1)


def _bf16_conv1x1(x, layer):
    dn = lax.conv_dimension_numbers(
        x.shape, layer["kernel"].shape, ("NHWC", "HWIO", "NHWC")
    )
    y = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), jnp.asarray(layer["kernel"], jnp.bfloat16),
        (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return y + jnp.asarray(layer["bias"], jnp.float32)


def _head(qt: QT, block: Dict, ctx: Dict, reg_max: int, num_classes: int):
    b1 = _qcb(qt, block["box1"], ctx)
    b2, _ = _qcb(b1, block["box2"], ctx, emit=False)
    c1 = _qcb(qt, block["cls1"], ctx)
    c2, _ = _qcb(c1, block["cls2"], ctx, emit=False)
    if ctx["mode"] == "plan":
        return None, None
    dist = _bf16_conv1x1(b2, block["box_out"])
    cls = _bf16_conv1x1(c2, block["cls_out"])
    n, h, w, _ = dist.shape
    return (dist.reshape(n, h * w, 4 * reg_max),
            cls.reshape(n, h * w, num_classes))


def _forward(tree: Dict, images, ctx: Dict, reg_max: int, num_classes: int):
    """One body for all three modes — tensor ids assigned by call order, so
    plan/calib/quant agree by construction (mirror of yolo_int8.apply,
    itself mirroring YOLOv8.__call__ eval mode, models/yolo.py:195-243)."""
    qt = _quant_input(images, ctx)
    if "stem_s2d" in tree:
        qt = _qs2d(qt)
        qt = _qcb(qt, tree["stem_s2d"], ctx)
    else:
        qt = _qcb(qt, tree["stem"], ctx, stride=2)
        qt = _qcb(qt, tree["down2"], ctx, stride=2)
    qt = _c2f(qt, tree["c2f_2"], ctx, True)
    qt = _qcb(qt, tree["down3"], ctx, stride=2)
    p3 = _c2f(qt, tree["c2f_3"], ctx, True)
    qt = _qcb(p3, tree["down4"], ctx, stride=2)
    p4 = _c2f(qt, tree["c2f_4"], ctx, True)
    qt = _qcb(p4, tree["down5"], ctx, stride=2)
    qt = _c2f(qt, tree["c2f_5"], ctx, True)
    p5 = _sppf(qt, tree["sppf"], ctx)

    n4 = _c2f(_qconcat([_qup2(p5), p4]), tree["neck_td4"], ctx, False)
    o3 = _c2f(_qconcat([_qup2(n4), p3]), tree["neck_td3"], ctx, False)
    d4 = _qcb(o3, tree["neck_down4"], ctx, stride=2)
    o4 = _c2f(_qconcat([d4, n4]), tree["neck_bu4"], ctx, False)
    d5 = _qcb(o4, tree["neck_down5"], ctx, stride=2)
    o5 = _c2f(_qconcat([d5, p5]), tree["neck_bu5"], ctx, False)

    dists, clss = [], []
    for feat, name in ((o3, "head_p3"), (o4, "head_p4"), (o5, "head_p5")):
        dist, cls = _head(feat, tree[name], ctx, reg_max, num_classes)
        dists.append(dist)
        clss.append(cls)
    if ctx["mode"] == "plan":
        return None
    return (jnp.concatenate(dists, axis=1).astype(jnp.float32),
            jnp.concatenate(clss, axis=1).astype(jnp.float32))


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def n_tensors(depth_mult: float = 0.334, stem_mode: str = "conv") -> int:
    """Number of quantized tensors (= scale slots): the input + every ConvBN
    output except the 6 head tails (box2/cls2 x 3 stay bf16). Shortcut adds
    reuse their conv2's slot (the sum is what gets quantized)."""
    from iqc_tpu.models.yolo_int8 import n_convs

    return 1 + n_convs(depth_mult, stem_mode) - 6


def calibrate(fp_tree: Dict, sample_batches, reg_max: int = 16,
              num_classes: int = 5) -> jnp.ndarray:
    """Per-tensor running absmax/127 over calibration batches, measured on
    the BN-folded fp forward (the quantization-target distribution).
    Returns [n_tensors] f32. fp_tree passes as a jit ARGUMENT — closing
    over the weight tree embeds jit constants, the pathological pattern on
    the tunnel backend (CLAUDE.md rule 1)."""

    def one(tree, batch):
        ctx = {"mode": "calib", "t": 0, "collect": []}
        _forward(tree, batch, ctx, reg_max, num_classes)
        return jnp.stack(ctx["collect"])

    f = jax.jit(one)
    tree_dev = jax.device_put(jax.tree_util.tree_map(jnp.asarray, fp_tree))
    scales = None
    for batch in sample_batches:
        s = f(tree_dev, jnp.asarray(batch))
        scales = s if scales is None else jnp.maximum(scales, s)
    return scales


def quantize(variables: Dict, scales, stem_mode: str = "conv",
             reg_max: int = 16, num_classes: int = 5) -> Dict:
    """Trained variables + calibrated per-tensor scales -> int8 tree with
    the input-side dequant folded into every conv's weights (host, once)."""
    fp = fold_fp(variables, stem_mode)
    ctx = {"mode": "plan", "t": 0, "plans": {}}
    _forward(fp, None, ctx, reg_max, num_classes)
    n = ctx["t"]
    scales_np = np.asarray(scales, np.float32)
    if scales_np.shape[0] != n:
        raise ValueError(
            f"scales has {scales_np.shape[0]} slots, forward plans {n}")

    def walk(node):
        if isinstance(node, dict):
            if "w_f" in node:
                comp = ctx["plans"][id(node)]
                w = np.asarray(node["w_f"], np.float32)
                s_vec = np.concatenate([
                    np.full(nc, scales_np[tid], np.float32) for tid, nc in comp
                ])
                if s_vec.shape[0] != w.shape[2]:
                    raise ValueError(
                        f"plan comp {comp} != kernel input dim {w.shape}")
                w_eff = w * s_vec[None, None, :, None]
                sc = np.maximum(
                    np.max(np.abs(w_eff), axis=(0, 1, 2)) / 127.0, 1e-12)
                w_q = np.clip(np.round(w_eff / sc), -127, 127).astype(np.int8)
                return {"w_q": jnp.asarray(w_q),
                        "mult": jnp.asarray(sc.astype(np.float32)),
                        "bias": jnp.asarray(node["bias"])}
            if "kernel" in node:  # bf16 head projection
                return {k: jnp.asarray(v) for k, v in node.items()}
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(fp)


def apply(q: Dict, images: jnp.ndarray, scales, reg_max: int = 16,
          num_classes: int = 5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int8-resident forward: images f32 NHWC (same preprocessing as the fp
    path) -> (dist_logits [B,A,4*reg_max], cls_logits [B,A,C]) f32."""
    ctx = {"mode": "quant", "t": 0, "scales": scales}
    return _forward(q, images, ctx, reg_max, num_classes)


def tree_size_bytes(tree) -> int:
    return sum(leaf.size * leaf.dtype.itemsize
               for leaf in jax.tree_util.tree_leaves(tree))
