"""True-int8 ResNet-50 inference path (MXU integer pipeline).

The reference *declares* a TensorRT int8 engine it never ships
(``config/config.yaml:139-150``: precision int8 + calibration dataset;
``models/tensorrt_optimizer.py`` does not exist). The TPU equivalent here is
real: int8 x int8 -> int32 convolutions lower straight to the MXU at
**2x the bf16 rate** (measured 399-407 TOP/s vs 194-195 TFLOP/s bf16 peak
on v5e — see RESULTS.md int8 probe), so the ResNet crop-classification
stage — the FLOP majority of the fused pipeline — can run at double
throughput.

Scheme (standard post-training quantization):
- weights: per-output-channel symmetric int8, scales folded together with
  the inference-time BatchNorm affine into one dequant multiply + bias;
- activations: per-tensor symmetric int8. Scales are **statically
  calibrated** (``calibrate_activation_scales`` records per-layer absmax on
  sample batches — the TensorRT calibration-dataset step,
  config.yaml:148-150). Dynamic in-graph absmax is also supported but
  measured 2x SLOWER end-to-end: the per-layer global reduction is a full
  activation pass AND a serialization point that blocks conv pipelining;
- residual adds, ReLU, pooling, and the classifier head stay in bf16/f32;
  dequant epilogues compute in bf16 (halves elementwise traffic vs f32).

``quantize_resnet`` converts trained ``ResNet50`` variables; ``apply``
mirrors the fp forward (models/resnet.py:70-99) exactly, layer for layer.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _fold_bn(bn_params: Dict, bn_stats: Dict, eps: float = 1e-5):
    """Inference BN -> per-channel affine (a, b): y = a*x + b."""
    gamma = np.asarray(bn_params["scale"], np.float32)
    beta = np.asarray(bn_params["bias"], np.float32)
    mean = np.asarray(bn_stats["mean"], np.float32)
    var = np.asarray(bn_stats["var"], np.float32)
    a = gamma / np.sqrt(var + eps)
    return a, beta - mean * a


def _quant_conv_weights(kernel: np.ndarray):
    """HWIO float kernel -> (int8 kernel, per-co scale [co])."""
    k = np.asarray(kernel, np.float32)
    scale = np.max(np.abs(k), axis=(0, 1, 2)) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def _pack_conv(params: Dict, stats: Dict, conv_name: str, bn_name: str) -> Dict:
    w_q, w_scale = _quant_conv_weights(params[conv_name]["kernel"])
    a, b = _fold_bn(params[bn_name], stats[bn_name])
    return {
        "w_q": jnp.asarray(w_q),
        # dequant multiplier folds the weight scale and the BN slope;
        # the activation scale joins at runtime (dynamic)
        "mult": jnp.asarray(w_scale * a),
        "bias": jnp.asarray(b),
    }


def quantize_resnet(variables: Dict, stage_sizes: Sequence[int] = (3, 4, 6, 3)) -> Dict:
    """Trained ResNet50 variables -> int8 inference tree (host-side, once)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    q: Dict[str, Any] = {
        "stem": _pack_conv(params, stats, "stem_conv", "stem_bn"),
        "stages": [],
    }
    for i, n_blocks in enumerate(stage_sizes):
        stage = []
        for j in range(n_blocks):
            name = f"stage{i + 1}_block{j + 1}"
            bp, bs = params[name], stats[name]
            block = {
                "conv1": _pack_conv(bp, bs, "conv1", "bn1"),
                "conv2": _pack_conv(bp, bs, "conv2", "bn2"),
                "conv3": _pack_conv(bp, bs, "conv3", "bn3"),
            }
            if "downsample_conv" in bp:
                block["down"] = _pack_conv(bp, bs, "downsample_conv", "downsample_bn")
            stage.append(block)
        q["stages"].append(stage)
    q["head1"] = {
        "kernel": jnp.asarray(params["head_dense1"]["kernel"], jnp.float32),
        "bias": jnp.asarray(params["head_dense1"]["bias"], jnp.float32),
    }
    q["head2"] = {
        "kernel": jnp.asarray(params["head_dense2"]["kernel"], jnp.float32),
        "bias": jnp.asarray(params["head_dense2"]["bias"], jnp.float32),
    }
    return q


def _dyn_scale(x: jnp.ndarray):
    return jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0, 1e-12)


def _qconv(x: jnp.ndarray, layer: Dict, ctx: Dict, strides=(1, 1), padding="SAME"):
    """int8 conv + folded BN affine -> bf16 NHWC.

    ctx carries the per-call activation-scale plumbing: with static scales
    (ctx["scales"] is a [n_convs] array) the quantize is a pure elementwise
    op that XLA fuses into the previous layer's dequant epilogue; with
    dynamic scales (None) an absmax reduction runs per layer (slow path,
    kept for calibration and as a fallback)."""
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
    dn = lax.conv_dimension_numbers(x_q.shape, layer["w_q"].shape,
                                    ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        x_q, layer["w_q"], strides, padding,
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    mult = (s_x * layer["mult"]).astype(jnp.bfloat16)
    return acc.astype(jnp.bfloat16) * mult + layer["bias"].astype(jnp.bfloat16)


def apply(
    q: Dict,
    images: jnp.ndarray,
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
    act_scales: Any = None,
    _collect: Any = None,
) -> jnp.ndarray:
    """int8 forward, mirror of ResNet50.__call__ eval mode
    (models/resnet.py:70-99). images: normalized f32 NHWC -> logits f32.
    ``act_scales``: [n_convs] f32 from calibrate_activation_scales (fast
    static path); None = dynamic per-batch scales."""
    ctx = {"i": 0, "scales": act_scales, "collect": _collect}
    x = images.astype(jnp.bfloat16)
    x = _qconv(x, q["stem"], ctx, strides=(2, 2), padding=[(3, 3), (3, 3)])
    x = jax.nn.relu(x)
    x = nn_max_pool(x)

    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            strides = (2, 2) if i > 0 and j == 0 else (1, 1)
            block = q["stages"][i][j]
            residual = x
            y = jax.nn.relu(_qconv(x, block["conv1"], ctx))
            y = jax.nn.relu(_qconv(y, block["conv2"], ctx, strides=strides))
            y = _qconv(y, block["conv3"], ctx)
            if "down" in block:
                residual = _qconv(residual, block["down"], ctx, strides=strides)
            x = jax.nn.relu(y + residual)

    features = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    y = features @ q["head1"]["kernel"] + q["head1"]["bias"]
    y = jax.nn.relu(y)
    return y @ q["head2"]["kernel"] + q["head2"]["bias"]


def n_convs(stage_sizes: Sequence[int] = (3, 4, 6, 3)) -> int:
    """Number of quantized convs (stem + 3/block + 1 downsample/stage)."""
    return 1 + sum(3 * n for n in stage_sizes) + len(stage_sizes)


def calibrate_activation_scales(
    q: Dict,
    sample_batches,
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
) -> jnp.ndarray:
    """Record per-layer activation absmax/127 over calibration batches
    (running max) — the TensorRT calibration-dataset equivalent
    (config.yaml:148-150). Returns [n_convs] f32."""
    # q as an ARGUMENT, not a closure: embedded weight-tree constants are
    # the pathological jit pattern on the tunnel backend (CLAUDE.md rule 1)
    def one(qq, batch):
        collect: list = []
        apply(qq, batch, stage_sizes, act_scales=None, _collect=collect)
        return jnp.stack(collect)

    f = jax.jit(one)
    q_dev = jax.device_put(q)
    scales = None
    for batch in sample_batches:
        s = f(q_dev, jnp.asarray(batch))
        scales = s if scales is None else jnp.maximum(scales, s)
    return scales


def nn_max_pool(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 max pool, pad 1 (stem pool, matching flax nn.max_pool call)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def tree_size_bytes(q: Dict) -> int:
    return sum(
        int(np.prod(x.shape)) * np.dtype(x.dtype).itemsize
        for x in jax.tree_util.tree_leaves(q)
    )
