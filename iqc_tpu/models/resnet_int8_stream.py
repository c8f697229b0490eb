"""Streaming (int8-resident) ResNet-50 inference — v2 of the int8 classifier.

Why v2: the v1 path (``models/resnet_int8.py``) quantizes each conv's INPUT
per call, so between two convs the activation round-trips HBM as bf16
(producer epilogue writes bf16; the consumer's quantize reads bf16 and
writes int8): up to 6 bytes/element of inter-layer traffic. After the r4
survivor-pool restructure the pooled-crop classification stage DOMINATES
the serving batch (20.6 ms of 58.6 at batch 128, 14.1 GB at 685 GB/s —
docs/profile_pooled_r5.json), and the identical streaming rewrite just won
+10.6% end-to-end on the YOLO stage (docs/yolo_stream_ab_r5.json), so the
same bytes-are-the-runtime argument applies here.

v2 quantizes each activation ONCE, in its producer's epilogue, with the
consumer conv's statically calibrated scale — activations live in HBM as
int8 codes end-to-end:

- conv epilogues fuse (XLA) the int32->bf16 dequant affine, ReLU, and the
  next conv's quantize into one elementwise chain, so only 1-byte codes
  are materialized between convs;
- the stem max-pool runs directly on codes (quantization is monotonic, so
  pool-then-quantize == quantize-then-pool bit-exactly);
- bottleneck residuals: the block-input CODES are dequantized (1-byte
  read) and added to conv3's not-yet-quantized bf16 output; the sum is
  quantized once for the next block. The downsample conv consumes the
  same codes, reusing the block input's scale;
- global mean pooling and the two dense heads stay f32, exactly as v1.

Numerics vs v1 (``tests/test_resnet_int8_stream.py``): quantization points
and scales are identical on every conv path — the ONLY divergence is the
residual read, which passes through the block input's int8 codes instead
of v1's unquantized bf16 copy (one extra absmax/127 rounding per shortcut).
Accuracy parity is validated on the shipped checkpoint like v1's was
(RESULTS.md int8 rows).

Shares v1's artifacts end-to-end: the quantized tree is
``resnet_int8.quantize_resnet`` verbatim and the scale vector is
``resnet_int8.calibrate_activation_scales`` verbatim — v2 is a different
WALK over the same numbers, so enabling it needs no recalibration.

Replaces (with the YOLO paths) the TensorRT-int8 engine the reference
declares but never ships (``/root/reference/config/config.yaml:139-150``).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from iqc_tpu.models.resnet_int8 import nn_max_pool


def _quant(y: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """bf16 activations -> int8 codes, identical op chain to v1's _qconv
    input quantize (round/clip in f32)."""
    return jnp.clip(
        jnp.round(y.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)


def _conv_affine(q_in: jnp.ndarray, s_in: jnp.ndarray, layer: Dict,
                 strides=(1, 1), padding="SAME") -> jnp.ndarray:
    """int8 codes -> int32 MXU conv -> bf16 dequant affine (BN folded).

    Identical algebra to v1's _qconv given the same codes: the dequant
    multiplier composes the input scale with the per-channel weight
    scale x BN slope already folded into ``layer['mult']``."""
    dn = lax.conv_dimension_numbers(q_in.shape, layer["w_q"].shape,
                                    ("NHWC", "HWIO", "NHWC"))
    acc = lax.conv_general_dilated(
        q_in, layer["w_q"], strides, padding,
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    mult = (s_in * layer["mult"]).astype(jnp.bfloat16)
    return acc.astype(jnp.bfloat16) * mult + layer["bias"].astype(jnp.bfloat16)


def apply(
    q: Dict,
    images: jnp.ndarray,
    act_scales: Any,
    stage_sizes: Sequence[int] = (3, 4, 6, 3),
) -> jnp.ndarray:
    """Streaming int8 forward, mirror of ``resnet_int8.apply`` (itself the
    mirror of models/resnet.py:70-99 eval mode). images: normalized f32/bf16
    NHWC -> logits f32.

    ``act_scales``: the [n_convs] vector from
    ``resnet_int8.calibrate_activation_scales`` — REQUIRED here (static
    scales are what allow producer-side quantization; there is no dynamic
    fallback in the streaming walk). Index layout matches v1's call order:
    stem, then per block conv1, conv2, conv3, [downsample].
    """
    assert act_scales is not None, "streaming path requires static scales"
    i = 0  # v1 call-order index into act_scales

    # stem: quantize the input image once, conv, then pool ON CODES —
    # quantization is monotonic, so this equals v1's pool-then-quantize
    s_stem = act_scales[i]
    i += 1
    x_q = _quant(images.astype(jnp.bfloat16), s_stem)
    y = jax.nn.relu(_conv_affine(x_q, s_stem, q["stem"],
                                 strides=(2, 2), padding=[(3, 3), (3, 3)]))
    s_cur = act_scales[i]  # first block conv1's input scale
    x_q = nn_max_pool(_quant(y, s_cur))

    n_blocks_total = sum(stage_sizes)
    done = 0
    for si, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            strides = (2, 2) if si > 0 and j == 0 else (1, 1)
            block = q["stages"][si][j]
            has_down = "down" in block
            # scale indices for this block (v1 call order)
            s1, s2, s3 = act_scales[i], act_scales[i + 1], act_scales[i + 2]
            i += 4 if has_down else 3
            done += 1
            last = done == n_blocks_total
            # next consumer's input scale (next block's conv1); the final
            # block's output feeds the f32 mean pool and stays bf16
            s_next = None if last else act_scales[i]

            y = jax.nn.relu(_conv_affine(x_q, s1, block["conv1"]))
            y = _quant(y, s2)
            y = jax.nn.relu(_conv_affine(y, s2, block["conv2"],
                                         strides=strides))
            y = _quant(y, s3)
            y = _conv_affine(y, s3, block["conv3"])
            if has_down:
                # the downsample consumes the SAME codes as conv1, so its
                # dequant composes the block input's scale s1 (v1
                # calibrated its slot from the identical tensor)
                residual = _conv_affine(x_q, s1, block["down"],
                                        strides=strides)
            else:
                residual = x_q.astype(jnp.bfloat16) * s1.astype(jnp.bfloat16)
            y = jax.nn.relu(y + residual)
            if last:
                x_bf = y
            else:
                x_q = _quant(y, s_next)

    features = jnp.mean(x_bf.astype(jnp.float32), axis=(1, 2))
    y = features @ q["head1"]["kernel"] + q["head1"]["bias"]
    y = jax.nn.relu(y)
    return y @ q["head2"]["kernel"] + q["head2"]["bias"]
