#!/usr/bin/env python3
"""Benchmark: fused QC ensemble pipeline throughput on one TPU chip.

Measures the steady-state images/minute of the full fused graph
(preprocess -> YOLOv8n -> decode+NMS -> crop -> per-crop ResNet-50 ->
fusion + severity stats) at 640x640 / bf16 — the configuration the
reference claims 500+ images/min for on a CUDA GPU (README.md:11,21;
config/config.yaml:133).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 500 img/min (the reference's headline claim).
"""

import json
import os
import sys
import time

BASELINE_IMG_PER_MIN = 500.0


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))

    import jax

    # NOTE: do NOT enable the persistent compilation cache here — on the
    # axon tunnel backend cache serialization hangs jit compiles
    # (measured: dfl kernel 0.8s without cache, >9 min with).

    import jax.numpy as jnp
    import numpy as np

    from iqc_tpu.config import SystemConfig
    from iqc_tpu.models.ensemble import build_ensemble_forward
    from iqc_tpu.models.resnet import ResNet50
    from iqc_tpu.models.yolo import YOLOv8

    cfg = SystemConfig.from_dict(
        {
            "model": {
                "max_detections": int(os.environ.get("BENCH_MAX_DET", "64")),
                "max_classified": int(os.environ.get("BENCH_MAX_CLS", "16")),
            },
            "processing": {"input_size": [640, 640]},
        }
    )
    m = cfg.model
    dtype = jnp.bfloat16
    yolo = YOLOv8(num_classes=m.num_classes, width_mult=m.width_mult,
                  depth_mult=m.depth_mult, dtype=dtype)
    resnet = ResNet50(num_classes=m.num_classes, dtype=dtype)

    rng = jax.random.PRNGKey(0)
    yolo_vars = yolo.init(rng, jnp.zeros((1, 640, 640, 3), jnp.float32), train=False)
    resnet_vars = resnet.init(rng, jnp.zeros((1, 224, 224, 3), jnp.float32), train=False)

    from iqc_tpu.models.yolo import STRIDES, feature_shapes
    from iqc_tpu.ops.jit_utils import hoisted_jit
    from iqc_tpu.ops.nms import make_anchors

    full = os.environ.get("BENCH_FULL", "0") == "1"
    if full:
        from iqc_tpu.models.ensemble import build_full_forward

        fwd = hoisted_jit(
            build_full_forward(
                yolo, resnet, (640, 640), m.max_detections, m.max_classified,
                max_segmented=16,
            )
        )
    else:
        fwd = hoisted_jit(
            build_ensemble_forward(
                yolo, resnet, (640, 640), m.max_detections, m.max_classified
            )
        )
    anchors, strides = make_anchors(feature_shapes((640, 640)), STRIDES)

    images = np.random.default_rng(0).integers(
        0, 255, (batch, 640, 640, 3), dtype=np.uint8
    )
    images_dev = jax.device_put(jnp.asarray(images))
    args = (
        jnp.float32(0.25), jnp.float32(0.5), jnp.float32(0.6), jnp.float32(0.4),
        jax.device_put(anchors), jax.device_put(strides),
    )

    def run_once():
        out = fwd(yolo_vars, resnet_vars, images_dev, *args)
        jax.block_until_ready(out)
        return out

    for _ in range(warmup):
        run_once()

    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    elapsed = time.perf_counter() - t0

    total_images = batch * iters
    per_sec = total_images / elapsed
    per_min = per_sec * 60.0
    p50_ms = elapsed / iters / batch * 1000.0

    # single-image end-to-end latency (p50 target: <20 ms)
    one = jax.device_put(jnp.asarray(images[:1]))
    lat = []
    for _ in range(max(iters * 2, 5)):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(yolo_vars, resnet_vars, one, *args))
        lat.append((time.perf_counter() - t0) * 1000)
    lat.sort()
    p50_single = lat[len(lat) // 2]

    result = {
        "metric": "full_pipeline_throughput" if full else "ensemble_pipeline_throughput",
        "value": round(per_min, 1),
        "unit": "images/min/chip",
        "vs_baseline": round(per_min / BASELINE_IMG_PER_MIN, 2),
        "detail": {
            "batch": batch,
            "iters": iters,
            "images_per_second": round(per_sec, 2),
            "amortized_latency_ms": round(p50_ms, 3),
            "single_image_p50_ms": round(p50_single, 3),
            "device": str(jax.devices()[0]),
            "dtype": "bfloat16",
            "max_detections": m.max_detections,
            "max_classified_crops": m.max_classified,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
