#!/usr/bin/env python3
"""Benchmark: fused QC pipeline throughput on one TPU chip — honest timing.

Measures steady-state images/minute of the FULL fused graph (preprocess ->
YOLOv8n -> decode+NMS -> crop -> per-crop ResNet-50 -> fusion -> on-device
segmentation) at production capacity (300 detections / 32 classified crops,
``iqc_tpu/config.py``), the configuration the reference claims 500+
images/min for on a CUDA GPU (README.md:11,21; config/config.yaml:133).

Timing methodology (the axon TPU tunnel does NOT block in
``jax.block_until_ready`` — round-1 numbers were ~13x over chip peak):

1. K pipeline iterations run inside ONE dispatched program (``lax.scan``
   whose carry perturbs the input by a runtime-zero epsilon, so the
   compiler cannot hoist the loop-invariant work), returning one scalar.
2. The wall clock covers dispatch + a host fetch of that scalar — the only
   operation that provably waits for remote completion on this backend.
3. Per-batch time = (T_K - T_1) / (K - 1): differencing cancels the ~30 ms
   tunnel round trip and any constant dispatch overhead.
4. Physical honesty: MFU is computed from the compiled executable's own
   XLA cost analysis, and the identical recipe is calibrated against a
   known-FLOPs 4096^3 bf16 matmul (must land near peak, not above it).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
vs_baseline is value / 500 img/min (the reference's headline claim).

Pooled default (BENCH_CLS_POOL=4x / BENCH_SEG_POOL=2x, the serving config):
the graph still carries the full 300-det/32-crop capacity, but only the
batch's top-(4*batch) REAL detections get the per-crop classifier (top-
2*batch the segmenter) — sized for the parity-measured ~0.45 valid
detections/image (docs/pool_parity_r4.json); overflow degrades to the
reference's own mock rule. BENCH_CLS_POOL=0 BENCH_SEG_POOL=0 restores the
dense reference-shaped graph for capacity-comparable numbers.

r5 default: YOLO runs the streaming int8 path (activations stay int8 codes
in HBM between convs, models/yolo_int8_stream.py) — hardware A/B won
+10.6% end-to-end at mAP parity (docs/yolo_stream_ab_r5.json).
BENCH_YOLO_INT8_STREAM=0 reverts to the v1 bf16-round-trip path.

The crop classifier runs the same streaming rewrite
(models/resnet_int8_stream.py) — hardware A/B won +4.5% end-to-end
(146,448 -> 153,008 img/min) with val accuracy identical to fp32
(docs/resnet_stream_ab_r5.json). BENCH_RESNET_INT8_STREAM=0 reverts to
the v1 static-calibrated path.
"""

import functools
import json
import os
import statistics
import time

BASELINE_IMG_PER_MIN = 500.0

# bf16 peak TFLOP/s by device kind (prefix match); override: BENCH_PEAK_TFLOPS
PEAK_TFLOPS = {
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v5": 459.0,       # v5p
    "TPU v4": 275.0,
    "TPU v6": 918.0,       # Trillium
}


def _peak_tflops(device) -> float:
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env)
    kind = getattr(device, "device_kind", "")
    for prefix in sorted(PEAK_TFLOPS, key=len, reverse=True):
        if kind.startswith(prefix):
            return PEAK_TFLOPS[prefix]
    return 197.0


def _timed_fetch(fn, *args) -> float:
    """Wall seconds for dispatch + scalar fetch (the reliable sync)."""
    import numpy as np

    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


def _measure(f1, fk, k: int, args, trials: int):
    """Median per-dispatch seconds via K-vs-1 differencing."""
    per, t1s, tks = [], [], []
    for _ in range(trials):
        t1 = _timed_fetch(f1, *args)
        tk = _timed_fetch(fk, *args)
        t1s.append(t1)
        tks.append(tk)
        per.append((tk - t1) / (k - 1))
    return statistics.median(per), statistics.median(t1s), statistics.median(tks)


def _calibrate(trials: int):
    """Known-FLOPs matmul through the identical timing recipe; returns
    (measured TFLOP/s, per-iter ms). Must come out <= chip peak."""
    import jax
    import jax.numpy as jnp

    n, k = 4096, 51
    flops = 2 * n**3

    @functools.partial(jax.jit, static_argnums=1)
    def loop(a, length):
        def body(c, _):
            return c @ a, None

        c, _ = jax.lax.scan(body, a, None, length=length)
        return jnp.sum(c[:1, :8]).astype(jnp.float32)

    x = jax.device_put(jnp.ones((n, n), jnp.bfloat16))
    f1 = functools.partial(loop, length=1)
    fk = functools.partial(loop, length=k)
    _timed_fetch(f1, x)
    _timed_fetch(fk, x)
    per, _, _ = _measure(f1, fk, k, (x,), trials)
    return flops / per / 1e12, per  # TFLOP/s, seconds per matmul


def main() -> None:
    # default batch follows the measured r4 scaling curve on TPU v5e:
    # 32 -> 34.4k, 64 -> 37.9k, 128 -> 40.8k img/min dense; 130.5k img/min
    # at batch 128 with the r4 default survivor pools
    # (docs/bench_b128_pooled_r4.json). Single-image latency is measured
    # separately below (BENCH_SINGLE).
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "8"))  # scan length K
    trials = int(os.environ.get("BENCH_TRIALS", "3"))
    full = os.environ.get("BENCH_FULL", "1") == "1"
    single = os.environ.get("BENCH_SINGLE", "1") == "1"

    import jax

    # NOTE: do NOT enable the persistent compilation cache here — on the
    # axon tunnel backend cache serialization hangs jit compiles
    # (measured: dfl kernel 0.8s without cache, >9 min with).

    import jax.numpy as jnp
    import numpy as np

    from iqc_tpu.config import SystemConfig
    from iqc_tpu.models.ensemble import build_ensemble_forward, build_full_forward
    from iqc_tpu.models.resnet import ResNet50
    from iqc_tpu.models.yolo import STRIDES, YOLOv8, feature_shapes
    from iqc_tpu.ops.jit_utils import hoisted_jit
    from iqc_tpu.ops.nms import make_anchors

    # production capacity by default (config.py defaults: 300 det / 32 crops)
    cfg = SystemConfig.from_dict(
        {
            "model": {
                "max_detections": int(os.environ.get("BENCH_MAX_DET", "300")),
                "max_classified": int(os.environ.get("BENCH_MAX_CLS", "32")),
                # batch-wide crop pool: BENCH_CLS_POOL=4x sizes it at
                # 4*batch. Default 4x since r4 (= the serving default,
                # config.yaml) — parity validated in docs/pool_parity_r4
                # .json, worth 3.2x at batch 128. BENCH_CLS_POOL=0 reverts
                # to the dense reference-shaped capacity graph.
                "max_classified_pool": int(
                    os.environ.get("BENCH_CLS_POOL", "4x").replace("x", "")
                ) * (batch if os.environ.get("BENCH_CLS_POOL", "4x").endswith("x") else 1),
                # batch-wide segmentation pool, same convention
                # (BENCH_SEG_POOL=2x => 2*batch ROIs segmented per batch)
                "max_segmented_pool": int(
                    os.environ.get("BENCH_SEG_POOL", "2x").replace("x", "")
                ) * (batch if os.environ.get("BENCH_SEG_POOL", "2x").endswith("x") else 1),
            },
            "processing": {"input_size": [640, 640]},
        }
    )
    m = cfg.model
    dtype = jnp.bfloat16
    stem = os.environ.get("BENCH_STEM", "conv")  # "s2d" = TPU-first stem
    yolo = YOLOv8(num_classes=m.num_classes, width_mult=m.width_mult,
                  depth_mult=m.depth_mult, dtype=dtype, stem_mode=stem)
    resnet = ResNet50(num_classes=m.num_classes, dtype=dtype)

    rng = jax.random.PRNGKey(0)
    yolo_vars = yolo.init(rng, jnp.zeros((1, 640, 640, 3), jnp.float32), train=False)
    # defaults mirror the shipped serving profile (config/config.yaml):
    # 128px crops + int8 classifier + int8 YOLO — every component
    # accuracy-validated (RESULTS.md r3 matrix). BENCH_CLS_INPUT=224
    # BENCH_PRECISION=bf16 BENCH_YOLO_INT8=0 reproduces the r2 recipe.
    ci = int(os.environ.get("BENCH_CLS_INPUT", "128"))
    resnet_vars = resnet.init(rng, jnp.zeros((1, ci, ci, 3), jnp.float32), train=False)

    precision = os.environ.get("BENCH_PRECISION", "int8")
    resnet_apply = None
    resnet_stream_on = False
    if precision == "int8":
        # TRUE int8 MXU path for the crop classifier (models/resnet_int8.py)
        from iqc_tpu.models import resnet_int8

        q = resnet_int8.quantize_resnet(resnet_vars)
        cal = jax.random.normal(rng, (16, ci, ci, 3), jnp.float32)
        scales = resnet_int8.calibrate_activation_scales(q, [cal])
        resnet_vars = {"q": jax.device_put(q), "scales": jax.device_put(scales)}
        resnet_stream_on = os.environ.get("BENCH_RESNET_INT8_STREAM", "1") == "1"
        if resnet_stream_on:
            # v2: int8-resident activations between convs (same tree+scales,
            # models/resnet_int8_stream.py) — hardware A/B knob
            from iqc_tpu.models import resnet_int8_stream

            resnet_apply = lambda v, xx: resnet_int8_stream.apply(
                v["q"], xx, v["scales"]
            )
        else:
            resnet_apply = lambda v, xx: resnet_int8.apply(
                v["q"], xx, act_scales=v["scales"]
            )

    yolo_apply = None
    yolo_int8_on = os.environ.get("BENCH_YOLO_INT8", "1") == "1"
    yolo_stream_on = os.environ.get("BENCH_YOLO_INT8_STREAM", "1") == "1"
    if yolo_stream_on:
        # v2: int8-RESIDENT activations (models/yolo_int8_stream.py) —
        # per-tensor scales folded into the weights; codes stay int8 in
        # HBM between convs instead of v1's bf16 round-trips
        from iqc_tpu.models import yolo_int8_stream

        ycal = jax.random.uniform(rng, (4, 640, 640, 3), jnp.float32)
        fp_tree = yolo_int8_stream.fold_fp(yolo_vars, stem_mode=stem)
        yscales = yolo_int8_stream.calibrate(
            fp_tree, [ycal], reg_max=yolo.reg_max, num_classes=m.num_classes)
        yq = yolo_int8_stream.quantize(
            yolo_vars, yscales, stem_mode=stem,
            reg_max=yolo.reg_max, num_classes=m.num_classes)
        yolo_vars = {"q": jax.device_put(yq),
                     "scales": jax.device_put(yscales)}
        yolo_apply = lambda v, xx: yolo_int8_stream.apply(
            v["q"], xx, v["scales"], reg_max=yolo.reg_max,
            num_classes=m.num_classes,
        )
    elif yolo_int8_on:
        # int8 activations for the bandwidth-bound YOLO stage
        # (models/yolo_int8.py); halves the HBM bytes its convs move
        from iqc_tpu.models import yolo_int8

        yq = yolo_int8.quantize_yolo(yolo_vars, stem_mode=stem)
        ycal = jax.random.uniform(rng, (4, 640, 640, 3), jnp.float32)
        yscales = yolo_int8.calibrate_activation_scales(
            yq, [ycal], reg_max=yolo.reg_max, num_classes=m.num_classes)
        yolo_vars = {"q": jax.device_put(yq),
                     "scales": jax.device_put(yscales)}
        yolo_apply = lambda v, xx: yolo_int8.apply(
            v["q"], xx, reg_max=yolo.reg_max, num_classes=m.num_classes,
            act_scales=v["scales"],
        )

    # crop-classifier input resolution (224 = reference transform parity;
    # smaller = TPU-first option for small-defect crops, needs a matching
    # retrained classifier — measure with BENCH_CLS_INPUT)
    if full:
        fwd = build_full_forward(
            yolo, resnet, (640, 640), m.max_detections, m.max_classified,
            classifier_input=ci,
            max_segmented=m.max_segmented, resnet_apply=resnet_apply,
            yolo_apply=yolo_apply, crop_pool=m.max_classified_pool,
            seg_pool=m.max_segmented_pool,
        )
    else:
        fwd = build_ensemble_forward(
            yolo, resnet, (640, 640), m.max_detections, m.max_classified,
            classifier_input=ci, resnet_apply=resnet_apply,
            yolo_apply=yolo_apply, crop_pool=m.max_classified_pool,
        )

    def small_out(out):
        # reduce over EVERY output leaf: a scalar that touches only part of
        # the outputs lets XLA dead-code-eliminate the rest (measured: the
        # per-crop ResNets and segmentation vanish, flops drop 8x)
        return sum(
            jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree_util.tree_leaves(out)
        )

    anchors, strides = make_anchors(feature_shapes((640, 640)), STRIDES)

    def make_loop(k: int):
        def loop(yv, rv, images, conf_t, iou_t, w_y, w_r, anc, strd):
            def body(carry, _):
                # runtime-zero, compiler-opaque perturbation: forces each
                # iteration to depend on the previous (no loop hoisting)
                eps = (carry * 1e-30).astype(images.dtype)
                out = fwd(yv, rv, images + eps, conf_t, iou_t, w_y, w_r, anc, strd)
                return small_out(out), None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return c

        return loop

    images = np.random.default_rng(0).integers(
        0, 255, (batch, 640, 640, 3), dtype=np.uint8
    )
    images_dev = jax.device_put(jnp.asarray(images))
    scalars = (
        jnp.float32(0.25), jnp.float32(0.5), jnp.float32(0.6), jnp.float32(0.4),
    )
    anc_dev, strd_dev = jax.device_put(anchors), jax.device_put(strides)
    args = (yolo_vars, resnet_vars, images_dev, *scalars, anc_dev, strd_dev)

    f1, cost1 = hoisted_jit(make_loop(1)).aot_compile(*args)
    fk, costk = hoisted_jit(make_loop(iters)).aot_compile(*args)
    # XLA cost analysis counts a while-loop body ONCE regardless of trip
    # count (and sometimes elides a length-1 scan) — take the max of both
    # compiles as the per-batch (one-iteration) flops.
    flops_per_batch = max(
        float(cost1.get("flops", 0.0)), float(costk.get("flops", 0.0))
    )

    # warm up execution paths
    _timed_fetch(f1, *args)
    _timed_fetch(fk, *args)

    per_batch, t1_med, _tk_med = _measure(f1, fk, iters, args, trials)
    per_sec = batch / per_batch
    per_min = per_sec * 60.0

    device = jax.devices()[0]
    peak = _peak_tflops(device)
    tflops = flops_per_batch / per_batch / 1e12 if flops_per_batch else None
    mfu = tflops / peak if tflops else None

    detail = {
        "batch": batch,
        "scan_iters": iters,
        "trials": trials,
        "images_per_second": round(per_sec, 2),
        "device_ms_per_batch": round(per_batch * 1e3, 3),
        "amortized_latency_ms": round(per_batch / batch * 1e3, 4),
        "tunnel_roundtrip_ms": round(t1_med * 1e3 - per_batch * 1e3, 1),
        "graph_gflops_per_batch": round(flops_per_batch / 1e9, 2) if flops_per_batch else None,
        "achieved_tflops": round(tflops, 2) if tflops else None,
        "mfu": round(mfu, 4) if mfu else None,
        "peak_tflops_assumed": peak,
        "device": str(device),
        "device_kind": getattr(device, "device_kind", "?"),
        "dtype": "bfloat16" if precision != "int8" else "bf16+int8-resnet",
        "yolo_stem": stem,
        "max_detections": m.max_detections,
        "max_classified_crops": m.max_classified,
        "crop_pool": m.max_classified_pool,
        "seg_pool": m.max_segmented_pool,
        "classifier_input": ci,
        "yolo_int8": yolo_int8_on or yolo_stream_on,
        "yolo_int8_stream": yolo_stream_on,
        "resnet_int8_stream": resnet_stream_on,
        "segmentation_included": full,
    }
    if m.max_classified_pool:
        # pooled-graph density disclosure: the 4x/2x pool sizing assumes the
        # parity-measured real-stream density (~0.45 valid detections/image,
        # p95=2, at the serving conf 0.7 — docs/pool_parity_r4.json). Every
        # capacity slot is still extracted; only the top-pool survivors get
        # the real classifier/segmentation, the rest degrade to the
        # reference's mock rule. Denser streams need a bigger
        # max_classified_pool (see config/config.yaml sizing runbook) and
        # land between this number and the dense (BENCH_CLS_POOL=0) row.
        detail["pool_sizing_assumes_valid_det_per_image"] = 0.45
        detail["pool_headroom_vs_assumed_density"] = round(
            m.max_classified_pool / (0.45 * batch), 1)

    if single:
        one = jax.device_put(jnp.asarray(images[:1]))
        args1 = (yolo_vars, resnet_vars, one, *scalars, anc_dev, strd_dev)
        # a single image runs ~1-5 ms on device, so the K-vs-1 difference
        # needs a much larger K than the batch probe to clear the ~50 ms
        # tunnel jitter (K=8 measured a NEGATIVE latency on the int8+128px
        # config); 64 iterations put >100 ms of compute in the difference
        ks = max(iters, 64)
        s1, _ = hoisted_jit(make_loop(1)).aot_compile(*args1)
        sk, _ = hoisted_jit(make_loop(ks)).aot_compile(*args1)
        _timed_fetch(s1, *args1)
        _timed_fetch(sk, *args1)
        per_img, e2e_med, _ = _measure(s1, sk, ks, args1, trials)
        detail["single_image_device_ms"] = round(per_img * 1e3, 3)
        # honest end-to-end through the tunnel: dispatch + fetch, per call
        detail["single_image_e2e_tunnel_ms"] = round(e2e_med * 1e3, 2)

    if os.environ.get("BENCH_CALIBRATE", "1") == "1":
        cal_tflops, _cal_per = _calibrate(trials)
        detail["calibration_matmul_tflops"] = round(cal_tflops, 1)
        detail["calibration_matmul_mfu"] = round(cal_tflops / peak, 3)

    result = {
        "metric": "full_pipeline_throughput" if full else "ensemble_pipeline_throughput",
        "value": round(per_min, 1),
        "unit": "images/min/chip",
        "vs_baseline": round(per_min / BASELINE_IMG_PER_MIN, 2),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
