#!/usr/bin/env python3
"""Per-stage MFU/time table for the fused pipeline (VERDICT r2 #3).

Times each pipeline stage in isolation with bench.py's K-vs-1 scan
differencing (the only honest recipe on the tunnel backend — CLAUDE.md
rule 1d), with FLOPs from each compiled executable's own cost analysis.

Stages:
  yolo_fwd       YOLOv8 backbone+neck+head (dist, cls logits)
  decode_nms     DFL decode + class-aware NMS on fixed logits
  crop_resnet    crop+resize + per-crop ResNet over Kc crops/image
  global_resnet  whole-image classifier branch
  segmentation   per-ROI segmentation kernels
  full           the complete fused graph (bench.py's subject)

Run on TPU: python scripts/profile_stages.py  (env: BATCH, ITERS, TRIALS).
The shipped serving profile (config/config.yaml: int8 classifier + int8
YOLO + 128px crops) is profiled with PRECISION=int8 YOLO_INT8=1
CLS_INPUT=128 — the same knobs bench.py reads as BENCH_*.
"""

import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _timed_fetch(fn, *args) -> float:
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    return time.perf_counter() - t0


def measure(make_loop, args, iters, trials, hoisted_jit):
    f1, cost1 = hoisted_jit(make_loop(1)).aot_compile(*args)
    fk, costk = hoisted_jit(make_loop(iters)).aot_compile(*args)
    flops = max(float(cost1.get("flops", 0.0)), float(costk.get("flops", 0.0)))
    gb = max(float(cost1.get("bytes accessed", 0.0)),
             float(costk.get("bytes accessed", 0.0))) / 1e9
    measure.last_bytes_gb = gb  # HBM-roofline side channel
    _timed_fetch(f1, *args)
    _timed_fetch(fk, *args)
    per = []
    for _ in range(trials):
        t1 = _timed_fetch(f1, *args)
        tk = _timed_fetch(fk, *args)
        per.append((tk - t1) / (iters - 1))
    return statistics.median(per), flops


def main() -> None:
    batch = int(os.environ.get("BATCH", "32"))
    iters = int(os.environ.get("ITERS", "8"))
    trials = int(os.environ.get("TRIALS", "3"))
    kc = int(os.environ.get("MAX_CLS", "32"))
    max_det = int(os.environ.get("MAX_DET", "300"))

    import jax
    import jax.numpy as jnp

    from iqc_tpu.config import SystemConfig
    from iqc_tpu.models.ensemble import build_full_forward
    from iqc_tpu.models.resnet import ResNet50
    from iqc_tpu.models.yolo import STRIDES, YOLOv8, feature_shapes
    from iqc_tpu.ops import image as imops
    from iqc_tpu.ops.jit_utils import hoisted_jit
    from iqc_tpu.ops.nms import decode_and_nms, make_anchors

    cfg = SystemConfig.from_dict(
        {"model": {"max_detections": max_det, "max_classified": kc},
         "processing": {"input_size": [640, 640]}}
    )
    m = cfg.model
    dtype = jnp.bfloat16
    yolo = YOLOv8(num_classes=m.num_classes, width_mult=m.width_mult,
                  depth_mult=m.depth_mult, dtype=dtype,
                  stem_mode=os.environ.get("STEM", "conv"))
    resnet = ResNet50(num_classes=m.num_classes, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    ci = int(os.environ.get("CLS_INPUT", "224"))
    yolo_vars = yolo.init(rng, jnp.zeros((1, 640, 640, 3), jnp.float32), train=False)
    resnet_vars = resnet.init(rng, jnp.zeros((1, ci, ci, 3), jnp.float32), train=False)
    anchors, strides = make_anchors(feature_shapes((640, 640)), STRIDES)

    # int8 variants (mirrors bench.py's BENCH_PRECISION / BENCH_YOLO_INT8)
    resnet_apply = None
    if os.environ.get("PRECISION", "bf16") == "int8":
        from iqc_tpu.models import resnet_int8

        q = resnet_int8.quantize_resnet(resnet_vars)
        cal = jax.random.normal(rng, (16, ci, ci, 3), jnp.float32)
        scales = resnet_int8.calibrate_activation_scales(q, [cal])
        resnet_vars = {"q": jax.device_put(q), "scales": jax.device_put(scales)}
        if os.environ.get("RESNET_INT8_STREAM", "0") == "1":
            # v2 int8-resident classifier (models/resnet_int8_stream.py)
            from iqc_tpu.models import resnet_int8_stream

            resnet_apply = lambda v, xx: resnet_int8_stream.apply(
                v["q"], xx, v["scales"])
        else:
            resnet_apply = lambda v, xx: resnet_int8.apply(
                v["q"], xx, act_scales=v["scales"])

    yolo_apply = None
    ycal = jax.random.uniform(rng, (4, 640, 640, 3), jnp.float32)
    if os.environ.get("YOLO_INT8_STREAM", "0") == "1":
        # v2 int8-resident activations (models/yolo_int8_stream.py) — the
        # bandwidth A/B against YOLO_INT8=1 (v1 bf16 round-trips)
        from iqc_tpu.models import yolo_int8_stream

        fp_tree = yolo_int8_stream.fold_fp(yolo_vars, stem_mode=yolo.stem_mode)
        yscales = yolo_int8_stream.calibrate(
            fp_tree, [ycal], reg_max=yolo.reg_max, num_classes=m.num_classes)
        yq = yolo_int8_stream.quantize(
            yolo_vars, yscales, stem_mode=yolo.stem_mode,
            reg_max=yolo.reg_max, num_classes=m.num_classes)
        yolo_vars = {"q": jax.device_put(yq), "scales": jax.device_put(yscales)}
        yolo_apply = lambda v, xx: yolo_int8_stream.apply(
            v["q"], xx, v["scales"], reg_max=yolo.reg_max,
            num_classes=m.num_classes)
    elif os.environ.get("YOLO_INT8", "0") == "1":
        from iqc_tpu.models import yolo_int8

        yq = yolo_int8.quantize_yolo(yolo_vars, stem_mode=yolo.stem_mode)
        yscales = yolo_int8.calibrate_activation_scales(
            yq, [ycal], reg_max=yolo.reg_max, num_classes=m.num_classes)
        yolo_vars = {"q": jax.device_put(yq), "scales": jax.device_put(yscales)}
        yolo_apply = lambda v, xx: yolo_int8.apply(
            v["q"], xx, reg_max=yolo.reg_max, num_classes=m.num_classes,
            act_scales=v["scales"])

    _yolo_fwd = yolo_apply or (lambda v, xx: yolo.apply(v, xx, train=False))
    _resnet_fwd = resnet_apply or (lambda v, xx: resnet.apply(v, xx, train=False))

    images = np.random.default_rng(0).integers(0, 255, (batch, 640, 640, 3), np.uint8)
    images_dev = jax.device_put(jnp.asarray(images))
    anc, strd = jax.device_put(anchors), jax.device_put(strides)

    def scanloop(stage_fn):
        def make_loop(k):
            def loop(*args):
                def body(carry, _):
                    return stage_fn(carry, *args), None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
                return c
            return loop
        return make_loop

    def ssum(out):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))

    results = {}
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
    only = set(filter(None, os.environ.get("STAGES", "").split(",")))

    def want(name):
        return not only or name in only

    def measure(make_loop_, args_, iters_, trials_, hj):  # noqa: F811
        # incremental rows: tunnel compiles are minutes each, so stream
        # results instead of holding them for one final print
        gmeasure = globals()["measure"]
        per_, fl_ = gmeasure(make_loop_, args_, iters_, trials_, hj)
        gb = getattr(gmeasure, "last_bytes_gb", 0.0)
        print(json.dumps({"stage_row": {
            "ms_per_batch": round(per_ * 1e3, 2),
            "gflops_per_batch": round(fl_ / 1e9, 1),
            "mfu": round(fl_ / per_ / 1e12 / peak, 3) if per_ > 0 else None,
            "hbm_gb_accessed": round(gb, 2),
            "hbm_gbps": round(gb / per_, 0) if per_ > 0 else None,
        }}), flush=True)
        return per_, fl_

    # 1. YOLO forward
    def yolo_stage(carry, yv, imgs):
        eps = (carry * 1e-30).astype(jnp.float32)
        x = imgs.astype(jnp.float32) / 255.0 + eps
        dist, cls = _yolo_fwd(yv, x)
        return ssum((dist, cls))

    if want("yolo_fwd"):
        per, fl = measure(scanloop(yolo_stage), (yolo_vars, images_dev),
                          iters, trials, hoisted_jit)
        results["yolo_fwd"] = (per, fl)

    # 2. decode+NMS on fixed logits
    na = anchors.shape[0]
    dist_fix = jax.device_put(jnp.asarray(
        np.random.default_rng(1).normal(0, 1, (batch, na, 64)), dtype))
    cls_fix = jax.device_put(jnp.asarray(
        np.random.default_rng(2).normal(-4, 2, (batch, na, m.num_classes)), dtype))

    def nms_stage(carry, d, c, a, s):
        eps = (carry * 1e-30).astype(d.dtype)
        det = decode_and_nms(d + eps, c, a, s, reg_max=16,
                             max_detections=max_det,
                             iou_threshold=jnp.float32(0.5),
                             score_threshold=jnp.float32(0.25))
        return ssum(det)

    if want("decode_nms"):
        per, fl = measure(scanloop(nms_stage), (dist_fix, cls_fix, anc, strd),
                          iters, trials, hoisted_jit)
        results["decode_nms"] = (per, fl)

    # 3. crop + resize + per-crop ResNet (fixed boxes)
    boxes_fix = jax.device_put(jnp.asarray(
        np.random.default_rng(3).uniform(0, 600, (batch, kc, 4)).astype(np.float32)))

    def crop_stage(carry, rv, imgs, bxs):
        eps = (carry * 1e-30).astype(jnp.float32)
        x = imgs.astype(jnp.float32) / 255.0 + eps
        crops = jax.vmap(lambda img, bx: imops.crop_and_resize(img, bx, (ci, ci)))(x, bxs)
        flat = imops.normalize_imagenet(crops.reshape(batch * kc, ci, ci, 3))
        logits = _resnet_fwd(rv, flat)
        return ssum(logits)

    if want("crop_resnet"):
        per, fl = measure(scanloop(crop_stage), (resnet_vars, images_dev, boxes_fix),
                          iters, trials, hoisted_jit)
        results["crop_resnet"] = (per, fl)

    # 3b. crop-pool variant (model.max_classified_pool, commit 68f1c89):
    # same extraction, one ResNet forward over CLS_POOL gathered crops.
    # Scores fixed, all slots valid — cost is validity-independent anyway.
    pool = int(os.environ.get("CLS_POOL", "0"))
    scores_fix = jax.device_put(jnp.asarray(
        np.random.default_rng(6).uniform(0, 1, (batch * kc,)).astype(np.float32)))

    def crop_pool_stage(carry, rv, imgs, bxs, sc):
        eps = (carry * 1e-30).astype(jnp.float32)
        x = imgs.astype(jnp.float32) / 255.0 + eps
        crops = jax.vmap(lambda img, bx: imops.crop_and_resize(img, bx, (ci, ci)))(x, bxs)
        flat = imops.normalize_imagenet(crops.reshape(batch * kc, ci, ci, 3))
        _, idx = jax.lax.top_k(sc, pool)
        logits = _resnet_fwd(rv, flat[idx])
        out = jnp.zeros((batch * kc,), jnp.float32).at[idx].set(
            jnp.max(logits.astype(jnp.float32), axis=-1))
        return ssum(out)

    if pool and want("crop_pool"):
        per, fl = measure(scanloop(crop_pool_stage),
                          (resnet_vars, images_dev, boxes_fix, scores_fix),
                          iters, trials, hoisted_jit)
        results[f"crop_pool_{pool}"] = (per, fl)

    # 3c. extraction alone (crop+resize+normalize, no classifier): the
    # pooled graph's residual extraction cost over all B*Kc slots
    def crop_extract_stage(carry, imgs, bxs):
        eps = (carry * 1e-30).astype(jnp.float32)
        x = imgs.astype(jnp.float32) / 255.0 + eps
        crops = jax.vmap(lambda img, bx: imops.crop_and_resize(img, bx, (ci, ci)))(x, bxs)
        return ssum(imops.normalize_imagenet(crops.reshape(batch * kc, ci, ci, 3)))

    if want("crop_extract"):
        per, fl = measure(scanloop(crop_extract_stage), (images_dev, boxes_fix),
                          iters, trials, hoisted_jit)
        results["crop_extract"] = (per, fl)

    # 4. global classifier branch
    from iqc_tpu.models.resnet import preprocess_for_classifier

    def global_stage(carry, rv, imgs):
        eps = (carry * 1e-30).astype(jnp.float32)
        x = imgs.astype(jnp.float32) / 255.0 + eps
        xg = preprocess_for_classifier(x, ci)
        return ssum(_resnet_fwd(rv, xg))

    if want("global_resnet"):
        per, fl = measure(scanloop(global_stage), (resnet_vars, images_dev),
                          iters, trials, hoisted_jit)
        results["global_resnet"] = (per, fl)

    # 5. segmentation kernels (fixed boxes)
    from iqc_tpu.ops.segmentation import segment_rois

    ms = m.max_segmented
    seg_boxes = jax.device_put(jnp.asarray(
        np.random.default_rng(4).uniform(0, 600, (batch, ms, 4)).astype(np.float32)))
    seg_cls = jax.device_put(jnp.zeros((batch, ms), jnp.int32))
    seg_valid = jax.device_put(jnp.ones((batch, ms), bool))

    roi = 128

    def seg_stage(carry, imgs, bxs, cls_, vld):
        eps = (carry * 1e-30).astype(jnp.float32)
        x = imgs.astype(jnp.float32) / 255.0 + eps
        gray = imops.rgb_to_gray(x)

        def seg_one(g, boxes, cids, valid):
            rois = imops.crop_and_resize(g[..., None], boxes, (roi, roi))[..., 0]
            bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1.0)
            bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1.0)
            return segment_rois(rois, cids, valid, bw / roi, bh / roi)

        out = jax.vmap(seg_one)(gray, bxs, cls_, vld)
        return ssum(out)

    if want("segmentation"):
        try:
            per, fl = measure(scanloop(seg_stage),
                              (images_dev, seg_boxes, seg_cls, seg_valid),
                              iters, trials, hoisted_jit)
            results["segmentation"] = (per, fl)
        except Exception as e:  # signature drift: keep the table useful
            print(f"segmentation stage skipped: {e}", file=sys.stderr)

    # 5a. seg-pool variant (model.max_segmented_pool): dense extraction,
    # ONE flat segment_rois over SEG_POOL gathered ROIs. Scores fixed, all
    # slots valid — pool cost is validity-independent anyway.
    spool = int(os.environ.get("SEG_POOL", "0"))
    seg_scores = jax.device_put(jnp.asarray(
        np.random.default_rng(9).uniform(0, 1, (batch * ms,)).astype(np.float32)))

    def seg_pool_stage(carry, imgs, bxs, cls_, sc):
        eps = (carry * 1e-30).astype(jnp.float32)
        x = imgs.astype(jnp.float32) / 255.0 + eps
        gray = imops.rgb_to_gray(x)
        rois = jax.vmap(
            lambda g, bx: imops.crop_and_resize(g[..., None], bx, (roi, roi))[..., 0]
        )(gray, bxs).reshape(batch * ms, roi, roi)
        _, idx = jax.lax.top_k(sc, spool)
        fb = bxs.reshape(batch * ms, 4)[idx]
        bw = jnp.maximum(fb[:, 2] - fb[:, 0], 1.0)
        bh = jnp.maximum(fb[:, 3] - fb[:, 1], 1.0)
        out = segment_rois(rois[idx], cls_.reshape(batch * ms)[idx],
                           jnp.ones((spool,), bool), bw / roi, bh / roi)
        return ssum(out)

    if spool and want("seg_pool"):
        per, fl = measure(scanloop(seg_pool_stage),
                          (images_dev, seg_boxes, seg_cls, seg_scores),
                          iters, trials, hoisted_jit)
        results[f"seg_pool_{spool}"] = (per, fl)

    # 5b. segmentation sub-stages: where inside the 12-ms stage does the
    # time go? (seg_pre = gray+crop+blur+otsu+seeds, seg_morph = the
    # iteration tails, seg_post = adaptive+watershed+confidences+stats,
    # seg_otsu = the histogram-matmul threshold alone)
    from iqc_tpu.ops import segmentation as segops

    rngs = np.random.default_rng(5)
    rois_fix = jax.device_put(jnp.asarray(
        rngs.uniform(0, 1, (batch, ms, roi, roi)).astype(np.float32)))
    mask_fix = jax.device_put(jnp.asarray(
        rngs.uniform(0, 1, (batch, ms, roi, roi)) < 0.25))
    seeds_fix = jax.device_put(jnp.asarray(
        rngs.uniform(0, 1, (batch, ms, roi, roi)) < 0.05))
    allow_fix = jax.device_put(jnp.asarray(
        rngs.uniform(0, 1, (batch, ms, roi, roi)) < 0.7))

    def _flip(carry):
        # data-dependent all-False bool: keeps the scan body unfoldable
        # (CLAUDE.md rule 1d) without changing bool-input values
        return (carry * 1e-30) > 1.0

    def seg_pre_stage(carry, imgs, bxs, cls_):
        eps = (carry * 1e-30).astype(jnp.float32)
        x = imgs.astype(jnp.float32) / 255.0 + eps
        gray = imops.rgb_to_gray(x)

        def one(g, boxes, cids):
            rois_ = imops.crop_and_resize(g[..., None], boxes, (roi, roi))[..., 0]

            def pre(r, k):
                dk = segops.table_lookup(segops.CLASS_IS_DARK, k)
                blurred = imops.gaussian_blur(r, sigma=1.0)
                m_t_raw = segops._threshold_pre(
                    r, segops.table_lookup(segops.CLASS_THRESH_ADJUST, k),
                    dk, blurred=blurred)
                seeds, grow_ok, n_seeds = segops._region_pre(
                    r, dk, blurred=blurred)
                return m_t_raw, seeds, grow_ok, n_seeds

            return jax.vmap(pre)(rois_, cids)

        return ssum(jax.vmap(one)(gray, bxs, cls_))

    if want("seg_pre"):
        per, fl = measure(scanloop(seg_pre_stage),
                          (images_dev, seg_boxes, seg_cls),
                          iters, trials, hoisted_jit)
        results["seg_pre"] = (per, fl)

    def seg_morph_stage(carry, mt, sd, al):
        f = _flip(carry)
        m_t, m_r = jax.vmap(
            lambda a, b, c: segops.morph_tails_batch(a, b, c, iterations=24)
        )(mt ^ f, sd ^ f, al ^ f)
        return ssum((m_t, m_r))

    if want("seg_morph"):
        per, fl = measure(scanloop(seg_morph_stage),
                          (mask_fix, seeds_fix, allow_fix),
                          iters, trials, hoisted_jit)
        results["seg_morph"] = (per, fl)

    def seg_post_stage(carry, rs, mt, mr):
        eps = (carry * 1e-30).astype(jnp.float32)
        rs = rs + eps

        def one(r3, mt3, mr3):
            def post(r, m_t_, m_r_):
                dk = jnp.bool_(True)
                c_t = segops._separation_confidence(r, m_t_)
                m_a, c_a = segops._adaptive_segment(r, dk, 13)
                m_w, c_w = segops._watershed_segment(r, dk, blurred=r)
                c_r = segops._region_confidence(m_r_, jnp.sum(m_r_))
                mask = m_t_ & m_a & m_w
                area, perim = segops.mask_stats(mask)
                return mask, c_t + c_a + c_w + c_r, area, perim

            return jax.vmap(post)(r3, mt3, mr3)

        return ssum(jax.vmap(one)(rs, mt, mr))

    if want("seg_post"):
        per, fl = measure(scanloop(seg_post_stage),
                          (rois_fix, mask_fix, seeds_fix),
                          iters, trials, hoisted_jit)
        results["seg_post"] = (per, fl)

    def seg_otsu_stage(carry, rs):
        eps = (carry * 1e-30).astype(jnp.float32)
        t = jax.vmap(jax.vmap(imops.otsu_threshold))(rs + eps)
        return ssum(t)

    if want("seg_otsu"):
        per, fl = measure(scanloop(seg_otsu_stage), (rois_fix,),
                          iters, trials, hoisted_jit)
        results["seg_otsu"] = (per, fl)

    # 6. full fused graph (CLS_POOL/SEG_POOL>0 profile the pooled serving
    # graph)
    fwd = build_full_forward(yolo, resnet, (640, 640), max_det, kc,
                             classifier_input=ci,
                             max_segmented=m.max_segmented,
                             resnet_apply=resnet_apply, yolo_apply=yolo_apply,
                             crop_pool=pool, seg_pool=spool)

    def full_stage(carry, yv, rv, imgs, a, s):
        eps = (carry * 1e-30).astype(imgs.dtype)
        out = fwd(yv, rv, imgs + eps, jnp.float32(0.25), jnp.float32(0.5),
                  jnp.float32(0.6), jnp.float32(0.4), a, s)
        return ssum(out)

    if want("full"):
        per, fl = measure(scanloop(full_stage),
                          (yolo_vars, resnet_vars, images_dev, anc, strd),
                          iters, trials, hoisted_jit)
        results["full"] = (per, fl)

    table = {}
    for name, (per, fl) in results.items():
        table[name] = {
            "ms_per_batch": round(per * 1e3, 2),
            "gflops_per_batch": round(fl / 1e9, 1),
            "tflops": round(fl / per / 1e12, 1) if per > 0 else None,
            "mfu": round(fl / per / 1e12 / peak, 3) if per > 0 else None,
        }
    print(json.dumps({"batch": batch, "stages": table}, indent=1))


if __name__ == "__main__":
    main()
