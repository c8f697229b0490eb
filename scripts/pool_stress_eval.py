#!/usr/bin/env python3
"""Survivor-pool DEGRADATION curve on a dense-defect stress corpus
(VERDICT r4 #4).

``pool_parity_eval.py`` showed the shipped 4x/2x pools are effectively
lossless at the real-stream density (~0.45 valid detections/image).  This
script measures what happens when a line is much denser than the pools
were sized for: a synthetic corpus with ``MIN_DEF..MAX_DEF`` (default
8..12) defects on EVERY image, swept across pool sizes, reporting for each
arm:

  * crop-classification coverage (real network) vs mock-rule share,
  * whether the detection surface stays bit-identical (it must — pooling
    never touches detection),
  * per-image severity-count agreement and A-F grade drift vs dense,
  * the ``mock_tail_total`` counter actually rising (the Prometheus signal
    an operator watches: iqc_mock_tail_detections_total).

The reference anchor is its 300-detection capacity intent
(/root/reference/config/yolo_config.yaml:97): the dense graph IS that
capacity; pools trade tail coverage for 3.2x throughput, and this curve +
the sizing runbook in config/config.yaml tell an operator where that
trade stops being free.

One JSON object to stdout.  Env: POOLS ("1x,2x,4x,8x"), SEG_SPEC
(seg-pool spec, default = same spec as the crop-pool arm), N_IMAGES (64),
MIN_DEF (8), MAX_DEF (12), VAL_SEED (7), CONFIG (config/config.yaml).
Run on TPU: ~1 dense + len(POOLS) pooled full-graph compiles.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _pool(spec: str, batch: int, cap: int) -> int:
    if spec.endswith("x"):
        return min(int(spec[:-1]) * batch, cap)
    return min(int(spec), cap)


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np

    from iqc_tpu.config import load_config
    from iqc_tpu.data.yolo_dataset import SyntheticDefectDataset
    from iqc_tpu.models.ensemble import (
        EnsemblePredictor, build_full_forward, unpack_outputs,
    )
    from iqc_tpu.ops.jit_utils import hoisted_jit

    cfg = load_config(os.environ.get("CONFIG", "config/config.yaml"))
    cfg.model.max_classified_pool = 0
    cfg.model.max_segmented_pool = 0

    pred = EnsemblePredictor(
        yolo_weights=cfg.model.yolo_weights,
        resnet_weights=cfg.model.resnet_weights,
        config=cfg,
    )
    m = cfg.model
    kc, s = pred.max_classified, m.max_segmented

    n_images = int(os.environ.get("N_IMAGES", "64"))
    min_def = int(os.environ.get("MIN_DEF", "8"))
    max_def = int(os.environ.get("MAX_DEF", "12"))
    pools = os.environ.get("POOLS", "1x,2x,4x,8x").split(",")

    ds = SyntheticDefectDataset(
        n_images, 320, 16, seed=int(os.environ.get("VAL_SEED", "7")),
        cache=False, min_defects=min_def, max_defects=max_def,
    )
    images = np.stack([ds.load(i)[0] for i in range(n_images)])
    gt_per_img = float(np.mean([ds.load(i)[3].sum() for i in range(n_images)]))
    b = images.shape[0]

    def build(crop_pool: int, seg_pool: int):
        return hoisted_jit(build_full_forward(
            pred.yolo, pred.resnet, pred.input_size,
            pred.max_detections, kc,
            classifier_input=m.classifier_input,
            max_segmented=s, roi_size=m.seg_roi_size,
            resnet_apply=pred._resnet_apply, yolo_apply=pred._yolo_apply,
            crop_pool=crop_pool, seg_pool=seg_pool,
        ))

    args = pred._args(images)
    d_det, d_img, d_masks, d_stats = (jax.device_get(t)
                                      for t in build(0, 0)(*args))
    do = unpack_outputs(d_det, d_img)
    valid = np.asarray(do.valid)
    counts = valid.sum(axis=1)

    # dense grades via the real result builder (also the counter baseline)
    import jax.numpy as jnp  # noqa: F401  (tree_map in build_result)

    do_host = do
    dense_grades = []
    for i in range(b):
        r = pred.build_result(do_host, i, images.shape[1:3])
        dense_grades.append(r["quality_assessment"]["quality_grade"])
    dense_mock_tail = pred.mock_tail_total  # dense graph can still overflow kc

    report = {
        "corpus": {
            "n_images": b, "min_defects": min_def, "max_defects": max_def,
            "gt_defects_per_image": round(gt_per_img, 2),
            "valid_detections_per_image": {
                "mean": round(float(counts.mean()), 2),
                "p95": int(np.percentile(counts, 95)),
                "max": int(counts.max()),
                "total": int(counts.sum()),
            },
        },
        "config": {
            "precision": cfg.edge.precision,
            "conf_threshold": pred.confidence_threshold,
            "max_classified": kc, "max_segmented": s,
        },
        "dense_mock_tail_per_image": round(dense_mock_tail / b, 3),
        "arms": [],
    }

    for spec in pools:
        cp = _pool(spec, b, b * kc)
        sp = _pool(os.environ.get("SEG_SPEC", spec), b, b * s)
        p_det, p_img, p_masks, p_stats = (jax.device_get(t)
                                          for t in build(cp, sp)(*args))
        po = unpack_outputs(p_det, p_img)

        det_identical = bool(
            np.array_equal(np.asarray(do.boxes), np.asarray(po.boxes))
            and np.array_equal(valid, np.asarray(po.valid)))

        vkc = valid[:, :kc]
        cls_p = np.asarray(po.crop_classified[:, :kc])
        covered = vkc & cls_p
        sev_eq = (np.asarray(do.severity_counts)
                  == np.asarray(po.severity_counts)).all(axis=1)

        # pooled grades + the operator counter through the REAL path
        pred.mock_tail_total = 0
        pooled_grades = []
        for i in range(b):
            r = pred.build_result(po, i, images.shape[1:3])
            pooled_grades.append(r["quality_assessment"]["quality_grade"])
        grade_drift = sum(1 for g1, g2 in zip(dense_grades, pooled_grades)
                          if g1 != g2)

        vs = valid[:, :s]
        seg_covered = vs & np.asarray(p_masks).any(axis=(2, 3))
        d_has = np.asarray(d_masks).any(axis=(2, 3))
        both = vs & d_has & seg_covered
        mask_eq = bool(np.array_equal(
            np.asarray(d_masks)[both], np.asarray(p_masks)[both]))

        report["arms"].append({
            "pool_spec": spec, "pool_cls": cp, "pool_seg": sp,
            "detection_identical": det_identical,
            "crop_coverage": round(float(covered.sum() / max(vkc.sum(), 1)), 4),
            "degraded_to_mock": int((vkc & ~cls_p).sum()),
            "mock_tail_counter_per_image": round(pred.mock_tail_total / b, 3),
            "seg_coverage": round(float(seg_covered.sum() / max(vs.sum(), 1)), 4),
            "masks_identical_on_covered": mask_eq,
            "severity_counts_equal_frac": round(float(sev_eq.mean()), 4),
            "grade_drift_images": grade_drift,
            "grade_drift_frac": round(grade_drift / b, 4),
        })

    print(json.dumps(report))


if __name__ == "__main__":
    main()
