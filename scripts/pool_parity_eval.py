#!/usr/bin/env python3
"""Pooled-vs-dense parity validation on REAL checkpoints + val data.

The batch-wide compaction pools (``model.max_classified_pool`` /
``model.max_segmented_pool``) are bit-identical to the dense
reference-shaped path whenever the batch's total valid survivors fit the
pool (models/ensemble.py:93-106, :268-277).  This script measures, on the
SHIPPED serving config (int8 + 128px crops) and the shipped checkpoints,
what actually happens on the held-out val splits:

  * per-image valid-detection counts at the serving thresholds
    (how much of the pool a real QC stream uses),
  * pooled crop-classification coverage (fraction of valid top-Kc slots
    that got the real network), and agreement with dense on covered slots,
  * pooled segmentation coverage + mask/stat agreement,
  * per-image severity-count / grading agreement (the decision surface).

One JSON object to stdout.  Env: POOL_CLS (default "4x" = 4*batch),
POOL_SEG (default "2x"), SPLITS ("64,128"), VAL_SEED (1), CONFIG
(config/config.yaml).  Run on TPU: ~4 full-graph compiles.
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

    # sitecustomize pre-imports jax on axon, so JAX_PLATFORMS in the shell
    # is too late (CLAUDE.md rule 3) — honor it via config update instead.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from iqc_tpu.config import load_config
    from iqc_tpu.data.yolo_dataset import SyntheticDefectDataset
    from iqc_tpu.models.ensemble import EnsemblePredictor, build_full_forward
    from iqc_tpu.ops.jit_utils import hoisted_jit

    cfg = load_config(os.environ.get("CONFIG", "config/config.yaml"))
    # dense baseline: force the pools off regardless of the YAML
    cfg.model.max_classified_pool = 0
    cfg.model.max_segmented_pool = 0

    pred = EnsemblePredictor(
        yolo_weights=cfg.model.yolo_weights,
        resnet_weights=cfg.model.resnet_weights,
        config=cfg,
    )
    m = cfg.model
    kc, s = pred.max_classified, m.max_segmented

    def build(crop_pool: int, seg_pool: int):
        return hoisted_jit(build_full_forward(
            pred.yolo, pred.resnet, pred.input_size,
            pred.max_detections, kc,
            classifier_input=m.classifier_input,
            max_segmented=s, roi_size=m.seg_roi_size,
            resnet_apply=pred._resnet_apply, yolo_apply=pred._yolo_apply,
            crop_pool=crop_pool, seg_pool=seg_pool,
        ))

    report = {
        "config": {
            "precision": cfg.edge.precision,
            "classifier_input": m.classifier_input,
            "conf_threshold": pred.confidence_threshold,
            "qc_conf_vector": bool(cfg.qc_specific.conf_vector(
                pred.class_names, pred.confidence_threshold)),
            "pool_cls_spec": os.environ.get("POOL_CLS", "4x"),
            "pool_seg_spec": os.environ.get("POOL_SEG", "2x"),
        },
        "splits": [],
    }

    from iqc_tpu.models.ensemble import unpack_outputs

    for n_val in [int(x) for x in os.environ.get("SPLITS", "64,128").split(",")]:
        ds = SyntheticDefectDataset(
            n_val, 320, 16, seed=int(os.environ.get("VAL_SEED", "1")),
            cache=False,
        )
        images = np.stack([ds.load(i)[0] for i in range(n_val)])  # uint8
        b = images.shape[0]
        cp = _pool(report["config"]["pool_cls_spec"], b, b * kc)
        sp = _pool(report["config"]["pool_seg_spec"], b, b * s)

        dense_f, pooled_f = build(0, 0), build(cp, sp)
        args = pred._args(images)
        d_det, d_img, d_masks, d_stats = jax.device_get(dense_f(*args))
        p_det, p_img, p_masks, p_stats = jax.device_get(pooled_f(*args))
        do, po = unpack_outputs(d_det, d_img), unpack_outputs(p_det, p_img)

        valid = np.asarray(do.valid)
        counts = valid.sum(axis=1)
        # detection surface must be untouched by pooling
        det_identical = bool(
            np.array_equal(np.asarray(do.boxes), np.asarray(po.boxes))
            and np.array_equal(valid, np.asarray(po.valid))
        )

        # --- crop-classification coverage / agreement on top-Kc slots ---
        vkc = valid[:, :kc]
        cls_d, cls_p = np.asarray(do.crop_classified[:, :kc]), np.asarray(
            po.crop_classified[:, :kc])
        covered = vkc & cls_p
        missed = vkc & ~cls_p
        conf_diff = np.abs(
            np.asarray(do.ensemble_conf[:, :kc], np.float64)
            - np.asarray(po.ensemble_conf[:, :kc], np.float64))
        class_agree = np.asarray(do.crop_class[:, :kc]) == np.asarray(
            po.crop_class[:, :kc])

        # --- segmentation coverage / agreement on top-S slots ---
        vs = valid[:, :s]
        seg_covered = vs & np.asarray(p_masks).any(axis=(2, 3))
        d_has = np.asarray(d_masks).any(axis=(2, 3))
        # slots where dense produced a mask: pooled must match exactly
        both = vs & d_has & seg_covered
        mask_eq = np.array_equal(
            np.asarray(d_masks)[both], np.asarray(p_masks)[both])
        stats_eq = bool(np.allclose(
            np.asarray(d_stats)[both], np.asarray(p_stats)[both]))

        # --- decision surface: severity counts per image ---
        sev_eq_imgs = int((np.asarray(do.severity_counts)
                           == np.asarray(po.severity_counts)).all(axis=1).sum())

        report["splits"].append({
            "n_images": int(b),
            "pool_cls": int(cp), "pool_seg": int(sp),
            "valid_per_image": {
                "mean": round(float(counts.mean()), 2),
                "max": int(counts.max()),
                "p95": int(np.percentile(counts, 95)),
                "total": int(counts.sum()),
            },
            "detection_identical": det_identical,
            "crop_pool": {
                "valid_topk_slots": int(vkc.sum()),
                "classified": int(covered.sum()),
                "degraded_to_mock": int(missed.sum()),
                "coverage": round(float(covered.sum() / max(vkc.sum(), 1)), 4),
                "max_conf_diff_on_covered": float(conf_diff[covered].max())
                if covered.any() else 0.0,
                "class_agreement_on_covered": round(float(
                    class_agree[covered].mean()), 4) if covered.any() else 1.0,
            },
            "seg_pool": {
                "valid_topS_slots": int(vs.sum()),
                "dense_nonempty": int((vs & d_has).sum()),
                "pooled_covered": int(seg_covered.sum()),
                "masks_bit_identical_on_covered": bool(mask_eq),
                "stats_equal_on_covered": stats_eq,
            },
            "severity_counts_equal_images": sev_eq_imgs,
            "severity_counts_equal_frac": round(sev_eq_imgs / b, 4),
        })

    print(json.dumps(report))


if __name__ == "__main__":
    main()
