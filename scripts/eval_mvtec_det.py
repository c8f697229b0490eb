#!/usr/bin/env python3
"""Re-evaluate a saved YOLO checkpoint on the held-out mvtec val split,
reporting the full per-IoU AP curve (0.50..0.95).

Runs on CPU by default (PLATFORM=cpu) so it can execute while the TPU is
busy training; set PLATFORM=tpu to use the tunnel device.

Reference parity: the upstream gets mAP50/mAP50-95 from Ultralytics
``model.val()`` (train/train_yolo.py:181-211); this drives the native
equivalent (iqc_tpu/train/detection_metrics.py) through the same
DetectionLoader enumeration train_mvtec.py uses, so numbers are directly
comparable with the .mvtec_report.json artifacts.

TTA=1 adds horizontal-flip test-time augmentation: both views' detections
are merged per image with score-weighted box fusion (the Ultralytics
``model.val(augment=True)`` equivalent the reference exposes via its val
path). Two independent localization estimates average out box noise, which
targets exactly the high-IoU AP tail (docs/per_thresh_640_r5.json).

Env: CKPT (required), IMG_SIZE (640), ROOT, CATEGORY, PLATFORM (cpu),
TTA (0). Prints one JSON line.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _iou_1(a, b):
    x1 = max(a[0], b[0]); y1 = max(a[1], b[1])
    x2 = min(a[2], b[2]); y2 = min(a[3], b[3])
    inter = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def weighted_box_fusion(boxes, scores, classes, iou_thr=0.6):
    """Score-weighted fusion of overlapping same-class boxes (WBF).

    Merged box = score-weighted mean of cluster members; merged score = max
    (single-view detections keep their rank instead of being halved).
    """
    order = np.argsort(-scores, kind="stable")
    clusters = []
    for i in order:
        b, s, c = boxes[i], float(scores[i]), int(classes[i])
        hit = None
        for cl in clusters:
            if cl["cls"] == c and _iou_1(cl["box"], b) >= iou_thr:
                hit = cl
                break
        if hit is None:
            clusters.append({"cls": c, "bsum": s * b.astype(np.float64),
                             "wsum": s, "box": b.copy(), "score": s})
        else:
            hit["bsum"] += s * b.astype(np.float64)
            hit["wsum"] += s
            hit["box"] = (hit["bsum"] / hit["wsum"]).astype(np.float32)
            hit["score"] = max(hit["score"], s)
    if not clusters:
        return (np.zeros((0, 4), np.float32), np.zeros(0, np.float32),
                np.zeros(0, np.int32))
    return (np.stack([cl["box"] for cl in clusters]).astype(np.float32),
            np.asarray([cl["score"] for cl in clusters], np.float32),
            np.asarray([cl["cls"] for cl in clusters], np.int32))


def main() -> None:
    import jax

    if os.environ.get("PLATFORM", "cpu") == "cpu":
        # sitecustomize pre-imports jax on the axon backend; flip to CPU
        # before any device access so a live TPU trainer isn't disturbed
        jax.config.update("jax_platforms", "cpu")

    from iqc_tpu.config import DEFECT_CLASSES
    from iqc_tpu.data.mvtec import (
        MVTecDetectionDataset, SubsetDataset, split_indices,
    )
    from iqc_tpu.data.yolo_dataset import DetectionLoader
    from iqc_tpu.train.checkpoint import load_variables
    from iqc_tpu.train.train_yolo import YOLOTrainer

    ckpt = os.environ["CKPT"]
    img_size = int(os.environ.get("IMG_SIZE", "640"))
    root = os.environ.get("ROOT", "data/mvtec_corpus")
    category = os.environ.get("CATEGORY", "metal_plate")

    meta = {}
    meta_path = ckpt + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f).get("config", {})

    # identical split recipe to scripts/train_mvtec.py:train_detection so
    # the val set matches the .mvtec_report.json artifacts exactly
    cat_dir = os.path.join(root, category)
    ds = MVTecDetectionDataset(
        cat_dir, image_size=img_size, max_boxes=16,
        include_good=True, class_names=list(DEFECT_CLASSES),
    )
    _, val_idx = split_indices(len(ds), val_fraction=0.25, seed=0)
    val_ds = SubsetDataset(ds, val_idx)
    val_loader = DetectionLoader(val_ds, 16, mosaic_prob=0, mixup_prob=0,
                                 shuffle=False)

    trainer = YOLOTrainer({
        "image_size": img_size,
        "max_boxes": 16,
        "width_mult": float(meta.get("width_mult",
                                     os.environ.get("WIDTH_MULT", "0.25"))),
        "depth_mult": float(meta.get("depth_mult",
                                     os.environ.get("DEPTH_MULT", "0.334"))),
        "batch_size": 16,
        "epochs": 1,
        "seed": 0,
    })
    trainer.build(steps_per_epoch=1)
    tmpl = {"params": trainer.ema_params,
            "batch_stats": trainer.state.batch_stats}
    loaded = load_variables(ckpt, tmpl)
    trainer.ema_params = loaded["params"]
    trainer.state = trainer.state._replace(batch_stats=loaded["batch_stats"])

    if os.environ.get("TTA", "0") != "0":
        import jax.numpy as jnp

        from iqc_tpu.train.detection_metrics import evaluate_detections

        c = trainer.config
        preds, gts = [], []
        for batch in val_loader:
            imgs = np.asarray(batch["images"])
            # TTA=1: identity + hflip. TTA=2: 4 views (h/v flips — the
            # corpus is top-down orientation-free, matching the trainer's
            # fliplr/flipud augmentation).
            flip_set = ([(False, False), (True, False)]
                        if os.environ["TTA"] == "1"
                        else [(False, False), (True, False),
                              (False, True), (True, True)])
            views = []
            for hf, vf in flip_set:
                x = imgs[:, :, ::-1] if hf else imgs
                x = x[:, ::-1] if vf else x
                det = trainer._predict(
                    trainer.ema_params, trainer.state.batch_stats,
                    jnp.asarray(x), jnp.float32(c["val_conf"]),
                    jnp.float32(c["val_iou"]),
                )
                import jax

                views.append(jax.device_get(
                    (det.boxes, det.scores, det.classes, det.valid)))
            for i in range(len(imgs)):
                bs, ss, cs = [], [], []
                for (hf, vf), (b, s, k, v) in zip(flip_set, views):
                    bb = b[i][v[i]].astype(np.float32).copy()
                    w = float(img_size)
                    if hf and len(bb):  # unflip x coords
                        x1 = w - bb[:, 2].copy()
                        x2 = w - bb[:, 0].copy()
                        bb[:, 0], bb[:, 2] = x1, x2
                    if vf and len(bb):  # unflip y coords
                        y1 = w - bb[:, 3].copy()
                        y2 = w - bb[:, 1].copy()
                        bb[:, 1], bb[:, 3] = y1, y2
                    bs.append(bb)
                    ss.append(s[i][v[i]].astype(np.float32))
                    cs.append(k[i][v[i]].astype(np.int32))
                fb, fs, fc = weighted_box_fusion(
                    np.concatenate(bs) if bs else np.zeros((0, 4), np.float32),
                    np.concatenate(ss), np.concatenate(cs),
                    iou_thr=float(c["val_iou"]))
                preds.append({"boxes": fb, "scores": fs, "classes": fc})
                gv = batch["valid"][i]
                gts.append({"boxes": batch["boxes"][i][gv],
                            "classes": batch["classes"][i][gv]})
        final = evaluate_detections(preds, gts, c["num_classes"])
    else:
        final = trainer.validate(val_loader)
    out = {
        "checkpoint": ckpt,
        "img_size": img_size,
        "tta": os.environ.get("TTA", "0"),
        "n_val": len(val_ds),
        "mAP50": round(float(final["mAP50"]), 4),
        "mAP50_95": round(float(final["mAP50_95"]), 4),
        "per_class_ap50": [round(float(v), 4)
                           for v in final.get("per_class_ap50", [])],
        "per_thresh_ap": [round(float(v), 4)
                          for v in final.get("per_thresh_ap", [])],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
