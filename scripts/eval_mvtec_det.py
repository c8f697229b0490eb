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

Env: CKPT (required), IMG_SIZE (640), ROOT, CATEGORY, PLATFORM (cpu).
Prints one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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

    final = trainer.validate(val_loader)
    out = {
        "checkpoint": ckpt,
        "img_size": img_size,
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
