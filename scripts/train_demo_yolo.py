#!/usr/bin/env python3
"""Train the shipped demo YOLOv8n detector on the synthetic corpus.

Reproduces models/yolov8n_qc_synthetic.msgpack with the device-resident
corpus + scanned-epoch + on-device-mosaic pipeline. Env: EPOCHS, N_IMAGES,
IMAGE_SIZE, OUT.

Run (TPU, ~5 min): python scripts/train_demo_yolo.py
"""

import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    from iqc_tpu.data.yolo_dataset import DetectionLoader, SyntheticDefectDataset
    from iqc_tpu.train.train_yolo import YOLOTrainer

    logging.basicConfig(level=logging.INFO)
    epochs = int(os.environ.get("EPOCHS", "60"))
    n_images = int(os.environ.get("N_IMAGES", "768"))
    image_size = int(os.environ.get("IMAGE_SIZE", "320"))
    out = os.environ.get("OUT", "models/yolov8n_qc_synthetic.msgpack")

    seed = int(os.environ.get("SEED", "42"))
    device_mosaic = os.environ.get("DEVICE_MOSAIC", "1") == "1"
    trainer = YOLOTrainer({
        "seed": seed,
        "stem_mode": os.environ.get("STEM", "conv"),
        "device_mosaic": device_mosaic,
        "mosaic_antialias": os.environ.get("MOSAIC_AA", "0") == "1",
        "image_size": image_size,
        "epochs": epochs,
        "learning_rate": 0.008,
        "warmup_epochs": 2,
        "ema_decay": 0.995,
        "max_boxes": 16,
        # CKPT_DIR isolates experiment runs from the shipped demo checkpoint
        # (mid-run best saves land here and would otherwise clobber it).
        "checkpoint_dir": os.environ.get("CKPT_DIR", "checkpoints/yolo_demo"),
    })
    c = trainer.config
    train_ds = SyntheticDefectDataset(n_images, image_size, c["max_boxes"], seed=0)
    val_ds = SyntheticDefectDataset(128, image_size, c["max_boxes"], seed=1)
    host_mosaic = 0.0 if trainer.uses_device_mosaic else c["mosaic"]
    train_loader = DetectionLoader(train_ds, c["batch_size"],
                                   mosaic_prob=host_mosaic, mixup_prob=0.0)
    val_loader = DetectionLoader(val_ds, c["batch_size"], mosaic_prob=0,
                                 mixup_prob=0, shuffle=False)
    report = trainer.train(train_loader, val_loader)
    trainer.save(out)
    meta = {
        "best_mAP50": round(report["best_mAP50"], 4),
        "final": {k: round(v, 4) for k, v in report["final"].items()
                  if isinstance(v, (int, float))},
        "n_images": n_images, "image_size": image_size,
        "epochs": report["epochs_trained"],
        "seed": seed,
        "stem_mode": c["stem_mode"],
        "pipeline": "device corpus + scanned epochs + device mosaic",
    }
    with open(out + ".train_report.json", "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
