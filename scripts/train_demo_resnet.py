#!/usr/bin/env python3
"""Train the shipped demo ResNet-50 defect-crop classifier.

Renders defect crops from the synthetic corpus (``SyntheticDefectDataset``
draws each defect with an exact box + class label), trains ``ResNet50`` with
the standard trainer, and writes ``models/resnet50_qc.msgpack`` — the default
``model.resnet_weights`` path (config/config.yaml:7) the serving ensemble
loads at startup. Without this file the demo server falls back to
initialized (random) classifier weights.

Crops mirror what the ensemble classifies at inference time: the detection
box grown by a margin, resampled to 224 (models/ensemble.py crop path).

Run (TPU, ~2 min): python scripts/train_demo_resnet.py
Env: N_IMAGES, EPOCHS, OUT.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def render_crops(n_images: int, crop_size: int = 224, seed: int = 7):
    """-> images [N,224,224,3] uint8, labels [N] int32 (one crop per defect)."""
    from PIL import Image

    from iqc_tpu.data.yolo_dataset import SyntheticDefectDataset

    ds = SyntheticDefectDataset(n=n_images, image_size=320, seed=seed, cache=False)
    rng = np.random.default_rng(seed)
    crops, labels = [], []
    for i in range(len(ds)):
        img, boxes, classes, valid = ds.load(i)
        s = img.shape[0]
        for b, c, v in zip(boxes, classes, valid):
            if not v:
                continue
            x1, y1, x2, y2 = b
            # margin like the inference crop path; jitter for robustness
            m = 0.15 + rng.uniform(-0.05, 0.1)
            w, h = x2 - x1, y2 - y1
            x1 = int(np.clip(x1 - m * w, 0, s - 2))
            y1 = int(np.clip(y1 - m * h, 0, s - 2))
            x2 = int(np.clip(x2 + m * w, x1 + 2, s))
            y2 = int(np.clip(y2 + m * h, y1 + 2, s))
            crop = Image.fromarray(img[y1:y2, x1:x2]).resize((crop_size, crop_size))
            crops.append(np.asarray(crop, np.uint8))
            labels.append(int(c))
    return np.stack(crops), np.asarray(labels, np.int32)


def main() -> None:
    from iqc_tpu.config import DEFECT_CLASSES
    from iqc_tpu.data.pipeline import ArrayDataset
    from iqc_tpu.train.train_resnet import ResNetTrainer

    n_images = int(os.environ.get("N_IMAGES", "1500"))
    epochs = int(os.environ.get("EPOCHS", "12"))
    out = os.environ.get("OUT", "models/resnet50_qc.msgpack")
    # 224 = reference transform parity (resent_model.py:57-66); 128 = the
    # TPU-first option for small-defect crops (model.classifier_input)
    crop_size = int(os.environ.get("CROP_SIZE", "224"))

    t0 = time.time()
    images, labels = render_crops(n_images, crop_size=crop_size)
    print(f"rendered {len(images)} crops in {time.time()-t0:.1f}s; "
          f"class counts {np.bincount(labels, minlength=5).tolist()}", flush=True)

    n_val = max(len(images) // 10, 50)
    perm = np.random.default_rng(0).permutation(len(images))
    val_idx, train_idx = perm[:n_val], perm[n_val:]
    train_ds = ArrayDataset(images[train_idx], labels[train_idx], list(DEFECT_CLASSES))
    val_ds = ArrayDataset(images[val_idx], labels[val_idx], list(DEFECT_CLASSES))

    trainer = ResNetTrainer({
        "epochs": epochs,
        "batch_size": 64,
        "learning_rate": 3e-4,
        "checkpoint_dir": "checkpoints/resnet_demo",
        "early_stopping_patience": epochs,
    })
    trainer.setup_data(train_ds, val_ds, val_ds)
    trainer.build(steps_per_epoch=len(trainer.train_loader))
    report = trainer.train(epochs=epochs)
    val = trainer.evaluate(trainer.val_loader)
    trainer.save(out, epoch=report["epochs_trained"])
    meta = {
        "val_accuracy": round(float(val["accuracy"]), 4),
        "val_f1": round(float(val["f1"]), 4),
        "n_crops": int(len(images)),
        "crop_size": crop_size,
        "epochs": report["epochs_trained"],
        "classes": list(DEFECT_CLASSES),
        "corpus": f"SyntheticDefectDataset(n={n_images}, image_size=320, seed=7)",
    }
    with open(out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta), flush=True)


if __name__ == "__main__":
    main()
