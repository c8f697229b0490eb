#!/usr/bin/env python3
"""Deterministic mAP evaluation of a saved YOLO checkpoint.

Enumerates the held-out synthetic val splits (seed 1; 64- and 128-image)
in order — no sampling, so repeated runs of the same checkpoint are
bit-identical (the round-2 with-replacement defect stays fixed).

Run: python scripts/eval_yolo.py  (env: CKPT, IMAGE_SIZE, SPLITS, VAL_SEED)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax.numpy as jnp

    from iqc_tpu.data.yolo_dataset import DetectionLoader, SyntheticDefectDataset
    from iqc_tpu.train.checkpoint import load_variables
    from iqc_tpu.train.train_yolo import YOLOTrainer

    ckpt = os.environ.get("CKPT", "models/yolov8n_qc_synthetic.msgpack")
    image_size = int(os.environ.get("IMAGE_SIZE", "320"))
    splits = [int(s) for s in os.environ.get("SPLITS", "64,128").split(",")]
    val_seed = int(os.environ.get("VAL_SEED", "1"))

    meta = {}
    meta_path = ckpt + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f).get("config", {})

    cfg = {
        "image_size": image_size,
        "max_boxes": int(meta.get("max_boxes", 16)),
        "width_mult": float(meta.get("width_mult", 0.25)),
        "depth_mult": float(meta.get("depth_mult", 0.334)),
        "reg_max": int(meta.get("reg_max", 16)),
        "num_classes": int(meta.get("num_classes", 5)),
        "compute_dtype": meta.get("compute_dtype", "bfloat16"),
        "stem_mode": meta.get("stem_mode", "conv"),
    }
    if os.environ.get("BOX_VOTING") is not None:  # else DEFAULT_CONFIG (on)
        cfg["box_voting"] = os.environ["BOX_VOTING"] == "1"
    trainer = YOLOTrainer(cfg)
    trainer.build(steps_per_epoch=1)
    template = {"params": trainer.ema_params,
                "batch_stats": trainer.state.batch_stats}
    loaded = load_variables(ckpt, template)
    trainer.ema_params = loaded["params"]
    trainer.state = trainer.state._replace(batch_stats=loaded["batch_stats"])

    int8_stream = os.environ.get("INT8_STREAM", "0") == "1"
    int8 = os.environ.get("INT8", "0") == "1" or int8_stream
    if int8:
        # swap the trainer's predict fn for the true-int8 forward
        # (models/yolo_int8.py, or the int8-resident streaming v2 with
        # INT8_STREAM=1) — measures the int8 mAP cost directly
        import jax
        import numpy as np

        from iqc_tpu.data.yolo_dataset import SyntheticDefectDataset as _SDS
        from iqc_tpu.models import yolo_int8
        from iqc_tpu.ops.jit_utils import hoisted_jit
        from iqc_tpu.ops.nms import decode_and_nms

        variables = {"params": loaded["params"],
                     "batch_stats": loaded["batch_stats"]}
        cal_ds = _SDS(8, image_size, trainer.config["max_boxes"], seed=99)
        cal = np.stack([cal_ds.load(i)[0] for i in range(8)]).astype(np.float32) / 255.0
        if int8_stream:
            from iqc_tpu.models import yolo_int8_stream as _stream

            fp_tree = _stream.fold_fp(
                variables, stem_mode=meta.get("stem_mode", "conv"))
            scales = _stream.calibrate(
                fp_tree, [cal], reg_max=trainer.config["reg_max"],
                num_classes=trainer.config["num_classes"])
            q = _stream.quantize(
                variables, scales, stem_mode=meta.get("stem_mode", "conv"),
                reg_max=trainer.config["reg_max"],
                num_classes=trainer.config["num_classes"])
        else:
            q = yolo_int8.quantize_yolo(
                variables, stem_mode=meta.get("stem_mode", "conv"),
            )
            scales = yolo_int8.calibrate_activation_scales(
                q, [cal], reg_max=trainer.config["reg_max"],
                num_classes=trainer.config["num_classes"])
        q_dev, scales_dev = jax.device_put(q), jax.device_put(scales)

        @hoisted_jit
        def predict_q(qq, ss, images, conf_t, iou_t, anchors, strides):
            if jnp.issubdtype(images.dtype, jnp.integer):
                images = images.astype(jnp.float32) / 255.0
            if int8_stream:
                from iqc_tpu.models import yolo_int8_stream as _stream

                dist, cls = _stream.apply(
                    qq, images, ss, reg_max=trainer.config["reg_max"],
                    num_classes=trainer.config["num_classes"])
            else:
                dist, cls = yolo_int8.apply(
                    qq, images, reg_max=trainer.config["reg_max"],
                    num_classes=trainer.config["num_classes"], act_scales=ss)
            return decode_and_nms(
                dist, cls, anchors, strides, trainer.config["reg_max"],
                max_detections=100, iou_threshold=iou_t, score_threshold=conf_t,
                box_voting=bool(trainer.config.get("box_voting", False)))

        trainer._predict = lambda p, bs, im, c, i: predict_q(
            q_dev, scales_dev, im, c, i,
            trainer._anchors_dev, trainer._strides_dev)
        # force the streaming validate path: the device-resident val scan
        # (_maybe_device_val/_val_scan) closes over the fp predict_core,
        # which would silently bypass this int8 monkeypatch and measure
        # the fp model
        trainer._maybe_device_val = lambda loader: None

    report = {"checkpoint": ckpt, "image_size": image_size, "int8": int8,
              "int8_stream": int8_stream, "val_seed": val_seed, "splits": {}}
    for n in splits:
        ds = SyntheticDefectDataset(n, image_size, trainer.config["max_boxes"],
                                    seed=val_seed)
        loader = DetectionLoader(ds, trainer.config["batch_size"],
                                 mosaic_prob=0, mixup_prob=0, shuffle=False)
        m1 = trainer.validate(loader)
        m2 = trainer.validate(loader)  # determinism witness
        for k in ("mAP50", "mAP50_95"):
            assert m1[k] == m2[k], f"non-deterministic eval: {k}"
        report["splits"][str(n)] = {
            k: round(float(v), 4) for k, v in m1.items()
            if isinstance(v, (int, float))
        }
        if "per_thresh_ap" in m1:
            report["splits"][str(n)]["per_thresh_ap"] = [
                round(float(v), 4) for v in m1["per_thresh_ap"]
            ]
        if "per_class_ap50" in m1:
            report["splits"][str(n)]["per_class_ap50"] = [
                round(float(v), 4) for v in m1["per_class_ap50"]
            ]
    print(json.dumps(report))


if __name__ == "__main__":
    main()
