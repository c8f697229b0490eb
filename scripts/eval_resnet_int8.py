#!/usr/bin/env python3
"""Classifier int8 parity eval on the shipped checkpoint: fp32 vs int8 v1
vs int8 streaming v2 (models/resnet_int8_stream.py).

Renders unseen defect crops from the synthetic corpus (VAL_SEED != the
demo trainer's seed 7 training stream), loads the shipped classifier
checkpoint, and reports accuracy + top-1 prediction agreement for each
path — the round-2 protocol that validated v1 ("100% prediction agreement
on 418 unseen crops", RESULTS.md), extended to the v2 walk.

Env: CKPT (default models/resnet50_qc.msgpack), N_IMAGES (default 200),
VAL_SEED (default 1), BATCH (default 64).
Prints one JSON object.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from iqc_tpu.models import resnet_int8, resnet_int8_stream
    from iqc_tpu.models.resnet import ResNet50, preprocess_for_classifier
    from iqc_tpu.train.checkpoint import try_load_variables

    sys.path.insert(0, os.path.dirname(__file__))
    from train_demo_resnet import render_crops

    ckpt = os.environ.get("CKPT", "models/resnet50_qc.msgpack")
    n_images = int(os.environ.get("N_IMAGES", "200"))
    val_seed = int(os.environ.get("VAL_SEED", "1"))
    batch = int(os.environ.get("BATCH", "64"))

    module = ResNet50(num_classes=5, dtype=jnp.float32)
    init_vars = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3), jnp.float32),
                            train=False)
    variables = try_load_variables(ckpt, init_vars)
    assert variables is not None, f"checkpoint {ckpt} failed to load"

    crops, labels = render_crops(n_images, crop_size=224, seed=val_seed)
    n = (len(crops) // batch) * batch  # static batch shapes only
    crops, labels = crops[:n], labels[:n]

    q = resnet_int8.quantize_resnet(variables)
    # calibration: first batches of the SAME unseen stream (standard PTQ)
    cal = [preprocess_for_classifier(jnp.asarray(crops[i:i + batch]))
           for i in range(0, min(n, 4 * batch), batch)]
    scales = resnet_int8.calibrate_activation_scales(q, cal)

    def fp(v, x):
        return module.apply(v, preprocess_for_classifier(x), train=False)

    def v1(v, x):
        return resnet_int8.apply(v["q"], preprocess_for_classifier(x),
                                 act_scales=v["scales"])

    def v2(v, x):
        return resnet_int8_stream.apply(v["q"], preprocess_for_classifier(x),
                                        v["scales"])

    arms = {
        "fp32": (jax.jit(fp), jax.device_put(variables)),
        "int8_v1": (jax.jit(v1), jax.device_put({"q": q, "scales": scales})),
        "int8_stream_v2": (jax.jit(v2),
                           jax.device_put({"q": q, "scales": scales})),
    }
    preds = {}
    for name, (f, v) in arms.items():
        out = []
        for i in range(0, n, batch):
            logits = f(v, jnp.asarray(crops[i:i + batch]))
            out.append(np.argmax(np.asarray(logits), -1))
        preds[name] = np.concatenate(out)

    def acc(p):
        return round(float((p == labels).mean()), 4)

    report = {
        "checkpoint": ckpt, "n_crops": int(n), "val_seed": val_seed,
        "accuracy": {k: acc(p) for k, p in preds.items()},
        "agreement_vs_fp32": {
            k: round(float((preds[k] == preds["fp32"]).mean()), 4)
            for k in ("int8_v1", "int8_stream_v2")
        },
        "agreement_v2_vs_v1": round(
            float((preds["int8_stream_v2"] == preds["int8_v1"]).mean()), 4),
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
