#!/usr/bin/env python3
"""Model preparation: initialize / convert QC model weights.

Equivalent of the reference's ``scripts/download_models.py``: it downloads
Ultralytics .pt files and builds a torchvision resnet50 head
(``download_models.py:46-164``), then writes a model_info.yaml with perf
targets (``:182-218``). This environment has zero egress, so instead:

- ``init``: create fresh Flax weights for yolov8{n,s,m}-class detectors and
  the ResNet-50 classifier, saved as msgpack + metadata.
- ``convert-resnet``: map a user-supplied torch(vision) resnet50 state_dict
  (.pt/.pth, loadable with plain torch CPU) onto our Flax ResNet-50 —
  including the reference's custom head (fc.1 / fc.4 Sequential indices,
  resent_model.py:74-81) when present.
- ``info``: write model_info.yaml with the performance targets.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

YOLO_VARIANTS = {
    "yolov8n": (0.25, 0.334),
    "yolov8s": (0.50, 0.334),
    "yolov8m": (0.75, 0.667),
}


def cmd_init(args) -> None:
    import jax
    import jax.numpy as jnp

    from iqc_tpu.models.resnet import ResNet50
    from iqc_tpu.models.yolo import YOLOv8
    from iqc_tpu.train.checkpoint import save_variables

    os.makedirs(args.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    for name in args.yolo_variants:
        w, d = YOLO_VARIANTS[name]
        yolo = YOLOv8(num_classes=args.num_classes, width_mult=w, depth_mult=d)
        variables = yolo.init(
            rng, jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32),
            train=False,
        )
        path = os.path.join(args.output_dir, f"{name}_qc.msgpack")
        save_variables(path, variables, {"variant": name, "width": w, "depth": d,
                                         "num_classes": args.num_classes})
        print(f"wrote {path}")

    resnet = ResNet50(num_classes=args.num_classes)
    variables = resnet.init(rng, jnp.zeros((1, 224, 224, 3), jnp.float32), train=False)
    path = os.path.join(args.output_dir, "resnet50_qc.msgpack")
    save_variables(path, variables, {"arch": "resnet50", "num_classes": args.num_classes})
    print(f"wrote {path}")
    cmd_info(args)


def convert_torch_resnet50(state_dict, num_classes: int = 5):
    """torch(vision) resnet50 state_dict -> Flax {params, batch_stats}.

    Handles both the stock fc (ignored) and the reference's custom head
    Sequential (fc.1 -> head_dense1, fc.4 -> head_dense2).
    """
    import numpy as np

    params, batch_stats = {}, {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def conv_w(v):
        return np.transpose(np.asarray(v), (2, 3, 1, 0))  # OIHW -> HWIO

    def copy_bn(torch_prefix, flax_name):
        put(params, (flax_name, "scale"), np.asarray(state_dict[f"{torch_prefix}.weight"]))
        put(params, (flax_name, "bias"), np.asarray(state_dict[f"{torch_prefix}.bias"]))
        put(batch_stats, (flax_name, "mean"),
            np.asarray(state_dict[f"{torch_prefix}.running_mean"]))
        put(batch_stats, (flax_name, "var"),
            np.asarray(state_dict[f"{torch_prefix}.running_var"]))

    def copy_bn_nested(torch_prefix, block, flax_name):
        put(params, (block, flax_name, "scale"),
            np.asarray(state_dict[f"{torch_prefix}.weight"]))
        put(params, (block, flax_name, "bias"),
            np.asarray(state_dict[f"{torch_prefix}.bias"]))
        put(batch_stats, (block, flax_name, "mean"),
            np.asarray(state_dict[f"{torch_prefix}.running_mean"]))
        put(batch_stats, (block, flax_name, "var"),
            np.asarray(state_dict[f"{torch_prefix}.running_var"]))

    put(params, ("stem_conv", "kernel"), conv_w(state_dict["conv1.weight"]))
    copy_bn("bn1", "stem_bn")

    stage_sizes = (3, 4, 6, 3)
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            tp = f"layer{i + 1}.{j}"
            block = f"stage{i + 1}_block{j + 1}"
            for k in (1, 2, 3):
                put(params, (block, f"conv{k}", "kernel"),
                    conv_w(state_dict[f"{tp}.conv{k}.weight"]))
                copy_bn_nested(f"{tp}.bn{k}", block, f"bn{k}")
            if f"{tp}.downsample.0.weight" in state_dict:
                put(params, (block, "downsample_conv", "kernel"),
                    conv_w(state_dict[f"{tp}.downsample.0.weight"]))
                copy_bn_nested(f"{tp}.downsample.1", block, "downsample_bn")

    # reference custom head: Sequential(Dropout, Linear(2048,512), ReLU,
    # Dropout, Linear(512,C)) -> fc.1 / fc.4 (resent_model.py:74-81)
    if "fc.1.weight" in state_dict:
        put(params, ("head_dense1", "kernel"),
            np.transpose(np.asarray(state_dict["fc.1.weight"])))
        put(params, ("head_dense1", "bias"), np.asarray(state_dict["fc.1.bias"]))
        put(params, ("head_dense2", "kernel"),
            np.transpose(np.asarray(state_dict["fc.4.weight"])))
        put(params, ("head_dense2", "bias"), np.asarray(state_dict["fc.4.bias"]))
    return {"params": params, "batch_stats": batch_stats}


def cmd_convert_resnet(args) -> None:
    import jax
    import jax.numpy as jnp
    import torch

    from iqc_tpu.models.resnet import ResNet50
    from iqc_tpu.train.checkpoint import save_variables

    ckpt = torch.load(args.input, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    converted = convert_torch_resnet50(state_dict, args.num_classes)

    # validate structure against a fresh init, filling any missing head
    resnet = ResNet50(num_classes=args.num_classes)
    init_vars = resnet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32), train=False
    )

    def merge(init, conv):
        if isinstance(init, dict):
            return {k: merge(v, conv.get(k)) if isinstance(conv, dict) else v
                    for k, v in init.items()}
        if conv is None:
            return init
        import numpy as np

        conv = np.asarray(conv)
        if conv.shape != init.shape:
            raise ValueError(f"shape mismatch: {conv.shape} vs {init.shape}")
        return conv.astype(init.dtype)

    merged = {
        "params": merge(init_vars["params"], converted["params"]),
        "batch_stats": merge(init_vars["batch_stats"], converted["batch_stats"]),
    }
    save_variables(args.output, merged, {"converted_from": args.input})
    print(f"wrote {args.output}")


def cmd_info(args) -> None:
    import yaml

    info = {
        "models": {
            "yolov8_qc": {"task": "defect detection", "input_size": [args.image_size] * 2},
            "resnet50_qc": {"task": "defect classification", "input_size": [224, 224]},
        },
        "performance_targets": {
            "accuracy": 0.942,
            "map50": 0.887,
            "precision": 0.913,
            "recall": 0.89,
            "inference_time_ms": 20,
            "throughput_images_per_minute": 5000,
        },
        "classes": ["crack", "scratch", "dent", "discoloration", "contamination"],
    }
    path = os.path.join(args.output_dir, "model_info.yaml")
    os.makedirs(args.output_dir, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(info, f)
    print(f"wrote {path}")


def cmd_verify(args) -> None:
    """Load a checkpoint and run a real forward pass — the reference's
    torch.load verification (download_models.py:86-105 equivalent)."""
    import jax
    import jax.numpy as jnp

    from iqc_tpu.train.checkpoint import load_metadata, load_variables

    meta = load_metadata(args.input)
    train_cfg = meta.get("config") or {}
    arch = meta.get("arch") or meta.get("variant") or args.arch
    if arch is None and "width_mult" in train_cfg:
        arch = "yolo(trained)"  # YOLOTrainer.save metadata carries its config
    if arch and arch.startswith("yolo"):
        from iqc_tpu.models.yolo import YOLOv8

        w, d = YOLO_VARIANTS.get(
            arch,
            (
                train_cfg.get("width_mult", meta.get("width", 0.25)),
                train_cfg.get("depth_mult", meta.get("depth", 0.334)),
            ),
        )
        module = YOLOv8(
            num_classes=train_cfg.get("num_classes", args.num_classes),
            width_mult=w, depth_mult=d,
            reg_max=train_cfg.get("reg_max", 16),
        )
        size = train_cfg.get("image_size", args.image_size)
        dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    else:
        from iqc_tpu.models.resnet import ResNet50

        module = ResNet50(num_classes=args.num_classes)
        dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
    template = module.init(jax.random.PRNGKey(0), dummy, train=False)
    variables = load_variables(args.input, template)
    out = module.apply(variables, dummy, train=False)
    leaves = jax.tree_util.tree_leaves(out)
    import numpy as np

    ok = all(np.isfinite(np.asarray(x)).all() for x in leaves)
    print(f"{args.input}: arch={arch or 'resnet50'} forward "
          f"{'OK (finite outputs)' if ok else 'FAILED (non-finite outputs)'}")
    if not ok:
        raise SystemExit(1)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_init = sub.add_parser("init")
    p_init.add_argument("--output-dir", default="models")
    p_init.add_argument("--num-classes", type=int, default=5)
    p_init.add_argument("--image-size", type=int, default=640)
    p_init.add_argument("--seed", type=int, default=0)
    p_init.add_argument("--yolo-variants", nargs="+", default=["yolov8n"],
                        choices=list(YOLO_VARIANTS))
    p_init.set_defaults(fn=cmd_init)

    p_conv = sub.add_parser("convert-resnet")
    p_conv.add_argument("--input", required=True)
    p_conv.add_argument("--output", required=True)
    p_conv.add_argument("--num-classes", type=int, default=5)
    p_conv.set_defaults(fn=cmd_convert_resnet)

    p_info = sub.add_parser("info")
    p_info.add_argument("--output-dir", default="models")
    p_info.add_argument("--image-size", type=int, default=640)
    p_info.set_defaults(fn=cmd_info)

    p_ver = sub.add_parser("verify")
    p_ver.add_argument("--input", required=True)
    p_ver.add_argument("--arch", default=None,
                       help="yolov8n/s/m or resnet50 (default: from metadata)")
    p_ver.add_argument("--num-classes", type=int, default=5)
    p_ver.add_argument("--image-size", type=int, default=320)
    p_ver.set_defaults(fn=cmd_verify)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
