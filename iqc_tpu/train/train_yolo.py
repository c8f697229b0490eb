"""YOLOv8 detection trainer — the loop the reference outsources.

``train/train_yolo.py`` hands the entire training loop to Ultralytics
(``model.train(...)`` with ~30 kwargs, ``:117-179``). Here the loop is
owned natively: Flax YOLOv8 forward, task-aligned-assignment loss
(``iqc_tpu/train/yolo_loss.py``, gains box=7.5/cls=0.5/dfl=1.5 per
``config/yolo_config.yaml:84-90``), mosaic/mixup batch assembly
(``yolo_config.yaml:75-76``), EMA weights, cosine or linear LR with
warmup, data-parallel pjit over the mesh, and native mAP50/mAP50-95
validation (``train_yolo.py:181-211`` semantics: conf 0.001, iou 0.6).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from iqc_tpu.config import MeshConfig
from iqc_tpu.data.yolo_dataset import DetectionLoader
from iqc_tpu.models.yolo import STRIDES, YOLOv8, feature_shapes
from iqc_tpu.ops.nms import make_anchors
from iqc_tpu.parallel.mesh import create_mesh, replicate
from iqc_tpu.train.checkpoint import save_variables
from iqc_tpu.train.detection_metrics import evaluate_detections
from iqc_tpu.train.utils import EarlyStopping, MetricsTracker, set_global_seed
from iqc_tpu.train.yolo_loss import YoloLossConfig, yolo_loss

logger = logging.getLogger(__name__)

DEFAULT_CONFIG: Dict[str, Any] = {
    # mirrors the reference's consumed hyperparams (train_yolo.py:42-78,
    # yolo_config.yaml:44-90)
    "num_classes": 5,
    "image_size": 640,
    "batch_size": 16,
    "epochs": 100,
    "learning_rate": 0.01,
    "final_lr_fraction": 0.01,
    "warmup_epochs": 3,
    "weight_decay": 5e-4,
    "momentum": 0.937,
    "box_gain": 7.5,
    "cls_gain": 0.5,
    "dfl_gain": 1.5,
    "mosaic": 1.0,
    "mixup": 0.0,
    "ema_decay": 0.9999,
    "width_mult": 0.25,
    "depth_mult": 0.334,
    "reg_max": 16,
    "max_boxes": 64,
    "val_conf": 0.001,
    "val_iou": 0.6,
    "patience": 50,
    "checkpoint_dir": "checkpoints/yolo",
    "compute_dtype": "bfloat16",
    "seed": 42,
}


class YOLOTrainer:
    """API parity with the reference ``YOLOTrainer`` (train_yolo.py:20-342),
    loop owned natively."""

    def __init__(self, config: Optional[Dict] = None, mesh_config: Optional[MeshConfig] = None):
        self.config = {**DEFAULT_CONFIG, **(config or {})}
        c = self.config
        self.rng = set_global_seed(c["seed"])
        self.mesh = create_mesh(mesh_config or MeshConfig())
        dtype = jnp.bfloat16 if c["compute_dtype"] == "bfloat16" else jnp.float32
        self.module = YOLOv8(
            num_classes=c["num_classes"], width_mult=c["width_mult"],
            depth_mult=c["depth_mult"], reg_max=c["reg_max"], dtype=dtype,
        )
        s = c["image_size"]
        self.anchors, self.strides = make_anchors(feature_shapes((s, s)), STRIDES)
        self.metrics = MetricsTracker()
        self.state = None
        self.ema_params = None
        self._train_step = None

    # -- setup -------------------------------------------------------------------

    def build(self, steps_per_epoch: int):
        c = self.config
        total_steps = max(c["epochs"] * steps_per_epoch, 1)
        warmup = max(int(c["warmup_epochs"] * steps_per_epoch), 1)
        from iqc_tpu.train.steps import warmup_cosine_schedule

        schedule = warmup_cosine_schedule(
            c["learning_rate"], warmup, total_steps, c["final_lr_fraction"]
        )
        optimizer = optax.chain(
            optax.add_decayed_weights(c["weight_decay"]),
            optax.sgd(schedule, momentum=c["momentum"], nesterov=True),
        )
        self._optimizer = optimizer
        size = c["image_size"]
        variables = self.module.init(
            self.rng, jnp.zeros((1, size, size, 3), jnp.float32), train=False
        )
        from iqc_tpu.train.steps import TrainState, create_train_state

        self.state = replicate(self.mesh, create_train_state(variables, optimizer))
        self.ema_params = jax.tree_util.tree_map(jnp.copy, self.state.params)

        loss_cfg = YoloLossConfig(
            box_gain=c["box_gain"], cls_gain=c["cls_gain"], dfl_gain=c["dfl_gain"]
        )
        module = self.module
        reg_max = c["reg_max"]
        ema_decay = c["ema_decay"]

        # anchors/strides as runtime args (ops/jit_utils.py: embedded array
        # constants are pathological on the tunnel TPU backend)
        def step(state, ema, images, boxes, classes, valid, anchors, strides):
            def loss_fn(params):
                vars_ = {"params": params, "batch_stats": state.batch_stats}
                (dist, cls), updates = module.apply(
                    vars_, images, train=True, mutable=["batch_stats"]
                )
                total, parts = yolo_loss(
                    dist, cls, anchors, strides, boxes, classes, valid,
                    reg_max, loss_cfg,
                )
                return total, (parts, updates["batch_stats"])

            (loss, (parts, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, opt_state = self._optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            # EMA decay warmup ramp (Ultralytics: d * (1 - exp(-updates/2000))):
            # a constant 0.9999 keeps ~85% weight on the random init even
            # after 1600 steps, so short trainings would validate/checkpoint
            # near-random EMA weights (ADVICE r1).
            step_f = state.step.astype(jnp.float32) + 1.0
            d = ema_decay * (1.0 - jnp.exp(-step_f / 2000.0))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1 - d) * p, ema, params
            )
            new_state = TrainState(state.step + 1, params, new_bs, opt_state)
            parts = dict(parts)
            parts["loss"] = loss
            return new_state, new_ema, parts

        if self.mesh.mesh.size == 1:
            # plain jit on single-device meshes: the GSPMD sharding pipeline
            # inflates this compile ~15x on the tunnel backend (train/steps.py)
            self._train_step_fn = jax.jit(step, donate_argnums=(0, 1))
        else:
            repl = NamedSharding(self.mesh.mesh, P())
            batch_sh = NamedSharding(self.mesh.mesh, P(self.mesh.data_axis))
            self._train_step_fn = jax.jit(
                step,
                in_shardings=(repl, repl, batch_sh, batch_sh, batch_sh, batch_sh,
                              repl, repl),
                out_shardings=(repl, repl, repl),
                donate_argnums=(0, 1),
            )
        anchors_r = replicate(self.mesh, self.anchors)
        strides_r = replicate(self.mesh, self.strides)
        self._train_step = lambda st, ema, im, bx, cl, vl: self._train_step_fn(
            st, ema, im, bx, cl, vl, anchors_r, strides_r
        )

        from iqc_tpu.ops.jit_utils import hoisted_jit

        @hoisted_jit
        def predict(params, batch_stats, images, conf_t, iou_t, anchors, strides):
            dist, cls = module.apply(
                {"params": params, "batch_stats": batch_stats}, images, train=False
            )
            from iqc_tpu.ops.nms import decode_and_nms

            return decode_and_nms(
                dist, cls, anchors, strides, reg_max,
                max_detections=100, iou_threshold=iou_t, score_threshold=conf_t,
            )

        self._anchors_dev = jax.device_put(self.anchors)
        self._strides_dev = jax.device_put(self.strides)
        self._predict = lambda p, bs, im, c, i: predict(
            p, bs, im, c, i, self._anchors_dev, self._strides_dev
        )

    # -- training (reference train_yolo.py:117-179) --------------------------------

    def train(self, train_loader: DetectionLoader,
              val_loader: Optional[DetectionLoader] = None,
              epochs: Optional[int] = None) -> Dict:
        c = self.config
        epochs = epochs or c["epochs"]
        if self._train_step is None:
            self.build(steps_per_epoch=len(train_loader))
        stopper = EarlyStopping(patience=c["patience"], mode="max")
        best_map = 0.0
        for epoch in range(epochs):
            t0 = time.time()
            losses = []
            for batch in train_loader:
                self.state, self.ema_params, parts = self._train_step(
                    self.state, self.ema_params,
                    jnp.asarray(batch["images"].astype(np.float32) / 255.0),
                    jnp.asarray(batch["boxes"]),
                    jnp.asarray(batch["classes"]),
                    jnp.asarray(batch["valid"]),
                )
                losses.append(parts)
            mean = {
                k: float(np.mean([float(p[k]) for p in losses]))
                for k in losses[0]
            } if losses else {}
            row = {f"train_{k}": v for k, v in mean.items()}
            if val_loader is not None:
                val = self.validate(val_loader)
                row.update({f"val_{k}": v for k, v in val.items()
                            if isinstance(v, (int, float))})
                best_map = max(best_map, val["mAP50"])
                if stopper.step(val["mAP50"]):
                    self.metrics.update(row)
                    logger.info("early stopping at epoch %d", epoch)
                    break
            self.metrics.update(row)
            logger.info("epoch %d: %s (%.1fs)", epoch, mean, time.time() - t0)
        return {
            "epochs_trained": len(self.metrics.history.get("train_loss", [])),
            "best_mAP50": best_map,
            "final": {k: v[-1] for k, v in self.metrics.history.items() if v},
        }

    # -- validation (train_yolo.py:181-211) ------------------------------------------

    def validate(self, loader: DetectionLoader) -> Dict:
        c = self.config
        preds, gts = [], []
        for batch in loader:
            det = self._predict(
                self.ema_params, self.state.batch_stats,
                jnp.asarray(batch["images"].astype(np.float32) / 255.0),
                jnp.float32(c["val_conf"]), jnp.float32(c["val_iou"]),
            )
            for i in range(len(batch["images"])):
                v = np.asarray(det.valid[i])
                preds.append(
                    {
                        "boxes": np.asarray(det.boxes[i])[v],
                        "scores": np.asarray(det.scores[i])[v],
                        "classes": np.asarray(det.classes[i])[v],
                    }
                )
                gv = batch["valid"][i]
                gts.append(
                    {"boxes": batch["boxes"][i][gv], "classes": batch["classes"][i][gv]}
                )
        return evaluate_detections(preds, gts, c["num_classes"])

    def save(self, path: str) -> None:
        save_variables(
            path,
            {"params": self.ema_params, "batch_stats": self.state.batch_stats},
            {"config": self.config},
        )


def main() -> None:  # pragma: no cover
    import argparse

    import yaml

    parser = argparse.ArgumentParser(description="Train YOLOv8 defect detector")
    parser.add_argument("--config", default=None)
    parser.add_argument("--data-dir", default=None,
                        help="dir with images/{train,val} + labels/{train,val}")
    parser.add_argument("--synthetic", action="store_true",
                        help="train on the procedural defect corpus")
    parser.add_argument("--epochs", type=int, default=None)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    config = {}
    if args.config:
        with open(args.config) as f:
            raw = yaml.safe_load(f) or {}
        config = raw.get("training", raw)
    if args.epochs:
        config["epochs"] = args.epochs

    trainer = YOLOTrainer(config)
    c = trainer.config
    if args.synthetic or not args.data_dir:
        from iqc_tpu.data.yolo_dataset import SyntheticDefectDataset

        train_ds = SyntheticDefectDataset(256, c["image_size"], c["max_boxes"])
        val_ds = SyntheticDefectDataset(64, c["image_size"], c["max_boxes"], seed=1)
    else:
        from iqc_tpu.data.yolo_dataset import YoloDataset

        train_ds = YoloDataset(
            os.path.join(args.data_dir, "images/train"),
            os.path.join(args.data_dir, "labels/train"),
            c["image_size"], c["max_boxes"],
        )
        val_ds = YoloDataset(
            os.path.join(args.data_dir, "images/val"),
            os.path.join(args.data_dir, "labels/val"),
            c["image_size"], c["max_boxes"],
        )
    train_loader = DetectionLoader(
        train_ds, c["batch_size"], mosaic_prob=c["mosaic"], mixup_prob=c["mixup"]
    )
    val_loader = DetectionLoader(val_ds, c["batch_size"], mosaic_prob=0, mixup_prob=0,
                                 shuffle=False)
    report = trainer.train(train_loader, val_loader)
    print(json.dumps(report, indent=2))
    trainer.save(os.path.join(c["checkpoint_dir"], "yolov8_qc.msgpack"))


if __name__ == "__main__":  # pragma: no cover
    main()
