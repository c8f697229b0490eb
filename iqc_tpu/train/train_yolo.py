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
    # per-class BCE weights for imbalanced defect classes — the reference's
    # declared-but-unread qc_specific.class_weights block
    # (yolo_config.yaml:214-220). Dict {class_name: w} or [C] list; None =
    # unweighted. Threaded as a runtime arg into yolo_loss.
    "class_weights": None,
    "mosaic": 1.0,
    "mixup": 0.0,
    "device_mosaic": True,   # in-batch mosaic/mixup on device (ops/mosaic.py)
    "mosaic_antialias": False,  # AA measurably hurts (see ops/mosaic._interp_matrix)
    # photometric/geometric train-time augmentation on top of mosaic — the
    # ~15 Ultralytics hyperparams the reference passes to model.train
    # (reference train_yolo.py:157-171). A dict of YoloAugHyp fields
    # (hsv_h/hsv_s/hsv_v, degrees, translate, scale, shear, flipud,
    # fliplr); None = off. Runs on device inside every train-step path
    # (streaming, staged, scanned-corpus) via data/augmentation.py.
    "augmentation": None,
    "ema_decay": 0.9999,
    "width_mult": 0.25,
    "depth_mult": 0.334,
    "stem_mode": "conv",  # "s2d" = TPU-first space-to-depth stem (models/yolo.py)
    "reg_max": 16,
    "max_boxes": 64,
    "val_conf": 0.001,
    "val_iou": 0.6,
    # merge-NMS box voting (ops/nms.py): +0.026 mAP50-95 on the 128-img val
    # split (0.7335 -> 0.7591), mAP50 unchanged — measured on the shipped
    # checkpoint, RESULTS.md. Default ON everywhere (ensemble/serving too).
    "box_voting": True,
    # transfer learning: freeze the first N modules (reference
    # transfer_learning.freeze_layers, yolo_config.yaml:160-162 — passed
    # to Ultralytics as `freeze`; 10 = the whole backbone here too:
    # stem..sppf). Exact freezing via a masked-updates optimizer stage.
    "freeze_layers": 0,
    # stage whole host-built epochs on device (one packed upload + one
    # scanned dispatch per epoch) when the epoch fits IQC_STAGED_EPOCH_MB.
    # Streaming pays ~120 ms dispatch + ~120 ms-fixed upload per step over
    # the tunnel; staging amortizes both across the epoch.
    "staged_host_epochs": True,
    "patience": 50,
    "checkpoint_dir": "checkpoints/yolo",
    "compute_dtype": "bfloat16",
    "seed": 42,
}


def frozen_modules(param_keys, freeze_n: int) -> set:
    """Module names frozen by ``freeze_layers=N``.

    N mirrors Ultralytics' ``freeze: N`` for the faithful stem (10 = the
    backbone). Canonical module order comes from models/yolo.MODULE_ORDER
    (jax tree ops sort dict keys, so the params dict cannot supply it).
    The s2d variant's backbone is 9 modules (no down2), so N>=10 freezes
    the whole backbone plus N-10 neck modules on both variants — never a
    neck module at N=10."""
    from iqc_tpu.models.yolo import BACKBONE_KEYS, MODULE_ORDER

    present = [k for k in MODULE_ORDER if k in param_keys]
    backbone = [k for k in present if k in BACKBONE_KEYS]
    rest = [k for k in present if k not in BACKBONE_KEYS]
    if freeze_n >= 10:
        return set(backbone + rest[:freeze_n - 10])
    return set(backbone[:freeze_n])


class YOLOTrainer:
    """API parity with the reference ``YOLOTrainer`` (train_yolo.py:20-342),
    loop owned natively."""

    def __init__(self, config: Optional[Dict] = None, mesh_config: Optional[MeshConfig] = None):
        self.config = {**DEFAULT_CONFIG, **(config or {})}
        c = self.config
        self.rng = set_global_seed(c["seed"])
        self.mesh = create_mesh(mesh_config or MeshConfig())
        # device mosaic is single-device only: in-batch source picks are a
        # batch-axis gather, which would cross shards on a data-parallel mesh
        self.uses_device_mosaic = bool(
            c.get("device_mosaic", True) and self.mesh.mesh.size == 1
        )
        dtype = jnp.bfloat16 if c["compute_dtype"] == "bfloat16" else jnp.float32
        self.module = YOLOv8(
            num_classes=c["num_classes"], width_mult=c["width_mult"],
            depth_mult=c["depth_mult"], reg_max=c["reg_max"], dtype=dtype,
            stem_mode=c.get("stem_mode", "conv"),
        )
        s = c["image_size"]
        self.anchors, self.strides = make_anchors(feature_shapes((s, s)), STRIDES)
        self.metrics = MetricsTracker()
        self.state = None
        self.ema_params = None
        self._train_step = None
        self._staged_run = None
        self._pending_batches = None
        self._epoch_fn = None
        self._val_scan = None
        self._val_cache: Dict[int, Any] = {}
        self._staged_logged = False

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
        freeze_n = int(c.get("freeze_layers", 0) or 0)
        if freeze_n:
            from iqc_tpu.train.steps import masked_updates

            optimizer = optax.chain(optimizer, masked_updates())
        self._optimizer = optimizer
        size = c["image_size"]
        variables = self.module.init(
            self.rng, jnp.zeros((1, size, size, 3), jnp.float32), train=False
        )
        from iqc_tpu.train.steps import TrainState, create_train_state

        self.state = replicate(self.mesh, create_train_state(variables, optimizer))
        if freeze_n:
            from iqc_tpu.train.steps import set_update_mask

            frozen = frozen_modules(list(self.state.params), freeze_n)
            mask = {}
            for key, sub in self.state.params.items():
                val = 0.0 if key in frozen else 1.0
                mask[key] = jax.tree_util.tree_map(
                    lambda _, v=val: jnp.asarray(v, jnp.float32), sub
                )
            self.state = self.state._replace(
                opt_state=set_update_mask(self.state.opt_state,
                                          replicate(self.mesh, mask))
            )
            logger.info("freeze_layers=%d: frozen modules = %s", freeze_n,
                        ", ".join(sorted(frozen)))
        self.ema_params = jax.tree_util.tree_map(jnp.copy, self.state.params)

        loss_cfg = YoloLossConfig(
            box_gain=c["box_gain"], cls_gain=c["cls_gain"], dfl_gain=c["dfl_gain"]
        )
        module = self.module
        reg_max = c["reg_max"]
        ema_decay = c["ema_decay"]

        # per-class BCE weights (qc_specific.class_weights); ones = neutral.
        # Always passed as a runtime arg so configured weights never embed
        # an array constant in the executable (ops/jit_utils.py).
        cw = c.get("class_weights")
        if isinstance(cw, dict):
            from iqc_tpu.config import DEFECT_CLASSES

            names = list(DEFECT_CLASSES)[: c["num_classes"]]
            cw = [float(cw.get(n, 1.0)) for n in names]
        self._class_weights = np.ones(c["num_classes"], np.float32) if cw is None \
            else np.asarray(cw, np.float32)
        if self._class_weights.shape != (c["num_classes"],):
            raise ValueError(
                f"class_weights must have {c['num_classes']} entries, got "
                f"{self._class_weights.shape}")

        # anchors/strides as runtime args (ops/jit_utils.py: embedded array
        # constants are pathological on the tunnel TPU backend)
        use_dev_mosaic = self.uses_device_mosaic and (
            c["mosaic"] > 0 or c["mixup"] > 0
        )
        mosaic_p, mixup_p, seed = c["mosaic"], c["mixup"], c["seed"]
        mosaic_aa = bool(c.get("mosaic_antialias", False))

        aug_raw = c.get("augmentation")
        aug_hyp = None
        if aug_raw:
            from iqc_tpu.data.augmentation import YoloAugHyp

            aug_hyp = YoloAugHyp.from_dict(
                aug_raw if isinstance(aug_raw, dict) else {})
            if not aug_hyp.active():
                aug_hyp = None
        self.aug_hyp = aug_hyp

        def make_step(apply_inbatch_mosaic: bool):
          def step(state, ema, images, boxes, classes, valid, anchors, strides,
                   cls_w):
            # uint8 batches scale on device: host .astype(f32)/255 quadruples
            # the host->device transfer (the dominant per-step cost over the
            # tunnel); float inputs pass through for backward compat
            if jnp.issubdtype(images.dtype, jnp.integer):
                images = images.astype(jnp.float32) / 255.0
            if apply_inbatch_mosaic and use_dev_mosaic:
                # the host loader serves raw samples; the 660 ms/batch host
                # collage becomes ~1.5 ms of masked interpolation matmuls
                # (ops/mosaic.py). Key derives from the step counter, so the
                # augmentation stream is deterministic and resume-stable.
                # (The device-corpus path applies corpus-wide mosaic in
                # epoch_fn instead — see mosaic_from_corpus.)
                from iqc_tpu.ops.mosaic import mixup_batch, mosaic_batch

                k = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
                km, kx = jax.random.split(k)
                images, boxes, classes, valid = mosaic_batch(
                    images, boxes, classes, valid, km, prob=mosaic_p,
                    antialias=mosaic_aa,
                )
                images, boxes, classes, valid = mixup_batch(
                    images, boxes, classes, valid, kx, prob=mixup_p
                )
            if aug_hyp is not None:
                # Ultralytics order: random_perspective + flips + HSV run
                # AFTER mosaic assembly. Distinct key stream from mosaic
                # (fold_in of a different base) keeps both deterministic
                # and resume-stable.
                from iqc_tpu.data.augmentation import yolo_train_augment_batch

                ka = jax.random.fold_in(
                    jax.random.PRNGKey(seed + 7919), state.step)
                images, boxes, classes, valid = yolo_train_augment_batch(
                    ka, images, boxes, classes, valid, aug_hyp)

            def loss_fn(params):
                vars_ = {"params": params, "batch_stats": state.batch_stats}
                (dist, cls), updates = module.apply(
                    vars_, images, train=True, mutable=["batch_stats"]
                )
                total, parts = yolo_loss(
                    dist, cls, anchors, strides, boxes, classes, valid,
                    reg_max, loss_cfg, class_weights=cls_w,
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
            # near-random EMA weights (ADVICE r1). The 2000-step time
            # constant is tuned for base 0.9999; for faster bases it must
            # shrink with the averaging window (1/(1-d)), else the ramp
            # never reaches the base within a run — measured: base 0.995
            # only hit d~0.90 after 4800 steps, i.e. no smoothing at all.
            tau = min(2000.0, 1.0 / max(1.0 - ema_decay, 1e-6))
            step_f = state.step.astype(jnp.float32) + 1.0
            d = ema_decay * (1.0 - jnp.exp(-step_f / tau))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1 - d) * p, ema, params
            )
            new_state = TrainState(state.step + 1, params, new_bs, opt_state)
            parts = dict(parts)
            parts["loss"] = loss
            return new_state, new_ema, parts

          return step

        step = make_step(apply_inbatch_mosaic=True)
        step_core = make_step(apply_inbatch_mosaic=False)

        anchors_r = replicate(self.mesh, self.anchors)
        strides_r = replicate(self.mesh, self.strides)
        cls_w_r = replicate(self.mesh, jnp.asarray(self._class_weights))
        self._cls_w_r = cls_w_r
        if self.mesh.mesh.size == 1:
            # plain jit on single-device meshes: the GSPMD sharding pipeline
            # inflates this compile ~15x on the tunnel backend (train/steps.py).
            # The batch uploads as ONE packed uint8 buffer: each transfer
            # through the tunnel costs ~120 ms fixed, so 4 arrays/step = 493 ms
            # of pure upload vs ~100 ms of compute (measured; steps.py packing).
            from iqc_tpu.train.steps import (
                batch_specs, pack_batch_host, unpack_batch_device,
            )

            _compiled = {}

            def run(st, ema, im, bx, cl, vl):
                arrs = [np.asarray(im), np.asarray(bx), np.asarray(cl),
                        np.asarray(vl)]
                key = tuple((a.shape, str(a.dtype)) for a in arrs)
                fn = _compiled.get(key)
                if fn is None:
                    specs = batch_specs(arrs)

                    def packed_step(state, ema_, buf, anchors, strides, cls_w):
                        im_, bx_, cl_, vl_ = unpack_batch_device(buf, specs)
                        return step(state, ema_, im_, bx_, cl_, vl_,
                                    anchors, strides, cls_w)

                    fn = _compiled[key] = jax.jit(
                        packed_step, donate_argnums=(0, 1)
                    )
                buf = jnp.asarray(pack_batch_host(arrs))
                return fn(st, ema, buf, anchors_r, strides_r, cls_w_r)

            self._train_step = run

            # device-resident corpus + whole-epoch scan (train() decides
            # eligibility): ONE dispatch and ONE metrics fetch per epoch.
            # Per-step the tunnel costs ~120 ms dispatch latency + ~350 ms
            # uploading an 18.8 MB batch (53 MB/s measured) while the step
            # computes in ~100 ms — a scanned epoch over a corpus already in
            # HBM removes both.
            def epoch_fn(state, ema, imgs, bxs, cls_, vld, idx_mat,
                         anchors, strides, cls_w):
                from iqc_tpu.ops.mosaic import mixup_batch, mosaic_from_corpus

                def body(carry, idx_row):
                    st_, ema_ = carry
                    if use_dev_mosaic:
                        # picks draw from the WHOLE corpus (host-mosaic
                        # sampling semantics — in-batch picks cost ~2 mAP50
                        # from intra-batch correlation, measured)
                        k = jax.random.fold_in(
                            jax.random.PRNGKey(seed), st_.step
                        )
                        km, kx = jax.random.split(k)
                        b_i, b_b, b_c, b_v = mosaic_from_corpus(
                            imgs, bxs, cls_, vld, idx_row, km, prob=mosaic_p,
                            antialias=mosaic_aa,
                        )
                        b_i = b_i / 255.0  # corpus is uint8-scaled
                        b_i, b_b, b_c, b_v = mixup_batch(
                            b_i, b_b, b_c, b_v, kx, prob=mixup_p
                        )
                    else:
                        b_i, b_b, b_c, b_v = (
                            imgs[idx_row], bxs[idx_row],
                            cls_[idx_row], vld[idx_row],
                        )
                    st_, ema_, parts = step_core(
                        st_, ema_, b_i, b_b, b_c, b_v, anchors, strides, cls_w,
                    )
                    return (st_, ema_), parts

                (state, ema), parts = jax.lax.scan(body, (state, ema), idx_mat)
                return state, ema, parts

            self._epoch_fn = jax.jit(epoch_fn, donate_argnums=(0, 1))
            self._anchors_r, self._strides_r = anchors_r, strides_r

            # staged host epochs: the loader's host-built batches for ONE
            # epoch upload as a single packed buffer and train inside one
            # scanned dispatch. This is the host-mosaic analog of the
            # device-corpus path — same per-epoch dispatch profile, but the
            # augmentation stays host-side (DetectionLoader mosaic4/mixup).
            # The scan body is the full streaming step, so in-batch device
            # mosaic (when active) keys off state.step identically to the
            # streaming path.
            _staged_compiled = {}

            def staged_run(st, ema, batches):
                arrs = [
                    np.stack([np.asarray(b["images"]) for b in batches]),
                    np.stack([np.asarray(b["boxes"]) for b in batches]),
                    np.stack([np.asarray(b["classes"]) for b in batches]),
                    np.stack([np.asarray(b["valid"]) for b in batches]),
                ]
                key = tuple((a.shape, str(a.dtype)) for a in arrs)
                fn = _staged_compiled.get(key)
                if fn is None:
                    specs = batch_specs(arrs)

                    def staged_epoch(state, ema_, buf, anchors, strides, cls_w):
                        im, bx, cl, vl = unpack_batch_device(buf, specs)

                        def body(carry, xs):
                            st_, em_ = carry
                            b_i, b_b, b_c, b_v = xs
                            st_, em_, parts = step(
                                st_, em_, b_i, b_b, b_c, b_v, anchors, strides,
                                cls_w,
                            )
                            return (st_, em_), parts

                        (state, ema_), parts = jax.lax.scan(
                            body, (state, ema_), (im, bx, cl, vl)
                        )
                        return state, ema_, parts

                    fn = _staged_compiled[key] = jax.jit(
                        staged_epoch, donate_argnums=(0, 1)
                    )
                buf = jnp.asarray(pack_batch_host(arrs))
                return fn(st, ema, buf, anchors_r, strides_r, cls_w_r)

            self._staged_run = staged_run
        else:
            self._epoch_fn = None
            self._staged_run = None
            repl = NamedSharding(self.mesh.mesh, P())
            batch_sh = NamedSharding(self.mesh.mesh, P(self.mesh.data_axis))
            self._train_step_fn = jax.jit(
                step,
                in_shardings=(repl, repl, batch_sh, batch_sh, batch_sh, batch_sh,
                              repl, repl, repl),
                out_shardings=(repl, repl, repl),
                donate_argnums=(0, 1),
            )
            self._train_step = lambda st, ema, im, bx, cl, vl: self._train_step_fn(
                st, ema, jnp.asarray(im), jnp.asarray(bx), jnp.asarray(cl),
                jnp.asarray(vl), anchors_r, strides_r, cls_w_r
            )

        from iqc_tpu.ops.jit_utils import hoisted_jit

        def predict_core(params, batch_stats, images, conf_t, iou_t, anchors,
                         strides):
            if jnp.issubdtype(images.dtype, jnp.integer):
                images = images.astype(jnp.float32) / 255.0
            dist, cls = module.apply(
                {"params": params, "batch_stats": batch_stats}, images, train=False
            )
            from iqc_tpu.ops.nms import decode_and_nms

            return decode_and_nms(
                dist, cls, anchors, strides, reg_max,
                # clamp to the anchor count: tiny eval resolutions (64px =
                # 84 anchors) would otherwise ask top_k for more candidates
                # than exist
                max_detections=min(100, int(anchors.shape[0])),
                iou_threshold=iou_t, score_threshold=conf_t,
                box_voting=bool(self.config.get("box_voting", False)),
            )

        predict = hoisted_jit(predict_core)

        # scanned validation over a device-resident val set: every batch's
        # predict+NMS runs inside ONE dispatch, detections fetch as ONE
        # bulk transfer (streaming validate pays dispatch+upload+fetch per
        # batch — ~3 s/epoch for 128 images over the tunnel)
        def val_scan(params, batch_stats, imgs, conf_t, iou_t, anchors,
                     strides):
            def body(_, im):
                det = predict_core(params, batch_stats, im, conf_t, iou_t,
                                   anchors, strides)
                return _, (det.boxes, det.scores, det.classes, det.valid)

            _, outs = jax.lax.scan(body, 0, imgs)
            return outs

        self._val_scan = jax.jit(val_scan)
        self._val_cache: Dict[int, Any] = {}

        self._anchors_dev = jax.device_put(self.anchors)
        self._strides_dev = jax.device_put(self.strides)
        self._predict = lambda p, bs, im, c, i: predict(
            p, bs, im, c, i, self._anchors_dev, self._strides_dev
        )

    # -- training (reference train_yolo.py:117-179) --------------------------------

    def _maybe_device_corpus(self, loader):
        """Upload the full dataset to HBM once when it fits (device-resident
        training data — the standard TPU pattern for small corpora). Returns
        (imgs, boxes, classes, valid) device arrays or None to stream.

        Eligible when: single-device mesh with the scanned epoch compiled,
        device mosaic owns augmentation (the host loader must not also
        augment), the dataset exposes load()/len, and the images fit under
        IQC_DEVICE_CORPUS_MB (default 2048)."""
        import os as _os

        if self._epoch_fn is None or not self.uses_device_mosaic:
            return None
        if getattr(loader, "mosaic_prob", 1.0) or getattr(loader, "mixup_prob", 0.0):
            return None
        ds = getattr(loader, "ds", None)
        if ds is None or not hasattr(ds, "load"):
            return None
        n = len(ds)
        size = self.config["image_size"]
        cap_mb = float(_os.environ.get("IQC_DEVICE_CORPUS_MB", "2048"))
        if n == 0 or n * size * size * 3 / 2**20 > cap_mb:
            return None
        first = ds.load(0)
        m = first[1].shape[0]
        imgs = np.zeros((n, size, size, 3), np.uint8)
        bxs = np.zeros((n, m, 4), np.float32)
        cls_ = np.zeros((n, m), np.int32)
        vld = np.zeros((n, m), bool)
        for i in range(n):
            im, bx, cl, vl = ds.load(i)
            if im.shape[0] != size:
                return None  # size mismatch: stream instead
            imgs[i], bxs[i], cls_[i], vld[i] = im, bx, cl, vl
        logger.info("device-resident corpus: %d images (%.0f MB) uploaded once",
                    n, imgs.nbytes / 2**20)
        return tuple(jax.device_put(x) for x in (imgs, bxs, cls_, vld))

    def _maybe_stage_epoch(self, loader):
        """Materialize one epoch of host-built batches for the staged path.

        Returns the batch list when staging applies (single-device mesh,
        ``staged_host_epochs`` on, uniform batch shapes, epoch under
        IQC_STAGED_EPOCH_MB), else None. When the epoch was materialized
        but turns out ineligible (ragged shapes / too large), the batches
        are parked in ``self._pending_batches`` so the streaming loop
        consumes them without re-running host augmentation."""
        import os as _os

        if self._staged_run is None or not self.config.get(
            "staged_host_epochs", True
        ):
            return None
        cap_mb = float(_os.environ.get("IQC_STAGED_EPOCH_MB", "1024"))
        it = iter(loader)
        first = next(it, None)
        if first is None:
            return None
        per_batch_mb = sum(v.nbytes for v in first.values()) / 2**20
        if per_batch_mb * len(loader) > cap_mb:
            import itertools

            self._pending_batches = itertools.chain([first], it)
            return None
        batches = [first] + list(it)
        shape0 = {k: v.shape for k, v in first.items()}
        if any({k: v.shape for k, v in b.items()} != shape0 for b in batches[1:]):
            self._pending_batches = batches
            return None
        if not self._staged_logged:
            logger.info(
                "staged host epoch: %d batches (%.0f MB) upload as one "
                "buffer, epoch runs as one scanned dispatch",
                len(batches), per_batch_mb * len(batches),
            )
            self._staged_logged = True
        return batches

    def train(self, train_loader: DetectionLoader,
              val_loader: Optional[DetectionLoader] = None,
              epochs: Optional[int] = None) -> Dict:
        c = self.config
        epochs = epochs or c["epochs"]
        if self._train_step is None:
            self.build(steps_per_epoch=len(train_loader))
        stopper = EarlyStopping(patience=c["patience"], mode="max")
        best_map = 0.0
        if self.uses_device_mosaic:
            # device mosaic owns augmentation: a loader still applying its
            # own host mosaic/mixup (DetectionLoader defaults mosaic_prob=1)
            # would double-augment — mosaics of mosaics (ADVICE r2).
            for attr in ("mosaic_prob", "mixup_prob"):
                if getattr(train_loader, attr, 0.0):
                    logger.warning(
                        "device_mosaic active: zeroing train_loader.%s to "
                        "avoid double augmentation", attr)
                    setattr(train_loader, attr, 0.0)
        corpus = self._maybe_device_corpus(train_loader)
        steps_per_epoch = len(train_loader)
        batch_size = train_loader.batch_size
        idx_rng = np.random.default_rng(c["seed"])
        for epoch in range(epochs):
            t0 = time.time()
            if corpus is not None:
                # scanned epoch: index draws match the streaming loader's
                # with-replacement sampling
                idx = idx_rng.integers(
                    0, corpus[0].shape[0], (steps_per_epoch, batch_size)
                ).astype(np.int32)
                self.state, self.ema_params, parts_t = self._epoch_fn(
                    self.state, self.ema_params, *corpus,
                    jnp.asarray(idx), self._anchors_r, self._strides_r,
                    self._cls_w_r,
                )
                mean = {k: float(jnp.mean(v)) for k, v in parts_t.items()}
            else:
                staged = self._maybe_stage_epoch(train_loader)
                if staged is not None:
                    self.state, self.ema_params, parts_t = self._staged_run(
                        self.state, self.ema_params, staged
                    )
                    mean = {k: float(jnp.mean(v)) for k, v in parts_t.items()}
                else:
                    losses = []
                    for batch in self._pending_batches or train_loader:
                        self.state, self.ema_params, parts = self._train_step(
                            self.state, self.ema_params, batch["images"],
                            batch["boxes"], batch["classes"], batch["valid"],
                        )
                        losses.append(parts)
                    self._pending_batches = None
                    mean = {
                        k: float(jnp.mean(jnp.stack([p[k] for p in losses])))
                        for k in losses[0]
                    } if losses else {}
            row = {f"train_{k}": v for k, v in mean.items()}
            if val_loader is not None:
                val = self.validate(val_loader)
                row.update({f"val_{k}": v for k, v in val.items()
                            if isinstance(v, (int, float))})
                if val["mAP50"] > best_map:
                    # persist the best EMA weights as we go — a long run
                    # killed by a timeout keeps its best epoch
                    # (ref save_period semantics, train_yolo.py:139)
                    self.save(os.path.join(c["checkpoint_dir"], "best_model.msgpack"))
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

    def _maybe_device_val(self, loader) -> Optional[tuple]:
        """Upload a deterministic val set once; later validate() calls scan
        it in one dispatch. Returns (device images (E,B,H,W,3), host gts)
        or None to stream (augmented/shuffled/ragged/oversized loaders)."""
        import os as _os

        if self._epoch_fn is None:  # multi-device mesh: stream per batch
            return None
        if (getattr(loader, "mosaic_prob", 0) or
                getattr(loader, "mixup_prob", 0) or
                getattr(loader, "shuffle", True)):
            return None
        cached = self._val_cache.get(id(loader))
        # the cached entry pins the loader object, so an id() can only be
        # reused after its entry is dropped; the identity check makes the
        # key collision-proof regardless
        if cached is not None and cached[0] is loader:
            return cached[1], cached[2]
        batches = list(loader)
        if not batches:
            return None
        shape0 = batches[0]["images"].shape
        if any(b["images"].shape != shape0 for b in batches[1:]):
            return None
        imgs = np.stack([b["images"] for b in batches])
        if imgs.nbytes / 2**20 > float(
            _os.environ.get("IQC_DEVICE_VAL_MB", "512")
        ):
            return None
        gts = []
        for b in batches:
            for i in range(len(b["images"])):
                gv = b["valid"][i]
                gts.append({"boxes": b["boxes"][i][gv],
                            "classes": b["classes"][i][gv]})
        imgs_dev = jax.device_put(imgs)
        self._val_cache[id(loader)] = (loader, imgs_dev, gts)
        return imgs_dev, gts

    def validate(self, loader: DetectionLoader) -> Dict:
        c = self.config
        resident = self._maybe_device_val(loader)
        if resident is not None:
            imgs_dev, gts = resident
            outs = self._val_scan(
                self.ema_params, self.state.batch_stats, imgs_dev,
                jnp.float32(c["val_conf"]), jnp.float32(c["val_iou"]),
                self._anchors_dev, self._strides_dev,
            )
            d_boxes, d_scores, d_classes, d_valid = jax.device_get(outs)
            preds = []
            for e in range(d_valid.shape[0]):
                for i in range(d_valid.shape[1]):
                    v = d_valid[e, i]
                    preds.append({
                        "boxes": d_boxes[e, i][v],
                        "scores": d_scores[e, i][v],
                        "classes": d_classes[e, i][v],
                    })
            return evaluate_detections(preds, gts, c["num_classes"])
        preds, gts = [], []
        for batch in loader:
            det = self._predict(
                self.ema_params, self.state.batch_stats,
                jnp.asarray(batch["images"]),
                jnp.float32(c["val_conf"]), jnp.float32(c["val_iou"]),
            )
            # ONE bulk fetch per batch: per-image det.valid[i] slicing costs
            # a device dispatch + fetch round trip EACH (4 arrays x batch
            # images x ~120 ms on the tunnel = most of the epoch wall)
            d_boxes, d_scores, d_classes, d_valid = jax.device_get(
                (det.boxes, det.scores, det.classes, det.valid)
            )
            for i in range(len(batch["images"])):
                v = d_valid[i]
                preds.append(
                    {
                        "boxes": d_boxes[i][v],
                        "scores": d_scores[i][v],
                        "classes": d_classes[i][v],
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
    parser.add_argument("--evolve", action="store_true",
                        help="run hyperparameter evolution (reference "
                             "yolo_config.yaml:121-127 evolution block) "
                             "instead of a single training")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    config = {}
    if args.config:
        with open(args.config) as f:
            raw = yaml.safe_load(f) or {}
        config = raw.get("training", raw)
        # qc_specific.class_weights (reference yolo_config.yaml:214-220)
        # feeds the per-class BCE weighting in yolo_loss
        qc = raw.get("qc_specific") or {}
        if qc.get("class_weights") and not config.get("class_weights"):
            config["class_weights"] = qc["class_weights"]
        # top-level augmentation block (reference yolo_config.yaml:61-83):
        # mosaic/mixup probabilities route to the mosaic tiers; the rest
        # (hsv/geometric/flips) to the on-device YoloAugHyp chain
        aug = dict(raw.get("augmentation") or {})
        if aug:
            if "mosaic" in aug and "mosaic" not in config:
                config["mosaic"] = float(aug.pop("mosaic"))
            if "mixup" in aug and "mixup" not in config:
                config["mixup"] = float(aug.pop("mixup"))
            aug.pop("copy_paste", None)  # reference ships 0.0; unimplemented
            if "augmentation" not in config:
                config["augmentation"] = aug
    if args.epochs:
        config["epochs"] = args.epochs

    evo_cfg = dict(config.pop("evolution", {}) or {})
    if args.evolve or evo_cfg.get("enabled"):
        from iqc_tpu.train.evolve import evolve_hyperparameters

        result = evolve_hyperparameters(
            config,
            generations=int(evo_cfg.get("generations", 10)),
            population_size=int(evo_cfg.get("population_size", 5)),
            mutation_probability=float(
                evo_cfg.get("mutation_probability", 0.8)),
            sigma=float(evo_cfg.get("sigma", 0.2)),
            seed=int(config.get("seed", 42)),
            out_dir=config.get("checkpoint_dir",
                               DEFAULT_CONFIG["checkpoint_dir"]),
        )
        print(json.dumps({"best_fitness": result["best_fitness"],
                          "best_config": {
                              k: result["best_config"][k]
                              for k in result["history"][0]["genes"]}},
                         indent=2))
        return

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
    host_mosaic = 0.0 if trainer.uses_device_mosaic else c["mosaic"]
    host_mixup = 0.0 if trainer.uses_device_mosaic else c["mixup"]
    train_loader = DetectionLoader(
        train_ds, c["batch_size"], mosaic_prob=host_mosaic, mixup_prob=host_mixup
    )
    val_loader = DetectionLoader(val_ds, c["batch_size"], mosaic_prob=0, mixup_prob=0,
                                 shuffle=False)
    report = trainer.train(train_loader, val_loader)
    print(json.dumps(report, indent=2))
    trainer.save(os.path.join(c["checkpoint_dir"], "yolov8_qc.msgpack"))


if __name__ == "__main__":  # pragma: no cover
    main()
