"""Portable model export: StableHLO graph + weights in one artifact.

TPU-native equivalent of the reference's ONNX export
(``/root/reference/train/train_yolo.py:246-280``; export config block
``config/yolo_config.yaml:107-119``). Instead of ONNX we serialize the
FUSED ensemble graph (YOLO backbone + decode/NMS + per-crop ResNet +
fusion) to StableHLO via ``jax.export`` — a versioned, backend-portable
interchange format XLA consumes directly on TPU/GPU/CPU — and package it
with the weight pytrees and anchor tables in a single zip artifact, so a
reload needs nothing but this file.

Weights ride as runtime ARGUMENTS of the exported function, not embedded
constants: graphs with large embedded device constants are pathological on
the tunnel TPU backend (CLAUDE.md rule 1 / ops/jit_utils.py), and keeping
them external also makes the artifact's weight blobs individually
inspectable.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

FORMAT_VERSION = 1
_GRAPH = "graph.stablehlo"
_META = "meta.json"
_YOLO = "yolo_vars.msgpack"
_RESNET = "resnet_vars.msgpack"
_ANCHORS = "anchors.npy"
_STRIDES = "strides.npy"


def _pure(tree: Any):
    """FrozenDict/jax-array pytree -> plain dicts of host numpy arrays
    (a stable structure that survives msgpack round-tripping)."""
    try:
        from flax.core import unfreeze

        tree = unfreeze(tree)
    except Exception:
        pass
    return jax.tree_util.tree_map(np.asarray, tree)


def export_ensemble(predictor, path: str, batch_size: int = 1) -> Dict:
    """Serialize ``predictor``'s fused forward graph + weights to ``path``.

    The graph is exported at a fixed ``batch_size`` (static shapes are the
    TPU contract — SURVEY.md §7). Returns a manifest dict (also stored in
    the artifact as meta.json).
    """
    from iqc_tpu.models.ensemble import build_ensemble_forward, pack_outputs

    m = predictor.config.model
    fwd = build_ensemble_forward(
        predictor.yolo, predictor.resnet, predictor.input_size,
        predictor.max_detections, predictor.max_classified,
        classifier_input=m.classifier_input,
        resnet_apply=predictor._resnet_apply,
        yolo_apply=getattr(predictor, "_yolo_apply", None),
    )

    def fn(yolo_vars, resnet_vars, images, conf_t, iou_t, w_yolo, w_resnet,
           anchors, strides):
        return pack_outputs(
            fwd(yolo_vars, resnet_vars, images, conf_t, iou_t,
                w_yolo, w_resnet, anchors, strides)
        )

    yolo_vars = _pure(predictor.yolo_vars)
    resnet_vars = _pure(predictor.resnet_vars)
    anchors = np.asarray(predictor._anchors)
    strides = np.asarray(predictor._strides)
    h, w = predictor.input_size
    shape = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.uint8)
    scalar = jax.ShapeDtypeStruct((), jnp.float32)

    abstract = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        (yolo_vars, resnet_vars),
    )
    exported = jax.export.export(jax.jit(fn))(
        abstract[0], abstract[1], shape, scalar, scalar, scalar, scalar,
        jax.ShapeDtypeStruct(anchors.shape, anchors.dtype),
        jax.ShapeDtypeStruct(strides.shape, strides.dtype),
    )

    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "iqc_tpu.fused_ensemble",
        "batch_size": batch_size,
        "input_size": list(predictor.input_size),
        "max_detections": predictor.max_detections,
        "max_classified": predictor.max_classified,
        "num_classes": m.num_classes,
        "class_names": list(predictor.class_names),
        "precision": predictor.config.edge.precision,
        "defaults": {
            "confidence_threshold": float(predictor.confidence_threshold),
            "nms_threshold": float(predictor.nms_threshold),
            "ensemble_weights": dict(predictor.ensemble_weights),
        },
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_META, json.dumps(meta, indent=1))
        z.writestr(_GRAPH, exported.serialize())
        z.writestr(_YOLO, serialization.msgpack_serialize(yolo_vars))
        z.writestr(_RESNET, serialization.msgpack_serialize(resnet_vars))
        for name, arr in ((_ANCHORS, anchors), (_STRIDES, strides)):
            buf = io.BytesIO()
            np.save(buf, arr)
            z.writestr(name, buf.getvalue())
    return meta


class ExportedEnsemble:
    """A reloaded artifact: meta + weights + a callable StableHLO graph."""

    def __init__(self, meta: Dict, exported, yolo_vars, resnet_vars,
                 anchors: np.ndarray, strides: np.ndarray):
        self.meta = meta
        self.exported = exported
        self.yolo_vars = yolo_vars
        self.resnet_vars = resnet_vars
        self.anchors = anchors
        self.strides = strides

    def __call__(
        self,
        images: np.ndarray,
        confidence_threshold: Optional[float] = None,
        nms_threshold: Optional[float] = None,
        ensemble_weights: Optional[Dict[str, float]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Run the engine; returns the packed (det [B,K,15], img [B,4+C])
        tensors (see ensemble.pack_outputs / unpack_outputs)."""
        d = self.meta["defaults"]
        conf = d["confidence_threshold"] if confidence_threshold is None else confidence_threshold
        iou = d["nms_threshold"] if nms_threshold is None else nms_threshold
        wts = ensemble_weights or d["ensemble_weights"]
        images = np.asarray(images, np.uint8)
        if images.shape[0] != self.meta["batch_size"]:
            raise ValueError(
                f"engine was exported for batch {self.meta['batch_size']}, "
                f"got {images.shape[0]}"
            )
        det, img = self.exported.call(
            self.yolo_vars, self.resnet_vars, jnp.asarray(images),
            jnp.float32(conf), jnp.float32(iou),
            jnp.float32(wts["yolo"]), jnp.float32(wts["resnet"]),
            jnp.asarray(self.anchors), jnp.asarray(self.strides),
        )
        return np.asarray(det), np.asarray(img)

    def outputs(self, images: np.ndarray, **kw):
        """Run and unpack to EnsembleOutputs (numpy)."""
        from iqc_tpu.models.ensemble import unpack_outputs

        det, img = self(images, **kw)
        return unpack_outputs(det, img)


def load_exported(path: str) -> ExportedEnsemble:
    """Reload an artifact written by export_ensemble."""
    with zipfile.ZipFile(path, "r") as z:
        meta = json.loads(z.read(_META))
        if meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(f"unsupported artifact version: {meta}")
        exported = jax.export.deserialize(z.read(_GRAPH))
        yolo_vars = serialization.msgpack_restore(z.read(_YOLO))
        resnet_vars = serialization.msgpack_restore(z.read(_RESNET))
        anchors = np.load(io.BytesIO(z.read(_ANCHORS)))
        strides = np.load(io.BytesIO(z.read(_STRIDES)))
    return ExportedEnsemble(meta, exported, yolo_vars, resnet_vars,
                            anchors, strides)
