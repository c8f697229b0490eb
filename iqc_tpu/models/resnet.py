"""Flax ResNet-50 defect classifier.

Replaces the reference's torchvision resnet50 wrapper
(``models/resent_model.py``): same architecture — bottleneck-v1 backbone
plus the custom head Dropout(0.5) -> Dense(512) -> ReLU -> Dropout(0.3) ->
Dense(num_classes) (``resent_model.py:74-81``) — built NHWC for TPU with a
configurable compute dtype (bf16 on the MXU, fp32 params).

Also carries the reference's observable decision rules: class names,
class+confidence -> severity mapping (``resent_model.py:237-255``), and
feature extraction from the pooled backbone (fixing the reference's broken
``model.features`` call at ``resent_model.py:268``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from iqc_tpu.config import DEFECT_CLASSES
from iqc_tpu.ops import image as imops

ModuleDef = Any


class Bottleneck(nn.Module):
    """ResNet-v1 bottleneck: 1x1 -> 3x3 -> 1x1 (x4), projection on mismatch."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = functools.partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = functools.partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )
        residual = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = nn.relu(norm(name="bn1")(y))
        y = conv(self.features, (3, 3), (self.strides, self.strides), name="conv2")(y)
        y = nn.relu(norm(name="bn2")(y))
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = norm(name="bn3", scale_init=nn.initializers.zeros)(y)

        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = conv(
                self.features * 4, (1, 1), (self.strides, self.strides), name="downsample_conv"
            )(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """NHWC ResNet-50 backbone + the reference's custom classifier head."""

    num_classes: int = 5
    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    head_hidden: int = 512
    head_dropout: Tuple[float, float] = (0.5, 0.3)

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        conv = functools.partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = functools.partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )
        x = x.astype(self.dtype)
        x = conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], name="stem_conv")(x)
        x = nn.relu(norm(name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                x = Bottleneck(
                    features=64 * 2**i, strides=strides, dtype=self.dtype,
                    name=f"stage{i + 1}_block{j + 1}",
                )(x, train=train)

        features = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global avg pool
        if return_features:
            return features

        # custom head, parity with resent_model.py:74-81
        y = nn.Dropout(self.head_dropout[0], deterministic=not train)(features)
        y = nn.Dense(self.head_hidden, name="head_dense1")(y)
        y = nn.relu(y)
        y = nn.Dropout(self.head_dropout[1], deterministic=not train)(y)
        return nn.Dense(self.num_classes, name="head_dense2")(y)


# ---------------------------------------------------------------------------
# Severity decision rules (vectorized, device-side)
# ---------------------------------------------------------------------------

# Reference rules, resent_model.py:237-255: classes {crack, dent} escalate,
# {scratch, discoloration} mid, {contamination} minor.
CRITICAL_CLASS_IDS = (0, 2)
MAJOR_CLASS_IDS = (1, 3)

SEV_MINOR, SEV_MAJOR, SEV_CRITICAL = 0, 1, 2


def classifier_severity(class_ids: jnp.ndarray, confidences: jnp.ndarray,
                        rules=None) -> jnp.ndarray:
    """Vectorized class+confidence -> severity {0,1,2} (resent_model.py:237-255).

    Scalar comparisons instead of isin-with-table: no array literal may be
    embedded in the executable (see ops/jit_utils.py).

    ``rules``: optional traced severity-rules array
    (qc_specific.severity_rules via ``QCSpecificConfig.severity_array``).
    A [2,3] array carries a dedicated classifier column (col 2, defaults
    0.6/0.8 = the reference's hard-coded classifier constants, so partial
    ``severity_rules`` blocks can't silently shift classifier tiers to the
    detection defaults); a legacy [2,2] array falls back to the detection
    confidence column. Area columns are ignored (the classifier has no
    box).
    """
    if rules is None:
        major_c, crit_c = 0.6, 0.8
    elif rules.shape[-1] >= 3:
        major_c, crit_c = rules[0, 2], rules[1, 2]
    else:
        major_c, crit_c = rules[0, 0], rules[1, 0]
    is_crit_class = (class_ids == 0) | (class_ids == 2)   # crack, dent
    is_major_class = (class_ids == 1) | (class_ids == 3)  # scratch, discoloration
    sev = jnp.full(class_ids.shape, SEV_MINOR, dtype=jnp.int32)
    sev = jnp.where(is_major_class & (confidences > crit_c), SEV_MAJOR, sev)
    sev = jnp.where(is_crit_class & (confidences > major_c), SEV_MAJOR, sev)
    sev = jnp.where(is_crit_class & (confidences > crit_c), SEV_CRITICAL, sev)
    return sev


def preprocess_for_classifier(images: jnp.ndarray, size: int = 224) -> jnp.ndarray:
    """[B,H,W,3] uint8/float -> size x size ImageNet-normalized float
    (resent_model.py:57-66 transform as device ops)."""
    x = imops.to_float(images)
    if x.shape[-3:-1] != (size, size):
        x = imops.resize_bilinear(x, (size, size))
    return imops.normalize_imagenet(x)


class ResNetClassifier:
    """Stateful convenience wrapper over the pure Flax model.

    API parity with the reference's ``ResNetClassifier``
    (``models/resent_model.py:132-287``): predict / predict_batch /
    extract_features / get_model_info, but all compute is one jitted
    program and batching is real device batching.
    """

    def __init__(
        self,
        model_path: Optional[str] = None,
        num_classes: int = 5,
        class_names: Optional[List[str]] = None,
        dtype: Any = jnp.float32,
        seed: int = 0,
    ):
        self.model_path = model_path
        self.num_classes = num_classes
        self.class_names = list(class_names or DEFECT_CLASSES)[:num_classes]
        self.module = ResNet50(num_classes=num_classes, dtype=dtype)
        self.variables = self._load_or_init(seed)
        from iqc_tpu.ops.jit_utils import hoisted_jit

        @hoisted_jit
        def _forward(variables, images):
            x = preprocess_for_classifier(images)
            logits = self.module.apply(variables, x, train=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            conf = jnp.max(probs, axis=-1)
            cls = jnp.argmax(probs, axis=-1).astype(jnp.int32)
            sev = classifier_severity(cls, conf)
            return {"probs": probs, "confidence": conf, "class_id": cls, "severity": sev}

        self._forward = _forward

        @hoisted_jit
        def _features(variables, images):
            x = preprocess_for_classifier(images)
            return self.module.apply(variables, x, train=False, return_features=True)

        self._features = _features

    def _load_or_init(self, seed: int):
        from iqc_tpu.train.checkpoint import try_load_variables

        dummy = jnp.zeros((1, 224, 224, 3), jnp.float32)
        init_vars = self.module.init(jax.random.PRNGKey(seed), dummy, train=False)
        if self.model_path:
            loaded = try_load_variables(self.model_path, init_vars)
            if loaded is not None:
                return loaded
        return init_vars

    # -- reference-parity API ------------------------------------------------

    def predict(self, image: np.ndarray) -> Dict:
        """Single-image classification -> reference result schema
        (resent_model.py:160-172)."""
        import time

        t0 = time.perf_counter()
        out = self._forward(self.variables, jnp.asarray(image)[None])
        out = jax.tree_util.tree_map(np.asarray, out)
        dt = (time.perf_counter() - t0) * 1000
        sev_names = ("minor", "major", "critical")
        return {
            "predicted_class": self.class_names[int(out["class_id"][0])],
            "confidence": float(out["confidence"][0]),
            "class_probabilities": {
                self.class_names[i]: float(p) for i, p in enumerate(out["probs"][0])
            },
            "severity": sev_names[int(out["severity"][0])],
            "inference_time_ms": dt,
        }

    def predict_batch(self, images: List[np.ndarray]) -> List[Dict]:
        """True device batching (the reference's predict_batch,
        resent_model.py:181-235, stacked host tensors)."""
        import time

        t0 = time.perf_counter()
        batch = jnp.stack([imops.to_float(jnp.asarray(im)) for im in images])
        out = jax.tree_util.tree_map(np.asarray, self._forward(self.variables, batch))
        total = (time.perf_counter() - t0) * 1000
        sev_names = ("minor", "major", "critical")
        results = []
        for i in range(len(images)):
            results.append(
                {
                    "predicted_class": self.class_names[int(out["class_id"][i])],
                    "confidence": float(out["confidence"][i]),
                    "class_probabilities": {
                        self.class_names[j]: float(p) for j, p in enumerate(out["probs"][i])
                    },
                    "severity": sev_names[int(out["severity"][i])],
                    "batch_index": i,
                    "batch_inference_time_ms": total,
                    "avg_time_per_image_ms": total / len(images),
                }
            )
        return results

    def extract_features(self, image: np.ndarray) -> np.ndarray:
        """2048-d pooled backbone features (fixes resent_model.py:268)."""
        return np.asarray(self._features(self.variables, jnp.asarray(image)[None]))[0]

    def get_model_info(self) -> Dict:
        return {
            "model_path": self.model_path,
            "device": str(jax.devices()[0]),
            "num_classes": self.num_classes,
            "class_names": self.class_names,
            "model_loaded": True,
            "input_size": (224, 224),
        }
