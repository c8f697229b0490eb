"""Flax YOLOv8 defect detector.

Replaces the Ultralytics/torch path the reference wraps in
``models/yolo_model.py`` (conv backbone, box decode and NMS all ran in
C++/CUDA inside the library — SURVEY.md §2b item 1). Here the full
CSP/C2f backbone + PAN neck + decoupled DFL head is Flax NHWC, and decode +
NMS is the fused XLA kernel in ``iqc_tpu/ops/nms.py`` — one jitted program
from pixels to a fixed-capacity detection set.

Width/depth multipliers follow the YOLOv8 family scaling (n: 0.25/0.334,
s: 0.5/0.334, m: 0.75/0.667, l: 1.0/1.0); channels snap to multiples of 8.

Severity rules are the reference's (``yolo_model.py:162-172``): confidence
and normalized-area thresholds, vectorized on device.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from iqc_tpu.config import DEFECT_CLASSES
from iqc_tpu.ops import image as imops
from iqc_tpu.ops.nms import decode_and_nms, make_anchors

STRIDES = (8, 16, 32)

# Module definition order (both stem variants listed; one exists per
# model). Index semantics match Ultralytics' `freeze: N` (the first 10 =
# the backbone) — consumed by YOLOTrainer's freeze_layers.
MODULE_ORDER = (
    "stem", "stem_s2d", "down2", "c2f_2", "down3", "c2f_3", "down4",
    "c2f_4", "down5", "c2f_5", "sppf",
    "neck_td4", "neck_td3", "neck_down4", "neck_bu4", "neck_down5",
    "neck_bu5", "head_p3", "head_p4", "head_p5",
)

# Backbone membership (the s2d variant drops down2, so its backbone is 9
# modules — freeze_layers=10 must still mean "the whole backbone" there).
BACKBONE_KEYS = frozenset(
    ("stem", "stem_s2d", "down2", "c2f_2", "down3", "c2f_3", "down4",
     "c2f_4", "down5", "c2f_5", "sppf")
)


def _make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(round(x / divisor) * divisor))


def _depth(n: int, depth_mult: float) -> int:
    return max(1, round(n * depth_mult))


class ConvBN(nn.Module):
    """Conv + BatchNorm + SiLU, the YOLO building block."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=[(p, p), (p, p)], use_bias=False, dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=self.dtype
        )(x)
        return nn.silu(x)


class C2fBottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.features, 3, dtype=self.dtype)(x, train)
        y = ConvBN(self.features, 3, dtype=self.dtype)(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial block with n inner bottlenecks (YOLOv8's C2f)."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y = ConvBN(2 * c, 1, dtype=self.dtype)(x, train)
        parts = [y[..., :c], y[..., c:]]
        for _ in range(self.n):
            parts.append(C2fBottleneck(c, self.shortcut, dtype=self.dtype)(parts[-1], train))
        y = jnp.concatenate(parts, axis=-1)
        return ConvBN(self.features, 1, dtype=self.dtype)(y, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 maxpools."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        x = ConvBN(c, 1, dtype=self.dtype)(x, train)
        pool = lambda z: nn.max_pool(z, (5, 5), strides=(1, 1), padding=((2, 2), (2, 2)))
        p1 = pool(x)
        p2 = pool(p1)
        p3 = pool(p2)
        x = jnp.concatenate([x, p1, p2, p3], axis=-1)
        return ConvBN(self.features, 1, dtype=self.dtype)(x, train)


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H/b,W/b,C*b*b]: fold a b x b spatial block into
    channels. Lossless pixel rearrangement (SPD-Conv); on TPU it converts
    tiny-channel high-resolution convs into fewer wider ones that actually
    fill the MXU/vector lanes."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, c * block * block)


class DetectHead(nn.Module):
    """Decoupled anchor-free head with DFL box regression (one scale)."""

    num_classes: int
    reg_max: int
    box_ch: int
    cls_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = ConvBN(self.box_ch, 3, dtype=self.dtype)(x, train)
        b = ConvBN(self.box_ch, 3, dtype=self.dtype)(b, train)
        dist = nn.Conv(4 * self.reg_max, (1, 1), dtype=self.dtype, name="box_out")(b)

        c = ConvBN(self.cls_ch, 3, dtype=self.dtype)(x, train)
        c = ConvBN(self.cls_ch, 3, dtype=self.dtype)(c, train)
        # bias prior so initial objectness is low (stable training start)
        cls = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype,
            bias_init=nn.initializers.constant(-4.6), name="cls_out",
        )(c)
        return dist, cls


class YOLOv8(nn.Module):
    """Full YOLOv8 graph: backbone -> PAN neck -> 3-scale decoupled head.

    Returns (dist_logits [B,A,4*reg_max], cls_logits [B,A,C]) flattened over
    the P3/P4/P5 grids in that order (strides 8/16/32).
    """

    num_classes: int = 5
    width_mult: float = 0.25
    depth_mult: float = 0.334
    reg_max: int = 16
    dtype: Any = jnp.float32
    # "conv": faithful YOLOv8 stem (two stride-2 convs through P1).
    # "s2d": TPU-first stem — space_to_depth(4) + one stride-1 conv straight
    # to P2. The faithful P1 layers run 3->16 and 16->32 channel convs over
    # 320^2/160^2 maps; those tiny channel counts leave the MXU/vector
    # lanes ~90% empty (measured: whole yolov8n fwd at 6.8% MFU, batch 32
    # @640). The s2d stem sees 48 input channels at 160^2 and skips the P1
    # activations entirely. Different parameters => retrain (SPD-Conv
    # literature and our corpus runs show accuracy parity).
    stem_mode: str = "conv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        w, d = self.width_mult, self.depth_mult
        ch = lambda c: _make_divisible(min(c, 1024) * w)
        x = x.astype(self.dtype)

        # backbone
        if self.stem_mode == "s2d":
            x = space_to_depth(x, 4)                                               # 160^2 x 48
            x = ConvBN(ch(128), 3, 1, dtype=self.dtype, name="stem_s2d")(x, train) # P2
        else:
            x = ConvBN(ch(64), 3, 2, dtype=self.dtype, name="stem")(x, train)      # P1
            x = ConvBN(ch(128), 3, 2, dtype=self.dtype, name="down2")(x, train)    # P2
        x = C2f(ch(128), _depth(3, d), True, dtype=self.dtype, name="c2f_2")(x, train)
        x = ConvBN(ch(256), 3, 2, dtype=self.dtype, name="down3")(x, train)        # P3
        p3 = C2f(ch(256), _depth(6, d), True, dtype=self.dtype, name="c2f_3")(x, train)
        x = ConvBN(ch(512), 3, 2, dtype=self.dtype, name="down4")(p3, train)       # P4
        p4 = C2f(ch(512), _depth(6, d), True, dtype=self.dtype, name="c2f_4")(x, train)
        x = ConvBN(ch(1024), 3, 2, dtype=self.dtype, name="down5")(p4, train)      # P5
        x = C2f(ch(1024), _depth(3, d), True, dtype=self.dtype, name="c2f_5")(x, train)
        p5 = SPPF(ch(1024), dtype=self.dtype, name="sppf")(x, train)

        # PAN neck: top-down
        u4 = jnp.concatenate([_upsample2x(p5), p4], axis=-1)
        n4 = C2f(ch(512), _depth(3, d), False, dtype=self.dtype, name="neck_td4")(u4, train)
        u3 = jnp.concatenate([_upsample2x(n4), p3], axis=-1)
        o3 = C2f(ch(256), _depth(3, d), False, dtype=self.dtype, name="neck_td3")(u3, train)
        # bottom-up
        d4 = ConvBN(ch(256), 3, 2, dtype=self.dtype, name="neck_down4")(o3, train)
        o4 = C2f(ch(512), _depth(3, d), False, dtype=self.dtype, name="neck_bu4")(
            jnp.concatenate([d4, n4], axis=-1), train
        )
        d5 = ConvBN(ch(512), 3, 2, dtype=self.dtype, name="neck_down5")(o4, train)
        o5 = C2f(ch(1024), _depth(3, d), False, dtype=self.dtype, name="neck_bu5")(
            jnp.concatenate([d5, p5], axis=-1), train
        )

        box_ch = max(16, ch(256) // 4, 4 * self.reg_max)
        cls_ch = max(ch(256), min(self.num_classes, 100))
        dists, clss = [], []
        for i, feat in enumerate((o3, o4, o5)):
            dist, cls = DetectHead(
                self.num_classes, self.reg_max, box_ch, cls_ch,
                dtype=self.dtype, name=f"head_p{i + 3}",
            )(feat, train)
            b, h, wd, _ = dist.shape
            dists.append(dist.reshape(b, h * wd, 4 * self.reg_max))
            clss.append(cls.reshape(b, h * wd, self.num_classes))
        return jnp.concatenate(dists, axis=1), jnp.concatenate(clss, axis=1)


def feature_shapes(input_size: Tuple[int, int]) -> List[Tuple[int, int]]:
    return [(input_size[0] // s, input_size[1] // s) for s in STRIDES]


# ---------------------------------------------------------------------------
# Device-side severity rule (yolo_model.py:162-172)
# ---------------------------------------------------------------------------

SEV_MINOR, SEV_MAJOR, SEV_CRITICAL = 0, 1, 2


def detection_severity(confidences: jnp.ndarray, areas: jnp.ndarray,
                       rules: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """conf/area -> severity {0,1,2}; area normalized by 1024^2 as the
    reference does regardless of true image size (yolo_model.py:164-165).

    ``rules``: optional traced [2,2] array
    [[major_min_conf, major_min_area_ratio],
     [critical_min_conf, critical_min_area_ratio]] — the reference's
    declared-but-never-read ``qc_specific.severity_rules`` block
    (yolo_config.yaml:226-236; build via QCSpecificConfig.severity_array).
    None compiles the reference code constants (0.8/0.05, 0.9/0.1)."""
    norm_area = areas / float(1024 * 1024)
    if rules is None:
        major_c, major_a, crit_c, crit_a = 0.8, 0.05, 0.9, 0.1
    else:
        major_c, major_a = rules[0, 0], rules[0, 1]
        crit_c, crit_a = rules[1, 0], rules[1, 1]
    sev = jnp.full(confidences.shape, SEV_MINOR, dtype=jnp.int32)
    sev = jnp.where((confidences > major_c) | (norm_area > major_a), SEV_MAJOR, sev)
    sev = jnp.where((confidences > crit_c) | (norm_area > crit_a), SEV_CRITICAL, sev)
    return sev


class YOLODetector:
    """Stateful wrapper: API parity with the reference ``YOLODetector``
    (``models/yolo_model.py:17-260``) on top of the pure jitted graph.

    predict() returns the reference's detection-dict schema; thresholds are
    traced scalars so ``update_thresholds`` never triggers recompilation.
    """

    def __init__(
        self,
        model_path: Optional[str] = None,
        confidence_threshold: float = 0.7,
        nms_threshold: float = 0.5,
        num_classes: int = 5,
        input_size: Tuple[int, int] = (640, 640),
        width_mult: float = 0.25,
        depth_mult: float = 0.334,
        max_detections: int = 300,
        class_names: Optional[List[str]] = None,
        dtype: Any = jnp.float32,
        seed: int = 0,
        stem_mode: str = "conv",
        box_voting: bool = True,
        class_conf_thresholds: Optional[Sequence[float]] = None,
        severity_rules: Optional[Sequence[Sequence[float]]] = None,
    ):
        # class_conf_thresholds: per-class confidence floors ([C], replaces
        # the scalar threshold — qc_specific.confidence_thresholds, see
        # QCSpecificConfig.conf_vector). severity_rules: [2,2] tier
        # thresholds (QCSpecificConfig.severity_array); None = reference
        # constants compiled in.
        self.model_path = model_path
        self.box_voting = bool(box_voting)
        self.confidence_threshold = confidence_threshold
        self.class_conf_thresholds = (
            None if class_conf_thresholds is None
            else [float(v) for v in class_conf_thresholds]
        )
        self._sev_rules = (
            None if severity_rules is None
            else jax.device_put(jnp.asarray(severity_rules, jnp.float32))
        )
        self.nms_threshold = nms_threshold
        self.input_size = tuple(input_size)
        self.max_detections = max_detections
        self.class_names = list(class_names or DEFECT_CLASSES)[:num_classes]
        self.module = YOLOv8(
            num_classes=num_classes, width_mult=width_mult,
            depth_mult=depth_mult, dtype=dtype, stem_mode=stem_mode,
        )
        self.variables = self._load_or_init(seed)
        anchors, strides = make_anchors(feature_shapes(self.input_size), STRIDES)
        self._anchors = jax.device_put(anchors)
        self._strides = jax.device_put(strides)

        def _forward(variables, images, conf_t, iou_t, anchors, strides,
                     sev_rules=None):
            x = imops.to_float(images)
            if x.shape[1:3] != self.input_size:
                x = imops.resize_bilinear(x, self.input_size)
            dist, cls = self.module.apply(variables, x, train=False)
            det = decode_and_nms(
                dist, cls, anchors, strides,
                reg_max=self.module.reg_max,
                max_detections=max_detections,
                iou_threshold=iou_t, score_threshold=conf_t,
                box_voting=self.box_voting,
            )
            from iqc_tpu.ops.boxes import box_area

            areas = box_area(det.boxes)
            sev = detection_severity(det.scores, areas, sev_rules)
            return det, areas, sev

        from iqc_tpu.ops.jit_utils import hoisted_jit

        self._forward_fn = hoisted_jit(_forward)

        def _call(v, im, c, i):
            args = (v, im, c, i, self._anchors, self._strides)
            if self._sev_rules is not None:
                args += (self._sev_rules,)
            return self._forward_fn(*args)

        self._forward = _call

    def _load_or_init(self, seed: int):
        from iqc_tpu.train.checkpoint import try_load_variables

        dummy = jnp.zeros((1, *self.input_size, 3), jnp.float32)
        init_vars = self.module.init(jax.random.PRNGKey(seed), dummy, train=False)
        if self.model_path:
            loaded = try_load_variables(self.model_path, init_vars)
            if loaded is not None:
                return loaded
        return init_vars

    def _conf_value(self):
        """Traced threshold arg: a [C] per-class vector when qc_specific
        confidence_thresholds are configured, else the scalar."""
        if self.class_conf_thresholds is not None:
            return jnp.asarray(self.class_conf_thresholds, jnp.float32)
        return jnp.float32(self.confidence_threshold)

    # -- reference-parity API ------------------------------------------------

    def predict(self, image: np.ndarray) -> Dict:
        t0 = time.perf_counter()
        img = np.asarray(image)
        det, areas, sev = self._forward(
            self.variables, jnp.asarray(img)[None],
            self._conf_value(), jnp.float32(self.nms_threshold),
        )
        dt = (time.perf_counter() - t0) * 1000
        dets = self.parse_detections(
            np.asarray(det.boxes[0]), np.asarray(det.scores[0]),
            np.asarray(det.classes[0]), np.asarray(det.valid[0]),
            np.asarray(sev[0]),
            scale=(img.shape[0] / self.input_size[0], img.shape[1] / self.input_size[1]),
        )
        return {
            "detections": dets,
            "inference_time_ms": dt,
            "image_shape": img.shape[:2],
            "total_detections": len(dets),
        }

    def parse_detections(self, boxes, scores, classes, valid, severities, scale=(1.0, 1.0)):
        """Fixed-capacity arrays -> reference detection dicts
        (yolo_model.py:128-160 schema)."""
        sev_names = ("minor", "major", "critical")
        out = []
        sy, sx = scale
        for i in range(len(valid)):
            if not valid[i]:
                break  # survivors are compacted to the front
            x1, y1, x2, y2 = boxes[i]
            x1, x2 = int(x1 * sx), int(x2 * sx)
            y1, y2 = int(y1 * sy), int(y2 * sy)
            cid = int(classes[i])
            out.append(
                {
                    "id": len(out),
                    "class": self.class_names[cid]
                    if 0 <= cid < len(self.class_names)
                    else f"class_{cid}",
                    "confidence": float(scores[i]),
                    "bbox": {
                        "x1": x1, "y1": y1, "x2": x2, "y2": y2,
                        "width": x2 - x1, "height": y2 - y1,
                        "center_x": (x1 + x2) / 2, "center_y": (y1 + y2) / 2,
                    },
                    "area": (x2 - x1) * (y2 - y1),
                    "severity": sev_names[int(severities[i])],
                }
            )
        return out

    def batch_predict(self, images: List[np.ndarray]) -> List[Dict]:
        """True device batching (the reference loops, yolo_model.py:175-185)."""
        t0 = time.perf_counter()
        batch = jnp.stack([jnp.asarray(im) for im in images])
        det, areas, sev = self._forward(
            self.variables, batch,
            self._conf_value(), jnp.float32(self.nms_threshold),
        )
        # ONE bulk fetch: per-image device slicing costs a dispatch + fetch
        # round trip per array (~120 ms each over the tunnel)
        h_boxes, h_scores, h_classes, h_valid, h_sev = jax.device_get(
            (det.boxes, det.scores, det.classes, det.valid, sev)
        )
        dt = (time.perf_counter() - t0) * 1000
        results = []
        for i in range(len(images)):
            dets = self.parse_detections(
                h_boxes[i], h_scores[i],
                h_classes[i], h_valid[i], h_sev[i],
                scale=(
                    images[i].shape[0] / self.input_size[0],
                    images[i].shape[1] / self.input_size[1],
                ),
            )
            results.append(
                {
                    "detections": dets,
                    "inference_time_ms": dt / len(images),
                    "image_shape": images[i].shape[:2],
                    "total_detections": len(dets),
                    "batch_index": i,
                }
            )
        return results

    def update_thresholds(self, confidence=None, nms: Optional[float] = None):
        """Runtime threshold mutation (yolo_model.py:252-260); thresholds are
        traced args, so this is free (no recompile). ``confidence`` accepts
        a scalar, a [C] sequence, or a {class_name: thr} dict
        (qc_specific.confidence_thresholds shape)."""
        if confidence is not None:
            if isinstance(confidence, dict):
                base = self.confidence_threshold
                self.class_conf_thresholds = [
                    float(confidence.get(n, base)) for n in self.class_names]
            elif isinstance(confidence, (list, tuple)):
                self.class_conf_thresholds = [float(v) for v in confidence]
            else:
                self.confidence_threshold = float(confidence)
                self.class_conf_thresholds = None
        if nms is not None:
            self.nms_threshold = float(nms)

    def visualize_detections(self, image: np.ndarray, detections: List[Dict]) -> np.ndarray:
        """Host-side box drawing (yolo_model.py:187-237 equivalent, numpy)."""
        from iqc_tpu.inference.visualize import draw_detections

        return draw_detections(image, detections)

    def get_model_info(self) -> Dict:
        return {
            "model_path": self.model_path,
            "device": str(jax.devices()[0]),
            "confidence_threshold": self.confidence_threshold,
            "nms_threshold": self.nms_threshold,
            "class_names": self.class_names,
            "model_loaded": True,
            "input_size": self.input_size,
            "max_detections": self.max_detections,
        }
