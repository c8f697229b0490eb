"""Typed configuration system.

Mirrors the reference's layered YAML config surface (``config/config.yaml``,
``config/yolo_config.yaml``, ``config/resnet_config.yaml``) with actual
validation — the reference loads raw dicts via ``yaml.safe_load`` with
hardcoded-default fallback (``app.py:51-81``) and ships a truncated
``resnet_config.yaml``. Here every consumed key is a typed field with a
default matching the reference's, unknown keys are preserved (the reference
declares many keys it never reads — integrations, security, scaling), and
runtime mutation (``PUT /api/config`` -> ``detector.update_config``) is a
first-class, validated operation.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import yaml

DEFECT_CLASSES = ("crack", "scratch", "dent", "discoloration", "contamination")
SEVERITY_LEVELS = ("minor", "major", "critical")


def _merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in (override or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


@dataclass
class ModelConfig:
    """Reference ``config.yaml:4-17`` (model block)."""

    yolo_weights: str = "models/yolov8_qc.msgpack"
    resnet_weights: str = "models/resnet50_qc.msgpack"
    confidence_threshold: float = 0.7
    nms_threshold: float = 0.5
    num_classes: int = 5
    ensemble_weights: Dict[str, float] = field(
        default_factory=lambda: {"yolo": 0.6, "resnet": 0.4}
    )
    # TPU-specific knobs (no reference analog: dtype of the compute path).
    compute_dtype: str = "bfloat16"
    # Capacity of the fused NMS kernel output (reference max_det=300,
    # yolo_config.yaml:97); number of survivors that get per-crop ResNet.
    max_detections: int = 300
    max_classified: int = 32
    # Batch-wide crop-classification pool (0 = off). When > 0, each batch
    # classifies only its top-`max_classified_pool` REAL survivors (one
    # static-shape ResNet forward over the pool) instead of every
    # B*max_classified capacity slot; slots that don't fit degrade to the
    # reference's mock refinement rule, exactly like beyond-max_classified
    # slots do (models/ensemble.py::build_ensemble_forward). Sized for the
    # expected defects-per-image of the stream (e.g. 4*batch). Results are
    # identical to the dense path whenever the batch's valid detections
    # fit the pool. TPU-first: turns padded-capacity FLOPs into real work.
    max_classified_pool: int = 0
    # survivors segmented inside the fused graph (BASELINE config #5)
    max_segmented: int = 16
    # Batch-wide segmentation pool (0 = off), the mirror of
    # max_classified_pool for the segmentation stage: each batch segments
    # only its top-`max_segmented_pool` REAL survivors in one flat
    # segment_rois call instead of every B*max_segmented capacity slot;
    # slots that don't fit produce the dense path's invalid-slot outputs
    # (empty mask, zero stats). Identical to the dense path whenever the
    # batch's valid detections fit the pool (models/ensemble.py::
    # build_full_forward).
    max_segmented_pool: int = 0
    seg_roi_size: int = 128
    reg_max: int = 16
    width_mult: float = 0.25   # YOLOv8n
    depth_mult: float = 0.334  # YOLOv8n
    # classifier geometry (224 = reference transform, resent_model.py:57-66);
    # stage sizes (3,4,6,3) = ResNet-50. Tests shrink both for fast compiles.
    classifier_input: int = 224
    resnet_stages: Tuple[int, ...] = (3, 4, 6, 3)
    # YOLO stem: "conv" (faithful YOLOv8) | "s2d" (TPU-first space-to-depth
    # stem, skips the MXU-starved P1 layers — see models/yolo.py). The two
    # are different parameterizations; checkpoints are stem-specific.
    yolo_stem: str = "conv"

    def validate(self) -> None:
        if self.yolo_stem not in ("conv", "s2d"):
            raise ValueError(f"unknown yolo_stem {self.yolo_stem!r}")
        if not 0.0 <= self.confidence_threshold <= 1.0:
            raise ValueError(f"confidence_threshold out of range: {self.confidence_threshold}")
        if not 0.0 <= self.nms_threshold <= 1.0:
            raise ValueError(f"nms_threshold out of range: {self.nms_threshold}")
        if self.num_classes < 1:
            raise ValueError("num_classes must be >= 1")
        if self.max_classified > self.max_detections:
            raise ValueError("max_classified cannot exceed max_detections")
        if self.max_classified_pool < 0:
            raise ValueError("max_classified_pool must be >= 0")
        if self.max_segmented_pool < 0:
            raise ValueError("max_segmented_pool must be >= 0")
        total = sum(self.ensemble_weights.values())
        if total <= 0:
            raise ValueError("ensemble weights must sum to a positive value")


@dataclass
class PreprocessingConfig:
    """Reference ``config.yaml:27-32`` + ``inference/detector.py:226-254``."""

    resize: Optional[Tuple[int, int]] = (640, 640)
    normalize: bool = True
    denoise: bool = False
    enhance_contrast: bool = False


@dataclass
class ProcessingConfig:
    """Reference ``config.yaml:20-32``. ``max_workers`` thread fan-out becomes
    true device batching; kept for API parity."""

    batch_size: int = 8
    max_workers: int = 4
    input_size: Tuple[int, int] = (640, 640)
    preprocessing: PreprocessingConfig = field(default_factory=PreprocessingConfig)

    def validate(self) -> None:
        if self.batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        h, w = self.input_size
        if h % 32 or w % 32:
            raise ValueError("input_size must be a multiple of the max stride (32)")


@dataclass
class QualityThresholds:
    """Reference ``config.yaml:47-54`` consumed by ``postprocess.py:545-551``."""

    minor_defect_limit: int = 3
    major_defect_limit: int = 1
    critical_defect_limit: int = 0
    confidence_threshold: float = 0.5
    area_threshold_percent: float = 50.0


@dataclass
class QualityControlConfig:
    """Reference ``config.yaml:35-54``."""

    defect_classes: List[str] = field(default_factory=lambda: list(DEFECT_CLASSES))
    severity_levels: List[str] = field(default_factory=lambda: list(SEVERITY_LEVELS))
    thresholds: QualityThresholds = field(default_factory=QualityThresholds)

    def validate(self) -> None:
        if not self.defect_classes:
            raise ValueError("defect_classes must not be empty")


@dataclass
class SpecLimit:
    upper: float = 5.0
    lower: float = 0.0
    target: float = 0.5


@dataclass
class SPCConfig:
    """Reference ``config.yaml:57-73`` consumed by ``analytics/sec_analysis.py``."""

    window_size: int = 100
    confidence_level: float = 0.95
    defect_rate_limits: SpecLimit = field(default_factory=SpecLimit)
    high_defect_rate_alert: float = 3.0


@dataclass
class ServingConfig:
    """Reference ``config.yaml:153-166`` (api block)."""

    host: str = "0.0.0.0"
    port: int = 5000
    debug: bool = False
    cors_enabled: bool = True
    rate_limit_enabled: bool = True
    requests_per_minute: int = 1000
    metrics_port: int = 9090
    # Authentication surface (reference config.yaml:162-166 declares a JWT
    # block it never reads; we honor it as a static API-key check).
    auth_enabled: bool = False
    api_keys: Tuple[str, ...] = ()
    # SPC report exports are confined to this directory (the reference's
    # /api/spc/export writes any client-supplied path — routes.py:417-443).
    reports_dir: str = "reports"
    # TLS (reference security.ssl block, config.yaml:266-271 — declared
    # there, never read; implemented in serving/wsgi.serve)
    ssl_enabled: bool = False
    ssl_cert: str = ""
    ssl_key: str = ""


@dataclass
class EdgeConfig:
    """Reference TensorRT block ``config.yaml:139-150``; TPU equivalent is
    XLA AOT compilation + bf16/int8 quantization (``iqc_tpu/models/optimizer.py``)."""

    precision: str = "bf16"  # fp32 | bf16 | int8
    # under int8: run the detector as true-int8 MXU convs too
    # (models/yolo_int8.py — mAP-parity measured on the shipped checkpoint,
    # RESULTS.md r3). False = weight-only int8 storage for YOLO.
    yolo_int8: bool = True
    # under yolo_int8: keep activations int8-resident in HBM end-to-end
    # (models/yolo_int8_stream.py — per-tensor scales folded into weights;
    # the v1 path re-quantizes per conv input through bf16 round-trips).
    # Hardware A/B won r5: YOLO stage 15.31 -> 9.68 ms at batch 128, pooled
    # pipeline 132,355 -> 146,448 img/min, mAP parity within 0.002
    # (docs/yolo_stream_ab_r5.json). Env override IQC_YOLO_INT8_STREAM=1|0.
    yolo_int8_stream: bool = True
    # same streaming rewrite for the crop classifier — activations stay
    # int8 codes in HBM between convs (models/resnet_int8_stream.py; same
    # quantized tree + scales as v1, different walk). The pooled-crop
    # ResNet stage dominated the r5 serving batch (20.6 ms of 58.6,
    # docs/profile_pooled_r5.json). Hardware A/B won r5: crop_pool stage
    # 20.6 -> 17.96 ms at batch 128, pooled pipeline 146,448 -> 153,008
    # img/min (+4.5%), val accuracy identical to fp32 (0.9922, agreement
    # 1.0 — docs/resnet_stream_ab_r5.json). Env override
    # IQC_RESNET_INT8_STREAM=1|0.
    resnet_int8_stream: bool = True
    max_batch_size: int = 8
    compilation_cache_dir: str = ".xla_cache"
    # magnitude pruning at export (reference optimization.pruning block,
    # yolo_config.yaml:146-151; models/optimizer.prune_magnitude). 0 = off.
    sparsity: float = 0.0
    structured_pruning: bool = False

    def validate(self) -> None:
        if self.precision not in ("fp32", "bf16", "int8"):
            raise ValueError(f"unknown precision {self.precision!r}")
        if not 0.0 <= self.sparsity < 1.0:
            raise ValueError(f"sparsity out of range: {self.sparsity}")


@dataclass
class StorageConfig:
    """Reference ``config.yaml:100-122`` (storage block) — declared there
    (SQLAlchemy + redis sit in its requirements.txt), zero storage code in
    its tree. Implemented here over stdlib sqlite3 (``iqc_tpu/storage.py``);
    mysql/postgresql declared in the reference's enum stay unimplemented
    and are rejected at validation when enabled."""

    enabled: bool = False
    database_type: str = "sqlite"
    database_path: str = "data/qc_database.sqlite"
    save_detailed_results: bool = True
    save_processed_images: bool = False
    save_failed_images: bool = True
    image_storage_path: str = "data/images"
    retention_days: int = 30
    max_storage_gb: float = 100.0
    # backup/recovery (reference production.backup, config.yaml:238-242)
    backup_enabled: bool = False
    backup_path: str = "backups"
    backup_frequency: str = "daily"  # hourly | daily | weekly
    backup_retention_days: int = 30

    def validate(self) -> None:
        if self.enabled and self.database_type != "sqlite":
            raise ValueError(
                f"database type {self.database_type!r} not implemented "
                "(sqlite only; the reference declares mysql/postgresql but "
                "ships no storage code either)"
            )
        if self.retention_days < 1:
            raise ValueError("retention_days must be >= 1")
        if self.max_storage_gb <= 0:
            raise ValueError("max_storage_gb must be positive")
        if self.backup_frequency not in ("hourly", "daily", "weekly"):
            raise ValueError(
                f"unknown backup_frequency {self.backup_frequency!r}"
            )


@dataclass
class AlertThresholds:
    """Reference ``config.yaml:82-87`` (alerts.thresholds)."""

    critical_defects: int = 1     # per-image critical count that alerts
    major_defects: int = 2        # per-image major count that alerts
    high_defect_rate: float = 3.0  # defects per image over the SPC window
    low_confidence: float = 0.6   # per-image mean ensemble confidence floor


@dataclass
class AlertsConfig:
    """Reference ``config.yaml:76-97`` — an alerts block the reference
    declares but never implements (no notification code exists in its
    tree). Webhook, email AND SMS delivery are implemented for real here
    (``iqc_tpu/serving/alerts.py``: JSON POST webhooks; stdlib smtplib
    against the declared ``email`` block — smtp_server/smtp_port/username/
    recipients, config.yaml:89-95; HTTP SMS-gateway delivery for the
    declared ``sms_notifications`` switch, config.yaml:78)."""

    email_notifications: bool = False
    sms_notifications: bool = False
    webhook_notifications: bool = False
    webhook_url: str = ""                 # reference single-URL key
    webhook_urls: Tuple[str, ...] = ()    # extension: fan-out to many
    thresholds: AlertThresholds = field(default_factory=AlertThresholds)
    cooldown_seconds: float = 60.0        # per-rule dedup window
    timeout_seconds: float = 3.0
    retries: int = 2
    # SMTP settings (reference config.yaml:89-95); consumed by
    # serving/alerts.send_email_smtp when email_notifications is on
    email: Dict[str, Any] = field(default_factory=dict)
    # SMS gateway settings (the reference declares only the
    # sms_notifications switch, config.yaml:78, and ships no transport;
    # industrial SMS goes through an HTTP gateway — Twilio-style POST):
    #   gateway_url: POST endpoint; api_key -> Authorization: Bearer;
    #   from: sender id; recipients: [E.164 numbers]. Consumed by
    #   serving/alerts.send_sms_http when sms_notifications is on.
    sms: Dict[str, Any] = field(default_factory=dict)

    def urls(self) -> Tuple[str, ...]:
        out = tuple(self.webhook_urls)
        if self.webhook_url and self.webhook_url not in out:
            out = (self.webhook_url,) + out
        return out

    def validate(self) -> None:
        if self.cooldown_seconds < 0 or self.timeout_seconds <= 0:
            raise ValueError("alert cooldown/timeout must be positive")
        if self.retries < 0:
            raise ValueError("alert retries must be >= 0")
        if self.email_notifications:
            if not self.email.get("smtp_server"):
                raise ValueError(
                    "email_notifications requires alerts.email.smtp_server")
            if not self.email.get("recipients"):
                raise ValueError(
                    "email_notifications requires alerts.email.recipients")
            try:
                int(self.email.get("smtp_port", 587))
            except (TypeError, ValueError):
                raise ValueError("alerts.email.smtp_port must be an integer")
        if self.sms_notifications:
            if not self.sms.get("gateway_url"):
                raise ValueError(
                    "sms_notifications requires alerts.sms.gateway_url")
            if not self.sms.get("recipients"):
                raise ValueError(
                    "sms_notifications requires alerts.sms.recipients")


@dataclass
class QCSpecificConfig:
    """Reference ``yolo_config.yaml:204-236`` (qc_specific block) — declared
    there, never read by any reference code. Implemented for real here:

    - ``confidence_thresholds``: per-class detection confidence floors,
      vectorized inside the fused decode+NMS kernel (``ops/nms.py``:
      ``score_threshold`` accepts a traced [C] vector).
    - ``class_weights``: per-class BCE weights in the YOLO training loss
      (``train/yolo_loss.py``) for imbalanced defect classes.
    - ``severity_rules``: per-tier min_confidence / min_area_ratio thresholds
      threaded as traced scalars into ``detection_severity`` /
      ``classifier_severity`` (defaults = the reference's hard-coded
      constants, yolo_model.py:162-172 / resent_model.py:237-255).
    - ``nms_threshold`` / ``max_detections_per_image``: post-processing
      overrides (None = inherit ``model.nms_threshold`` / capacity).
    """

    confidence_thresholds: Dict[str, float] = field(default_factory=dict)
    class_weights: Dict[str, float] = field(default_factory=dict)
    nms_threshold: Optional[float] = None
    max_detections_per_image: Optional[int] = None
    severity_rules: Dict[str, Dict[str, float]] = field(default_factory=dict)

    def validate(self) -> None:
        for name, v in self.confidence_thresholds.items():
            if not 0.0 <= float(v) <= 1.0:
                raise ValueError(
                    f"confidence_thresholds[{name!r}] out of range: {v}")
        for name, v in self.class_weights.items():
            if float(v) < 0.0:
                raise ValueError(f"class_weights[{name!r}] must be >= 0: {v}")
        if self.nms_threshold is not None and not 0.0 <= self.nms_threshold <= 1.0:
            raise ValueError(f"qc_specific.nms_threshold out of range: {self.nms_threshold}")
        if (self.max_detections_per_image is not None
                and self.max_detections_per_image < 1):
            raise ValueError("max_detections_per_image must be >= 1")
        for tier, rule in self.severity_rules.items():
            if tier not in SEVERITY_LEVELS:
                raise ValueError(f"unknown severity tier {tier!r}")
            for k in rule:
                if k not in ("min_confidence", "min_area_ratio",
                             "classifier_min_confidence"):
                    raise ValueError(f"unknown severity rule key {k!r}")

    # -- vectorization helpers (device-arg builders) ---------------------------

    def conf_vector(self, defect_classes: Sequence[str],
                    default: float) -> Optional[List[float]]:
        """Per-class confidence thresholds as a [C] list (None when the
        block is empty = keep the scalar threshold). Classes missing from
        the dict fall back to ``default`` (model.confidence_threshold)."""
        if not self.confidence_thresholds:
            return None
        return [float(self.confidence_thresholds.get(c, default))
                for c in defect_classes]

    def weight_vector(self, defect_classes: Sequence[str]) -> Optional[List[float]]:
        """Per-class loss weights as a [C] list (None when empty)."""
        if not self.class_weights:
            return None
        return [float(self.class_weights.get(c, 1.0)) for c in defect_classes]

    def severity_array(self) -> Optional[List[List[float]]]:
        """[2,3] [[major_conf, major_area_ratio, cls_major_conf],
        [critical_conf, critical_area_ratio, cls_critical_conf]] for
        ``detection_severity`` (cols 0:2) and ``classifier_severity``
        (col 2). None when the block is empty = compiled-in reference
        constants. Missing detection keys default to the reference's
        detection constants (0.8/0.05, 0.9/0.1); the classifier column
        defaults to the reference's *classifier* constants (0.6, 0.8 —
        resent_model.py:237-255), which are hard-coded in the reference
        regardless of the qc block, so a partial ``severity_rules`` block
        never shifts classifier tiers. Override explicitly with the
        per-tier ``classifier_min_confidence`` key."""
        if not self.severity_rules:
            return None
        major = self.severity_rules.get("major", {})
        crit = self.severity_rules.get("critical", {})
        return [
            [float(major.get("min_confidence", 0.8)),
             float(major.get("min_area_ratio", 0.05)),
             float(major.get("classifier_min_confidence", 0.6))],
            [float(crit.get("min_confidence", 0.9)),
             float(crit.get("min_area_ratio", 0.1)),
             float(crit.get("classifier_min_confidence", 0.8))],
        ]


@dataclass
class MeshConfig:
    """TPU-native equivalent of the reference's disabled NCCL distributed block
    (``config/yolo_config.yaml:197-202``): a jax.sharding Mesh over ICI."""

    enabled: bool = True
    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1  # -1 = all devices
    model_parallel: int = 1


@dataclass
class ScalingConfig:
    """Reference ``production.scaling`` block (config.yaml:221-228) —
    declared there (auto_scale/min_instances/max_instances/cpu_threshold/
    memory_threshold) with zero scaling code anywhere in the tree.

    Implemented for real here at the process level: the declared knobs
    drive ``serving/scaling.AutoScaler``, which samples host CPU/memory
    utilization from /proc and resizes the serving queue's worker pool
    between min_instances and max_instances (the reference's "instances"
    are gunicorn workers; ours are queue-draining workers that overlap
    host-side decode/post work while device programs serialize — see
    serving/app.QualityControlSystem.set_worker_count). Cluster-level
    instance scaling stays a deployment concern (Dockerfile/healthcheck
    are the hooks), as it is in the reference."""

    auto_scale: bool = False
    min_instances: int = 1
    max_instances: int = 4
    cpu_threshold: float = 80.0     # percent; scale UP above this
    memory_threshold: float = 85.0  # percent; scale UP above this
    # extensions (the declared block has no cadence/hysteresis knobs):
    interval_seconds: float = 10.0  # sampling period
    # scale DOWN only after this many consecutive samples below half the
    # thresholds — avoids flapping around the boundary
    scale_down_samples: int = 3

    def validate(self) -> None:
        if self.min_instances < 1:
            raise ValueError("scaling.min_instances must be >= 1")
        if self.max_instances < self.min_instances:
            raise ValueError(
                "scaling.max_instances must be >= min_instances")
        if not (0 < self.cpu_threshold <= 100
                and 0 < self.memory_threshold <= 100):
            raise ValueError("scaling thresholds must be in (0, 100]")
        if self.interval_seconds <= 0 or self.scale_down_samples < 1:
            raise ValueError("scaling cadence knobs must be positive")


@dataclass
class SystemConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    processing: ProcessingConfig = field(default_factory=ProcessingConfig)
    quality_control: QualityControlConfig = field(default_factory=QualityControlConfig)
    spc: SPCConfig = field(default_factory=SPCConfig)
    api: ServingConfig = field(default_factory=ServingConfig)
    edge: EdgeConfig = field(default_factory=EdgeConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    alerts: AlertsConfig = field(default_factory=AlertsConfig)
    storage: StorageConfig = field(default_factory=StorageConfig)
    qc_specific: QCSpecificConfig = field(default_factory=QCSpecificConfig)
    scaling: ScalingConfig = field(default_factory=ScalingConfig)
    # Uninterpreted passthrough for declared-but-unread reference keys
    # (alerts/email, storage, integrations, security, ...).
    extra: Dict[str, Any] = field(default_factory=dict)

    def validate(self) -> "SystemConfig":
        self.model.validate()
        self.processing.validate()
        self.quality_control.validate()
        self.edge.validate()
        self.alerts.validate()
        self.storage.validate()
        self.qc_specific.validate()
        self.scaling.validate()
        return self

    # ---- dict round-tripping -------------------------------------------------

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "SystemConfig":
        raw = dict(raw or {})
        model_raw = dict(raw.pop("model", {}))
        proc_raw = dict(raw.pop("processing", {}))
        qc_raw = dict(raw.pop("quality_control", {}))
        spc_raw = dict(raw.pop("spc", {}))
        api_raw = dict(raw.pop("api", {}))
        edge_raw = dict(raw.pop("edge", {}))
        mesh_raw = dict(raw.pop("mesh", {}))
        alerts_raw = dict(raw.pop("alerts", {}))
        storage_raw = dict(raw.pop("storage", {}))
        qc_spec_raw = dict(raw.pop("qc_specific", {}) or {})

        if "resnet_stages" in model_raw:
            model_raw["resnet_stages"] = tuple(model_raw["resnet_stages"])
        model = _build(ModelConfig, model_raw)
        pre_raw = dict(proc_raw.pop("preprocessing", {}))
        if "resize" in pre_raw and pre_raw["resize"] is not None:
            pre_raw["resize"] = tuple(pre_raw["resize"])
        if "input_size" in proc_raw:
            proc_raw["input_size"] = tuple(proc_raw["input_size"])
        processing = _build(ProcessingConfig, proc_raw)
        processing.preprocessing = _build(PreprocessingConfig, pre_raw)

        thr_raw = dict(qc_raw.pop("thresholds", {}))
        qc = _build(QualityControlConfig, qc_raw)
        qc.thresholds = _build(QualityThresholds, thr_raw)

        # Reference nests spec limits under spc.specification_limits.defect_rate
        spec = dict(spc_raw.pop("specification_limits", {}) or {})
        rate = dict(spec.get("defect_rate", {}) or {})
        spc = _build(SPCConfig, spc_raw)
        if rate:
            spc.defect_rate_limits = _build(SpecLimit, rate)

        # Reference nests rate limiting under api.rate_limiting
        rl = dict(api_raw.pop("rate_limiting", {}) or {})
        # Reference nests auth under api.authentication (config.yaml:162-166)
        auth = dict(api_raw.pop("authentication", {}) or {})
        if "api_keys" in api_raw:
            api_raw["api_keys"] = tuple(api_raw["api_keys"] or ())
        api = _build(ServingConfig, api_raw)
        if rl:
            api.rate_limit_enabled = bool(rl.get("enabled", api.rate_limit_enabled))
            api.requests_per_minute = int(
                rl.get("requests_per_minute", api.requests_per_minute)
            )
        if auth:
            api.auth_enabled = bool(auth.get("enabled", api.auth_enabled))
            keys = auth.get("api_keys")
            if keys:
                api.api_keys = tuple(str(k) for k in keys)
        # Reference nests TLS at top-level security.ssl (config.yaml:266-271);
        # security stays in extra for config-passthrough parity.
        ssl_raw = dict((raw.get("security") or {}).get("ssl") or {})
        if ssl_raw:
            api.ssl_enabled = bool(ssl_raw.get("enabled", api.ssl_enabled))
            api.ssl_cert = str(ssl_raw.get("cert_file", api.ssl_cert))
            api.ssl_key = str(ssl_raw.get("key_file", api.ssl_key))

        # Reference nests storage as database/image_storage/results_storage
        # (config.yaml:100-122); accept both that shape and the flat one.
        db_raw = dict(storage_raw.pop("database", {}) or {})
        img_raw = dict(storage_raw.pop("image_storage", {}) or {})
        res_raw = dict(storage_raw.pop("results_storage", {}) or {})
        if "type" in db_raw:
            storage_raw.setdefault("database_type", db_raw["type"])
        if "name" in db_raw:
            storage_raw.setdefault("database_path", db_raw["name"])
        for src, dst in (("save_processed_images", "save_processed_images"),
                         ("save_failed_images", "save_failed_images"),
                         ("storage_path", "image_storage_path"),
                         ("retention_days", "retention_days"),
                         ("max_storage_gb", "max_storage_gb")):
            if src in img_raw:
                storage_raw.setdefault(dst, img_raw[src])
        if "save_detailed_results" in res_raw:
            storage_raw.setdefault("save_detailed_results",
                                   res_raw["save_detailed_results"])
        # Reference nests backup at top-level production.backup
        # (config.yaml:238-242); production stays in extra passthrough.
        bk_raw = dict((raw.get("production") or {}).get("backup") or {})
        for src, dst in (("enabled", "backup_enabled"),
                         ("frequency", "backup_frequency"),
                         ("retention_days", "backup_retention_days"),
                         ("backup_path", "backup_path")):
            if src in bk_raw:
                storage_raw.setdefault(dst, bk_raw[src])

        alert_thr_raw = dict(alerts_raw.pop("thresholds", {}) or {})
        if "webhook_urls" in alerts_raw:
            alerts_raw["webhook_urls"] = tuple(alerts_raw["webhook_urls"] or ())
        alerts = _build(AlertsConfig, alerts_raw)
        if alert_thr_raw:
            alerts.thresholds = _build(AlertThresholds, alert_thr_raw)

        # Reference nests scaling at production.scaling (config.yaml:221-228);
        # our to_dict round-trip emits a top-level "scaling" key. Overlay the
        # reference-style block on top so an update() patch touching
        # production.scaling wins over the round-tripped state.
        scaling_raw = dict(raw.pop("scaling", None) or {})
        scaling_raw.update((raw.get("production") or {}).get("scaling") or {})

        cfg = cls(
            model=model,
            processing=processing,
            quality_control=qc,
            spc=spc,
            api=api,
            edge=_build(EdgeConfig, edge_raw),
            mesh=_build(MeshConfig, mesh_raw),
            alerts=alerts,
            storage=_build(StorageConfig, storage_raw),
            qc_specific=_build(QCSpecificConfig, qc_spec_raw),
            scaling=_build(ScalingConfig, scaling_raw),
            extra=raw,
        )
        return cfg.validate()

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        extra = d.pop("extra")
        d.update(extra)
        return d

    def update(self, patch: Dict[str, Any]) -> "SystemConfig":
        """Apply a (possibly nested) dict patch and revalidate.

        Parity with ``detector.update_config`` (``inference/detector.py:321-329``)
        but type-checked instead of blind ``dict.update``.
        """
        merged = _merge(self.to_dict(), patch)
        return SystemConfig.from_dict(merged)

    def json(self) -> str:
        return json.dumps(self.to_dict(), default=str)


def _build(cls, raw: Dict[str, Any]):
    """Construct dataclass ``cls`` from ``raw``, ignoring unknown keys."""
    names = {f.name for f in dataclasses.fields(cls)}
    known = {k: v for k, v in raw.items() if k in names}
    return cls(**known)


def load_config(path: Optional[str] = None) -> SystemConfig:
    """Load a YAML config file, falling back to defaults when absent.

    Parity with ``app.py:51-81`` (default fallback on FileNotFound), but the
    loaded dict is validated rather than used raw.
    """
    if path is None:
        # no explicit path: prefer the shipped config (which wires the
        # trained demo checkpoints) when running from a repo checkout
        default = os.path.join(os.path.dirname(__file__), "..", "config", "config.yaml")
        if os.path.exists(default):
            path = default
        else:
            return SystemConfig().validate()
    try:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
    except FileNotFoundError:
        return SystemConfig().validate()
    return SystemConfig.from_dict(raw)
