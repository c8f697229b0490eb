"""Quality-control detector: the unified inference orchestrator (L5).

Rebuild of ``inference/detector.py`` with the execution model inverted
(SURVEY.md §3.3): the reference fans each image out to a thread that makes
a batch-size-1 GPU call; here ``predict_batch`` stacks images into one
device batch through the fused ensemble graph, and preprocessing
(resize / bilateral denoise / CLAHE — ``detector.py:226-254``) runs as
jitted device ops instead of host OpenCV.

API parity: predict / predict_batch / predict_stream / benchmark /
get_system_info / get_performance_stats / reset_performance_stats /
update_config, with the same result schemas. Performance stats are
lock-guarded (the reference mutates them racily from N threads,
``detector.py:272-279`` — SURVEY.md §5.2).
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from iqc_tpu.config import SystemConfig
from iqc_tpu.inference.postprocess import PostProcessor
from iqc_tpu.inference.segmentation import ImageSegmentator
from iqc_tpu.models.ensemble import EnsemblePredictor
from iqc_tpu.ops import image as imops

logger = logging.getLogger(__name__)


class QualityControlDetector:
    """validate -> preprocess -> fused ensemble -> segmentation ->
    postprocess, batched on device."""

    def __init__(
        self,
        yolo_weights: Optional[str] = None,
        resnet_weights: Optional[str] = None,
        config: Optional[SystemConfig] = None,
    ):
        if isinstance(config, dict):
            config = SystemConfig.from_dict(config)
        self.config = config or SystemConfig()
        self.ensemble_predictor = EnsemblePredictor(
            yolo_weights=yolo_weights, resnet_weights=resnet_weights, config=self.config
        )
        self.segmentator = ImageSegmentator(self.config)
        self.postprocessor = PostProcessor(self.config)

        self._stats_lock = threading.Lock()
        self.performance_stats = {
            "total_predictions": 0, "total_time": 0.0, "average_time": 0.0
        }
        # native lock-free latency histogram (C++ runtime; Python fallback)
        from iqc_tpu.runtime import LatencyHistogram

        self._latency = LatencyHistogram()
        self._preprocess = self._build_preprocess()

    # -- preprocessing (detector.py:226-254 as device ops) -----------------------

    def _build_preprocess(self):
        pre = self.config.processing.preprocessing
        resize = tuple(pre.resize) if pre.resize else None
        denoise = bool(pre.denoise)
        enhance = bool(pre.enhance_contrast)

        from iqc_tpu.ops.jit_utils import hoisted_jit

        @hoisted_jit
        def fn(images):
            x = imops.to_float(images)
            if resize is not None and x.shape[1:3] != resize:
                x = imops.resize_bilinear(x, resize)
            if denoise:
                x = imops.bilateral_filter(x, d=9, sigma_color=75.0, sigma_space=75.0)
            if enhance:
                x = jax.vmap(imops.enhance_contrast_rgb)(x)
            return x

        return fn

    # -- validation (detector.py:208-224) ----------------------------------------

    @staticmethod
    def _validate_image(image) -> bool:
        if image is None or not isinstance(image, np.ndarray):
            return False
        if image.ndim == 1:
            return QualityControlDetector._decode(image) is not None
        return image.ndim in (2, 3) and image.size > 0

    @staticmethod
    def _decode(buf: np.ndarray) -> Optional[np.ndarray]:
        """Host-side decode of an encoded byte buffer (decode stays on host;
        everything after lives in HBM — SURVEY.md §2b item 4)."""
        import io

        from PIL import Image

        try:
            img = Image.open(io.BytesIO(buf.tobytes()))
            return np.asarray(img.convert("RGB"))
        except Exception:
            return None

    def _to_rgb_array(self, image: np.ndarray) -> Optional[np.ndarray]:
        if image.ndim == 1:
            return self._decode(image)
        if image.ndim == 2:
            return np.repeat(image[..., None], 3, axis=-1)
        return image

    # -- single image (detector.py:72-126) -----------------------------------------

    def predict(self, image: np.ndarray, include_segmentation: bool = True) -> Dict:
        start = time.perf_counter()
        if not self._validate_image(image):
            return {"error": "Invalid image input"}
        rgb = self._to_rgb_array(image)
        if rgb is None:
            return {"error": "Invalid image input"}
        try:
            from iqc_tpu.utils.tracing import StageTimes, stage_timer

            stages = StageTimes()
            with stage_timer(stages, "preprocess"):
                # stays device-resident: no host round trip between stages
                processed = self._preprocess(jnp.asarray(rgb)[None])[0]
            segmentation_results: Dict = {}
            if include_segmentation:
                # ONE device program: detection + crop classification +
                # fusion + segmentation (BASELINE config #5)
                with stage_timer(stages, "ensemble+segmentation"):
                    out, masks, seg_stats = self.ensemble_predictor.run_full_host(
                        processed[None]
                    )
                    shape = tuple(processed.shape)
                    ensemble_results = self.ensemble_predictor.build_result(
                        out, 0, shape
                    )
                    if ensemble_results.get("detections"):
                        s = masks.shape[1]
                        segmentation_results = self.segmentator._assemble_result(
                            ensemble_results["detections"][:s],
                            self.segmentator._unpack(masks[0], seg_stats[0]),
                            out.boxes[0][:s], shape[:2],
                        )
            else:
                with stage_timer(stages, "ensemble"):
                    ensemble_results = self.ensemble_predictor.predict(processed)
            with stage_timer(stages, "postprocess"):
                final = self.postprocessor.process_results(
                    ensemble_results, segmentation_results, processed.shape
                )
            elapsed = time.perf_counter() - start
            self._update_stats(elapsed)
            final.update(
                {
                    "total_inference_time_ms": elapsed * 1000,
                    "stage_times_ms": stages.as_dict(),
                    "ensemble_confidence": ensemble_results.get("ensemble_confidence", 0.0),
                    "global_classification": ensemble_results.get("global_classification", {}),
                    "processing_pipeline": "fused(yolo+nms+crop-resnet) + segmentation + postprocess",
                    "image_metadata": {
                        "original_shape": tuple(image.shape),
                        "channels": image.shape[2] if image.ndim > 2 else 1,
                        "dtype": str(image.dtype),
                        "size_bytes": int(image.nbytes),
                    },
                }
            )
            return final
        except Exception as e:  # failure boundary (detector.py:124-126)
            logger.exception("prediction failed")
            return {"error": str(e)}

    # -- batch (true device batching; reference thread fan-out detector.py:128-180) --

    def predict_batch(self, images: List[np.ndarray], max_workers: Optional[int] = None) -> List[Dict]:
        start = time.perf_counter()
        if not images:
            return []
        try:
            rgbs = [self._to_rgb_array(im) for im in images]
            if any(r is None for r in rgbs):
                return [
                    {"error": "Invalid image input", "batch_index": i}
                    if r is None
                    else self.predict(images[i])
                    for i, r in enumerate(rgbs)
                ]
            size = self.config.processing.preprocessing.resize or self.config.processing.input_size
            stacked = np.stack(
                [
                    r if r.shape[:2] == tuple(size) else np.asarray(
                        imops.resize_bilinear(imops.to_float(jnp.asarray(r)), size) * 255
                    ).astype(np.uint8)
                    for r in rgbs
                ]
            )
            # pad to the next power-of-two bucket (capped at the configured
            # batch_size): every distinct batch shape compiles a fresh
            # executable (~10 s on CPU, minutes over the TPU tunnel), so
            # bucketing bounds the compiled variants to log2(max_batch)
            # while padded rows ride along and get dropped below
            n = len(images)
            cap = max(int(self.config.processing.batch_size), 1)
            bucket = 1
            while bucket < n and bucket < cap:
                bucket *= 2
            if n < bucket:
                stacked = np.concatenate(
                    [stacked, np.repeat(stacked[-1:], bucket - n, axis=0)]
                )
            # ONE device program for the whole batch: preprocess stays
            # device-resident, detection + crop classification + fusion +
            # segmentation fused (BASELINE config #5)
            processed = self._preprocess(jnp.asarray(stacked))
            out, masks, seg_stats = self.ensemble_predictor.run_full_host(processed)
            shape = tuple(processed.shape[1:])
            ens_results = [
                self.ensemble_predictor.build_result(out, i, shape)
                for i in range(len(images))
            ]
            s = masks.shape[1]
            segs = [
                self.segmentator._assemble_result(
                    e.get("detections", [])[:s],
                    self.segmentator._unpack(masks[i], seg_stats[i]),
                    out.boxes[i][:s], shape[:2],
                )
                if e.get("detections")
                else {}
                for i, e in enumerate(ens_results)
            ]
            results: List[Dict] = []
            for i, ens in enumerate(ens_results):
                final = self.postprocessor.process_results(
                    ens, segs[i], shape
                )
                final["batch_index"] = i
                final["ensemble_confidence"] = ens.get("ensemble_confidence", 0.0)
                final["global_classification"] = ens.get("global_classification", {})
                results.append(final)

            total = time.perf_counter() - start
            self._update_stats(total, count=len(images))
            batch_stats = {
                "batch_size": len(images),
                "total_batch_time_ms": total * 1000,
                "average_time_per_image_ms": total * 1000 / len(images),
                "throughput_images_per_second": len(images) / total,
            }
            for r in results:
                r["batch_statistics"] = batch_stats
            return results
        except Exception as e:
            logger.exception("batch prediction failed")
            return [{"error": str(e), "batch_index": i} for i in range(len(images))]

    # -- streaming (detector.py:182-206) ---------------------------------------------

    def predict_stream(
        self,
        image_generator: Iterable[np.ndarray],
        callback: Optional[Callable[[Dict], None]] = None,
        micro_batch: int = 1,
    ):
        """Streaming inference (detector.py:182-206). With micro_batch > 1,
        consecutive frames are coalesced into device batches — the
        steady-state loop that keeps the chip busy (SURVEY.md §2a
        "device-resident steady-state loop") while bounding latency to one
        micro-batch."""

        def produce():
            if micro_batch <= 1:
                for i, image in enumerate(image_generator):
                    result = self.predict(image)
                    result["stream_index"] = i
                    result["timestamp"] = time.time()
                    yield result
                return
            import itertools

            idx = 0
            it = iter(image_generator)
            while True:
                chunk = list(itertools.islice(it, micro_batch))
                if not chunk:
                    return
                for result in self.predict_batch(chunk):
                    result["stream_index"] = idx
                    result["timestamp"] = time.time()
                    idx += 1
                    yield result

        if callback is not None:
            try:
                for result in produce():
                    callback(result)
            except Exception as e:
                callback({"error": str(e)})
            return None
        return produce()

    # -- stats / info (detector.py:272-329) --------------------------------------------

    def _update_stats(self, elapsed: float, count: int = 1) -> None:
        with self._stats_lock:
            s = self.performance_stats
            s["total_predictions"] += count
            s["total_time"] += elapsed
            s["average_time"] = s["total_time"] / s["total_predictions"]
        self._latency.record(elapsed * 1000 / max(count, 1))

    def get_performance_stats(self) -> Dict:
        with self._stats_lock:
            stats = dict(self.performance_stats)
        if stats["total_predictions"] > 0:
            stats.update(
                {
                    "average_time_ms": stats["average_time"] * 1000,
                    "throughput_images_per_second": (
                        1.0 / stats["average_time"] if stats["average_time"] > 0 else 0.0
                    ),
                    "total_time_minutes": stats["total_time"] / 60,
                    "latency_percentiles_ms": {
                        "p50": self._latency.percentile(50),
                        "p95": self._latency.percentile(95),
                        "p99": self._latency.percentile(99),
                    },
                }
            )
        return stats

    def reset_performance_stats(self) -> None:
        with self._stats_lock:
            self.performance_stats = {
                "total_predictions": 0, "total_time": 0.0, "average_time": 0.0
            }

    def get_system_info(self) -> Dict:
        return {
            "detector_status": "operational",
            "components_loaded": {
                "ensemble_predictor": self.ensemble_predictor is not None,
                "segmentator": self.segmentator is not None,
                "postprocessor": self.postprocessor is not None,
            },
            "performance_stats": self.get_performance_stats(),
            "configuration": self.config.to_dict(),
            "ensemble_info": self.ensemble_predictor.get_model_info(),
            "devices": [str(d) for d in jax.devices()],
        }

    def update_config(self, new_config: Dict) -> None:
        """Runtime config mutation (detector.py:321-329): validated merge,
        propagated to the postprocessor; thresholds propagate to the
        ensemble without recompilation."""
        self.config = self.config.update(new_config)
        self.postprocessor.update_config(self.config)
        m = self.config.model
        self.ensemble_predictor.confidence_threshold = m.confidence_threshold
        self.ensemble_predictor.nms_threshold = m.nms_threshold
        self.ensemble_predictor.ensemble_weights = dict(m.ensemble_weights)
        # qc_specific (per-class thresholds / severity rules) reads live
        # from the predictor's config in _args — keep it the same object
        self.ensemble_predictor.config = self.config

    # -- benchmark (detector.py:331-395) --------------------------------------------

    def benchmark(self, test_images: List[np.ndarray], iterations: int = 1,
                  batched: bool = True) -> Dict:
        all_times: List[float] = []
        all_results: List[Dict] = []
        for _ in range(iterations):
            if batched:
                t0 = time.perf_counter()
                rs = self.predict_batch(test_images)
                per = (time.perf_counter() - t0) / max(len(test_images), 1)
                all_times.extend([per] * len(test_images))
                all_results.extend(rs)
            else:
                for image in test_images:
                    t0 = time.perf_counter()
                    all_results.append(self.predict(image))
                    all_times.append(time.perf_counter() - t0)
        times_ms = np.asarray(all_times) * 1000
        ok = [r for r in all_results if "error" not in r]
        n_det = sum(len(r.get("detections", [])) for r in ok)
        return {
            "total_images": len(test_images) * iterations,
            "iterations": iterations,
            "timing_statistics": {
                "mean_ms": float(np.mean(times_ms)),
                "median_ms": float(np.median(times_ms)),
                "min_ms": float(np.min(times_ms)),
                "max_ms": float(np.max(times_ms)),
                "std_ms": float(np.std(times_ms)),
                "p95_ms": float(np.percentile(times_ms, 95)),
                "p99_ms": float(np.percentile(times_ms, 99)),
            },
            "throughput": {
                "images_per_second": len(all_times) / max(float(np.sum(all_times)), 1e-9),
                "images_per_minute": len(all_times) / max(float(np.sum(all_times)), 1e-9) * 60,
            },
            "accuracy_metrics": {
                "success_rate": len(ok) / max(len(all_results), 1),
                "average_detections_per_image": n_det / max(len(ok), 1),
                "average_confidence": float(
                    np.mean([r.get("ensemble_confidence", 0.0) for r in ok])
                )
                if ok
                else 0.0,
            },
        }
