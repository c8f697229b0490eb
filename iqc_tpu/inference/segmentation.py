"""Image segmentator: reference-parity API over the on-device kernels.

Replaces ``inference/segmentation.py`` (761 lines of per-box host OpenCV /
skimage / Python-BFS work — the pipeline's hottest loop, SURVEY.md §3.2)
with one fixed-capacity jitted program (``iqc_tpu/ops/segmentation.py``).
The class here is a thin host shell: pad detections to capacity, call the
kernel, reassemble the reference's result schema
(``segmentation.py:39-146``), including lazy full-resolution mask
reconstruction and the area analysis / size-bucket statistics
(``segmentation.py:623-655``).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from iqc_tpu.config import SystemConfig
from iqc_tpu.ops import image as imops
from iqc_tpu.ops.segmentation import (
    METHOD_ADAPTIVE,
    METHOD_REGION_GROWING,
    METHOD_THRESHOLD,
    METHOD_WATERSHED,
    SegmentationOutputs,
    segment_detections,
)

logger = logging.getLogger(__name__)

METHOD_NAMES = ("threshold", "adaptive", "watershed", "region_growing")


class ImageSegmentator:
    """API parity with the reference ``ImageSegmentator``
    (``inference/segmentation.py:20-761``)."""

    def __init__(self, config: Optional[SystemConfig] = None, capacity: int = 32,
                 roi_size: int = 128):
        if isinstance(config, dict):
            config = SystemConfig.from_dict(config)
        self.config = config or SystemConfig()
        self.capacity = capacity
        self.roi_size = roi_size
        self.class_names = list(self.config.quality_control.defect_classes)

        from iqc_tpu.ops.jit_utils import hoisted_jit

        def _packed(img, rois):
            # single packed [N,6] input (boxes | class id | valid) and packed
            # stat output: host<->device transfers each cost ~40 ms over the
            # tunnel, so both directions are coalesced
            boxes = rois[..., 0:4]
            cids = rois[..., 4].astype(jnp.int32)
            valid = rois[..., 5] > 0.5
            out = segment_detections(img, boxes, cids, valid, roi_size=self.roi_size)
            stats = jnp.stack(
                [out.area, out.perimeter, out.compactness,
                 out.confidence, out.method.astype(jnp.float32)], axis=-1
            )
            return out.masks, stats

        self._kernel = hoisted_jit(_packed)
        # batched variant: one program over [B] images x [capacity] ROIs
        self._kernel_batch = hoisted_jit(jax.vmap(_packed))

    # -- core ------------------------------------------------------------------

    def segment_defects(self, image: np.ndarray, detections: List[Dict]) -> Dict:
        """Segment defect regions; returns the reference's result schema."""
        results = {
            "segmented_regions": [],
            "masks": [],
            "contours": [],
            "area_analysis": {},
            "total_defect_area": 0,
            "defect_density": 0.0,
        }
        if not detections:
            return results

        img = imops.to_float(jnp.asarray(image))
        h, w = image.shape[:2]
        boxes = np.zeros((self.capacity, 4), np.float32)
        cids = np.zeros((self.capacity,), np.int32)
        valid = np.zeros((self.capacity,), bool)
        for i, det in enumerate(detections[: self.capacity]):
            b = det["bbox"]
            boxes[i] = (b["x1"], b["y1"], b["x2"], b["y2"])
            cls = det.get("class", "")
            # unknown classes fall back to the threshold method
            # (segmentation.py:194 method_mapping.get(..., 'threshold'));
            # class id 3 (discoloration) carries METHOD_THRESHOLD
            cids[i] = (
                self.class_names.index(cls) if cls in self.class_names else 3
            )
            valid[i] = True

        rois = np.concatenate(
            [boxes, cids[:, None].astype(np.float32), valid[:, None].astype(np.float32)],
            axis=-1,
        )
        masks, stats = jax.device_get(self._kernel(img, jnp.asarray(rois)))
        return self._assemble_result(
            detections, self._unpack(masks, stats), boxes, (h, w)
        )

    def segment_batch(
        self, images: np.ndarray, batch_detections: List[List[Dict]]
    ) -> List[Dict]:
        """Batched segmentation: all images' ROIs in ONE device program
        (the reference loops host OpenCV per box per image). images
        [B,H,W,3]; batch_detections[i] = detection dicts for image i."""
        b = len(batch_detections)
        if b == 0:
            return []
        h, w = images.shape[1:3]
        boxes = np.zeros((b, self.capacity, 4), np.float32)
        cids = np.zeros((b, self.capacity), np.int32)
        valid = np.zeros((b, self.capacity), bool)
        for i, dets in enumerate(batch_detections):
            for j, det in enumerate(dets[: self.capacity]):
                bb = det["bbox"]
                boxes[i, j] = (bb["x1"], bb["y1"], bb["x2"], bb["y2"])
                cls = det.get("class", "")
                cids[i, j] = (
                    self.class_names.index(cls) if cls in self.class_names else 3
                )
                valid[i, j] = True
        if not valid.any():
            return [self.segment_defects(images[i], []) for i in range(b)]
        rois = np.concatenate(
            [boxes, cids[..., None].astype(np.float32), valid[..., None].astype(np.float32)],
            axis=-1,
        )
        masks, stats = jax.device_get(
            self._kernel_batch(
                imops.to_float(jnp.asarray(images)), jnp.asarray(rois)
            )
        )
        results = []
        for i in range(b):
            results.append(
                self._assemble_result(
                    batch_detections[i],
                    self._unpack(masks[i], stats[i]),
                    boxes[i], (h, w),
                )
            )
        return results

    @staticmethod
    def _unpack(masks: np.ndarray, stats: np.ndarray) -> SegmentationOutputs:
        stats = np.asarray(stats)
        return SegmentationOutputs(
            masks=np.asarray(masks),
            area=stats[..., 0], perimeter=stats[..., 1],
            compactness=stats[..., 2], confidence=stats[..., 3],
            method=stats[..., 4].astype(np.int32),
        )

    def _assemble_result(self, detections, out_np, boxes, shape) -> Dict:
        """Shared host-side schema assembly for one image."""
        h, w = shape
        results = {
            "segmented_regions": [], "masks": [], "contours": [],
            "area_analysis": {}, "total_defect_area": 0, "defect_density": 0.0,
        }
        total_image_area = float(h * w)
        total = 0.0
        for i in range(min(len(detections), len(out_np.masks), len(boxes))):
            det = detections[i]
            area = float(out_np.area[i])
            total += area
            global_mask = self.reconstruct_mask(out_np.masks[i], boxes[i], (h, w))
            region = {
                "detection_id": i,
                "defect_class": det.get("class", "unknown"),
                "confidence": det.get("confidence", 0.0),
                "bbox": det["bbox"],
                "mask": global_mask,
                "local_mask": out_np.masks[i],
                "contours": self.mask_contours(global_mask),
                "area_pixels": area,
                "area_percentage": area / total_image_area * 100.0,
                "perimeter": float(out_np.perimeter[i]),
                "compactness": float(out_np.compactness[i]),
                "segmentation_method": METHOD_NAMES[int(out_np.method[i])],
                "confidence_score": float(out_np.confidence[i]),
            }
            results["segmented_regions"].append(region)
            results["masks"].append(global_mask)
            results["contours"].extend(region["contours"])
        results["total_defect_area"] = total
        results["defect_density"] = total / total_image_area * 100.0
        results["area_analysis"] = self._analyze_defect_areas(
            results["segmented_regions"]
        )
        return results

    # -- host utilities --------------------------------------------------------

    @staticmethod
    def reconstruct_mask(roi_mask: np.ndarray, box: Sequence[float], image_shape) -> np.ndarray:
        """Paste an ROI-grid mask back into a full-resolution uint8 mask
        (the reference's global-coordinate mask, segmentation.py:90-94)."""
        h, w = image_shape
        x1, y1, x2, y2 = (int(round(v)) for v in box)
        x1, y1 = max(0, x1), max(0, y1)
        x2, y2 = min(w, max(x2, x1 + 1)), min(h, max(y2, y1 + 1))
        bw, bh = x2 - x1, y2 - y1
        global_mask = np.zeros((h, w), np.uint8)
        if bw <= 0 or bh <= 0:
            return global_mask
        # nearest-neighbour upsample of the bool ROI grid to the box size
        r = roi_mask.shape[0]
        yi = (np.arange(bh) * r // max(bh, 1)).clip(0, r - 1)
        xi = (np.arange(bw) * r // max(bw, 1)).clip(0, r - 1)
        global_mask[y1:y2, x1:x2] = roi_mask[np.ix_(yi, xi)].astype(np.uint8) * 255
        return global_mask

    @staticmethod
    def mask_contours(mask: np.ndarray, min_area: int = 10) -> List[np.ndarray]:
        """Boundary-pixel polygons per connected component (host-side,
        cv2-free equivalent of findContours, segmentation.py:486-506).
        Returns [K, 1, 2] int arrays of (x, y) boundary points."""
        from scipy import ndimage as ndi

        labels, count = ndi.label(mask > 0)
        contours = []
        for lbl in range(1, count + 1):
            comp = labels == lbl
            if comp.sum() < min_area:
                continue
            inner = ndi.binary_erosion(comp)
            by, bx = np.nonzero(comp & ~inner)
            if len(bx) == 0:
                continue
            contours.append(np.stack([bx, by], axis=-1)[:, None, :].astype(np.int32))
        return contours

    @staticmethod
    def _analyze_defect_areas(regions: List[Dict]) -> Dict:
        """Area statistics + size buckets (segmentation.py:623-655)."""
        if not regions:
            return {}
        areas = [r["area_pixels"] for r in regions]
        pcts = [r["area_percentage"] for r in regions]
        return {
            "total_regions": len(regions),
            "total_area_pixels": float(sum(areas)),
            "total_area_percentage": float(sum(pcts)),
            "average_area_pixels": float(np.mean(areas)),
            "median_area_pixels": float(np.median(areas)),
            "max_area_pixels": float(max(areas)),
            "min_area_pixels": float(min(areas)),
            "area_std": float(np.std(areas)),
            "size_distribution": {
                "small_defects": sum(1 for a in areas if a < 100),
                "medium_defects": sum(1 for a in areas if 100 <= a < 1000),
                "large_defects": sum(1 for a in areas if a >= 1000),
            },
        }

    def visualize_segmentation(
        self, image: np.ndarray, segmentation_results: Dict, save_path: Optional[str] = None
    ) -> np.ndarray:
        from iqc_tpu.inference.visualize import draw_segmentation

        vis = draw_segmentation(image, segmentation_results.get("masks", []))
        if save_path:
            self.save_image(vis, save_path)
        return vis

    @staticmethod
    def save_image(image: np.ndarray, path: str) -> None:
        from PIL import Image

        Image.fromarray(image.astype(np.uint8)).save(path)
