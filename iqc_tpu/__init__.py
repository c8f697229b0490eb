"""TPU-native industrial quality-control computer-vision framework.

A from-scratch JAX / Flax / Pallas / pjit rebuild of the capabilities of the
reference system (``JayDS22/Industrial-Quality-Control-Computer-Vision-System-``):

- YOLOv8 defect detection (Flax) with a fused on-device box-decode + NMS kernel
  (replacing the reference's Ultralytics/CUDA path, ``models/yolo_model.py``).
- ResNet-50 defect classification (Flax) with the reference's custom head
  (``models/resent_model.py:74-81``).
- A single batched ensemble graph: detection -> per-crop classification ->
  confidence fusion -> severity/grading, implementing for real what the
  reference mocks (``models/ensemble.py:181-195``).
- On-device defect segmentation (Otsu / adaptive / watershed / region-growing
  equivalents, ``inference/segmentation.py``) and post-processing
  (``inference/postprocess.py``).
- SPC analytics (c/u/X-mR charts, Western-Electric rules, Cp/Cpk/Cpm,
  ``analytics/sec_analysis.py``) and the anomaly detector the reference
  imports but never ships (``app.py:28``).
- Device-mesh data parallelism over ICI via ``jax.sharding`` (the reference
  has only a disabled NCCL config block, ``config/yolo_config.yaml:197-202``).

See SURVEY.md for the full component inventory this package mirrors.
"""

__version__ = "0.1.0"

from iqc_tpu.config import SystemConfig, load_config  # noqa: F401
