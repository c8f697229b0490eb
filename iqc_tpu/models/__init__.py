"""Flax model zoo: ResNet-50 classifier, YOLOv8 detector, fused ensemble.

TPU-native replacements for the reference's torch/Ultralytics model layer
(SURVEY.md §1 L4): same capability surface, single-graph execution.
"""

from iqc_tpu.models.resnet import ResNet50, ResNetClassifier  # noqa: F401
from iqc_tpu.models.yolo import YOLOv8, YOLODetector  # noqa: F401
from iqc_tpu.models.ensemble import EnsemblePredictor, EnsembleOptimizer  # noqa: F401
