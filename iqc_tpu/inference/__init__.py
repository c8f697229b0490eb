"""Inference orchestration: detector, on-device segmentation, postprocess."""
