"""Training: pjit data-parallel trainers, checkpointing, utilities.

TPU-native replacement for the reference's training layer
(``train/train_resnet.py``, ``train/train_yolo.py``, ``train/utils.py``).
"""
