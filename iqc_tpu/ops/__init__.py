"""On-device (XLA/Pallas) compute kernels.

These replace the reference's third-party native surface (SURVEY.md §2b):
OpenCV C++ kernels, skimage/scipy filters, sklearn DBSCAN, and the
Ultralytics CUDA decode+NMS — all as vectorized, statically-shaped JAX ops
that live in HBM/VMEM instead of round-tripping to host.
"""
