"""Training utilities.

Rebuild of ``train/utils.py``: global seeding (jax PRNG determinism replaces
cudnn flags, ``utils.py:23-32``), EarlyStopping (``utils.py:47-85``),
MetricsTracker with JSON export (``utils.py:87-176``), class-weight
computation (``utils.py:263-280``), training report with target-met flags
(``utils.py:356-406``), parameter counting / model size (``utils.py:408-426``)
and a device-latency profiler (CUDA-event microbenchmark ->
block_until_ready timing, ``utils.py:428-470``).
"""

from __future__ import annotations

import json
import os
import random
import time
from typing import Callable, Dict, List, Optional

import jax
import numpy as np


def set_global_seed(seed: int = 42) -> jax.Array:
    """Seed python/numpy and return the root jax PRNG key. jax is
    deterministic by construction — the TPU equivalent of
    cudnn.deterministic (utils.py:23-32)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class EarlyStopping:
    """Patience-based early stopping (utils.py:47-85)."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0, mode: str = "max"):
        if mode not in ("max", "min"):
            raise ValueError("mode must be 'max' or 'min'")
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.best: Optional[float] = None
        self.counter = 0
        self.should_stop = False

    def step(self, value: float) -> bool:
        """Record a metric; returns True when training should stop."""
        improved = (
            self.best is None
            or (self.mode == "max" and value > self.best + self.min_delta)
            or (self.mode == "min" and value < self.best - self.min_delta)
        )
        if improved:
            self.best = value
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop


class MetricsTracker:
    """Per-epoch metric history + JSON export (utils.py:87-176).
    Plotting is delegated to matplotlib only if available."""

    def __init__(self):
        self.history: Dict[str, List[float]] = {}

    def update(self, metrics: Dict[str, float]) -> None:
        for k, v in metrics.items():
            self.history.setdefault(k, []).append(float(v))

    def best(self, metric: str, mode: str = "max") -> Optional[float]:
        values = self.history.get(metric)
        if not values:
            return None
        return max(values) if mode == "max" else min(values)

    def export_json(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.history, f, indent=2)

    def plot(self, path: str) -> bool:  # pragma: no cover - needs matplotlib
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return False
        keys = [k for k in ("loss", "val_loss", "accuracy", "val_accuracy") if k in self.history]
        if not keys:
            keys = list(self.history)[:4]
        fig, axes = plt.subplots(2, 2, figsize=(10, 8))
        for ax, key in zip(axes.flat, keys):
            ax.plot(self.history[key])
            ax.set_title(key)
        for ax in axes.flat[len(keys):]:
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(path)
        plt.close(fig)
        return True


def compute_class_weights(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """Inverse-frequency class weights (utils.py:263-280)."""
    counts = np.bincount(np.asarray(labels), minlength=num_classes).astype(np.float64)
    total = counts.sum()
    weights = np.where(counts > 0, total / (num_classes * np.maximum(counts, 1)), 0.0)
    return weights.astype(np.float32)


def count_parameters(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def model_size_mb(params) -> float:
    """fp32 parameter footprint in MB (utils.py:408-426)."""
    total_bytes = sum(
        int(np.prod(p.shape)) * p.dtype.itemsize for p in jax.tree_util.tree_leaves(params)
    )
    return total_bytes / (1024 * 1024)


def profile_model(fn: Callable, *args, iterations: int = 50, warmup: int = 5) -> Dict:
    """Device-latency profile of a jitted callable: mean/std/min/max/FPS
    (the CUDA-event profiler, utils.py:428-470, via block_until_ready)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iterations):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times_ms = np.asarray(times) * 1000
    return {
        "mean_ms": float(times_ms.mean()),
        "std_ms": float(times_ms.std()),
        "min_ms": float(times_ms.min()),
        "max_ms": float(times_ms.max()),
        "p95_ms": float(np.percentile(times_ms, 95)),
        "fps": float(1000.0 / times_ms.mean()),
        "iterations": iterations,
    }


def training_report(
    history: Dict[str, List[float]],
    targets: Optional[Dict[str, float]] = None,
    path: Optional[str] = None,
) -> Dict:
    """Summary report with target-met booleans (utils.py:356-406)."""
    targets = targets or {"accuracy": 0.942, "precision": 0.913, "recall": 0.89}
    finals = {k: (v[-1] if v else None) for k, v in history.items()}
    bests = {k: (max(v) if v else None) for k, v in history.items()}
    met = {}
    for name, target in targets.items():
        for key in (f"val_{name}", name):
            if history.get(key):
                met[name] = bool(max(history[key]) >= target)
                break
        else:
            met[name] = False
    report = {
        "epochs_trained": max((len(v) for v in history.values()), default=0),
        "final_metrics": finals,
        "best_metrics": bests,
        "targets": targets,
        "targets_met": met,
        "all_targets_met": all(met.values()) if met else False,
    }
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(report, f, indent=2)
    return report
