"""Checkpoint save/load for model variables and train state.

Replaces the reference's torch checkpoint handling: dual-format load with
pretrained fallback (``models/resent_model.py:85-112``), full train-state
checkpoints with epoch/optimizer/scheduler (``train/train_resnet.py:499-519``),
and the generic monitor/mode ``ModelCheckpoint`` policy
(``train/utils.py:178-261``). Format is flax msgpack (weights) + JSON
sidecar (metadata); orbax is used for sharded train-state checkpoints.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)


def save_variables(path: str, variables, metadata: Optional[Dict] = None) -> None:
    """Serialize a Flax variables pytree to msgpack (+ JSON sidecar)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_vars = jax.tree_util.tree_map(np.asarray, variables)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_vars))
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def _state_dict_keys(d, prefix=()):
    """Flatten a (possibly nested) state dict to dotted key paths."""
    if isinstance(d, dict):
        out = []
        for k, v in d.items():
            out.extend(_state_dict_keys(v, prefix + (str(k),)))
        return out
    return [".".join(prefix)]


def load_variables(path: str, template):
    """Deserialize into the structure of ``template`` (structure- and
    shape-checked).

    flax.serialization.from_bytes restores by key name and silently IGNORES
    extra keys in the stored file — a checkpoint from a deeper architecture
    partially restores into a shallower one (observed: a (3,4,6,3) ResNet-50
    checkpoint "loading" into a (1,1,1,1) test model because the blocks_0
    shapes coincide). Compare the stored key set against the template's
    before restoring, then check every leaf shape."""
    with open(path, "rb") as f:
        data = f.read()
    raw = serialization.msgpack_restore(data)
    target_sd = serialization.to_state_dict(
        jax.tree_util.tree_map(np.asarray, template)
    )
    stored_keys = set(_state_dict_keys(raw))
    target_keys = set(_state_dict_keys(target_sd))
    if stored_keys != target_keys:
        extra = sorted(stored_keys - target_keys)[:5]
        missing = sorted(target_keys - stored_keys)[:5]
        raise ValueError(
            f"checkpoint structure mismatch: {len(stored_keys - target_keys)} "
            f"key(s) not in model (e.g. {extra}), "
            f"{len(target_keys - stored_keys)} model key(s) absent "
            f"(e.g. {missing})"
        )
    restored = serialization.from_bytes(template, data)
    t_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    r_leaves = jax.tree_util.tree_flatten_with_path(restored)[0]
    for (t_path, t_leaf), (_, r_leaf) in zip(t_leaves, r_leaves):
        ts, rs = np.shape(t_leaf), np.shape(r_leaf)
        if ts != rs:
            key = jax.tree_util.keystr(t_path)
            raise ValueError(
                f"checkpoint leaf {key} has shape {rs}, model expects {ts}"
            )
    return restored


def try_load_variables(path: str, template):
    """Load weights, falling back to None only when the file is MISSING —
    parity with the reference's pretrained fallback (resent_model.py:100-101).

    A malformed or shape-incompatible checkpoint re-raises: silently serving
    randomly-initialized weights while /health reports healthy is worse than
    failing model init (ADVICE r1). Callers that keep init weights on None
    must surface that state (EnsemblePredictor.weights_source).
    """
    try:
        return load_variables(path, template)
    except FileNotFoundError:
        logger.warning("checkpoint %s not found; using initialized weights", path)
        return None
    except Exception as e:  # malformed/incompatible checkpoint: fail loudly
        raise ValueError(f"corrupt or incompatible checkpoint {path!r}: {e}") from e


def load_metadata(path: str) -> Dict:
    try:
        with open(path + ".json") as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def save_train_state(path: str, state, metadata: Optional[Dict] = None) -> None:
    """Persist a full TrainState (step, params, batch_stats, opt_state) —
    the reference's full-checkpoint semantics (train_resnet.py:499-519:
    epoch + model + optimizer + scheduler state)."""
    save_variables(path, tuple(state), metadata)


def load_train_state(path: str, template):
    """Restore a TrainState saved by save_train_state into the structure
    of ``template`` (same model/optimizer)."""
    loaded = load_variables(path, tuple(template))
    return type(template)(*loaded)


class CheckpointManager:
    """Monitor/mode/save-frequency checkpoint policy
    (train/utils.py:178-261 equivalent), storing msgpack weights."""

    def __init__(
        self,
        directory: str,
        monitor: str = "val_accuracy",
        mode: str = "max",
        save_frequency: int = 1,
        keep_best_only: bool = True,
    ):
        if mode not in ("max", "min"):
            raise ValueError("mode must be 'max' or 'min'")
        self.directory = directory
        self.monitor = monitor
        self.mode = mode
        self.save_frequency = save_frequency
        self.keep_best_only = keep_best_only
        self.best: Optional[float] = None
        os.makedirs(directory, exist_ok=True)

    def _improved(self, value: float) -> bool:
        if self.best is None:
            return True
        return value > self.best if self.mode == "max" else value < self.best

    def step(self, epoch: int, metrics: Dict[str, float], variables) -> Dict[str, Any]:
        """Record an epoch; save best and/or periodic checkpoints."""
        saved = {}
        value = float(metrics.get(self.monitor, float("nan")))
        meta = {"epoch": epoch, "metrics": metrics, "monitor": self.monitor}
        if not np.isnan(value) and self._improved(value):
            self.best = value
            best_path = os.path.join(self.directory, "best_model.msgpack")
            save_variables(best_path, variables, meta)
            saved["best"] = best_path
        if not self.keep_best_only and self.save_frequency and epoch % self.save_frequency == 0:
            path = os.path.join(self.directory, f"checkpoint_epoch_{epoch}.msgpack")
            save_variables(path, variables, meta)
            saved["periodic"] = path
        return saved
