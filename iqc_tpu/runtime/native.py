"""ctypes bindings for the C++ serving runtime (with Python fallbacks).

Builds ``libiqc_runtime.so`` on first use if g++ is available (no pybind11
in this environment — plain C ABI + ctypes). Every class degrades to a
behavior-identical pure-Python implementation when the native library
can't be built, so the framework never hard-requires a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
import time
from collections import deque
from typing import Dict, List

import numpy as np

logger = logging.getLogger(__name__)

_CPP_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libiqc_runtime.so")
_lib = None
_lib_lock = threading.Lock()


def _load_library():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _CPP_DIR], check=True,
                    capture_output=True, timeout=120,
                )
            except Exception as e:
                logger.warning("native runtime build failed (%s); using Python fallback", e)
                _lib = False
                return _lib
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("native runtime load failed (%s); using Python fallback", e)
            _lib = False
            return _lib

        lib.bq_create.restype = ctypes.c_void_p
        lib.bq_create.argtypes = [ctypes.c_size_t]
        lib.bq_destroy.argtypes = [ctypes.c_void_p]
        lib.bq_push.restype = ctypes.c_int
        lib.bq_push.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.bq_pop_batch.restype = ctypes.c_int
        lib.bq_pop_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_double,
        ]
        lib.bq_size.restype = ctypes.c_size_t
        lib.bq_size.argtypes = [ctypes.c_void_p]
        lib.bq_close.argtypes = [ctypes.c_void_p]

        lib.rl_create.restype = ctypes.c_void_p
        lib.rl_create.argtypes = [ctypes.c_int, ctypes.c_double]
        lib.rl_destroy.argtypes = [ctypes.c_void_p]
        lib.rl_allow.restype = ctypes.c_int
        lib.rl_allow.argtypes = [ctypes.c_void_p, ctypes.c_char_p]

        lib.lh_create.restype = ctypes.c_void_p
        lib.lh_destroy.argtypes = [ctypes.c_void_p]
        lib.lh_record.argtypes = [ctypes.c_void_p, ctypes.c_double]
        lib.lh_percentile.restype = ctypes.c_double
        lib.lh_percentile.argtypes = [ctypes.c_void_p, ctypes.c_double]
        lib.lh_count.restype = ctypes.c_uint64
        lib.lh_count.argtypes = [ctypes.c_void_p]
        lib.lh_mean.restype = ctypes.c_double
        lib.lh_mean.argtypes = [ctypes.c_void_p]

        u8p = ctypes.POINTER(ctypes.c_uint8)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.iqc_jpeg_info.restype = ctypes.c_int
        lib.iqc_jpeg_info.argtypes = [u8p, ctypes.c_size_t, ip, ip]
        lib.iqc_jpeg_decode.restype = ctypes.c_int
        lib.iqc_jpeg_decode.argtypes = [
            u8p, ctypes.c_size_t, ctypes.c_int, u8p, ctypes.c_size_t,
            ip, ip, ip,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return bool(_load_library())


class BatchQueue:
    """Request-coalescing queue: push int ids, pop aggregated batches.
    Native condvar MPMC ring when built; threading fallback otherwise."""

    def __init__(self, capacity: int = 4096):
        lib = _load_library()
        self._native = bool(lib)
        if self._native:
            self._lib = lib
            self._ptr = lib.bq_create(capacity)
        else:
            self._items: deque = deque()
            self._capacity = capacity
            self._mu = threading.Lock()
            self._cv = threading.Condition(self._mu)
            self._closed = False

    def push(self, request_id: int) -> bool:
        if self._native:
            return bool(self._lib.bq_push(self._ptr, request_id))
        with self._cv:
            if self._closed or len(self._items) >= self._capacity:
                return False
            self._items.append(request_id)
            self._cv.notify()
            return True

    def pop_batch(self, max_batch: int, timeout_ms: float = 100.0) -> List[int]:
        if self._native:
            buf = (ctypes.c_int64 * max_batch)()
            n = self._lib.bq_pop_batch(self._ptr, buf, max_batch, timeout_ms)
            return [buf[i] for i in range(n)]
        with self._cv:
            if not self._items:
                self._cv.wait_for(
                    lambda: self._items or self._closed, timeout=timeout_ms / 1000.0
                )
            out = []
            while self._items and len(out) < max_batch:
                out.append(self._items.popleft())
            return out

    def qsize(self) -> int:
        if self._native:
            return int(self._lib.bq_size(self._ptr))
        with self._mu:
            return len(self._items)

    def close(self) -> None:
        if self._native:
            self._lib.bq_close(self._ptr)
        else:
            with self._cv:
                self._closed = True
                self._cv.notify_all()

    def __del__(self):
        if getattr(self, "_native", False):
            try:
                self._lib.bq_destroy(self._ptr)
            except Exception:
                pass


class NativeRateLimiter:
    """Per-key sliding-window limiter backed by the C++ striped-lock
    implementation (thread-safe version of routes.py:599-636)."""

    def __init__(self, max_requests: int, window_s: float = 60.0):
        lib = _load_library()
        self._native = bool(lib)
        self.max_requests = max_requests
        self.window = window_s
        if self._native:
            self._lib = lib
            self._ptr = lib.rl_create(max_requests, window_s)
        else:
            from iqc_tpu.serving.app import RateLimiter

            self._py = RateLimiter(max_requests, window_s)

    def allow(self, key: str) -> bool:
        if self._native:
            return bool(self._lib.rl_allow(self._ptr, key.encode()))
        return self._py.allow(key)

    def __del__(self):
        if getattr(self, "_native", False):
            try:
                self._lib.rl_destroy(self._ptr)
            except Exception:
                pass


class LatencyHistogram:
    """Lock-free latency recording with percentile queries (native) or a
    numpy reservoir fallback."""

    def __init__(self):
        lib = _load_library()
        self._native = bool(lib)
        if self._native:
            self._lib = lib
            self._ptr = lib.lh_create()
        else:
            self._samples: List[float] = []
            self._mu = threading.Lock()

    def record(self, ms: float) -> None:
        if self._native:
            self._lib.lh_record(self._ptr, float(ms))
        else:
            with self._mu:
                self._samples.append(float(ms))
                if len(self._samples) > 100_000:
                    self._samples = self._samples[-50_000:]

    def percentile(self, p: float) -> float:
        if self._native:
            return float(self._lib.lh_percentile(self._ptr, p))
        with self._mu:
            if not self._samples:
                return 0.0
            return float(np.percentile(self._samples, p))

    def count(self) -> int:
        if self._native:
            return int(self._lib.lh_count(self._ptr))
        with self._mu:
            return len(self._samples)

    def mean(self) -> float:
        if self._native:
            return float(self._lib.lh_mean(self._ptr))
        with self._mu:
            return float(np.mean(self._samples)) if self._samples else 0.0

    def summary(self) -> Dict[str, float]:
        return {
            "count": self.count(),
            "mean_ms": self.mean(),
            "p50_ms": self.percentile(50),
            "p95_ms": self.percentile(95),
            "p99_ms": self.percentile(99),
        }

    def __del__(self):
        if getattr(self, "_native", False):
            try:
                self._lib.lh_destroy(self._ptr)
            except Exception:
                pass


def decode_jpeg(data: bytes, target: int = 0):
    """Native libjpeg decode -> RGB uint8 [H,W,3], or None (caller falls
    back to PIL for non-JPEG/odd files).

    ``target``: largest model dimension the caller will resize to. When the
    source is larger, DCT-domain scale_denom 2/4/8 decodes directly at
    reduced resolution — decode cost drops with the pixel count, and the
    pipeline's bilinear resize runs on far fewer pixels too. The chosen
    scale keeps the decoded image >= target so downstream quality is the
    same as decode-then-resize (serving hot path: one CPU, PIL decode
    ~7 ms/640px image vs ~114 ms device compute per batch-32)."""
    lib = _load_library()
    if not lib or len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.iqc_jpeg_info(buf, len(data), ctypes.byref(w), ctypes.byref(h)):
        return None
    scale = 1
    if target > 0:
        while scale < 8 and min(w.value, h.value) // (scale * 2) >= target:
            scale *= 2
    ow = (w.value + scale - 1) // scale
    oh = (h.value + scale - 1) // scale
    out = np.empty(((oh + 1) * (ow + 1) * 3,), np.uint8)
    c = ctypes.c_int()
    rc = lib.iqc_jpeg_decode(
        buf, len(data), scale,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.nbytes,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(c),
    )
    if rc or c.value != 3:
        return None
    return out[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()
