"""Native (C++) serving runtime with pure-Python fallbacks."""

from iqc_tpu.runtime.native import (  # noqa: F401
    BatchQueue,
    LatencyHistogram,
    NativeRateLimiter,
    native_available,
)
