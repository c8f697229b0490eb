"""Cross-cutting utilities: logging, tracing/profiling, seeding."""

from iqc_tpu.utils.logging_config import configure_logging  # noqa: F401
from iqc_tpu.utils.tracing import profile_trace, stage_timer, StageTimes  # noqa: F401
from iqc_tpu.train.utils import set_global_seed  # noqa: F401
