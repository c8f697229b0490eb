"""Analytics: statistical process control + anomaly scoring (SURVEY.md L2)."""

from iqc_tpu.analytics.spc import SPCAnalyzer  # noqa: F401
from iqc_tpu.analytics.anomaly import AnomalyDetector  # noqa: F401
