from spectre_tpu.utils.debug import (
    check_finite,
    deterministic_mode,
    enable_nan_checks,
)
from spectre_tpu.utils.metrics import MetricsWriter, experiment_name
from spectre_tpu.utils.summary import format_summary, model_summary

__all__ = [
    "MetricsWriter", "experiment_name",
    "check_finite", "deterministic_mode", "enable_nan_checks",
    "model_summary", "format_summary",
]
