from spectre_tpu.utils.metrics import MetricsWriter, experiment_name

__all__ = ["MetricsWriter", "experiment_name"]
