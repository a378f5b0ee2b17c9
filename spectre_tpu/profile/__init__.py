from spectre_tpu.profile.parser import ProfilerParser
from spectre_tpu.profile.tracer import trace_step

__all__ = ["ProfilerParser", "trace_step"]
