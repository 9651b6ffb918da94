from opencl_path_tracer_tpu.utils.profiling import (
    trace_profile, device_timer,
)
from opencl_path_tracer_tpu.utils.logging import get_logger

__all__ = ["trace_profile", "device_timer", "get_logger"]
