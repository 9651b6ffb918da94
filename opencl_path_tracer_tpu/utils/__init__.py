from opencl_path_tracer_tpu.utils.profiling import (
    trace_profile, device_timer,
)
from opencl_path_tracer_tpu.utils.logging import get_logger
from opencl_path_tracer_tpu.utils.determinism import check_deterministic

__all__ = ["trace_profile", "device_timer", "get_logger",
           "check_deterministic"]
