from opencl_path_tracer_tpu.runtime.engine import RenderEngine
from opencl_path_tracer_tpu.runtime.controller import CameraController
from opencl_path_tracer_tpu.runtime.meter import PerfMeter

__all__ = ["RenderEngine", "CameraController", "PerfMeter"]
