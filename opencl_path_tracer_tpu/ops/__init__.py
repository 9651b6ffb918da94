from opencl_path_tracer_tpu.ops import rng as rng
from opencl_path_tracer_tpu.ops import tonemap as tonemap
from opencl_path_tracer_tpu.ops import raygen as raygen
from opencl_path_tracer_tpu.ops import intersect as intersect
from opencl_path_tracer_tpu.ops import bsdf as bsdf
from opencl_path_tracer_tpu.ops import shading as shading

__all__ = ["rng", "tonemap", "raygen", "intersect", "bsdf", "shading"]
