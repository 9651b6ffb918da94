from opencl_path_tracer_tpu.accel.types import BVH
from opencl_path_tracer_tpu.accel.median_tree import build_median_tree
from opencl_path_tracer_tpu.accel.lbvh import build_lbvh
from opencl_path_tracer_tpu.accel.traverse import make_bvh_intersect

__all__ = [
    "BVH", "build_median_tree", "build_lbvh", "make_bvh_intersect",
]
