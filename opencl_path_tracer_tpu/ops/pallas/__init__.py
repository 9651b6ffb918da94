from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    pallas_first_intersect, make_pallas_intersect, make_mxu_intersect,
    pack_rays,
)

__all__ = [
    "pallas_first_intersect", "make_pallas_intersect",
    "make_mxu_intersect", "pack_rays",
]
