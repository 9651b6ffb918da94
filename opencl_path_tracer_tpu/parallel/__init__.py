from opencl_path_tracer_tpu.parallel.mesh import (
    describe_devices, make_render_mesh,
)
from opencl_path_tracer_tpu.parallel.shard import (
    make_tiled_step, make_tiled_wavefront_step,
    make_sample_sharded_render, gather_colors,
)

__all__ = [
    "describe_devices",
    "make_render_mesh",
    "make_tiled_step",
    "make_tiled_wavefront_step",
    "make_sample_sharded_render",
    "gather_colors",
]
