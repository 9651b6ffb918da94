"""TPU-native progressive path tracer.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
zotya701/OpenCL_Path_tracer (an OpenCL megakernel progressive path tracer,
see /root/reference: main.cpp + prog.cl). This is NOT a port: the compute
path is vectorized SPMD over pixel/ray batches (VPU/MXU friendly), the
acceleration structure is a jittable LBVH (plus a reference-parity host
midpoint tree), and multi-chip scale-out uses jax.sharding meshes with
psum accumulation over ICI instead of a single-device work-item grid.

Public surface (mirrors what a user of the reference needs):
  - scene:    Scene builder (add_material/add_triangle/add_obj/end_obj),
              built-in scene library (Cornell box, reference default scene)
  - io:       OBJ/MTL loader (incl. custom Kn/Kk/Tp keys), PNG I/O,
              checkpoint save/resume of progressive render state
  - models:   megakernel (reference-math parity) and wavefront renderers
  - ops:      raygen, intersection, BSDF, RNG, tonemap, median filter
  - accel:    midpoint AABB tree (parity) and LBVH (jittable)
  - parallel: device mesh helpers, sample/tile-sharded progressive render
  - runtime:  progressive render engine, camera controller, perf meter
"""

from opencl_path_tracer_tpu import config as config
from opencl_path_tracer_tpu.version import __version__

__all__ = ["__version__", "config"]
