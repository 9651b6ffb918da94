from opencl_path_tracer_tpu.core.types import Rays, Hits
from opencl_path_tracer_tpu.core.geometry import (
    TrianglesSoA,
    rotate_x,
    rotate_y,
    rotate_z,
    triangle_normals,
)
from opencl_path_tracer_tpu.core.materials import (
    MaterialsSoA,
    MaterialType,
    make_material,
    conductor_f0,
)
from opencl_path_tracer_tpu.core.camera import Camera, make_camera
from opencl_path_tracer_tpu.core.spheres import SpheresSoA

__all__ = [
    "SpheresSoA",
    "Rays",
    "Hits",
    "TrianglesSoA",
    "rotate_x",
    "rotate_y",
    "rotate_z",
    "triangle_normals",
    "MaterialsSoA",
    "MaterialType",
    "make_material",
    "conductor_f0",
    "Camera",
    "make_camera",
]
