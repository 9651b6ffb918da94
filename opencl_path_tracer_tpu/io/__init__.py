from opencl_path_tracer_tpu.io.obj import load_obj, Attrib, Shape, MtlMaterial
from opencl_path_tracer_tpu.io.image import write_png, read_png
from opencl_path_tracer_tpu.io.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "load_obj", "Attrib", "Shape", "MtlMaterial",
    "write_png", "read_png",
    "save_checkpoint", "load_checkpoint",
]
