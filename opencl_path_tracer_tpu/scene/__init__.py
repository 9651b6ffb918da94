from opencl_path_tracer_tpu.scene.builder import SceneBuilder, Scene
from opencl_path_tracer_tpu.scene import library as library

__all__ = ["SceneBuilder", "Scene", "library"]
