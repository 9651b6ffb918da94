from opencl_path_tracer_tpu.models import megakernel as megakernel

__all__ = ["megakernel"]
