from fsr_tpu.utils import image, profiling

__all__ = ["image", "profiling"]
