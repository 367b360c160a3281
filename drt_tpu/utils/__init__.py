from drt_tpu.utils import image, logging, profiling

__all__ = ["image", "logging", "profiling"]
