from drt_tpu.utils import image, logging, profiling, debug, native

__all__ = ["image", "logging", "profiling", "debug", "native"]
