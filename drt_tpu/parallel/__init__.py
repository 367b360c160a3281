from drt_tpu.parallel import mesh, multihost

__all__ = ["mesh", "multihost"]
