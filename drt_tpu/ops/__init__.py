from drt_tpu.ops import vecmath, intersect, bxdf

__all__ = ["vecmath", "intersect", "bxdf"]
