from drt_tpu.ops import vecmath, intersect, bxdf, megakernel

__all__ = ["vecmath", "intersect", "bxdf", "megakernel"]
