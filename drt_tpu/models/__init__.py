from drt_tpu.models import cbox, gallery

__all__ = ["cbox", "gallery"]
