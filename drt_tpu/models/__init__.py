from drt_tpu.models import cbox

__all__ = ["cbox"]
