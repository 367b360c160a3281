"""Native C++ EXR writer (native/exr_writer.cpp) vs the Python writer.

The native writer mirrors the reference's native OpenEXR output path
(reference: src/write.hpp:9-26); both implementations here target the
identical byte layout (EXR 2.0 scanline, compression NONE, half ABGR
planar), so output files must be byte-identical for the same image.
"""

import numpy as np
import pytest

from drt_tpu.utils.image import read_exr, write_exr
from drt_tpu.utils.native import exr_writer


@pytest.fixture()
def img():
    rng = np.random.default_rng(0)
    a = rng.uniform(0.0, 4.0, size=(17, 23, 3)).astype(np.float32)
    a[0, 0] = [0.0, 1e-8, 65504.0]  # zero, subnormal-ish, half-max
    return a


def test_native_writer_builds_and_matches_python(tmp_path, img):
    lib = exr_writer()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    p_native = tmp_path / "native.exr"
    p_python = tmp_path / "python.exr"

    import ctypes
    buf = np.ascontiguousarray(img)
    rc = lib.drt_write_exr(str(p_native).encode(),
                           buf.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_float)),
                           img.shape[1], img.shape[0])
    assert rc == 0

    # Force the pure-Python path by writing RGBA (native handles RGB only).
    rgba = np.concatenate([img, np.ones((*img.shape[:2], 1), np.float32)],
                          axis=2)
    write_exr(str(p_python), rgba)

    assert p_native.read_bytes() == p_python.read_bytes()


def test_native_roundtrip(tmp_path, img):
    if exr_writer() is None:
        pytest.skip("no C++ toolchain available")
    p = tmp_path / "rt.exr"
    write_exr(str(p), img)  # dispatches to the native writer for RGB
    back = read_exr(str(p))
    np.testing.assert_allclose(back[:, :, :3],
                               img.astype(np.float16).astype(np.float32),
                               rtol=0, atol=0)
    assert (back[:, :, 3] == 1.0).all()
