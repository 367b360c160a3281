"""Sanitizer utilities (drt_tpu/utils/debug.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from drt_tpu.config import RenderConfig
from drt_tpu.models import cbox
from drt_tpu.renderer import trace_rays
from drt_tpu.utils.debug import assert_finite, checked, validate_scene
from drt_tpu.camera import camera_rays, pixel_grid
import jax


def test_checked_flags_nan():
    def f(x):
        return jnp.log(x)  # NaN for negative input

    with pytest.raises(Exception):
        checked(f)(jnp.asarray([-1.0]))
    out = checked(f)(jnp.asarray([1.0]))
    assert float(out[0]) == 0.0


def test_radiance_is_nan_clean():
    """The masked wavefront must not leak NaN/Inf through live lanes
    (dead-lane inf/NaN is sanitized before entering throughput,
    renderer.py _bounce). Full-depth trace checked host-side; checkify
    over the whole scan is prohibitively slow to compile, so the checked()
    wrapper is validated on small functions above."""
    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=4, height=4, spp=2, max_depth=6)
    xy = jnp.repeat(pixel_grid(4, 4), 2, axis=0)
    cu = jax.random.uniform(jax.random.key(0), (32, 2), dtype=jnp.float32)
    o, d, _ = camera_rays(cam, 4, 4, xy, cu)
    L = trace_rays(params, scene, o, d, jax.random.key(1), cfg)
    assert_finite({"L": [L.x, L.y, L.z]}, "radiance")


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.asarray([1.0, jnp.nan])}, "params")


def test_validate_scene_passes_on_cbox():
    scene, params, _ = cbox.build(dtype=jnp.float32)
    validate_scene(scene, params)


def test_validate_scene_catches_bad_index():
    scene, params, _ = cbox.build(dtype=jnp.float32)
    bad = scene._replace(shape_mat=scene.shape_mat + 100)
    with pytest.raises(IndexError):
        validate_scene(bad, params)
