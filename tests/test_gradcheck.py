"""Gradient-image + gradient-check facilities (the reference's headline
validation artifact, README.md:138-145: per-pixel d(pixel)/d(wall albedo)
by reverse mode, checked against the dual-number forward-mode render)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from drt_tpu.config import RenderConfig
from drt_tpu.gradcheck import check_gradients, grad_image, grad_image_fwd
from drt_tpu.models import cbox


def test_grad_image_backprop_equals_jvp():
    """Radiative-backprop gradient image == forward-mode (dual-number)
    gradient image, per pixel, for an albedo row and an emission row."""
    scene, params, cam = cbox.build(dtype=jnp.float64)
    cfg = RenderConfig(width=10, height=8, spp=6, max_depth=6)
    key = jax.random.key(3)
    for param in ("albedo:0", "emission:0"):
        g_bp = np.asarray(grad_image(scene, cam, cfg, params, key, param))
        g_fw = np.asarray(grad_image_fwd(scene, cam, cfg, params, key,
                                         param))
        assert np.abs(g_fw).max() > 1e-3, param  # non-trivial signal
        np.testing.assert_allclose(g_bp, g_fw, rtol=1e-9, atol=1e-12)


def test_grad_image_chunked_and_split_lanes():
    """spp chunking and bsdf_samples splitting both preserve the
    backprop == jvp identity."""
    scene, params, cam = cbox.build(dtype=jnp.float64)
    key = jax.random.key(5)
    for cfg in (RenderConfig(width=6, height=4, spp=4, max_depth=4,
                             spp_chunks=2),
                RenderConfig(width=6, height=4, spp=2, max_depth=3,
                             bsdf_samples=2)):
        g_bp = np.asarray(grad_image(scene, cam, cfg, params, key))
        g_fw = np.asarray(grad_image_fwd(scene, cam, cfg, params, key))
        np.testing.assert_allclose(g_bp, g_fw, rtol=1e-9, atol=1e-12)


def test_check_gradients_utility():
    scene, params, cam = cbox.build(dtype=jnp.float64)
    cfg = RenderConfig(width=6, height=4, spp=4, max_depth=6)
    results = check_gradients(scene, cam, cfg, params, jax.random.key(0),
                              n_directions=3, rtol=1e-8)
    assert len(results) == 3
    assert any(abs(d) > 1e-3 for d, _ in results)


def test_check_gradients_rejects_unbiased():
    import pytest

    scene, params, cam = cbox.build(dtype=jnp.float64)
    cfg = RenderConfig(width=4, height=4, spp=2, max_depth=3,
                       unbiased=True)
    with pytest.raises(ValueError):
        check_gradients(scene, cam, cfg, params, jax.random.key(0))


def test_grad_image_param_parsing():
    import pytest

    scene, params, cam = cbox.build(dtype=jnp.float64)
    cfg = RenderConfig(width=4, height=4, spp=2, max_depth=3)
    with pytest.raises(ValueError):
        grad_image(scene, cam, cfg, params, jax.random.key(0), "roughness:0")
    with pytest.raises(ValueError):
        grad_image(scene, cam, cfg, params, jax.random.key(0), "albedo:99")
