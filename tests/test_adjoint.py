"""Gradient validation of the radiative-backprop custom VJP.

Strategy (SURVEY.md §4 "Gradient"):
  1. biased mode (key replay) must equal `jax.grad` of the forward
     estimator — the same identity the reference's biased integrate mode
     satisfies by construction (integrate.hpp:26-37);
  2. finite differences on a *fixed injected tape* (a deterministic
     function) must match;
  3. unbiased mode (fresh keys) must agree in expectation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drt_tpu.adjoint import make_diff_renderer
from drt_tpu.camera import camera_rays, pixel_grid
from drt_tpu.config import RenderConfig
from drt_tpu.models import cbox
from drt_tpu.renderer import trace_rays
from drt_tpu.scene import Params
import reference_impl as ref
from drt_tpu.ops.vecmath import V3


def vsum(v):
    return v.x.sum() + v.y.sum() + v.z.sum()


def _setup(width=8, height=6, spp=4, max_depth=12, seed=0,
           dtype=jnp.float64):
    full, trunc, tape = ref.render_mirror(width, height, spp,
                                          max_depth=max_depth, seed=seed)
    scene, params, cam = cbox.build(dtype=dtype)
    cfg = RenderConfig(width=width, height=height, spp=spp,
                       max_depth=max_depth)
    xy = jnp.repeat(pixel_grid(width, height), spp, axis=0)
    o, d, _ = camera_rays(cam, width, height, xy,
                          jnp.asarray(tape.cam_u, dtype))
    tape3 = jnp.asarray(tape.bounce_u.transpose(0, 2, 1), dtype)
    return scene, params, cfg, o, d, tape3


def test_custom_vjp_equals_jax_grad_tape():
    scene, params, cfg, o, d, tape = _setup()
    diff = make_diff_renderer(scene, cfg, use_tape=True)

    def loss_custom(p):
        return vsum(diff(p, o, d, tape))

    def loss_ad(p):
        return vsum(trace_rays(p, scene, o, d, None, cfg, tape=tape))

    g_custom = jax.grad(loss_custom)(params)
    g_ad = jax.grad(loss_ad)(params)
    np.testing.assert_allclose(g_custom.albedo, g_ad.albedo, rtol=1e-10)
    np.testing.assert_allclose(g_custom.emission, g_ad.emission, rtol=1e-10)
    # gradients are non-trivial
    assert np.abs(np.asarray(g_custom.albedo)).max() > 0.1
    assert np.abs(np.asarray(g_custom.emission)).max() > 0.1


def test_custom_vjp_equals_jax_grad_key_mode():
    scene, params, cfg, o, d, _ = _setup()
    key = jax.random.key(123)
    rng = jax.random.key_data(key)
    diff = make_diff_renderer(scene, cfg)

    def loss_custom(p):
        return vsum(diff(p, o, d, rng))

    def loss_ad(p):
        return vsum(trace_rays(p, scene, o, d, key, cfg))

    g_custom = jax.grad(loss_custom)(params)
    g_ad = jax.grad(loss_ad)(params)
    np.testing.assert_allclose(g_custom.albedo, g_ad.albedo, rtol=1e-10)
    np.testing.assert_allclose(g_custom.emission, g_ad.emission, rtol=1e-10)


def test_finite_differences_tape():
    scene, params, cfg, o, d, tape = _setup(width=6, height=4, spp=2)
    diff = make_diff_renderer(scene, cfg, use_tape=True)

    def loss(p):
        return vsum(diff(p, o, d, tape))

    g = jax.grad(loss)(params)
    eps = 1e-6
    for (pname, row, col) in [("albedo", 0, 0), ("albedo", 2, 1),
                              ("emission", 0, 2)]:
        arr = getattr(params, pname)
        bump = arr.at[row, col].add(eps)
        p_plus = params._replace(**{pname: bump})
        bump = arr.at[row, col].add(-eps)
        p_minus = params._replace(**{pname: bump})
        fd = (loss(p_plus) - loss(p_minus)) / (2 * eps)
        np.testing.assert_allclose(getattr(g, pname)[row, col], fd,
                                   rtol=1e-5)


def test_per_ray_cotangents():
    """Non-uniform upstream cotangent: grad of weighted sum must equal the
    weighted combination of per-ray gradients."""
    scene, params, cfg, o, d, tape = _setup(width=4, height=3, spp=2)
    diff = make_diff_renderer(scene, cfg, use_tape=True)
    w = V3.from_array(jnp.asarray(
        np.random.default_rng(5).normal(size=(o.x.shape[0], 3))))

    def loss_custom(p):
        return vsum(diff(p, o, d, tape) * w)

    def loss_ad(p):
        return vsum(trace_rays(p, scene, o, d, None, cfg, tape=tape) * w)

    g_custom = jax.grad(loss_custom)(params)
    g_ad = jax.grad(loss_ad)(params)
    np.testing.assert_allclose(g_custom.albedo, g_ad.albedo, rtol=1e-10)
    np.testing.assert_allclose(g_custom.emission, g_ad.emission, rtol=1e-10)


def test_image_renderer_grads_match_jax_grad():
    """The chunked image-level custom VJP (chunk loop inside the VJP) must
    equal jax.grad of the unchunked forward render on the same keys."""
    import dataclasses
    from drt_tpu.adjoint import make_diff_image_renderer
    from drt_tpu.renderer import render_image
    from drt_tpu.models import cbox as cbox_m

    scene, params, cam = cbox_m.build(dtype=jnp.float64)
    cfg1 = RenderConfig(width=8, height=6, spp=4, max_depth=8, spp_chunks=1)
    cfg4 = dataclasses.replace(cfg1, spp_chunks=4)
    key = jax.random.key(11)
    rng = jax.random.key_data(key)
    w = jnp.asarray(np.random.default_rng(3).normal(size=(6, 8, 3)))

    for cfg in (cfg1, cfg4):
        diff = make_diff_image_renderer(scene, cam, cfg)

        def loss_custom(p):
            return (diff(p, rng) * w).sum()

        def loss_ad(p):
            return (render_image(p, scene, cam, key, cfg) * w).sum()

        img_c = diff(params, rng)
        img_a = render_image(params, scene, cam, key, cfg)
        np.testing.assert_allclose(img_c, img_a, rtol=1e-12)
        g_c = jax.grad(loss_custom)(params)
        g_a = jax.grad(loss_ad)(params)
        np.testing.assert_allclose(g_c.albedo, g_a.albedo, rtol=1e-9)
        np.testing.assert_allclose(g_c.emission, g_a.emission, rtol=1e-9)


def test_unbiased_mode_agrees_in_expectation():
    """Fresh-key adjoint (reference: integrate.hpp:11-24) is a different
    estimator; averaged over many keys it must approach the biased-replay
    gradient of the converged estimator."""
    import dataclasses
    scene, params, cfg0, o, d, _ = _setup(width=4, height=3, spp=8)
    cfg_u = dataclasses.replace(cfg0, unbiased=True)
    diff_u = make_diff_renderer(scene, cfg_u)
    diff_b = make_diff_renderer(scene, cfg0)

    def g_of(diff, seed):
        rng = jax.random.key_data(jax.random.key(seed))
        return jax.grad(lambda p: vsum(diff(p, o, d, rng)))(params)

    n_trials = 60
    gu = [g_of(diff_u, s) for s in range(n_trials)]
    gb = [g_of(diff_b, s) for s in range(n_trials)]
    mean_u = np.mean([np.asarray(g.albedo) for g in gu], axis=0)
    mean_b = np.mean([np.asarray(g.albedo) for g in gb], axis=0)
    scale = np.abs(mean_b).max()
    np.testing.assert_allclose(mean_u, mean_b, atol=0.35 * scale)


def test_jvp_dual_number_ground_truth():
    """The reference validates reverse-mode grads against a forward-mode
    dual-number render (README.md:138-145, Dual<double> at
    src/render.cpp:22-23). TPU equivalent: jax.jvp through the tape-mode
    estimator is exactly that dual-number pass; for every tangent
    direction v, <vjp-grad, v> must equal the jvp tangent."""
    scene, params, cfg, o, d, tape = _setup(max_depth=6)
    diff = make_diff_renderer(scene, cfg, use_tape=True)

    def loss(p):
        return vsum(diff(p, o, d, tape))

    def loss_ad(p):  # plain AD graph (no custom VJP) for the jvp pass
        return vsum(trace_rays(p, scene, o, d, None, cfg, tape=tape))

    grad = jax.grad(loss)(params)
    rng = np.random.default_rng(3)
    for _ in range(4):
        v = Params(
            albedo=jnp.asarray(rng.normal(size=params.albedo.shape)),
            emission=jnp.asarray(rng.normal(size=params.emission.shape)))
        _, tangent = jax.jvp(loss_ad, (params,), (v,))
        dot = (jnp.sum(grad.albedo * v.albedo)
               + jnp.sum(grad.emission * v.emission))
        np.testing.assert_allclose(float(dot), float(tangent),
                                   rtol=1e-9, atol=1e-12)
