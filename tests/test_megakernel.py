"""Pallas megakernel vs the XLA wavefront path (interpret mode on CPU).

The megakernels (drt_tpu/ops/megakernel.py) consume the same uniform tape
layout as `trace_rays(..., tape=...)`, so forward radiance and adjoint
parameter gradients must agree with the XLA path to f32 rounding. On real
TPU the kernels compile natively; these tests exercise the identical
kernel body through the Pallas interpreter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drt_tpu.adjoint import _param_grads
from drt_tpu.camera import camera_rays, pixel_grid
from drt_tpu.config import RenderConfig
from drt_tpu.models import cbox
from drt_tpu.ops.megakernel import make_pallas_adjoint, make_pallas_tracer
from drt_tpu.ops.vecmath import V3
from drt_tpu.renderer import trace_rays
from drt_tpu.scene import SceneBuilder, albedo_table, emission_table


def _rays_and_tape(cfg, cam, n, seed=0):
    xy = pixel_grid(cfg.width, cfg.height)
    reps = -(-n // xy.shape[0])
    xy = jnp.tile(xy, (reps, 1))[:n]
    u_cam = jax.random.uniform(jax.random.key(seed), (n, 2),
                               dtype=jnp.float32)
    o, d, _ = camera_rays(cam, cfg.width, cfg.height, xy, u_cam)
    tape = jax.random.uniform(jax.random.key(seed + 1),
                              (cfg.max_depth, 3, n), dtype=jnp.float32)
    return o, d, tape


@pytest.mark.parametrize("n", [300, 1024])  # non-multiple + exact tile
def test_forward_matches_xla_path(n):
    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=4)
    o, d, tape = _rays_and_tape(cfg, cam, n)

    L_ref = trace_rays(params, scene, o, d, None, cfg, tape=tape)
    tracer = make_pallas_tracer(scene, cfg, tile_rows=8, interpret=True)
    L_pal = tracer(albedo_table(scene, params),
                   emission_table(scene, params), o, d, tape)
    ra = np.stack([np.asarray(c) for c in L_ref])
    pa = np.stack([np.asarray(c) for c in L_pal])
    assert ra.mean() > 0  # scene actually lights up
    np.testing.assert_allclose(pa, ra, rtol=2e-5, atol=2e-6)


def test_adjoint_matches_xla_param_grads():
    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=4)
    n = 777
    o, d, tape = _rays_and_tape(cfg, cam, n)
    g = V3(*jax.random.uniform(jax.random.key(7), (3, n),
                               dtype=jnp.float32))

    _, res = trace_rays(params, scene, o, d, None, cfg, tape=tape,
                        collect=True)
    gp = _param_grads(params, scene, res, g, jnp.float32)

    adj = make_pallas_adjoint(scene, cfg, tile_rows=8, interpret=True)
    da, de = adj(albedo_table(scene, params),
                 emission_table(scene, params), o, d, tape, g)
    k = gp.albedo.shape[0]
    l = gp.emission.shape[0]
    np.testing.assert_allclose(np.asarray(da)[:k], np.asarray(gp.albedo),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(de)[:l], np.asarray(gp.emission),
                               rtol=1e-4, atol=1e-5)


def test_forward_specular_mirror_triangle_scene():
    """Exercises the specular, mirror, and triangle kernel branches the
    cbox scene never hits."""
    b = SceneBuilder()
    white = b.albedo_param([0.6, 0.6, 0.6])
    glossy = b.albedo_param([0.4, 0.5, 0.6])
    emission = b.emission_param([2.0, 1.5, 1.0])
    b.plane([0.0, 1.0, 0.0], -1.0, b.specular(glossy, 10.0))
    b.sphere([0.0, 0.0, 3.0], 1.0, b.mirror())
    b.triangle([-2.0, -0.5, 2.0], [2.0, -0.5, 2.0], [0.0, 2.0, 2.5],
               b.diffuse(white))
    b.sphere([0.0, 3.0, 3.0], 1.0, None, emission)
    scene, params = b.build(jnp.float32)
    from drt_tpu.camera import look_at
    cam = look_at([0.0, 0.0, 0.0], [0.0, 0.0, 1.0], dtype=jnp.float32)
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=3)
    n = 512
    o, d, tape = _rays_and_tape(cfg, cam, n, seed=3)

    L_ref = trace_rays(params, scene, o, d, None, cfg, tape=tape)
    tracer = make_pallas_tracer(scene, cfg, tile_rows=4, interpret=True)
    L_pal = tracer(albedo_table(scene, params),
                   emission_table(scene, params), o, d, tape)
    ra = np.stack([np.nan_to_num(np.asarray(c)) for c in L_ref])
    pa = np.stack([np.nan_to_num(np.asarray(c)) for c in L_pal])
    np.testing.assert_allclose(pa, ra, rtol=5e-5, atol=1e-5)


@pytest.mark.parametrize("build", ["glossy", "tri"])
def test_fastmath_kernel_matches_exact_statistically(build):
    """The fast-math kernel rewrites (hardware rsqrt, algebraically
    cancelled s*cos/pdf quotients, *0.5 root halving, ratio-carry
    divide-free nearest-hit) preserve the estimator: tape-mode fastmath
    vs exact tracer on the glossy scene (diffuse + specular + mirror)
    and the triangle scene, loose f32 tolerance (the production
    internal-RNG path is only statistically pinned anyway)."""
    from drt_tpu.models import gallery
    from drt_tpu.ops.megakernel import make_fused_tracer

    builder = {"glossy": gallery.build_glossy,
               "tri": gallery.build_tri}[build]
    scene, params, cam = builder(dtype=jnp.float32)
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=4)
    n = 8 * 8 * 2
    cam_u = jax.random.uniform(jax.random.key(0), (2, n),
                               dtype=jnp.float32)
    tape = jax.random.uniform(jax.random.key(1), (cfg.max_depth, 3, n),
                              dtype=jnp.float32)
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)
    exact = make_fused_tracer(scene, cam, cfg, tile_rows=8, rng="tape",
                              interpret=True, n_rays=n)
    fast = make_fused_tracer(scene, cam, cfg, tile_rows=8, rng="tape",
                             interpret=True, n_rays=n, fastmath=True)
    L_e = np.stack([np.asarray(c) for c in
                    exact(alb, emi, cam_u, tape)])
    L_f = np.stack([np.asarray(c) for c in
                    fast(alb, emi, cam_u, tape)])
    assert L_e.mean() > 0
    np.testing.assert_allclose(L_f, L_e, rtol=2e-3, atol=1e-4)
