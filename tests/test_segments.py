"""Segmented wavefront kernels + inter-segment compaction (tape mode).

With identical per-(ray, bounce) uniforms, splitting the bounce loop into
segments and compacting dead rays between them is exactly the unsplit
estimator (compaction only permutes lanes), and the segment adjoints
stitched through the boundary suffix radiance S reproduce the full
parameter gradients.
"""

import numpy as np

import jax
import jax.numpy as jnp

from drt_tpu.adjoint import _param_grads
from drt_tpu.camera import camera_rays, pixel_grid
from drt_tpu.config import RenderConfig
from drt_tpu.models import cbox
from drt_tpu.ops.megakernel import (make_fused_segment_adjoint,
                                    make_fused_segment_tracer)
from drt_tpu.ops.vecmath import V3
from drt_tpu.renderer import trace_rays
from drt_tpu.scene import albedo_table, emission_table

W, H, SPP, D, B0 = 16, 8, 8, 5, 2
N = W * H * SPP
K = 640  # compacted capacity (multiple of the 128-lane tile)


def _setup(seed=0):
    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=W, height=H, spp=SPP, max_depth=D)
    xy = jnp.tile(pixel_grid(W, H), (SPP, 1))  # spp-outer order
    cam_u = jax.random.uniform(jax.random.key(seed), (N, 2),
                               dtype=jnp.float32)
    o, d, _ = camera_rays(cam, W, H, xy, cam_u)
    tape = jax.random.uniform(jax.random.key(seed + 1), (D, 3, N),
                              dtype=jnp.float32)
    return scene, params, cam, cfg, cam_u, o, d, tape


def _compact(state, tape_b, g=None):
    """nonzero+gather compaction with a pad slot absorbing fill dups."""
    alive = state[9]
    idx = jnp.nonzero(alive > 0, size=K, fill_value=N)[0]
    gstate = [jnp.pad(c, (0, 1))[idx] for c in state]
    tape_g = jnp.pad(tape_b, ((0, 0), (0, 0), (0, 1)))[:, :, idx]
    out = (idx, gstate, tape_g)
    if g is not None:
        out += ([jnp.pad(c, (0, 1))[idx] for c in (g.x, g.y, g.z)],)
    return out


def test_split_forward_equals_unsplit():
    scene, params, cam, cfg, cam_u, o, d, tape = _setup()
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)
    L_ref = trace_rays(params, scene, o, d, None, cfg, tape=tape)

    segA = make_fused_segment_tracer(scene, cam, cfg, 0, B0,
                                     tile_rows=1, rng="tape",
                                     interpret=True)
    segB = make_fused_segment_tracer(scene, cam, cfg, B0, D, n_rays=K,
                                     tile_rows=1, rng="tape",
                                     interpret=True)
    L_A, state = segA(alb, emi, cam_u.T, tape[:B0])
    n_alive = int(np.asarray(state[9] > 0).sum())
    assert 0 < n_alive < N and n_alive <= K  # compaction is non-trivial
    idx, gstate, tape_g = _compact(state, tape[B0:])
    L_B = segB(alb, emi, tape_g, *gstate)

    for c_ref, c_a, c_b in zip(L_ref, L_A, L_B):
        full = jnp.zeros(N + 1, jnp.float32).at[idx].add(c_b)[:N] + c_a
        np.testing.assert_allclose(np.asarray(full), np.asarray(c_ref),
                                   rtol=2e-5, atol=2e-6)


def test_split_adjoint_equals_unsplit():
    scene, params, cam, cfg, cam_u, o, d, tape = _setup(seed=5)
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)
    g = V3(*jax.random.uniform(jax.random.key(11), (3, N),
                               dtype=jnp.float32))
    _, res = trace_rays(params, scene, o, d, None, cfg, tape=tape,
                        collect=True)
    gp = _param_grads(params, scene, res, g, jnp.float32)

    segA = make_fused_segment_tracer(scene, cam, cfg, 0, B0, tile_rows=1,
                                     rng="tape", interpret=True)
    adjA = make_fused_segment_adjoint(scene, cam, cfg, 0, B0, tile_rows=1,
                                      rng="tape", interpret=True)
    adjB = make_fused_segment_adjoint(scene, cam, cfg, B0, D, n_rays=K,
                                      tile_rows=1, rng="tape",
                                      interpret=True)

    _, state = segA(alb, emi, cam_u.T, tape[:B0])
    idx, gstate, tape_g, g_c = _compact(state, tape[B0:], g)
    daB, deB, S = adjB(alb, emi, tape_g, *gstate, *g_c)
    S_full = [jnp.zeros(N + 1, jnp.float32).at[idx].set(c)[:N]
              for c in S]
    daA, deA = adjA(alb, emi, cam_u.T, tape[:B0], g.x, g.y, g.z, *S_full)

    k = gp.albedo.shape[0]
    l = gp.emission.shape[0]
    np.testing.assert_allclose(np.asarray(daA + daB)[:k],
                               np.asarray(gp.albedo),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(deA + deB)[:l],
                               np.asarray(gp.emission),
                               rtol=1e-4, atol=1e-5)


def test_compacted_image_renderer_structure():
    """Image-level compaction glue (nonzero/gather/scatter + custom VJP
    chaining) compiles and runs on CPU. Interpret-mode PRNG yields zero
    uniforms (all rays RR-absorbed past min_bounces), so values aren't
    asserted — on-chip value checks: 0.999 pixel correlation vs the
    unsplit renderer and FD gradients to 5e-5 (docs/KERNELS.md)."""
    from drt_tpu.fused import (make_compacted_image_renderer,
                               seeds_from_key)

    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=16, height=8, spp=4, max_depth=4,
                       spp_chunks=2)
    render = make_compacted_image_renderer(scene, cam, cfg, splits=(2,),
                                           tile_rows=1)
    seeds = seeds_from_key(jax.random.key(0))
    img = render(params, seeds)
    assert img.shape == (8, 16, 3)
    assert np.isfinite(np.asarray(img)).all()
    g = jax.grad(lambda p: render(p, seeds).sum())(params)
    assert np.isfinite(np.asarray(g.albedo)).all()

    import pytest

    cfg_u = RenderConfig(width=16, height=8, spp=4, max_depth=4,
                         unbiased=True)
    with pytest.raises(ValueError):
        make_compacted_image_renderer(scene, cam, cfg_u)
