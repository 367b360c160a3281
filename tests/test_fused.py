"""Fully-fused megakernel (in-kernel camera + uniform plumbing) vs the
XLA path, in tape mode on CPU (the TPU PRNG is not emulated by the Pallas
interpreter; internal-RNG mode is exercised on real TPU by
tests/test_fused.py::test_internal_rng_on_tpu and the bench)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drt_tpu.adjoint import _param_grads
from drt_tpu.camera import camera_rays
from drt_tpu.config import RenderConfig
from drt_tpu.models import cbox
from drt_tpu.ops.megakernel import make_fused_adjoint, make_fused_tracer
from drt_tpu.ops.vecmath import V3
from drt_tpu.camera import pixel_grid
from drt_tpu.renderer import trace_rays
from drt_tpu.scene import albedo_table, emission_table


def _setup(cfg, seed=0):
    scene, params, cam = cbox.build(dtype=jnp.float32)
    spp_c = cfg.spp // cfg.spp_chunks
    n = cfg.width * cfg.height * spp_c
    # spp-OUTER ray ordering (megakernel._camera_rays_static): ray i is
    # pixel i % (W*H), sample i // (W*H).
    xy = jnp.tile(pixel_grid(cfg.width, cfg.height), (spp_c, 1))
    cam_u = jax.random.uniform(jax.random.key(seed), (n, 2),
                               dtype=jnp.float32)
    o, d, _ = camera_rays(cam, cfg.width, cfg.height, xy, cam_u)
    tape = jax.random.uniform(jax.random.key(seed + 1),
                              (cfg.max_depth, 3, n), dtype=jnp.float32)
    return scene, params, cam, n, cam_u, o, d, tape


def test_fused_forward_camera_and_trace_match_xla():
    """In-kernel camera generation + wavefront == camera_rays + trace_rays
    bit-for-bit on the same uniform tape."""
    cfg = RenderConfig(width=8, height=6, spp=4, max_depth=3)
    scene, params, cam, n, cam_u, o, d, tape = _setup(cfg)

    L_ref = trace_rays(params, scene, o, d, None, cfg, tape=tape)
    tracer = make_fused_tracer(scene, cam, cfg, tile_rows=8, rng="tape",
                               interpret=True)
    L_pal = tracer(albedo_table(scene, params),
                   emission_table(scene, params), cam_u.T, tape)
    ra = np.stack([np.asarray(c) for c in L_ref])
    pa = np.stack([np.asarray(c) for c in L_pal])
    assert ra.mean() > 0
    np.testing.assert_allclose(pa, ra, rtol=2e-5, atol=2e-6)


def test_fused_adjoint_matches_xla_param_grads():
    cfg = RenderConfig(width=8, height=6, spp=4, max_depth=3)
    scene, params, cam, n, cam_u, o, d, tape = _setup(cfg, seed=4)
    g = V3(*jax.random.uniform(jax.random.key(9), (3, n),
                               dtype=jnp.float32))

    _, res = trace_rays(params, scene, o, d, None, cfg, tape=tape,
                        collect=True)
    gp = _param_grads(params, scene, res, g, jnp.float32)
    adj = make_fused_adjoint(scene, cam, cfg, tile_rows=8, rng="tape",
                             interpret=True)
    da, de = adj(albedo_table(scene, params),
                 emission_table(scene, params), cam_u.T, tape, g)
    k = gp.albedo.shape[0]
    l = gp.emission.shape[0]
    np.testing.assert_allclose(np.asarray(da)[:k], np.asarray(gp.albedo),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(de)[:l], np.asarray(gp.emission),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="TPU per-core PRNG is not emulated on CPU")
def test_internal_rng_on_tpu():
    """On real TPU: internal-RNG image agrees with the XLA renderer
    statistically, and the fused adjoint matches finite differences of
    the (deterministic, seeded) fused estimator."""
    from drt_tpu.renderer import render_image

    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=16, height=12, spp=64, max_depth=4)
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)
    seeds = jnp.asarray([123, 456], jnp.int32)

    tracer = make_fused_tracer(scene, cam, cfg, rng="internal")
    L = tracer(alb, emi, seeds)
    img_p = np.stack([np.asarray(c).reshape(12, 16, 64).mean(-1)
                      for c in L], -1)
    img_x = np.asarray(render_image(params, scene, cam, jax.random.key(0),
                                    cfg))
    assert abs(img_p.mean() - img_x.mean()) / img_x.mean() < 0.1

    adj = make_fused_adjoint(scene, cam, cfg, rng="internal")
    n = 16 * 12 * 64
    g1 = V3(jnp.ones(n), jnp.ones(n), jnp.ones(n))
    da, _ = adj(alb, emi, seeds, g1)

    def f(tab):
        L = tracer(tab, emi, seeds)
        return float((L.x + L.y + L.z).sum())

    eps = 1e-2
    alb_np = np.asarray(alb)
    ap = alb_np.copy()
    ap[0, 0] += eps
    am = alb_np.copy()
    am[0, 0] -= eps
    fd = (f(jnp.asarray(ap)) - f(jnp.asarray(am))) / (2 * eps)
    assert abs(float(da[0, 0]) - fd) / (abs(fd) + 1e-3) < 2e-2


def test_boundary_uniforms_stay_finite_and_agree():
    """Sampling-pdf singularity guards: uniforms of exactly 0 and 1
    (the reference's rand()/RAND_MAX spans [0, 1] inclusive) collapse
    the diffuse/specular pdfs to 0; the guarded estimator drops those
    samples (0, not 0/0 = NaN) identically in the XLA wavefront and the
    fused kernel. Regression for the on-chip NaN pixels found in round 2
    (specular scene, ~1e-6 of draws in f32)."""
    from drt_tpu.models import gallery

    scene, params, cam = gallery.build_glossy(dtype=jnp.float32)
    cfg = RenderConfig(width=8, height=6, spp=4, max_depth=4)
    n = cfg.width * cfg.height * cfg.spp
    rng = np.random.default_rng(0)
    u = rng.uniform(size=(cfg.max_depth, 3, n)).astype(np.float32)
    # Force boundary draws into every bounce's BSDF-sample slots.
    u[:, 1, ::7] = 1.0   # u1 = 1: diffuse cos=0, specular cos_h=1
    u[:, 1, 3::11] = 0.0  # u1 = 0: specular pdf 0
    u[:, 2, 5::13] = 0.0
    cam_u = rng.uniform(size=(n, 2)).astype(np.float32)
    xy = jnp.tile(pixel_grid(cfg.width, cfg.height), (cfg.spp, 1))
    o, d, _ = camera_rays(cam, cfg.width, cfg.height, xy,
                          jnp.asarray(cam_u))
    tape = jnp.asarray(u)

    L_ref = trace_rays(params, scene, o, d, None, cfg, tape=tape)
    ra = np.stack([np.asarray(c) for c in L_ref])
    assert np.isfinite(ra).all()

    tracer = make_fused_tracer(scene, cam, cfg, tile_rows=1, rng="tape",
                               interpret=True)
    L_pal = tracer(albedo_table(scene, params),
                   emission_table(scene, params),
                   jnp.asarray(cam_u.T), tape)
    pa = np.stack([np.asarray(c) for c in L_pal])
    assert np.isfinite(pa).all()
    np.testing.assert_allclose(pa, ra, rtol=2e-5, atol=2e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="TPU per-core PRNG is not emulated on CPU")
def test_gallery_scenes_finite_on_tpu():
    """Specular/mirror/triangle kernel branches on real Mosaic: many
    seeds, all pixels finite, statistics agree with the XLA renderer.
    (Round 2 found ~1e-6-probability NaN pixels here — the sampling-pdf
    singularity guards; keep this sweep as the canary.)"""
    from drt_tpu.fused import make_fused_image_renderer, seeds_from_key
    from drt_tpu.models import gallery
    from drt_tpu.renderer import render_image

    for build in (gallery.build_glossy, gallery.build_tri):
        scene, params, cam = build(dtype=jnp.float32)
        cfg = RenderConfig(width=64, height=48, spp=64, max_depth=5)
        render = make_fused_image_renderer(scene, cam, cfg)
        for s in range(8):
            img = np.asarray(render(params,
                                    seeds_from_key(jax.random.key(s))))
            assert np.isfinite(img).all(), (build.__name__, s)
        img_x = np.asarray(render_image(params, scene, cam,
                                        jax.random.key(4), cfg))
        rel = abs(img.mean() - img_x.mean()) / max(img_x.mean(), 1e-9)
        assert rel < 0.1, (build.__name__, rel)
        g = jax.jit(jax.grad(
            lambda p: render(p, seeds_from_key(jax.random.key(5)))
            .mean()))(params)
        assert np.isfinite(np.asarray(g.albedo)).all()


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="TPU per-core PRNG is not emulated on CPU")
def test_internal_unbiased_adjoint_on_tpu():
    """Fused unbiased adjoint (fresh bounce streams, integrate.hpp:39-52)
    on the real chip: for a LINEAR image functional the gradient
    expectation matches the biased adjoint's (SE-scaled bound over
    paired seeds) — for nonlinear losses the two legitimately differ by
    the gradient of the estimator's variance term — and
    adjoint_samples=4 cuts the gradient variance (integrate.hpp:15-19
    n_samples mean)."""
    import dataclasses

    from drt_tpu.fused import make_fused_image_renderer, seeds_from_key

    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg_b = RenderConfig(width=32, height=16, spp=16, max_depth=4)
    cfg_u = dataclasses.replace(cfg_b, unbiased=True)
    cfg_u4 = dataclasses.replace(cfg_b, unbiased=True, adjoint_samples=4)
    w_img = jnp.asarray(np.random.default_rng(0).uniform(
        0.5, 1.5, (16, 32, 3)), jnp.float32)

    def gfn(cfg):
        render = make_fused_image_renderer(scene, cam, cfg, tile_rows=8)
        return jax.jit(jax.grad(
            lambda p, s: (render(p, s) * w_img).sum()))

    g_b, g_u, g_u4 = (gfn(c) for c in (cfg_b, cfg_u, cfg_u4))

    def sample(g, seed):
        return np.asarray(g(params, seeds_from_key(jax.random.key(seed)))
                          .albedo)

    trials = 48
    gb = np.stack([sample(g_b, s) for s in range(trials)])
    gu = np.stack([sample(g_u, s) for s in range(trials)])
    gu4 = np.stack([sample(g_u4, s) for s in range(trials)])
    # Unbiased differs per seed (fresh backward streams)...
    assert np.abs(gu - gb).max() > 1e-6
    # ...but agrees in expectation, within 5 standard errors (9 entries
    # tested jointly; 4 SE per entry has a non-trivial familywise
    # false-positive rate).
    se = np.sqrt(gb.var(0) / trials + gu.var(0) / trials)
    np.testing.assert_array_less(np.abs(gu.mean(0) - gb.mean(0)),
                                 5.0 * se + 1e-8)
    # n=4 averages 4 independent retraces: variance drops clearly.
    assert gu4.var(0).mean() < 0.6 * gu.var(0).mean(), (
        gu.var(0).mean(), gu4.var(0).mean())


def test_tile_base_splits_are_consistent():
    """Two half-wavefront kernel calls with tile_base offsets must
    reproduce the single full-wavefront call exactly (the shard_map
    decomposition, megakernel n_rays/tile_base)."""
    cfg = RenderConfig(width=16, height=8, spp=8, max_depth=3)
    scene, params, cam, n, cam_u, o, d, tape = _setup(cfg, seed=6)
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)

    tile_rows = 1  # 128-ray tiles so n=1024 splits into 8 tiles
    full = make_fused_tracer(scene, cam, cfg, tile_rows=tile_rows,
                             rng="tape", interpret=True)
    L_full = full(alb, emi, cam_u.T, tape)

    half = n // 2
    half_tiles = half // 128
    part = make_fused_tracer(scene, cam, cfg, tile_rows=tile_rows,
                             rng="tape", interpret=True, n_rays=half)
    L0 = part(alb, emi, cam_u.T[:, :half], tape[:, :, :half], tile_base=0)
    L1 = part(alb, emi, cam_u.T[:, half:], tape[:, :, half:],
              tile_base=half_tiles)
    for cf, c0, c1 in zip(L_full, L0, L1):
        np.testing.assert_array_equal(np.asarray(cf[:half]), np.asarray(c0))
        np.testing.assert_array_equal(np.asarray(cf[half:]), np.asarray(c1))


def test_tile_base_adjoint_partials_sum_to_full():
    cfg = RenderConfig(width=16, height=8, spp=8, max_depth=3)
    scene, params, cam, n, cam_u, o, d, tape = _setup(cfg, seed=8)
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)
    g = V3(*jax.random.uniform(jax.random.key(11), (3, n),
                               dtype=jnp.float32))

    full = make_fused_adjoint(scene, cam, cfg, tile_rows=1, rng="tape",
                              interpret=True)
    da_f, de_f = full(alb, emi, cam_u.T, tape, g)

    half = n // 2
    part = make_fused_adjoint(scene, cam, cfg, tile_rows=1, rng="tape",
                              interpret=True, n_rays=half)
    gh0 = V3(g.x[:half], g.y[:half], g.z[:half])
    gh1 = V3(g.x[half:], g.y[half:], g.z[half:])
    da0, de0 = part(alb, emi, cam_u.T[:, :half], tape[:, :, :half], gh0,
                    tile_base=0)
    da1, de1 = part(alb, emi, cam_u.T[:, half:], tape[:, :, half:], gh1,
                    tile_base=half // 128)
    np.testing.assert_allclose(np.asarray(da0 + da1), np.asarray(da_f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(de0 + de1), np.asarray(de_f),
                               rtol=1e-5, atol=1e-6)


def test_sharded_fused_structure_on_virtual_mesh():
    """Sharded fused renderer under shard_map on a 4-device virtual mesh:
    validates specs/collectives/compile. (Interpret-mode PRNG yields
    zeros, so values are not asserted here — value parity is covered by
    the tile_base tests and the on-TPU mesh(1) check.)"""
    from jax.sharding import Mesh

    from drt_tpu.fused import (make_sharded_fused_image_renderer,
                               seeds_from_key)

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=64, height=32, spp=8, max_depth=2,
                       spp_chunks=2)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2),
                ("tiles", "spp"))
    render = make_sharded_fused_image_renderer(scene, cam, cfg, mesh,
                                               tile_rows=1)
    seeds = seeds_from_key(jax.random.key(0))
    img = render(params, seeds)
    assert img.shape == (32, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
    g = jax.grad(lambda p: render(p, seeds).sum())(params)
    assert np.isfinite(np.asarray(g.albedo)).all()


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_fused_values_match_single_device(n_dev):
    """Production sharded path, VALUE-level: the tape-mode fused kernels
    under shard_map on a virtual {2,4,8}-device mesh reproduce the
    single-device fused image bit-for-bit, and the psum'd parameter
    gradients to f32 reduction tolerance (the multi-chip analogue of the
    reference's serial loop, src/render.cpp:72-86)."""
    from jax.sharding import Mesh

    from drt_tpu.fused import (make_fused_image_renderer,
                               make_sharded_fused_image_renderer)

    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs {n_dev} devices")
    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=16, height=8, spp=8, max_depth=3)
    n = cfg.width * cfg.height * cfg.spp  # 1024 = 8 x 128-ray tiles
    cam_u = jax.random.uniform(jax.random.key(21), (2, n),
                               dtype=jnp.float32)
    tape = jax.random.uniform(jax.random.key(22), (cfg.max_depth, 3, n),
                              dtype=jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("rays",))

    single = make_fused_image_renderer(scene, cam, cfg, tile_rows=1,
                                       rng="tape")
    sharded = make_sharded_fused_image_renderer(scene, cam, cfg, mesh,
                                                tile_rows=1, rng="tape")
    img_s = single(params, cam_u, tape)
    img_m = sharded(params, cam_u, tape)
    assert float(jnp.abs(img_s).mean()) > 0
    np.testing.assert_array_equal(np.asarray(img_m), np.asarray(img_s))

    def loss(render):
        return lambda p: jnp.sum(render(p, cam_u, tape) ** 2)

    g_s = jax.grad(loss(single))(params)
    g_m = jax.grad(loss(sharded))(params)
    assert float(jnp.abs(g_s.albedo).max()) > 0
    np.testing.assert_allclose(np.asarray(g_m.albedo),
                               np.asarray(g_s.albedo),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_m.emission),
                               np.asarray(g_s.emission),
                               rtol=2e-5, atol=1e-7)


def test_stored_adjoint_matches_retrace_bit_exact():
    """adjoint='stored' (forward writes (sc, best) residuals; backward is
    a retrace-free reverse sweep) must reproduce adjoint='retrace' —
    image AND gradients — bit-for-bit: the sweep kernel replays the
    throughput recurrence in the forward's exact op order and gate is a
    static constant masked by best > 0."""
    from drt_tpu.fused import make_fused_image_renderer

    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=16, height=8, spp=4, max_depth=4)
    n = cfg.width * cfg.height * cfg.spp
    cam_u = jax.random.uniform(jax.random.key(31), (2, n),
                               dtype=jnp.float32)
    tape = jax.random.uniform(jax.random.key(32), (cfg.max_depth, 3, n),
                              dtype=jnp.float32)

    r_ret = make_fused_image_renderer(scene, cam, cfg, tile_rows=1,
                                      rng="tape", adjoint="retrace")
    r_sto = make_fused_image_renderer(scene, cam, cfg, tile_rows=1,
                                      rng="tape", adjoint="stored")

    def loss(render):
        return lambda p: jnp.sum(render(p, cam_u, tape) ** 2)

    img_r, g_r = jax.value_and_grad(loss(r_ret))(params)
    img_s, g_s = jax.value_and_grad(loss(r_sto))(params)
    assert float(img_r) > 0
    np.testing.assert_array_equal(np.asarray(img_s), np.asarray(img_r))
    assert np.abs(np.asarray(g_r.albedo)).max() > 0
    np.testing.assert_array_equal(np.asarray(g_s.albedo),
                                  np.asarray(g_r.albedo))
    np.testing.assert_array_equal(np.asarray(g_s.emission),
                                  np.asarray(g_r.emission))


def test_stored_adjoint_sharded_matches_single_device():
    """Sharded stored adjoint (residuals sharded on rays, swept per
    shard, grads psum'd) equals the single-device stored run on a
    virtual mesh."""
    from jax.sharding import Mesh

    from drt_tpu.fused import (make_fused_image_renderer,
                               make_sharded_fused_image_renderer)

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=16, height=8, spp=2, max_depth=3)
    n = cfg.width * cfg.height * cfg.spp
    cam_u = jax.random.uniform(jax.random.key(41), (2, n),
                               dtype=jnp.float32)
    tape = jax.random.uniform(jax.random.key(42), (cfg.max_depth, 3, n),
                              dtype=jnp.float32)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("rays",))

    single = make_fused_image_renderer(scene, cam, cfg, tile_rows=1,
                                       rng="tape", adjoint="stored")
    sharded = make_sharded_fused_image_renderer(scene, cam, cfg, mesh,
                                                tile_rows=1, rng="tape",
                                                adjoint="stored")

    def loss(render):
        return lambda p: jnp.sum(render(p, cam_u, tape) ** 2)

    np.testing.assert_array_equal(
        np.asarray(sharded(params, cam_u, tape)),
        np.asarray(single(params, cam_u, tape)))
    g_s = jax.grad(loss(single))(params)
    g_m = jax.grad(loss(sharded))(params)
    assert np.abs(np.asarray(g_s.albedo)).max() > 0
    np.testing.assert_allclose(np.asarray(g_m.albedo),
                               np.asarray(g_s.albedo),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_m.emission),
                               np.asarray(g_s.emission),
                               rtol=2e-5, atol=1e-7)


def test_fused_min_bounces_zero_matches_xla():
    """Russian roulette from bounce 0 (reference -b 0) through the fused
    kernel, tape-exact vs the XLA path."""
    cfg = RenderConfig(width=8, height=6, spp=4, max_depth=3,
                       min_bounces=0, absorb_prob=0.3)
    scene, params, cam, n, cam_u, o, d, tape = _setup(cfg, seed=13)
    L_ref = trace_rays(params, scene, o, d, None, cfg, tape=tape)
    tracer = make_fused_tracer(scene, cam, cfg, tile_rows=2, rng="tape",
                               interpret=True)
    L_pal = tracer(albedo_table(scene, params),
                   emission_table(scene, params), cam_u.T, tape)
    for r, p in zip(L_ref, L_pal):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r),
                                   rtol=2e-5, atol=2e-6)


def test_fused_image_renderer_odd_sizes():
    """Image sizes whose ray count doesn't fill whole tiles exercise the
    padding path of the fused image renderer (structure only on CPU)."""
    from drt_tpu.fused import make_fused_image_renderer, seeds_from_key

    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=13, height=7, spp=3, max_depth=2)
    render = make_fused_image_renderer(scene, cam, cfg, tile_rows=1)
    img = render(params, seeds_from_key(jax.random.key(0)))
    assert img.shape == (7, 13, 3)
    assert np.isfinite(np.asarray(img)).all()
    g = jax.grad(lambda p: render(p, seeds_from_key(
        jax.random.key(0))).sum())(params)
    assert np.isfinite(np.asarray(g.albedo)).all()


def test_split_fused_matches_expanded_xla():
    """bsdf_samples > 1 on the fused path (VERDICT r2 missing-#2): the
    splitting renderer must equal the plain XLA wavefront run on the
    SAME prefix-expanded per-lane uniforms (lane-mean identity), and
    its custom-VJP gradients must equal jax.grad of that forward."""
    import dataclasses

    from drt_tpu.fused import (make_split_fused_image_renderer,
                               split_prefix_tape)
    from drt_tpu.renderer import lane_count

    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=3,
                       bsdf_samples=2)
    M = lane_count(cfg)  # 4
    w, h, spp = cfg.width, cfg.height, cfg.spp
    npix = w * h
    n_lanes = npix * spp * M
    seeds = jnp.asarray([3, 7], jnp.int32)

    render = make_split_fused_image_renderer(scene, cam, cfg,
                                             tile_rows=8, interpret=True)
    img = render(params, seeds)

    # Reference: plain (non-splitting) tracer on the M-expanded lanes.
    cam_u, tp = split_prefix_tape(seeds, 0, cfg)
    pix = np.arange(n_lanes) % npix
    xy = jnp.asarray(np.stack([pix % w, pix // w], -1), jnp.int32)
    o, d, _ = camera_rays(cam, w, h, xy, cam_u.T)
    cfg1 = dataclasses.replace(cfg, bsdf_samples=1)

    def img_ref(p):
        L = trace_rays(p, scene, o, d, None, cfg1, tape=tp)
        chans = [c.reshape(M * spp, h, w).mean(axis=0) for c in L]
        return jnp.stack(chans, axis=-1)

    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref(params)),
                               rtol=2e-5, atol=2e-6)

    g_fused = jax.grad(lambda p: render(p, seeds).sum())(params)
    g_ref = jax.grad(lambda p: img_ref(p).sum())(params)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
    assert np.abs(np.asarray(g_ref.albedo)).max() > 1e-3

    # Stored and retrace adjoints agree bit-for-bit.
    r_re = make_split_fused_image_renderer(scene, cam, cfg, tile_rows=8,
                                           interpret=True,
                                           adjoint="retrace")
    g_re = jax.grad(lambda p: r_re(p, seeds).sum())(params)
    r_st = make_split_fused_image_renderer(scene, cam, cfg, tile_rows=8,
                                           interpret=True,
                                           adjoint="stored")
    g_st = jax.grad(lambda p: r_st(p, seeds).sum())(params)
    for a, b in zip(g_st, g_re):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_split_matches_single_device():
    """The sharded splitting renderer (global prefix tape + sharded
    tape-mode kernels at spp' = spp*M) must bit-equal the single-chip
    splitting renderer's image, with psum'd grads to f32 reduction
    tolerance, on baked AND dyn kernels over the 8-device CPU mesh."""
    from jax.sharding import Mesh

    from drt_tpu.fused import (make_sharded_split_image_renderer,
                               make_split_dyn_image_renderer,
                               make_split_fused_image_renderer)
    from drt_tpu.models import gallery

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs multiple devices")
    mesh = Mesh(np.asarray(devices[:2]), ("rays",))
    # n_lanes = 16*16*2*4 = 2048 = 2 devices x 1024-lane (8-row) tiles.
    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=3,
                       bsdf_samples=2)
    seeds = jnp.asarray([9, 4], jnp.int32)

    for tag, scene_build, single_make, dyn in (
            ("baked", cbox.build, make_split_fused_image_renderer, False),
            ("dyn", lambda dtype: gallery.build_mesh(level=1, dtype=dtype),
             make_split_dyn_image_renderer, True)):
        scene, params, cam = scene_build(dtype=jnp.float32)
        single = single_make(scene, cam, cfg, tile_rows=8,
                             interpret=True)
        sharded = make_sharded_split_image_renderer(
            scene, cam, cfg, mesh, tile_rows=8, interpret=True, dyn=dyn)
        img_s = jax.jit(single)(params, seeds)
        img_m = jax.jit(sharded)(params, seeds)
        np.testing.assert_array_equal(np.asarray(img_m),
                                      np.asarray(img_s), err_msg=tag)
        assert float(np.abs(np.asarray(img_s)).mean()) > 0, tag
        g_s = jax.jit(jax.grad(lambda p: single(p, seeds).sum()))(params)
        g_m = jax.jit(jax.grad(lambda p: sharded(p, seeds).sum()))(params)
        for a, b in zip(g_m, g_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7,
                                       err_msg=tag)
