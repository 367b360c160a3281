"""Path-regeneration kernel tests (ops/regen.py).

Verification chain: the regen kernel's per-sample radiance is pinned
bit-for-bit to the lockstep tape-mode megakernel fed the identical
hash-keyed uniforms (which is itself pinned to the XLA wavefront and,
through it, to the C++ reference by tests/test_golden.py); gradients
are pinned to jax.grad through the XLA wavefront on the same tapes
(biased replay == autodiff of the forward estimator,
reference: include/drt/integrate.hpp:26-37).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drt_tpu.camera import camera_rays, pixel_grid
from drt_tpu.config import RenderConfig
from drt_tpu.fused import make_regen_image_renderer
from drt_tpu.models.cbox import build as build_cbox
from drt_tpu.ops.megakernel import make_fused_tracer
from drt_tpu.ops.regen import hash_tapes, hash_uniform, make_regen_tracer
from drt_tpu.renderer import trace_rays
from drt_tpu.scene import albedo_table, emission_table

SEEDS = jnp.asarray([12345, 67890], jnp.int32)


@pytest.fixture(scope="module")
def cbox():
    return build_cbox(dtype=jnp.float32)


def _tables(scene, params):
    return albedo_table(scene, params), emission_table(scene, params)


def _img3(L):
    return np.stack([np.asarray(L.x), np.asarray(L.y), np.asarray(L.z)], -1)


def test_hash_uniform_open_interval_and_spread():
    n = 1 << 14
    i = jnp.arange(n, dtype=jnp.int32)
    u = np.asarray(hash_uniform(7, i, i // 64, i % 5, 1, jnp.float32))
    assert (u > 0.0).all() and (u < 1.0).all()
    # crude equidistribution: 16 bins within 5 sigma
    hist, _ = np.histogram(u, bins=16, range=(0.0, 1.0))
    sigma = np.sqrt(n * (1 / 16) * (15 / 16))
    assert np.abs(hist - n / 16).max() < 5 * sigma


def test_regen_bit_equals_lockstep_tape_kernel_spp1(cbox):
    scene, params, cam = cbox
    cfg = RenderConfig(width=40, height=24, spp=1, max_depth=5)
    alb, emi = _tables(scene, params)
    npix = cfg.width * cfg.height
    cam_u, tape = hash_tapes(SEEDS, npix, 1, cfg.max_depth, jnp.float32)
    lock = make_fused_tracer(scene, cam, cfg, tile_rows=8, rng="tape",
                             interpret=True)
    want = _img3(lock(alb, emi, cam_u, tape))
    trg = make_regen_tracer(scene, cam, cfg, tile_rows=8, interpret=True)
    L, trips = trg(alb, emi, SEEDS)
    got = _img3(L)
    np.testing.assert_array_equal(got, want)
    assert int(np.asarray(trips).max()) <= cfg.max_depth


def test_regen_sum_matches_xla_oracle_spp8(cbox):
    scene, params, cam = cbox
    cfg = RenderConfig(width=32, height=16, spp=6, max_depth=5)
    npix = cfg.width * cfg.height
    alb, emi = _tables(scene, params)
    cam_u, tape = hash_tapes(SEEDS, npix, cfg.spp, cfg.max_depth,
                             jnp.float32)
    xy = jnp.tile(pixel_grid(cfg.width, cfg.height), (cfg.spp, 1))
    orig, d, _ = camera_rays(cam, cfg.width, cfg.height, xy, cam_u.T)
    L = trace_rays(params, scene, orig, d, jax.random.PRNGKey(0), cfg,
                   tape=tape)
    per = np.stack([np.asarray(L.x), np.asarray(L.y), np.asarray(L.z)],
                   -1).reshape(cfg.spp, npix, 3)
    want = per.sum(0)
    trg = make_regen_tracer(scene, cam, cfg, tile_rows=8, interpret=True)
    Lr, trips = trg(alb, emi, SEEDS)
    got = _img3(Lr)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-6)
    assert rel.max() < 1e-5  # in-lane sample accumulation order only
    # packing: trips must not exceed the worst-case budget
    assert int(np.asarray(trips).max()) <= cfg.spp * cfg.max_depth


def test_regen_trip_cut_matches_estimator_premise(cbox):
    """Pin the trip-count model the regen estimator actually obeys
    (VERDICT r3 #8 asked for the premise to be tested — and testing it
    CORRECTED it): the while_loop ends when EVERY lane of the
    (tile_rows*128)-lane tile has finished its spp samples, so trips ~
    MAX over lanes of total path length, not the mean. The "~2.4x"
    figure in the original estimator is the MEAN-occupancy cut
    (1 / live-lane fraction 38.5% at depth 5, RR absorb 0.5 —
    pathtracer.hpp:121-136); the realized trip cut is smaller by the
    straggler tail, max ~= spp*E[len] + O(sqrt(spp)) over 1024 lanes:
    measured ratio 0.775 of the spp*max_depth budget at spp=8 (cut
    1.29x), approaching E[len]/depth ~ 0.39 only as spp_c grows. The
    on-chip gate (tools/bench_regen.py) must therefore sweep spp_chunks
    — small spp_c starves the packing win."""
    scene, params, cam = cbox
    cfg = RenderConfig(width=32, height=16, spp=8, max_depth=5,
                       min_bounces=1, absorb_prob=0.5)
    alb, emi = _tables(scene, params)
    trg = make_regen_tracer(scene, cam, cfg, tile_rows=8, interpret=True)
    _, trips = trg(alb, emi, SEEDS)
    t = np.asarray(trips).astype(np.float64)
    budget = cfg.spp * cfg.max_depth
    assert t.max() <= budget
    assert t.min() >= cfg.spp  # every sample costs >= 1 trip per lane
    ratio = t.mean() / budget
    # Straggler-gated band: a real cut exists (< 0.9) but nowhere near
    # the mean-occupancy bound (> spp*E[len]/budget ~ 0.31) at spp=8.
    assert 0.6 < ratio < 0.9, f"packing ratio {ratio:.3f} left the " \
        f"measured straggler band (0.775 at this config)"


@pytest.mark.parametrize("adjoint", ["stored", "retrace"])
def test_regen_renderer_grads_match_xla_autodiff(cbox, adjoint):
    scene, params, cam = cbox
    cfg = RenderConfig(width=24, height=16, spp=4, max_depth=4,
                       spp_chunks=2)
    spp_c = cfg.spp // cfg.spp_chunks
    npix = cfg.width * cfg.height
    render = make_regen_image_renderer(scene, cam, cfg, tile_rows=8,
                                       interpret=True, adjoint=adjoint)
    gw = jax.random.normal(jax.random.PRNGKey(7),
                           (cfg.height, cfg.width, 3), jnp.float32)

    def loss_regen(p):
        return (render(p, SEEDS) * gw).sum()

    def loss_oracle(p):
        img = 0.0
        for c in range(cfg.spp_chunks):
            cam_u, tape = hash_tapes(SEEDS, npix, spp_c, cfg.max_depth,
                                     jnp.float32, sample_base=c * spp_c)
            xy = jnp.tile(pixel_grid(cfg.width, cfg.height), (spp_c, 1))
            orig, d, _ = camera_rays(cam, cfg.width, cfg.height, xy,
                                     cam_u.T)
            L = trace_rays(p, scene, orig, d, jax.random.PRNGKey(0), cfg,
                           tape=tape)
            per = jnp.stack([L.x, L.y, L.z], -1).reshape(spp_c, npix, 3)
            img = img + per.sum(0)
        img = (img / cfg.spp).reshape(cfg.height, cfg.width, 3)
        return (img * gw).sum()

    v_r, g_r = jax.value_and_grad(loss_regen)(params)
    v_o, g_o = jax.value_and_grad(loss_oracle)(params)
    assert abs(float(v_r - v_o)) < 1e-4
    for name in ("albedo", "emission"):
        a = np.asarray(getattr(g_r, name))
        b = np.asarray(getattr(g_o, name))
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)
        assert rel < 5e-5, (name, rel)


def test_regen_renderer_rejects_unbiased(cbox):
    scene, _, cam = cbox
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=3,
                       unbiased=True)
    with pytest.raises(ValueError, match="biased-only"):
        make_regen_image_renderer(scene, cam, cfg, interpret=True)


def test_regen_renderer_guards_vmem_footprint(cbox):
    """The adjoint kernels keep 5 (t_cap, tile_rows, 128) f32 blocks
    VMEM-resident (2 residual inputs + 3 reconstructed-P scratch);
    RenderConfig defaults (spp=100, depth=32 -> t_cap=3200, ~65 MiB at
    tile_rows=8) must be a config error NAMING spp_chunks, not a Mosaic
    compile failure (VERDICT r3 weak-#7 / advisor regen.py:152)."""
    scene, _, cam = cbox
    with pytest.raises(ValueError, match="spp_chunks is 10"):
        make_regen_image_renderer(scene, cam, RenderConfig(),
                                  interpret=True)
    # The suggested knob value fits: spp_chunks=10 -> t_cap=320.
    make_regen_image_renderer(scene, cam, RenderConfig(spp_chunks=10),
                              interpret=True)


def test_regen_tile_rows_auto_falls_back(cbox):
    """tile_rows=None (default) auto-picks the largest of (32, 16, 8)
    that fits the VMEM budget, so configs that fit at 8 but not at the
    32 throughput default still build (advisor r4 fused.py:1185:
    spp=64, spp_chunks=1, depth=5 -> t_cap=320 -> 26 MiB at 32,
    6.6 MiB at 8)."""
    from drt_tpu.fused import _resolve_regen_tile_rows

    scene, params, cam = cbox
    cfg = RenderConfig(width=16, height=8, spp=64, spp_chunks=1,
                       max_depth=5)
    assert _resolve_regen_tile_rows(cfg, None) == 8
    assert _resolve_regen_tile_rows(cfg, 32) == 32  # explicit wins
    render = make_regen_image_renderer(scene, cam, cfg, interpret=True)
    img = np.asarray(render(params, SEEDS))
    assert np.isfinite(img).all()
    # A small t_cap keeps the throughput default.
    small = RenderConfig(width=16, height=8, spp=4, max_depth=3)
    assert _resolve_regen_tile_rows(small, None) == 32


def test_sharded_regen_matches_single_device(cbox):
    import numpy as _np
    from jax.sharding import Mesh

    from drt_tpu.fused import make_sharded_regen_image_renderer

    scene, params, cam = cbox
    # 128*64 pixels = 8 whole (8*128)-pixel tiles: one per device.
    cfg = RenderConfig(width=128, height=64, spp=4, max_depth=4)
    devs = jax.devices("cpu")[:8]
    mesh = Mesh(_np.asarray(devs), ("tiles",))
    single = make_regen_image_renderer(scene, cam, cfg, tile_rows=8,
                                       interpret=True, adjoint="stored")
    sharded = make_sharded_regen_image_renderer(scene, cam, cfg, mesh,
                                                tile_rows=8,
                                                interpret=True,
                                                adjoint="stored")
    img_1 = np.asarray(single(params, SEEDS))
    img_8 = np.asarray(sharded(params, SEEDS))
    np.testing.assert_array_equal(img_8, img_1)

    def loss(render):
        return lambda p: (render(p, SEEDS) ** 2).sum()

    g_1 = jax.grad(loss(single))(params)
    g_8 = jax.grad(loss(sharded))(params)
    for name in ("albedo", "emission"):
        a = np.asarray(getattr(g_1, name))
        b = np.asarray(getattr(g_8, name))
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-12)
        assert rel < 1e-6, (name, rel)  # psum order only


# ---------------------------------------------------------------------------
# Chunk-grid (n_chunks > 1): the spp-chunk loop riding the kernel grid
# must be bit-equal to the host loop it replaces. Unlike the lockstep
# kernels' TPU PRNG, the hash RNG keys on the ABSOLUTE sample index, so
# the in-kernel per-chunk offset is exactly verifiable under interpret.
# ---------------------------------------------------------------------------

def test_regen_chunk_grid_bit_equals_host_loop(cbox):
    scene, params, cam = cbox
    cfg = RenderConfig(width=40, height=24, spp=8, spp_chunks=4,
                       max_depth=3)
    spp_c = cfg.spp // cfg.spp_chunks
    alb, emi = _tables(scene, params)
    tr1 = make_regen_tracer(scene, cam, cfg, tile_rows=8, interpret=True)
    trN = make_regen_tracer(scene, cam, cfg, tile_rows=8, interpret=True,
                            n_chunks=cfg.spp_chunks)
    LN, tripsN = trN(alb, emi, SEEDS)
    assert tripsN.shape == (np.asarray(tripsN).shape[0], cfg.spp_chunks)
    acc = None
    for c in range(cfg.spp_chunks):
        Lc, trips_c = tr1(alb, emi, SEEDS, sample_base=c * spp_c)
        np.testing.assert_array_equal(np.asarray(tripsN[:, c]),
                                      np.asarray(trips_c))
        acc = (Lc if acc is None else
               type(Lc)(acc.x + Lc.x, acc.y + Lc.y, acc.z + Lc.z))
    for nm in ("x", "y", "z"):
        np.testing.assert_array_equal(np.asarray(getattr(LN, nm)),
                                      np.asarray(getattr(acc, nm)))


def test_regen_collect_sweep_chunk_grid_match_host_loop(cbox):
    from drt_tpu.ops.regen import make_regen_sweep_adjoint
    from drt_tpu.ops.vecmath import V3

    scene, params, cam = cbox
    cfg = RenderConfig(width=40, height=24, spp=8, spp_chunks=4,
                       max_depth=3)
    spp_c = cfg.spp // cfg.spp_chunks
    alb, emi = _tables(scene, params)
    npix = cfg.width * cfg.height
    col1 = make_regen_tracer(scene, cam, cfg, tile_rows=8, interpret=True,
                             collect=True)
    colN = make_regen_tracer(scene, cam, cfg, tile_rows=8, interpret=True,
                             collect=True, n_chunks=cfg.spp_chunks)
    LN, rscN, rmetaN, tripsN = colN(alb, emi, SEEDS)
    sw1 = make_regen_sweep_adjoint(scene, cfg, tile_rows=8, interpret=True)
    swN = make_regen_sweep_adjoint(scene, cfg, tile_rows=8, interpret=True,
                                   n_chunks=cfg.spp_chunks)
    g = V3(jnp.full((npix,), 0.25, jnp.float32),
           jnp.full((npix,), 0.5, jnp.float32),
           jnp.full((npix,), 0.125, jnp.float32))
    daN, deN = swN(alb, emi, rscN, rmetaN, tripsN, g)
    accL = da = de = None
    for c in range(cfg.spp_chunks):
        Lc, rsc_c, rmeta_c, trips_c = col1(alb, emi, SEEDS,
                                           sample_base=c * spp_c)
        accL = (Lc if accL is None else
                type(Lc)(accL.x + Lc.x, accL.y + Lc.y, accL.z + Lc.z))
        # residual rows past a tile's trip count are unwritten garbage;
        # compare only rows below the per-tile bound (flattened pixels
        # tile in (8*128)-pixel blocks).
        t1 = np.asarray(trips_c)
        tile_of = np.arange(npix) // (8 * 128)
        valid = np.asarray(t1)[tile_of][None, :] > \
            np.arange(rsc_c.shape[0])[:, None]
        np.testing.assert_array_equal(
            np.where(valid, np.asarray(rscN[c]), 0.0),
            np.where(valid, np.asarray(rsc_c), 0.0))
        np.testing.assert_array_equal(
            np.where(valid, np.asarray(rmetaN[c]), 0),
            np.where(valid, np.asarray(rmeta_c), 0))
        da_c, de_c = sw1(alb, emi, rsc_c, rmeta_c, trips_c, g)
        da = da_c if da is None else da + da_c
        de = de_c if de is None else de + de_c
    for nm in ("x", "y", "z"):
        np.testing.assert_array_equal(np.asarray(getattr(LN, nm)),
                                      np.asarray(getattr(accL, nm)))
    np.testing.assert_allclose(np.asarray(daN), np.asarray(da),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(deN), np.asarray(de),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("adjoint", ["stored", "retrace"])
def test_regen_renderer_chunked_matches_host_loop(cbox, adjoint):
    """Through the public renderer: chunked=True (one dispatch per
    fwd/collect/sweep) is image-bit-equal and gradient-close to the
    legacy chunked=False host loop."""
    scene, params, cam = cbox
    cfg = RenderConfig(width=40, height=24, spp=8, spp_chunks=4,
                       max_depth=3)
    imgs, grads = [], []
    for chunked in (True, False):
        r = make_regen_image_renderer(scene, cam, cfg, tile_rows=8,
                                      interpret=True, adjoint=adjoint,
                                      chunked=chunked)
        img, vjp = jax.vjp(lambda p: r(p, SEEDS), params)
        gr = vjp(jnp.ones_like(img))[0]
        imgs.append(np.asarray(img))
        grads.append((np.asarray(gr.albedo), np.asarray(gr.emission)))
    np.testing.assert_array_equal(imgs[0], imgs[1])
    np.testing.assert_allclose(grads[0][0], grads[1][0],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(grads[0][1], grads[1][1],
                               rtol=1e-5, atol=1e-7)


def test_dyn_regen_renderer_chunked_matches_host_loop(cbox):
    from drt_tpu.fused import make_dyn_regen_image_renderer

    scene, params, cam = cbox
    cfg = RenderConfig(width=40, height=24, spp=8, spp_chunks=4,
                       max_depth=3)
    imgs, grads = [], []
    for chunked in (True, False):
        r = make_dyn_regen_image_renderer(scene, cam, cfg, tile_rows=8,
                                          interpret=True,
                                          chunked=chunked)
        img, vjp = jax.vjp(lambda p: r(p, SEEDS), params)
        gr = vjp(jnp.ones_like(img))[0]
        imgs.append(np.asarray(img))
        grads.append((np.asarray(gr.albedo), np.asarray(gr.emission)))
    np.testing.assert_array_equal(imgs[0], imgs[1])
    np.testing.assert_allclose(grads[0][0], grads[1][0],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(grads[0][1], grads[1][1],
                               rtol=1e-5, atol=1e-7)


def test_sharded_regen_chunked_matches_single_device(cbox):
    """Sharded + chunk-grid stored adjoint: the chunk axis is unsharded
    (residuals f[n_chunks, t_cap, pix] shard on pix, trips
    i32[tiles, n_chunks] shard on tiles) — image bit-equal and grads
    psum-close to the single-device chunked renderer."""
    import numpy as _np
    from jax.sharding import Mesh

    from drt_tpu.fused import make_sharded_regen_image_renderer

    scene, params, cam = cbox
    cfg = RenderConfig(width=128, height=64, spp=4, spp_chunks=2,
                       max_depth=4)
    devs = jax.devices("cpu")[:8]
    mesh = Mesh(_np.asarray(devs), ("tiles",))
    single = make_regen_image_renderer(scene, cam, cfg, tile_rows=8,
                                       interpret=True, adjoint="stored")
    sharded = make_sharded_regen_image_renderer(scene, cam, cfg, mesh,
                                                tile_rows=8,
                                                interpret=True,
                                                adjoint="stored")
    img_1 = np.asarray(single(params, SEEDS))
    img_8 = np.asarray(sharded(params, SEEDS))
    np.testing.assert_array_equal(img_8, img_1)

    def loss(render):
        return lambda p: (render(p, SEEDS) ** 2).sum()

    g_1 = jax.grad(loss(single))(params)
    g_8 = jax.grad(loss(sharded))(params)
    for name in ("albedo", "emission"):
        a = np.asarray(getattr(g_1, name))
        b = np.asarray(getattr(g_8, name))
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-12)
        assert rel < 1e-6, (name, rel)  # psum order only
