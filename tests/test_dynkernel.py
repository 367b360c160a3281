"""Memory-resident-scene (dyn) megakernels vs the XLA wavefront path
(Pallas interpret mode on CPU).

The dyn kernels (drt_tpu/ops/dynkernel.py) read the scene from SMEM
arrays at run time — the TPU form of the reference's dynamic O(S)
dispatch loop (include/drt/pathtracer.hpp:72-89) — so forward radiance
and adjoint parameter gradients must agree with `trace_rays` on the
same uniform tape for ANY scene, including ones far past the baked
kernels' 24-shape unroll budget. Both loop modes (Python unroll and
lax.fori_loop) are exercised.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from drt_tpu.camera import camera_rays
from drt_tpu.config import RenderConfig
from drt_tpu.fused import (make_dyn_image_renderer,
                           make_sharded_dyn_image_renderer)
from drt_tpu.models import cbox, gallery
from drt_tpu.ops.dynkernel import (DynScene, make_dyn_adjoint,
                                   make_dyn_collect_tracer,
                                   make_dyn_sweep_adjoint,
                                   make_dyn_tracer)
from drt_tpu.ops.vecmath import V3
from drt_tpu.renderer import trace_rays
from drt_tpu.scene import albedo_table, emission_table

SCENES = {
    "cbox": lambda: cbox.build(dtype=jnp.float32),
    "glossy": lambda: gallery.build_glossy(dtype=jnp.float32),
    "tri": lambda: gallery.build_tri(dtype=jnp.float32),
    # 87 shapes (80-triangle icosphere + box + light): the scene class
    # the dyn kernels exist for — past the baked unroll budget.
    "mesh80": lambda: gallery.build_mesh(level=1, dtype=jnp.float32),
}


def _setup(build, n=512, max_depth=4, seed=0):
    scene, params, cam = build()
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=max_depth)
    cam_u = jax.random.uniform(jax.random.key(seed), (2, n),
                               dtype=jnp.float32)
    tape = jax.random.uniform(jax.random.key(seed + 1),
                              (max_depth, 3, n), dtype=jnp.float32)
    # Primary rays exactly as the in-kernel camera maps them
    # (spp-outer: ray i -> pixel i % npix).
    npix = cfg.width * cfg.height
    pix = np.arange(n) % npix
    xy = jnp.asarray(np.stack([pix % cfg.width, pix // cfg.width], -1),
                     jnp.int32)
    o, d, _ = camera_rays(cam, cfg.width, cfg.height, xy, cam_u.T)
    return scene, params, cam, cfg, cam_u, tape, o, d


@pytest.mark.parametrize("name", sorted(SCENES))
@pytest.mark.parametrize("unroll", [16, 0])
def test_forward_matches_xla_path(name, unroll):
    scene, params, cam, cfg, cam_u, tape, o, d = _setup(SCENES[name])
    L_ref = trace_rays(params, scene, o, d, None, cfg, tape=tape)
    ds = DynScene(scene)
    tracer = make_dyn_tracer(ds, cam, cfg, tile_rows=8, rng="tape",
                             interpret=True, unroll_shapes=unroll,
                             n_rays=o.x.shape[0])
    L = tracer(albedo_table(scene, params), emission_table(scene, params),
               ds.operands, cam_u, tape)
    ra = np.stack([np.asarray(c) for c in L_ref])
    pa = np.stack([np.asarray(c) for c in L])
    assert ra.mean() > 0
    np.testing.assert_allclose(pa, ra, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("name", ["glossy", "mesh80"])
def test_adjoint_matches_xla_grads(name):
    scene, params, cam, cfg, cam_u, tape, o, d = _setup(SCENES[name])
    n = o.x.shape[0]
    g = V3(*jax.random.uniform(jax.random.key(7), (3, n),
                               dtype=jnp.float32))

    def loss(p):
        L = trace_rays(p, scene, o, d, None, cfg, tape=tape)
        return (L.x * g.x + L.y * g.y + L.z * g.z).sum()

    gp = jax.grad(loss)(params)
    ds = DynScene(scene)
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)
    adj = make_dyn_adjoint(ds, cam, cfg, tile_rows=8, rng="tape",
                           interpret=True, n_rays=n)
    da, de = adj(alb, emi, ds.operands, cam_u, tape, g.x, g.y, g.z)
    k = params.albedo.shape[0]
    l = params.emission.shape[0]
    np.testing.assert_allclose(np.asarray(da)[:k], np.asarray(gp.albedo),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(de)[:l],
                               np.asarray(gp.emission),
                               rtol=1e-4, atol=1e-5)
    assert np.abs(np.asarray(gp.albedo)).max() > 1e-3


def test_stored_residual_sweep_bit_equals_retrace():
    """The collect tracer's radiance is bit-equal to the plain tracer,
    and the stored-residual sweep's gradients are bit-equal to the
    retrace adjoint (same recurrences in the same op order)."""
    scene, params, cam, cfg, cam_u, tape, o, d = _setup(
        SCENES["mesh80"])
    n = o.x.shape[0]
    g = V3(*jax.random.uniform(jax.random.key(9), (3, n),
                               dtype=jnp.float32))
    ds = DynScene(scene)
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)
    tracer = make_dyn_tracer(ds, cam, cfg, tile_rows=8, rng="tape",
                             interpret=True, n_rays=n)
    collect = make_dyn_collect_tracer(ds, cam, cfg, tile_rows=8,
                                      rng="tape", interpret=True,
                                      n_rays=n)
    sweep = make_dyn_sweep_adjoint(ds, cfg, tile_rows=8, interpret=True)
    adj = make_dyn_adjoint(ds, cam, cfg, tile_rows=8, rng="tape",
                           interpret=True, n_rays=n)
    L1 = tracer(alb, emi, ds.operands, cam_u, tape)
    L2, rsc, rrow = collect(alb, emi, ds.operands, cam_u, tape)
    for a, b in zip(L1, L2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    da_r, de_r = adj(alb, emi, ds.operands, cam_u, tape, g.x, g.y, g.z)
    da_s, de_s = sweep(alb, emi, rsc, rrow, g)
    np.testing.assert_array_equal(np.asarray(da_s), np.asarray(da_r))
    np.testing.assert_array_equal(np.asarray(de_s), np.asarray(de_r))


def _image_setup(max_depth=3):
    scene, params, cam = gallery.build_mesh(level=1, dtype=jnp.float32)
    cfg = RenderConfig(width=128, height=64, spp=1, max_depth=max_depth)
    n = cfg.width * cfg.height * cfg.spp
    cam_u = jax.random.uniform(jax.random.key(0), (2, n),
                               dtype=jnp.float32)
    tape = jax.random.uniform(jax.random.key(1), (max_depth, 3, n),
                              dtype=jnp.float32)
    return scene, params, cam, cfg, cam_u, tape, n


def _ref_image_fn(scene, cam, cfg, cam_u, tape, n):
    npix = cfg.width * cfg.height
    pix = np.arange(n) % npix
    xy = jnp.asarray(np.stack([pix % cfg.width, pix // cfg.width], -1),
                     jnp.int32)
    o, d, _ = camera_rays(cam, cfg.width, cfg.height, xy, cam_u.T)

    def img(p):
        L = trace_rays(p, scene, o, d, None, cfg, tape=tape)
        spp_c = cfg.spp
        chans = [c.reshape(spp_c, cfg.height, cfg.width).mean(axis=0)
                 for c in L]
        return jnp.stack(chans, axis=-1)

    return img


@pytest.mark.parametrize("adjoint", ["stored", "retrace"])
def test_image_renderer_tape_parity(adjoint):
    scene, params, cam, cfg, cam_u, tape, n = _image_setup()
    img_ref = _ref_image_fn(scene, cam, cfg, cam_u, tape, n)
    ref = img_ref(params)
    gref = jax.grad(lambda p: img_ref(p).sum())(params)
    render = make_dyn_image_renderer(scene, cam, cfg, tile_rows=8,
                                     rng="tape", interpret=True,
                                     adjoint=adjoint)
    img = render(params, cam_u, tape)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
    gd = jax.grad(lambda p: render(p, cam_u, tape).sum())(params)
    for a, b in zip(gd, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_sharded_dyn_matches_single_device():
    """The sharded dyn path (scene operands replicated, rays sharded by
    tile_base, grads psum'd) reproduces the single-device image
    BIT-EXACTLY and the gradients to f32 reduction tolerance."""
    scene, params, cam, cfg, cam_u, tape, n = _image_setup()
    render1 = make_dyn_image_renderer(scene, cam, cfg, tile_rows=8,
                                      rng="tape", interpret=True)
    img1 = render1(params, cam_u, tape)
    g1 = jax.grad(lambda p: render1(p, cam_u, tape).sum())(params)

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()).reshape(n_dev), ("d",))
    render8 = make_sharded_dyn_image_renderer(scene, cam, cfg, mesh,
                                              tile_rows=8, rng="tape",
                                              interpret=True)
    img8 = render8(params, cam_u, tape)
    np.testing.assert_array_equal(np.asarray(img8), np.asarray(img1))
    g8 = jax.grad(lambda p: render8(p, cam_u, tape).sum())(params)
    for a, b in zip(g8, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_cluster_build_invariants():
    """_cluster_tris: every triangle appears in exactly one slot, and
    each cluster's AABB contains all member-triangle vertices."""
    from drt_tpu.ops.dynkernel import _cluster_tris

    scene, params, cam = gallery.build_mesh(level=2, dtype=jnp.float32)
    ds0 = DynScene(scene, cluster_min_tris=10**9)  # just for the sort
    t0 = ds0.n_plane + ds0.n_sphere
    # geo_vertex keeps (v0, v1, v2) rows — operands[0] stores the
    # kernel's (v0, e1, e2) edge form.
    tri_geo = np.asarray(ds0.geo_vertex)[t0:]
    K = 16
    slots, aabbs = _cluster_tris(tri_geo, K)
    assert slots.size == aabbs.shape[0] * K
    real = slots[slots >= 0]
    assert sorted(real.tolist()) == list(range(tri_geo.shape[0]))
    v = tri_geo[:, :9].reshape(-1, 3, 3)
    for c in range(aabbs.shape[0]):
        idx = slots[c * K:(c + 1) * K]
        idx = idx[idx >= 0]
        lo, hi = aabbs[c, :3], aabbs[c, 3:]
        assert (v[idx] >= lo - 1e-7).all() and (v[idx] <= hi + 1e-7).all()


def test_cluster_k_auto_adapts_to_mesh_size():
    """cluster_k=None (the default) resolves per the on-chip sweep
    (docs/ROUND5_NOTES.md §4-5): K=16 below _AUTO_K32_TRIS triangles,
    K=32 at or above — and an explicit K always wins."""
    from drt_tpu.ops.dynkernel import _AUTO_K32_TRIS

    small, _, _ = gallery.build_mesh(level=1, dtype=jnp.float32)  # 80
    big, _, _ = gallery.build_mesh(level=3, dtype=jnp.float32)  # 1280
    ds_small, ds_big = DynScene(small), DynScene(big)
    assert ds_small.n_tri < _AUTO_K32_TRIS <= ds_big.n_tri
    assert ds_small.cluster_k == 16
    assert ds_big.cluster_k == 32
    assert DynScene(big, cluster_k=16).cluster_k == 16
    # The auto choice keeps the build invariants: every real triangle
    # slotted once, padded slots degenerate.
    assert ds_big.n_clusters * 32 >= ds_big.n_tri


@pytest.mark.parametrize("level,fastmath", [(1, False), (2, False),
                                            (2, True)])
def test_cluster_culling_bit_equals_unclustered(level, fastmath):
    """Cluster culling is a pure visit-order/skip optimization: the
    forward radiance must be BIT-EQUAL with clustering on vs off (the
    (t, original-index) winner is order-independent and padding
    triangles are degenerate), and the retrace adjoint gradients must
    also be bit-equal. level=2 (320 tris, 20+ clusters) exercises the
    fori_loop cluster path; level=1 the unrolled one; fastmath=True the
    ratio-carry sweep (whose cross-multiplied cull bound must stay
    conservative too)."""
    scene, params, cam = gallery.build_mesh(level=level,
                                            dtype=jnp.float32)
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=4)
    n = 512
    cam_u = jax.random.uniform(jax.random.key(3), (2, n),
                               dtype=jnp.float32)
    tape = jax.random.uniform(jax.random.key(4), (cfg.max_depth, 3, n),
                              dtype=jnp.float32)
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)
    g = V3(*jax.random.uniform(jax.random.key(5), (3, n),
                               dtype=jnp.float32))

    outs = []
    for ds in (DynScene(scene), DynScene(scene, cluster_min_tris=10**9)):
        tracer = make_dyn_tracer(ds, cam, cfg, tile_rows=8, rng="tape",
                                 interpret=True, n_rays=n,
                                 fastmath=fastmath)
        adj = make_dyn_adjoint(ds, cam, cfg, tile_rows=8, rng="tape",
                               interpret=True, n_rays=n,
                               fastmath=fastmath)
        L = tracer(alb, emi, ds.operands, cam_u, tape)
        da, de = adj(alb, emi, ds.operands, cam_u, tape, g.x, g.y, g.z)
        outs.append((L, da, de))
    (L1, da1, de1), (L2, da2, de2) = outs
    assert DynScene(scene).n_clusters > 0
    for a, b in zip(L1, L2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(da1), np.asarray(da2))
    np.testing.assert_array_equal(np.asarray(de1), np.asarray(de2))
    assert np.asarray(L1.x).mean() > 0


def test_supercluster_build_invariants():
    """Two-level culling (VERDICT r3 #3): super row s unions leaf AABBs
    [s*M, (s+1)*M); padding leaves are inverted boxes (lo > hi — the
    union identity) appended before the super rows in the same SMEM
    operand. Round-4 on-chip regression: an inverted box is NOT skipped
    by the slab test (min/max normalizes it to cover every t), so every
    padded leaf's triangle slots must be REAL in-range rows of
    degenerate triangles — pre-fix they indexed past the triangle
    segment (OOB SMEM garbage on real TPU; wrong radiance at any
    cluster count not divisible by super_m)."""
    scene, params, cam = gallery.build_mesh(level=2, dtype=jnp.float32)
    ds = DynScene(scene)  # 320 tris / K=16 -> 20+ leaves -> supers on
    assert ds.n_clusters > ds.super_m and ds.n_super > 0
    assert ds.n_clusters_pad == ds.n_super * ds.super_m
    assert ds.n_clusters_pad > ds.n_clusters  # 20 leaves pad to 24
    caabb = np.asarray(ds.operands[5])
    assert caabb.shape[0] == ds.n_clusters_pad + ds.n_super
    leaves = caabb[:ds.n_clusters_pad].reshape(ds.n_super, ds.super_m, 6)
    sup = caabb[ds.n_clusters_pad:]
    np.testing.assert_array_equal(sup[:, :3], leaves[:, :, :3].min(1))
    np.testing.assert_array_equal(sup[:, 3:], leaves[:, :, 3:].max(1))
    # Padding leaves are inverted boxes (identity of the super union).
    pad = caabb[ds.n_clusters:ds.n_clusters_pad]
    assert (pad[:, :3] > pad[:, 3:]).all()
    # EVERY indexable triangle slot (incl. padded clusters') is a real
    # row: the triangle segment covers n_clusters_pad * K rows, and the
    # padded clusters' rows are all-zero (degenerate, det == 0).
    t0 = ds.n_plane + ds.n_sphere
    geo = np.asarray(ds.operands[0])
    assert geo.shape[0] - t0 == ds.n_clusters_pad * ds.cluster_k
    padded_rows = geo[t0 + ds.n_clusters * ds.cluster_k:]
    np.testing.assert_array_equal(padded_rows, 0.0)


@pytest.mark.parametrize("fastmath", [False, True])
def test_two_level_cull_bit_equals_single_level(fastmath):
    """Default (two-level) vs super_m=1 (single-level) vs unclustered:
    all three visit orders produce bit-identical radiance AND adjoint
    gradients — the lexicographic (t, orig) winner argument again."""
    scene, params, cam = gallery.build_mesh(level=2, dtype=jnp.float32)
    cfg = RenderConfig(width=8, height=8, spp=1, max_depth=4)
    n = 512
    cam_u = jax.random.uniform(jax.random.key(13), (2, n),
                               dtype=jnp.float32)
    tape = jax.random.uniform(jax.random.key(14), (cfg.max_depth, 3, n),
                              dtype=jnp.float32)
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)
    g = V3(*jax.random.uniform(jax.random.key(15), (3, n),
                               dtype=jnp.float32))

    variants = [DynScene(scene),                       # two-level
                DynScene(scene, super_m=1),            # leaf-only
                DynScene(scene, cluster_min_tris=10**9)]  # unculled
    assert variants[0].n_super > 0 and variants[1].n_super == 0
    outs = []
    for ds in variants:
        tracer = make_dyn_tracer(ds, cam, cfg, tile_rows=8, rng="tape",
                                 interpret=True, n_rays=n,
                                 fastmath=fastmath)
        adj = make_dyn_adjoint(ds, cam, cfg, tile_rows=8, rng="tape",
                               interpret=True, n_rays=n,
                               fastmath=fastmath)
        L = tracer(alb, emi, ds.operands, cam_u, tape)
        da, de = adj(alb, emi, ds.operands, cam_u, tape, g.x, g.y, g.z)
        outs.append((L, da, de))
    (L0, da0, de0) = outs[0]
    assert np.asarray(L0.x).mean() > 0
    for L, da, de in outs[1:]:
        for a, b in zip(L0, L):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(da0), np.asarray(da))
        np.testing.assert_array_equal(np.asarray(de0), np.asarray(de))


def test_dyn_fastmath_matches_exact_statistically():
    """The ratio-carry fastmath sweep (no divides in the nearest-hit
    loop: plane h/denom and triangle 1/det replaced by sign-normalized
    cross-multiplied comparisons, one t = bnum/bden divide per lane
    after the loop) preserves the estimator on the mesh scene: tape-mode
    fastmath vs exact tracer to loose f32 tolerance, and the winner set
    itself is identical up to f32 rounding of degenerate ties."""
    scene, params, cam = gallery.build_mesh(level=1, dtype=jnp.float32)
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=4)
    n = 8 * 8 * 2
    cam_u = jax.random.uniform(jax.random.key(6), (2, n),
                               dtype=jnp.float32)
    tape = jax.random.uniform(jax.random.key(7), (cfg.max_depth, 3, n),
                              dtype=jnp.float32)
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)
    L = {}
    for fm in (False, True):
        tracer = make_dyn_tracer(DynScene(scene), cam, cfg, tile_rows=8,
                                 rng="tape", interpret=True, n_rays=n,
                                 fastmath=fm)
        L[fm] = np.stack([np.asarray(c) for c in
                          tracer(alb, emi, DynScene(scene).operands,
                                 cam_u, tape)])
    assert L[False].mean() > 0
    np.testing.assert_allclose(L[True], L[False], rtol=2e-3, atol=1e-4)


def test_dynscene_rejects_f64():
    scene, params, cam = cbox.build(dtype=jnp.float64)
    with pytest.raises(ValueError, match="f32"):
        DynScene(scene)


def test_make_renderer_dyn_backend_smoke():
    """make_renderer wires the pallas-dyn backend end to end (interpret
    mode kernels under the hood on CPU when forced)."""
    from drt_tpu.parallel.render import make_renderer

    scene, params, cam = gallery.build_mesh(level=1, dtype=jnp.float32)
    cfg = RenderConfig(width=64, height=32, spp=2, max_depth=3)
    render = make_renderer(scene, cfg, cam, backend="pallas-dyn")
    img = np.asarray(render(params, jax.random.key(0)))
    assert img.shape == (32, 64, 3)
    # Interpret-mode internal PRNG is stubbed to zeros on CPU, so only
    # shape/finiteness are checked here; value tests are tape-mode.
    assert np.isfinite(img).all()


def test_split_dyn_matches_expanded_xla():
    """bsdf_samples > 1 on the dyn path: the lane-splitting renderer
    over the memory-resident kernels (87-shape mesh scene, cluster
    culling active) must equal the plain XLA wavefront run on the same
    prefix-expanded per-lane uniforms, and its custom-VJP gradients
    must equal jax.grad of that forward."""
    import dataclasses

    from drt_tpu.fused import (make_split_dyn_image_renderer,
                               split_prefix_tape)
    from drt_tpu.renderer import lane_count

    scene, params, cam = gallery.build_mesh(level=1, dtype=jnp.float32)
    cfg = RenderConfig(width=8, height=8, spp=2, max_depth=3,
                       bsdf_samples=2)
    M = lane_count(cfg)  # 4
    w, h, spp = cfg.width, cfg.height, cfg.spp
    npix = w * h
    n_lanes = npix * spp * M
    seeds = jnp.asarray([5, 11], jnp.int32)

    assert DynScene(scene).n_clusters > 0
    render = make_split_dyn_image_renderer(scene, cam, cfg,
                                           tile_rows=8, interpret=True)
    img = render(params, seeds)

    cam_u, tp = split_prefix_tape(seeds, 0, cfg)
    pix = np.arange(n_lanes) % npix
    xy = jnp.asarray(np.stack([pix % w, pix // w], -1), jnp.int32)
    o, d, _ = camera_rays(cam, w, h, xy, cam_u.T)
    cfg1 = dataclasses.replace(cfg, bsdf_samples=1)

    def img_ref(p):
        L = trace_rays(p, scene, o, d, None, cfg1, tape=tp)
        chans = [c.reshape(M * spp, h, w).mean(axis=0) for c in L]
        return jnp.stack(chans, axis=-1)

    np.testing.assert_allclose(np.asarray(img),
                               np.asarray(img_ref(params)),
                               rtol=2e-5, atol=2e-6)

    g_fused = jax.grad(lambda p: render(p, seeds).sum())(params)
    g_ref = jax.grad(lambda p: img_ref(p).sum())(params)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
    assert np.abs(np.asarray(g_ref.albedo)).max() > 1e-3


def test_make_renderer_split_dyn_backend_smoke():
    """make_renderer wires the pallas-split-dyn backend end to end."""
    from drt_tpu.parallel.render import make_renderer

    scene, params, cam = gallery.build_mesh(level=1, dtype=jnp.float32)
    cfg = RenderConfig(width=16, height=8, spp=2, max_depth=3,
                       bsdf_samples=2)
    render = make_renderer(scene, cfg, cam, backend="pallas-split-dyn")
    img = np.asarray(render(params, jax.random.key(0)))
    assert img.shape == (8, 16, 3)
    assert np.isfinite(img).all() and img.mean() > 0


def test_dyn_unbiased_renderer_builds_and_is_finite():
    """VERDICT r3 #6: the unbiased (fresh-retrace, integrate.hpp:39-52)
    gradient mode on the PRODUCTION mesh path. The dyn family routes
    through the same _build_internal_renderer unbiased branch as the
    baked kernels (salted bounce seed per adjoint sample, averaged over
    cfg.adjoint_samples); here: it builds, runs under interpret, and
    yields finite gradients — the statistical 5-sigma expectation match
    runs on-chip (test_dyn_unbiased_adjoint_on_tpu)."""

    import dataclasses as _dc

    scene, params, cam = SCENES["mesh80"]()
    seeds = jnp.asarray([12345, 67890], jnp.int32)
    cfg_b = RenderConfig(width=16, height=8, spp=2, max_depth=3)
    cfg_u = _dc.replace(cfg_b, unbiased=True, adjoint_samples=2)

    def gfn(cfg):
        render = make_dyn_image_renderer(scene, cam, cfg, tile_rows=8,
                                         interpret=True)
        return jax.grad(lambda p, s: render(p, s).sum())(params, seeds)

    # Interpret-mode internal PRNG is stubbed on CPU, so this pins the
    # build + shape/finiteness contract only; the fresh-stream-vs-replay
    # value behavior is the TPU test below.
    g_b, g_u = gfn(cfg_b), gfn(cfg_u)
    for g in (g_b, g_u):
        assert np.isfinite(np.asarray(g.albedo)).all()
        assert g.albedo.shape == params.albedo.shape
        assert g.emission.shape == params.emission.shape


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="TPU per-core PRNG is not emulated on CPU")
def test_dyn_unbiased_adjoint_on_tpu():
    """On-chip statistical verification of the dyn unbiased adjoint,
    mirroring tests/test_fused.py::test_internal_unbiased_adjoint_on_tpu
    on the memory-resident path: expectation match within 5 SE for a
    linear functional, variance cut from adjoint_samples=4."""
    import dataclasses

    from drt_tpu.fused import seeds_from_key

    scene, params, cam = SCENES["mesh80"]()
    cfg_b = RenderConfig(width=32, height=16, spp=16, max_depth=4)
    cfg_u = dataclasses.replace(cfg_b, unbiased=True)
    cfg_u4 = dataclasses.replace(cfg_b, unbiased=True, adjoint_samples=4)
    w_img = jnp.asarray(np.random.default_rng(0).uniform(
        0.5, 1.5, (16, 32, 3)), jnp.float32)

    def gfn(cfg):
        render = make_dyn_image_renderer(scene, cam, cfg, tile_rows=8)
        return jax.jit(jax.grad(
            lambda p, s: (render(p, s) * w_img).sum()))

    g_b, g_u, g_u4 = (gfn(c) for c in (cfg_b, cfg_u, cfg_u4))

    def sample(g, seed):
        return np.asarray(g(params, seeds_from_key(jax.random.key(seed)))
                          .albedo)

    trials = 32
    gb = np.stack([sample(g_b, s) for s in range(trials)])
    gu = np.stack([sample(g_u, s) for s in range(trials)])
    gu4 = np.stack([sample(g_u4, s) for s in range(trials)])
    assert np.abs(gu - gb).max() > 1e-6
    se = np.sqrt(gb.var(0) / trials + gu.var(0) / trials)
    np.testing.assert_array_less(np.abs(gu.mean(0) - gb.mean(0)),
                                 5.0 * se + 1e-8)
    assert gu4.var(0).mean() < 0.6 * gu.var(0).mean(), (
        gu.var(0).mean(), gu4.var(0).mean())
