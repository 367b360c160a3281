"""Chunk-grid fusion: the spp-chunk loop riding the kernel grid
(megakernel/dynkernel `n_chunks > 1`) must be launch-for-launch
equivalent to the host-side per-chunk loop it replaces (fused.py's
`chunked=False` path) — same seeds per chunk (fused._chunk_seeds ==
megakernel._chunk_seed_pair), chunk-summed radiance, chunk-dim stored
residuals, and SMEM gradient partials accumulated over the full
(tile, chunk) grid.

On CPU the Pallas interpreter stubs the TPU PRNG (all chunks draw the
same zeros), so these tests validate the grid/accumulation/spec
plumbing: bit-equality of N-chunk one-launch vs N separate launches,
and stored-vs-retrace agreement through the public renderer. The
seed-advance arithmetic itself is verified in-kernel on real TPU by
test_chunkgrid_seeds_advance_on_tpu.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drt_tpu import fused
from drt_tpu.config import RenderConfig
from drt_tpu.models import cbox
from drt_tpu.ops.dynkernel import DynScene, make_dyn_tracer
from drt_tpu.ops.megakernel import (CAM_CHUNK_STRIDE, BOUNCE_CHUNK_STRIDE,
                                    make_fused_adjoint,
                                    make_fused_collect_tracer,
                                    make_fused_sweep_adjoint,
                                    make_fused_tracer)
from drt_tpu.ops.vecmath import V3
from drt_tpu.scene import albedo_table, emission_table

CFG = RenderConfig(width=16, height=8, spp=8, spp_chunks=4, max_depth=3)
SEEDS = jnp.asarray([1234, 5678], jnp.int32)


def _sum_v3(a, b):
    return V3(a.x + b.x, a.y + b.y, a.z + b.z)


def test_chunk_seed_strides_match_host_loop():
    """fused._chunk_seeds (the host loop) and the in-kernel strides are
    the same arithmetic — chunk c's (cam, bounce) seed words agree."""
    def wrap(x):  # i32 two's-complement wraparound, warning-free
        return np.int64(x).astype(np.uint64).astype(np.uint32) \
            .astype(np.int32)

    for c in range(5):
        host = np.asarray(fused._chunk_seeds(SEEDS, c))
        cam = wrap(int(SEEDS[0]) + int(CAM_CHUNK_STRIDE) * c)
        bnc = wrap(int(SEEDS[1]) + int(BOUNCE_CHUNK_STRIDE) * c)
        assert host[0] == cam and host[1] == bnc


def test_baked_tracer_chunk_grid_bit_equals_host_loop():
    scene, params, cam = cbox.build(dtype=jnp.float32)
    alb, emi = albedo_table(scene, params), emission_table(scene, params)
    tr1 = make_fused_tracer(scene, cam, CFG, interpret=True, n_chunks=1)
    trN = make_fused_tracer(scene, cam, CFG, interpret=True,
                            n_chunks=CFG.spp_chunks)
    LN = trN(alb, emi, SEEDS)
    acc = None
    for c in range(CFG.spp_chunks):
        Lc = tr1(alb, emi, fused._chunk_seeds(SEEDS, c))
        acc = Lc if acc is None else _sum_v3(acc, Lc)
    for nm in ("x", "y", "z"):
        np.testing.assert_array_equal(np.asarray(getattr(LN, nm)),
                                      np.asarray(getattr(acc, nm)))


def test_dyn_tracer_chunk_grid_bit_equals_host_loop():
    scene, params, cam = cbox.build(dtype=jnp.float32)
    ds = DynScene(scene)
    alb, emi = albedo_table(scene, params), emission_table(scene, params)
    tr1 = make_dyn_tracer(ds, cam, CFG, interpret=True, n_chunks=1)
    trN = make_dyn_tracer(ds, cam, CFG, interpret=True,
                          n_chunks=CFG.spp_chunks)
    LN = trN(alb, emi, ds.operands, SEEDS)
    acc = None
    for c in range(CFG.spp_chunks):
        Lc = tr1(alb, emi, ds.operands, fused._chunk_seeds(SEEDS, c))
        acc = Lc if acc is None else _sum_v3(acc, Lc)
    for nm in ("x", "y", "z"):
        np.testing.assert_array_equal(np.asarray(getattr(LN, nm)),
                                      np.asarray(getattr(acc, nm)))


def test_collect_and_sweep_chunk_grid_match_host_loop():
    """Chunk-dim residuals: collect's L/rsc/rbest and the sweep's
    gradient partials equal the per-chunk launches, bit for bit."""
    scene, params, cam = cbox.build(dtype=jnp.float32)
    alb, emi = albedo_table(scene, params), emission_table(scene, params)
    col1 = make_fused_collect_tracer(scene, cam, CFG, interpret=True,
                                     n_chunks=1)
    colN = make_fused_collect_tracer(scene, cam, CFG, interpret=True,
                                     n_chunks=CFG.spp_chunks)
    LN, rscN, rbestN = colN(alb, emi, SEEDS)
    accL = None
    for c in range(CFG.spp_chunks):
        Lc, rsc_c, rbest_c = col1(alb, emi, fused._chunk_seeds(SEEDS, c))
        accL = Lc if accL is None else _sum_v3(accL, Lc)
        np.testing.assert_array_equal(np.asarray(rscN[c]),
                                      np.asarray(rsc_c))
        np.testing.assert_array_equal(np.asarray(rbestN[c]),
                                      np.asarray(rbest_c))
    for nm in ("x", "y", "z"):
        np.testing.assert_array_equal(np.asarray(getattr(LN, nm)),
                                      np.asarray(getattr(accL, nm)))

    sw1 = make_fused_sweep_adjoint(scene, CFG, interpret=True, n_chunks=1)
    swN = make_fused_sweep_adjoint(scene, CFG, interpret=True,
                                   n_chunks=CFG.spp_chunks)
    n = rscN.shape[-1]
    g = V3(jnp.full((n,), 0.25, jnp.float32),
           jnp.full((n,), 0.5, jnp.float32),
           jnp.full((n,), 0.125, jnp.float32))
    daN, deN = swN(alb, emi, rscN, rbestN, g)
    da = de = None
    for c in range(CFG.spp_chunks):
        da_c, de_c = sw1(alb, emi, rscN[c], rbestN[c], g)
        da = da_c if da is None else da + da_c
        de = de_c if de is None else de + de_c
    np.testing.assert_allclose(np.asarray(daN), np.asarray(da),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(deN), np.asarray(de),
                               rtol=1e-6, atol=1e-7)


def test_adjoint_chunk_grid_matches_host_loop():
    scene, params, cam = cbox.build(dtype=jnp.float32)
    alb, emi = albedo_table(scene, params), emission_table(scene, params)
    ad1 = make_fused_adjoint(scene, cam, CFG, interpret=True, n_chunks=1)
    adN = make_fused_adjoint(scene, cam, CFG, interpret=True,
                             n_chunks=CFG.spp_chunks)
    spp_c = CFG.spp // CFG.spp_chunks
    n = CFG.width * CFG.height * spp_c
    g = V3(jnp.full((n,), 0.5, jnp.float32),
           jnp.full((n,), 0.25, jnp.float32),
           jnp.full((n,), 1.0, jnp.float32))
    daN, deN = adN(alb, emi, SEEDS, g)
    da = de = None
    for c in range(CFG.spp_chunks):
        da_c, de_c = ad1(alb, emi, fused._chunk_seeds(SEEDS, c), g)
        da = da_c if da is None else da + da_c
        de = de_c if de is None else de + de_c
    np.testing.assert_allclose(np.asarray(daN), np.asarray(da),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(deN), np.asarray(de),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("maker", ["baked", "dyn"])
def test_renderer_stored_matches_retrace_chunked(maker):
    """Through the public renderer (now one launch per fwd/bwd): the
    stored-residual sweep and the retrace adjoint agree — exercising
    chunk-dim residual routing end to end."""
    scene, params, cam = cbox.build(dtype=jnp.float32)
    make = (fused.make_fused_image_renderer if maker == "baked"
            else fused.make_dyn_image_renderer)
    imgs, grads = [], []
    for adjoint in ("retrace", "stored"):
        r = make(scene, cam, CFG, adjoint=adjoint, interpret=True)
        img, vjp = jax.vjp(lambda p: r(p, SEEDS), params)
        gr = vjp(jnp.ones_like(img))[0]
        imgs.append(np.asarray(img))
        grads.append((np.asarray(gr.albedo), np.asarray(gr.emission)))
    np.testing.assert_array_equal(imgs[0], imgs[1])
    np.testing.assert_allclose(grads[0][0], grads[1][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(grads[0][1], grads[1][1],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="needs the real in-kernel TPU PRNG")
def test_chunkgrid_seeds_advance_on_tpu():
    """On real TPU (live PRNG): the one-launch chunk grid reproduces N
    separate launches bit-for-bit — including the in-kernel per-chunk
    seed advance, which the CPU interpreter cannot exercise."""
    scene, params, cam = cbox.build(dtype=jnp.float32)
    alb, emi = albedo_table(scene, params), emission_table(scene, params)
    tr1 = make_fused_tracer(scene, cam, CFG, n_chunks=1)
    trN = make_fused_tracer(scene, cam, CFG, n_chunks=CFG.spp_chunks)
    LN = trN(alb, emi, SEEDS)
    acc = None
    for c in range(CFG.spp_chunks):
        Lc = tr1(alb, emi, fused._chunk_seeds(SEEDS, c))
        acc = Lc if acc is None else _sum_v3(acc, Lc)
    for nm in ("x", "y", "z"):
        np.testing.assert_array_equal(np.asarray(getattr(LN, nm)),
                                      np.asarray(getattr(acc, nm)))
    # Distinct chunks must draw distinct streams (stride actually lands).
    L0 = tr1(alb, emi, fused._chunk_seeds(SEEDS, 0))
    L1 = tr1(alb, emi, fused._chunk_seeds(SEEDS, 1))
    assert not np.array_equal(np.asarray(L0.x), np.asarray(L1.x))
