"""Dyn-regen kernel tests (ops/dynregen.py): path regeneration over
memory-resident scenes, pinned to the dyn tape kernels / XLA wavefront
exactly as tests/test_regen.py pins the baked regen kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drt_tpu.camera import camera_rays, pixel_grid
from drt_tpu.config import RenderConfig
from drt_tpu.fused import make_dyn_regen_image_renderer
from drt_tpu.models import gallery
from drt_tpu.ops.dynkernel import DynScene, make_dyn_tracer
from drt_tpu.ops.dynregen import make_dyn_regen_tracer
from drt_tpu.ops.regen import hash_tapes
from drt_tpu.renderer import trace_rays
from drt_tpu.scene import albedo_table, emission_table

SEEDS = jnp.asarray([4242, 777], jnp.int32)


@pytest.fixture(scope="module")
def mesh_scene():
    return gallery.build_mesh(level=1, dtype=jnp.float32)


def test_dyn_regen_bit_equals_dyn_tape_kernel_spp1(mesh_scene):
    scene, params, cam = mesh_scene
    cfg = RenderConfig(width=40, height=24, spp=1, max_depth=4)
    ds = DynScene.of(scene)
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)
    npix = cfg.width * cfg.height
    cam_u, tape = hash_tapes(SEEDS, npix, 1, cfg.max_depth, jnp.float32)
    lock = make_dyn_tracer(ds, cam, cfg, tile_rows=8, rng="tape",
                           interpret=True)
    Lw = lock(alb, emi, ds.operands, cam_u, tape)
    want = np.stack([np.asarray(c) for c in (Lw.x, Lw.y, Lw.z)], -1)
    trg = make_dyn_regen_tracer(ds, cam, cfg, tile_rows=8, interpret=True)
    L, trips = trg(alb, emi, ds.operands, SEEDS)
    got = np.stack([np.asarray(c) for c in (L.x, L.y, L.z)], -1)
    np.testing.assert_array_equal(got, want)
    assert int(np.asarray(trips).max()) <= cfg.max_depth


@pytest.mark.parametrize("adjoint", ["stored", "retrace"])
def test_dyn_regen_renderer_grads_match_xla_autodiff(mesh_scene, adjoint):
    scene, params, cam = mesh_scene
    cfg = RenderConfig(width=24, height=16, spp=4, max_depth=4,
                       spp_chunks=2)
    spp_c = cfg.spp // cfg.spp_chunks
    npix = cfg.width * cfg.height
    render = make_dyn_regen_image_renderer(scene, cam, cfg, tile_rows=8,
                                           interpret=True, adjoint=adjoint)
    gw = jax.random.normal(jax.random.PRNGKey(3),
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
        assert rel < 5e-5, (name, adjoint, rel)


def test_sharded_dyn_regen_matches_single_device(mesh_scene):
    from jax.sharding import Mesh

    from drt_tpu.fused import make_sharded_dyn_regen_image_renderer

    scene, params, cam = mesh_scene
    cfg = RenderConfig(width=128, height=64, spp=2, max_depth=3)
    devs = jax.devices("cpu")[:8]
    mesh = Mesh(np.asarray(devs), ("tiles",))
    single = make_dyn_regen_image_renderer(scene, cam, cfg, tile_rows=8,
                                           interpret=True,
                                           adjoint="stored")
    sharded = make_sharded_dyn_regen_image_renderer(
        scene, cam, cfg, mesh, tile_rows=8, interpret=True,
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
        assert rel < 1e-6, (name, rel)
