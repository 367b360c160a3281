"""CPU (interpret) verification of the regeneration kernel vs the XLA
wavefront fed the SAME hash-keyed uniforms via tape injection.

Run: JAX_PLATFORMS=cpu python tools/check_regen.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from drt_tpu.camera import camera_rays, pixel_grid
from drt_tpu.config import RenderConfig
from drt_tpu.models.cbox import build as build_cbox
from drt_tpu.ops.regen import hash_tapes, make_regen_tracer
from drt_tpu.renderer import trace_rays
from drt_tpu.scene import albedo_table, emission_table


def oracle_image(params, scene, cam, cfg, seeds, sample_base=0):
    npix = cfg.width * cfg.height
    dtype = cam.forward.dtype
    cam_u, tape = hash_tapes(seeds, npix, cfg.spp, cfg.max_depth, dtype,
                             sample_base=sample_base)
    xy = jnp.tile(pixel_grid(cfg.width, cfg.height), (cfg.spp, 1))
    orig, d, _ = camera_rays(cam, cfg.width, cfg.height, xy, cam_u.T)
    key = jax.random.PRNGKey(0)  # ignored under tape
    L = trace_rays(params, scene, orig, d, key, cfg, tape=tape)
    # spp-outer ray order: ray i -> pixel i % npix
    per = jnp.stack([L.x, L.y, L.z], -1).reshape(cfg.spp, npix, 3)
    return per


def main():
    scene, params, cam = build_cbox()
    seeds = jnp.asarray([12345, 67890], jnp.int32)

    for spp, tag in ((1, "spp=1 bit parity"), (8, "spp=8 sum parity")):
        cfg = RenderConfig(width=40, height=24, spp=spp, max_depth=5)
        per = np.asarray(oracle_image(params, scene, cam, cfg, seeds))
        trace = make_regen_tracer(scene, cam, cfg, tile_rows=8,
                                  interpret=True)
        alb = albedo_table(scene, params)
        emi = emission_table(scene, params)
        L, trips = trace(alb, emi, seeds)
        img = np.stack([np.asarray(L.x), np.asarray(L.y),
                        np.asarray(L.z)], -1)
        want = per.sum(0)
        err = np.abs(img - want)
        denom = np.maximum(np.abs(want), 1e-6)
        rel = (err / denom).max()
        print(f"[{tag}] max abs diff {err.max():.3e}  max rel {rel:.3e}  "
              f"trips={np.asarray(trips).tolist()}  "
              f"budget={spp * cfg.max_depth}")
        if spp == 1:
            # vs the XLA wavefront: tiny op-fusion rounding differences
            # are possible; the BIT-equal oracle is the lockstep fused
            # tape kernel below.
            assert rel < 5e-7, "spp=1 tolerance vs XLA exceeded"
            from drt_tpu.ops.megakernel import make_fused_tracer
            cam_u, tape = hash_tapes(seeds, cfg.width * cfg.height, 1,
                                     cfg.max_depth, cam.forward.dtype)
            tr = make_fused_tracer(scene, cam, cfg, tile_rows=8,
                                   rng="tape", interpret=True)
            Lf = tr(alb, emi, cam_u, tape)
            flk = np.stack([np.asarray(Lf.x), np.asarray(Lf.y),
                            np.asarray(Lf.z)], -1)
            dk = np.abs(img - flk).max()
            print(f"[spp=1 vs lockstep-tape kernel] max abs diff {dk:.3e}")
            assert dk == 0.0, "regen must bit-equal the lockstep kernel"
        else:
            assert rel < 1e-5, "sum-order tolerance exceeded"

    # Gradients: regen stored-sweep VJP vs autodiff through the XLA
    # wavefront on the SAME hash tapes (biased replay == autodiff of the
    # forward estimator).
    from drt_tpu.fused import make_regen_image_renderer

    cfg = RenderConfig(width=40, height=24, spp=8, max_depth=5,
                       spp_chunks=2)
    for adj in ("stored", "retrace"):
        render = make_regen_image_renderer(scene, cam, cfg, tile_rows=8,
                                           interpret=True, adjoint=adj)
        gkey = jax.random.PRNGKey(7)
        gw = jax.random.normal(gkey, (cfg.height, cfg.width, 3),
                               cam.forward.dtype)

        def loss_regen(p):
            return (render(p, seeds) * gw).sum()

        def loss_oracle(p):
            npix = cfg.width * cfg.height
            per_chunk = []
            spp_c = cfg.spp // cfg.spp_chunks
            for c in range(cfg.spp_chunks):
                sub = RenderConfig(width=cfg.width, height=cfg.height,
                                   spp=spp_c, max_depth=cfg.max_depth)
                per = oracle_image(p, scene, cam, sub, seeds,
                                   sample_base=c * spp_c)
                per_chunk.append(per.sum(0))
            img = sum(per_chunk).reshape(cfg.height, cfg.width, 3) / cfg.spp
            return (img * gw).sum()

        v_r, g_r = jax.value_and_grad(loss_regen)(params)
        v_o, g_o = jax.value_and_grad(loss_oracle)(params)
        print(f"[grad {adj}] value diff {abs(float(v_r - v_o)):.3e}")
        for name in ("albedo", "emission"):
            a = np.asarray(getattr(g_r, name))
            b = np.asarray(getattr(g_o, name))
            rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)
            print(f"[grad {adj}] {name} max rel diff {rel:.3e}")
            assert rel < 5e-5, (name, adj, rel)
    print("OK")


if __name__ == "__main__":
    main()
