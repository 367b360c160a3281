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
from drt_tpu.ops.megakernel import make_fused_tracer
from drt_tpu.ops.regen import hash_tapes, make_regen_tracer
from drt_tpu.renderer import trace_rays
from drt_tpu.scene import albedo_table, emission_table

scene, params, cam = build_cbox()
seeds = jnp.asarray([12345, 67890], jnp.int32)
cfg = RenderConfig(width=40, height=24, spp=1, max_depth=5)
npix = cfg.width * cfg.height
dtype = cam.forward.dtype

cam_u, tape = hash_tapes(seeds, npix, 1, cfg.max_depth, dtype)
alb = albedo_table(scene, params)
emi = emission_table(scene, params)

# XLA oracle
xy = pixel_grid(cfg.width, cfg.height)
orig, d, _ = camera_rays(cam, cfg.width, cfg.height, xy, cam_u.T)
Lx = trace_rays(params, scene, orig, d, jax.random.PRNGKey(0), cfg,
                tape=tape)
xla = np.stack([np.asarray(c) for c in (Lx.x, Lx.y, Lx.z)], -1)

# lockstep fused tape kernel
tr = make_fused_tracer(scene, cam, cfg, tile_rows=8, rng="tape",
                       interpret=True)
Lf = tr(alb, emi, cam_u, tape)
fused = np.stack([np.asarray(c) for c in (Lf.x, Lf.y, Lf.z)], -1)

# regen kernel
trg = make_regen_tracer(scene, cam, cfg, tile_rows=8, interpret=True)
Lr, trips = trg(alb, emi, seeds)
regen = np.stack([np.asarray(c) for c in (Lr.x, Lr.y, Lr.z)], -1)

print("xla vs fused  max abs:", np.abs(xla - fused).max())
print("xla vs regen  max abs:", np.abs(xla - regen).max())
print("fused vs regen max abs:", np.abs(fused - regen).max())
bad = np.abs(fused - regen).max(-1)
idx = int(bad.argmax())
print("worst pixel", idx, "fused", fused[idx], "regen", regen[idx],
      "xla", xla[idx])
nbad = int((bad > 0).sum())
print("pixels differing fused-vs-regen:", nbad, "/", npix)
