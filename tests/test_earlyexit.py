"""Experimental per-tile early-exit tracer (ops/earlyexit.py): must be
bit-equal to the lockstep megakernel on a shared tape (the kernels draw
identical streams; early exit only skips all-dead tiles' compute).

Measured on TPU v5e the early-exit variant is NET SLOWER at every
depth/tile tested (docs/KERNELS.md "Masked-lane waste"); it is kept as
the documented negative result for VERDICT r1 item 3.
"""

import numpy as np

import jax
import jax.numpy as jnp

from drt_tpu.config import RenderConfig
from drt_tpu.models import cbox
from drt_tpu.ops.earlyexit import make_earlyexit_tracer
from drt_tpu.ops.megakernel import make_fused_tracer
from drt_tpu.scene import albedo_table, emission_table


def test_earlyexit_matches_lockstep_on_tape():
    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=16, height=8, spp=4, max_depth=6)
    n = cfg.width * cfg.height * cfg.spp
    cam_u = jax.random.uniform(jax.random.key(1), (2, n),
                               dtype=jnp.float32)
    tape = jax.random.uniform(jax.random.key(2),
                              (cfg.max_depth, 3, n), dtype=jnp.float32)
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)

    std = make_fused_tracer(scene, cam, cfg, tile_rows=1, rng="tape",
                            interpret=True)
    ee = make_earlyexit_tracer(scene, cam, cfg, tile_rows=1, rng="tape",
                               interpret=True)
    Ls = std(alb, emi, cam_u, tape)
    Le = ee(alb, emi, cam_u, tape)
    a = np.stack([np.asarray(c) for c in Ls])
    b = np.stack([np.asarray(c) for c in Le])
    assert a.mean() > 0
    np.testing.assert_array_equal(b, a)
