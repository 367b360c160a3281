"""Minimal repro / bisect harness for the XLA-wavefront fwd+bwd TPU
device error (docs/ROUND3_NOTES.md §1; VERDICT r3 weak-#6).

Observed: the differentiable XLA wavefront on the mesh-87 scene dies
with "UNAVAILABLE: TPU device error" at 640x480x256 (spp_chunks=16 ->
4.9M rays/chunk x 87 shapes), 2/2 runs, while 320x240x32/4-chunks
(614k rays/chunk) completes with finite grads. This tool walks a ladder
of per-chunk ray counts at fixed scene size and reports the largest
green rung, so parallel/render.XLA_FWDBWD_MAX_RAY_SHAPES can be pinned
to a measured bound instead of the current conservative 1e8.

Each rung runs in THIS process (the failure is a runtime/infra abort;
run under a driver that tolerates a dead process, or pass --one-rung N
from a shell loop to isolate each rung in its own process).

Usage: python tools/repro_xla_bigscene.py [--level 1] [--one-rung IDX]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

# (width, height, spp, spp_chunks) ladder, increasing rays/chunk.
RUNGS = [
    (320, 240, 32, 4),    # 6.1e5 rays/chunk — known good
    (640, 480, 32, 4),    # 2.5e6
    (640, 480, 64, 4),    # 4.9e6
    (640, 480, 128, 4),   # 9.8e6
    (640, 480, 256, 4),   # 2.0e7
    (640, 480, 256, 16),  # 4.9e6 rays/chunk but 16 chunks (headline)
]


def run_rung(scene, params, cam, rung):
    from drt_tpu.adjoint import make_diff_image_renderer
    from drt_tpu.config import RenderConfig

    w, h, spp, chunks = rung
    cfg = RenderConfig(width=w, height=h, spp=spp, max_depth=5,
                       min_bounces=1, absorb_prob=0.5, spp_chunks=chunks)
    diff = make_diff_image_renderer(scene, cam, cfg)

    @jax.jit
    def fwdbwd(p, key_data):
        return jax.value_and_grad(lambda pp: diff(pp, key_data).sum())(p)

    key_data = jax.random.key_data(jax.random.key(0))
    t0 = time.perf_counter()
    val, grads = jax.block_until_ready(fwdbwd(params, key_data))
    dt = time.perf_counter() - t0
    finite = bool(jnp.isfinite(val)
                  & jnp.isfinite(grads.albedo).all()
                  & jnp.isfinite(grads.emission).all())
    return {"rung": rung, "seconds": round(dt, 1), "finite": finite,
            "rays_per_chunk": w * h * (spp // chunks)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=1,
                    help="icosphere level (1 -> 87-shape scene)")
    ap.add_argument("--one-rung", type=int, default=None,
                    help="run only RUNGS[i] (process-isolated bisection)")
    args = ap.parse_args()

    from drt_tpu.models import gallery
    scene, params, cam = gallery.build_mesh(level=args.level,
                                            dtype=jnp.float32)
    print(f"# scene shapes={scene.num_shapes} "
          f"backend={jax.default_backend()}", flush=True)

    rungs = ([RUNGS[args.one_rung]] if args.one_rung is not None
             else RUNGS)
    for rung in rungs:
        print(f"# running rung {rung}...", flush=True)
        print(json.dumps(run_rung(scene, params, cam, rung)), flush=True)


if __name__ == "__main__":
    main()
