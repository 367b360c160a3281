"""Scaling benchmark: sharded-render throughput vs device count.

BASELINE.md asks for rays/s scaling efficiency from 1 device to N. Real
multi-chip hardware is not available in this environment, so this tool
measures the sharded XLA wavefront path over an N-device mesh:

  - on a TPU pod slice it measures real ICI scaling (run it there);
  - locally it runs on virtual CPU devices
    (XLA_FLAGS=--xla_force_host_platform_device_count=N), which validates
    the sharding/collective structure and reports *functional* scaling
    numbers (CPU "devices" share the same cores, so speedup is not
    expected — efficiency is meaningful only on real chips).

Prints one JSON line per device count plus a summary line with the
1 -> max-devices efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None,
                    help="device counts to measure (default: 1..all)")
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (set before jax init)")
    ap.add_argument("-x", "--width", type=int, default=512)
    ap.add_argument("-y", "--height", type=int, default=384)
    ap.add_argument("-n", "--spp", type=int, default=8)
    ap.add_argument("--max-depth", type=int, default=4)
    ap.add_argument("--backend", default="auto",
                    choices=("auto", "xla", "pallas-sharded"),
                    help="auto = the production path for the platform "
                         "(pallas-sharded fused kernels on TPU when the "
                         "rays tile over the mesh, xla elsewhere)")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()

    import jax

    if args.virtual:
        # Env JAX_PLATFORMS can be overridden by platform plugins (e.g.
        # the axon TPU tunnel); the config knob wins.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from drt_tpu.config import RenderConfig
    from drt_tpu.models import cbox
    from drt_tpu.parallel.mesh import make_mesh
    from drt_tpu.parallel.render import make_renderer

    n_dev = len(jax.devices())
    counts = args.devices or [c for c in (1, 2, 4, 8, 16, 32) if c <= n_dev]
    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       max_depth=args.max_depth)
    n_rays = args.width * args.height * args.spp

    from drt_tpu.parallel.render import resolve_backend

    results = {}
    backends = {}
    for c in counts:
        mesh = make_mesh(devices=jax.devices()[:c],
                         shape=(c, 1))
        backends[c] = resolve_backend(scene, cfg, mesh, args.backend)
        render = make_renderer(scene, cfg, cam, mesh=mesh,
                               differentiable=True, backend=backends[c])

        def loss(p, key):
            return render(p, key).sum()

        step = jax.jit(jax.value_and_grad(loss))
        key = jax.random.key(0)
        jax.block_until_ready(step(params, key))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(step(params, key))
            best = min(best, time.perf_counter() - t0)
        mrays = n_rays / best / 1e6
        results[c] = mrays
        print(json.dumps({"devices": c, "fwdbwd_mrays_s": round(mrays, 3),
                          "t_s": round(best, 4),
                          "backend": backends[c]}))

    lo, hi = min(results), max(results)
    eff = results[hi] / (results[lo] * (hi / lo)) if hi > lo else 1.0
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"fraction of linear {lo}->{hi} devices",
        "platform": jax.default_backend(),
        "note": ("virtual CPU devices share cores; efficiency is "
                 "meaningful on real chips only"
                 if jax.default_backend() == "cpu" else "real devices"),
    }))


if __name__ == "__main__":
    sys.exit(main())
