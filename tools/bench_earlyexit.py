"""Measure the per-tile early-exit tracer vs the lockstep megakernel
(VERDICT r1 item 3 — Pallas-level masked-lane-waste attack).

Runs the internal-RNG forward at several depths and tile sizes on the
real chip and prints one JSON line per config. The early-exit kernel's
radiance is bit-equal to the lockstep kernel's (asserted per run).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    from drt_tpu.config import RenderConfig
    from drt_tpu.models import cbox
    from drt_tpu.ops.earlyexit import make_earlyexit_tracer
    from drt_tpu.ops.megakernel import make_fused_tracer
    from drt_tpu.scene import albedo_table, emission_table

    scene, params, cam = cbox.build(dtype=jnp.float32)
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)
    seeds = jnp.asarray([1234, 5678], jnp.int32)

    def time_best(fn, reps=5):
        jax.block_until_ready(fn())
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    REPS = 4  # launches per jit: amortize the ~25 ms axon dispatch

    for depth in (5, 8, 16):
        for tile_rows in (16, 8):  # Mosaic requires sublane % 8 == 0
            cfg = RenderConfig(width=640, height=480, spp=32,
                               max_depth=depth)
            n = cfg.width * cfg.height * cfg.spp

            std = make_fused_tracer(scene, cam, cfg, tile_rows=tile_rows)
            ee = make_earlyexit_tracer(scene, cam, cfg,
                                       tile_rows=tile_rows)

            def many(tracer):
                def f():
                    acc = jnp.zeros(())
                    for r in range(REPS):  # distinct seeds: no CSE
                        L = tracer(alb, emi, seeds + r)
                        acc = acc + L.x[0] + L.y[0] + L.z[0]
                    return acc
                return jax.jit(f)

            t_std = time_best(many(std)) / REPS
            t_ee = time_best(many(ee)) / REPS
            Ls = std(alb, emi, seeds)
            Le = ee(alb, emi, seeds)
            same = all(bool(jnp.array_equal(a, b))
                       for a, b in zip(Ls, Le))
            print(json.dumps({
                "depth": depth, "tile_rows": tile_rows,
                "lockstep_ms": round(t_std * 1e3, 2),
                "earlyexit_ms": round(t_ee * 1e3, 2),
                "speedup": round(t_std / t_ee, 3),
                "lockstep_mrays_s": round(n / t_std / 1e6, 1),
                "earlyexit_mrays_s": round(n / t_ee / 1e6, 1),
                "bit_equal": same,
            }), flush=True)


if __name__ == "__main__":
    main()
