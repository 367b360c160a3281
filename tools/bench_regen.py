"""A/B the path-regeneration forward kernel vs the lockstep fused
forward on the real chip.

Different RNG families (hash-keyed vs hardware PRNG streams), so images
agree statistically, not bitwise; throughput is the measurement. Prints
one JSON object, incrementally keyed (partial output survives a crash).

Usage: python tools/bench_regen.py [--depth 5] [--spp 256]
       [--tile-rows 8 16 32] [--chunks 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp


def time_best(fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[0], ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--chunks", type=int, nargs="+", default=[16, 4, 1],
                    help="spp_chunks sweep: the trip loop is gated by "
                         "the slowest lane, so packing efficiency GROWS "
                         "with per-launch spp (spp/chunks) — measured "
                         "ratio 0.775 at spp_c=8 vs ~0.39 asymptote "
                         "(tests/test_regen.py trip-premise test)")
    ap.add_argument("--tile-rows", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--skip-lockstep", action="store_true")
    args = ap.parse_args()

    from drt_tpu.config import RenderConfig
    from drt_tpu.fused import make_fused_image_renderer, seeds_from_key
    from drt_tpu.models import cbox
    from drt_tpu.ops.regen import make_regen_tracer
    from drt_tpu.scene import albedo_table, emission_table

    scene, params, cam = cbox.build(dtype=jnp.float32)
    seeds = seeds_from_key(jax.random.key(0))
    out = {"depth": args.depth, "spp": args.spp, "chunks": args.chunks}
    for n_chunks in args.chunks:
        run_one(args, scene, params, cam, seeds, n_chunks, out)
    print(json.dumps(out, indent=1))


def run_one(args, scene, params, cam, seeds, n_chunks, out):
    import dataclasses  # noqa: F401

    from drt_tpu.config import RenderConfig
    from drt_tpu.fused import make_fused_image_renderer
    from drt_tpu.ops.regen import make_regen_tracer
    from drt_tpu.scene import albedo_table, emission_table

    cfg = RenderConfig(width=640, height=480, spp=args.spp,
                       min_bounces=1, absorb_prob=0.5,
                       max_depth=args.depth, spp_chunks=n_chunks)
    n_rays = cfg.width * cfg.height * cfg.spp
    spp_c = cfg.spp // cfg.spp_chunks
    ck = f"c{n_chunks}_"

    ref_img = None
    if not args.skip_lockstep and f"lockstep_c{n_chunks}_fwd_mrays_s" \
            not in out:
        render = make_fused_image_renderer(scene, cam, cfg, fastmath=True)
        fwd = jax.jit(render)
        fwdbwd = jax.jit(lambda p, s: jax.value_and_grad(
            lambda pp: render(pp, s).sum())(p))
        tf, tf_med = time_best(fwd, params, seeds)
        out[f"lockstep_c{n_chunks}_fwd_mrays_s"] = round(n_rays / tf / 1e6, 1)
        out[f"lockstep_c{n_chunks}_fwd_mrays_s_median"] = round(n_rays / tf_med / 1e6, 1)
        tb, _ = time_best(fwdbwd, params, seeds)
        out[f"lockstep_c{n_chunks}_fwdbwd_mrays_s"] = round(n_rays / tb / 1e6, 1)
        ref_img = np.asarray(fwd(params, seeds))
        print(json.dumps(out), flush=True)

    h, w = cfg.height, cfg.width
    for tr in args.tile_rows:
        t0 = time.perf_counter()
        # Chunk-grid tracer (production form): the spp-chunk loop rides
        # the kernel grid — one launch per forward regardless of
        # spp_chunks. trips comes back i32[n_tiles, n_chunks].
        trace = make_regen_tracer(scene, cam, cfg, tile_rows=tr,
                                  fastmath=True,
                                  n_chunks=cfg.spp_chunks)

        def render_regen(p, s, trace=trace):
            alb = albedo_table(scene, p)
            emi = emission_table(scene, p)
            L, trips = trace(alb, emi, s)
            img = jnp.stack([L.x, L.y, L.z], -1)
            return (img / cfg.spp).reshape(h, w, 3), trips

        fwd_r = jax.jit(render_regen)
        try:
            img_r, trips = jax.block_until_ready(fwd_r(params, seeds))
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            out[f"regen_{ck}tr{tr}_error"] = repr(e)[:300]
            print(json.dumps(out), flush=True)
            continue
        out[f"regen_{ck}tr{tr}_compile_s"] = round(time.perf_counter() - t0, 1)
        tf, tf_med = time_best(fwd_r, params, seeds)
        out[f"regen_{ck}tr{tr}_fwd_mrays_s"] = round(n_rays / tf / 1e6, 1)
        out[f"regen_{ck}tr{tr}_fwd_mrays_s_median"] = round(
            n_rays / tf_med / 1e6, 1)
        trips = np.asarray(trips)
        out[f"regen_{ck}tr{tr}_trips_mean"] = float(trips.mean())
        out[f"regen_{ck}tr{tr}_trips_max"] = int(trips.max())
        out[f"regen_{ck}tr{tr}_trip_budget"] = int(spp_c * cfg.max_depth)
        img_r = np.asarray(img_r)
        out[f"regen_{ck}tr{tr}_finite"] = bool(np.isfinite(img_r).all())
        if ref_img is not None:
            out[f"regen_{ck}tr{tr}_mean_rel_diff"] = float(
                abs(img_r.mean() - ref_img.mean()) / ref_img.mean())
            out[f"regen_{ck}tr{tr}_px_rel_rms"] = float(
                np.sqrt(((img_r - ref_img) ** 2).mean())
                / max(ref_img.std(), 1e-9))
        print(json.dumps(out), flush=True)

        # fwd+bwd through the regen image renderer (stored sweep)
        from drt_tpu.fused import make_regen_image_renderer

        try:
            render_r = make_regen_image_renderer(scene, cam, cfg,
                                                 tile_rows=tr)
            fwdbwd_r = jax.jit(lambda p, s: jax.value_and_grad(
                lambda pp: render_r(pp, s).sum())(p))
            v, g = jax.block_until_ready(fwdbwd_r(params, seeds))
            tb, tb_med = time_best(fwdbwd_r, params, seeds)
            out[f"regen_{ck}tr{tr}_fwdbwd_mrays_s"] = round(n_rays / tb / 1e6,
                                                        1)
            out[f"regen_{ck}tr{tr}_fwdbwd_mrays_s_median"] = round(
                n_rays / tb_med / 1e6, 1)
            out[f"regen_{ck}tr{tr}_grads_finite"] = bool(
                np.isfinite(np.asarray(g.albedo)).all()
                and np.isfinite(np.asarray(g.emission)).all())
        except Exception as e:  # noqa: BLE001
            out[f"regen_{ck}tr{tr}_fwdbwd_error"] = repr(e)[:300]
        print(json.dumps(out), flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
