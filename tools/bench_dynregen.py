"""A/B the dyn-regen kernels vs the lockstep dyn kernels on a
triangle-mesh scene on the real chip. Prints incrementally-keyed JSON.

Usage: python tools/bench_dynregen.py [--level 2] [--depth 5]
       [--spp 64] [--chunks 4] [--tile-rows 8 16 32]
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
    ap.add_argument("--level", type=int, default=1)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--tile-rows", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--skip-lockstep", action="store_true")
    args = ap.parse_args()

    from drt_tpu.config import RenderConfig
    from drt_tpu.fused import (make_dyn_image_renderer,
                               make_dyn_regen_image_renderer,
                               seeds_from_key)
    from drt_tpu.models import gallery

    scene, params, cam = gallery.build_mesh(level=args.level,
                                            dtype=jnp.float32)
    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       min_bounces=1, absorb_prob=0.5,
                       max_depth=args.depth, spp_chunks=args.chunks)
    n_rays = cfg.width * cfg.height * cfg.spp
    seeds = seeds_from_key(jax.random.key(0))
    out = {"level": args.level, "n_shapes": int(scene.num_shapes),
           "depth": args.depth, "spp": args.spp, "chunks": args.chunks}

    ref_img = None
    if not args.skip_lockstep:
        render = make_dyn_image_renderer(scene, cam, cfg, fastmath=True)
        fwd = jax.jit(render)
        fwdbwd = jax.jit(lambda p, s: jax.value_and_grad(
            lambda pp: render(pp, s).sum())(p))
        tf, _ = time_best(fwd, params, seeds)
        out["dyn_fwd_mrays_s"] = round(n_rays / tf / 1e6, 2)
        tb, _ = time_best(fwdbwd, params, seeds)
        out["dyn_fwdbwd_mrays_s"] = round(n_rays / tb / 1e6, 2)
        ref_img = np.asarray(fwd(params, seeds))
        print(json.dumps(out), flush=True)

    for tr in args.tile_rows:
        t0 = time.perf_counter()
        try:
            render_r = make_dyn_regen_image_renderer(scene, cam, cfg,
                                                     tile_rows=tr)
            fwd_r = jax.jit(render_r)
            img_r = np.asarray(jax.block_until_ready(fwd_r(params, seeds)))
        except Exception as e:  # noqa: BLE001
            out[f"dynregen_tr{tr}_error"] = repr(e)[:300]
            print(json.dumps(out), flush=True)
            continue
        out[f"dynregen_tr{tr}_compile_s"] = round(
            time.perf_counter() - t0, 1)
        tf, tf_med = time_best(fwd_r, params, seeds)
        out[f"dynregen_tr{tr}_fwd_mrays_s"] = round(n_rays / tf / 1e6, 2)
        out[f"dynregen_tr{tr}_fwd_mrays_s_median"] = round(
            n_rays / tf_med / 1e6, 2)
        out[f"dynregen_tr{tr}_finite"] = bool(np.isfinite(img_r).all())
        if ref_img is not None:
            out[f"dynregen_tr{tr}_mean_rel_diff"] = float(
                abs(img_r.mean() - ref_img.mean()) / ref_img.mean())
        print(json.dumps(out), flush=True)
        try:
            fwdbwd_r = jax.jit(lambda p, s, r=render_r: jax.value_and_grad(
                lambda pp: r(pp, s).sum())(p))
            v, g = jax.block_until_ready(fwdbwd_r(params, seeds))
            tb, _ = time_best(fwdbwd_r, params, seeds)
            out[f"dynregen_tr{tr}_fwdbwd_mrays_s"] = round(
                n_rays / tb / 1e6, 2)
            out[f"dynregen_tr{tr}_grads_finite"] = bool(
                np.isfinite(np.asarray(g.albedo)).all()
                and np.isfinite(np.asarray(g.emission)).all())
        except Exception as e:  # noqa: BLE001
            out[f"dynregen_tr{tr}_fwdbwd_error"] = repr(e)[:300]
        print(json.dumps(out), flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
