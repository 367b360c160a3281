"""A/B the fast-math production kernels on the real chip.

Same seeds => same sample streams: fastmath vs exact differ only by
last-ulp rounding (rsqrt, cancelled quotients), so images/grads must
agree tightly while throughput improves. Prints one JSON object.

Usage: python tools/bench_fastmath.py [--depth 5] [--spp 256]
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
    args = ap.parse_args()

    from drt_tpu.config import RenderConfig
    from drt_tpu.fused import make_fused_image_renderer, seeds_from_key
    from drt_tpu.models import cbox

    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=640, height=480, spp=args.spp,
                       min_bounces=1, absorb_prob=0.5,
                       max_depth=args.depth, spp_chunks=16)
    n_rays = cfg.width * cfg.height * cfg.spp
    seeds = seeds_from_key(jax.random.key(0))
    out = {"depth": args.depth, "spp": args.spp}
    imgs = {}
    grads = {}
    for tag, fm in (("exact", False), ("fastmath", True)):
        render = make_fused_image_renderer(scene, cam, cfg, fastmath=fm)

        @jax.jit
        def fwd(p, s, render=render):
            return render(p, s)

        @jax.jit
        def fwdbwd(p, s, render=render):
            return jax.value_and_grad(
                lambda pp: render(pp, s).sum())(p)

        tf, tf_med = time_best(fwd, params, seeds)
        tb, tb_med = time_best(fwdbwd, params, seeds)
        out[f"{tag}_fwd_mrays_s"] = round(n_rays / tf / 1e6, 1)
        out[f"{tag}_fwd_mrays_s_median"] = round(n_rays / tf_med / 1e6, 1)
        out[f"{tag}_fwdbwd_mrays_s"] = round(n_rays / tb / 1e6, 1)
        out[f"{tag}_fwdbwd_mrays_s_median"] = round(
            n_rays / tb_med / 1e6, 1)
        imgs[tag] = np.asarray(fwd(params, seeds))
        grads[tag] = jax.tree.map(np.asarray, fwdbwd(params, seeds)[1])

    # Same streams: value agreement to rounding.
    scale = np.abs(imgs["exact"]).max()
    out["img_max_abs_diff"] = float(
        np.abs(imgs["fastmath"] - imgs["exact"]).max())
    out["img_scale"] = float(scale)
    out["img_finite"] = bool(np.isfinite(imgs["fastmath"]).all())
    ge, gf = grads["exact"], grads["fastmath"]
    out["grad_max_rel_diff"] = float(max(
        np.abs(np.asarray(a) - np.asarray(b)).max()
        / max(np.abs(np.asarray(a)).max(), 1e-12)
        for a, b in zip(ge, gf)))
    out["fwd_speedup"] = round(out["fastmath_fwd_mrays_s"]
                               / out["exact_fwd_mrays_s"], 3)
    out["fwdbwd_speedup"] = round(out["fastmath_fwdbwd_mrays_s"]
                                  / out["exact_fwdbwd_mrays_s"], 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
