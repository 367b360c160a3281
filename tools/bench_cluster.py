"""On-chip benchmark of triangle-cluster culling in the dyn kernels.

For icosphere meshes at level 1/2/3 (80/320/1280 triangles,
gallery.build_mesh), measures the dyn image renderer fwd and fwd+bwd
with clustering ON (default DynScene) vs OFF (cluster_min_tris=inf),
asserts the images are bit-equal (culling is a pure skip optimization),
and reports cluster counts. This quantifies the acceleration structure
that replaces the reference's per-ray BVH descent with whole-tile AABB
culling (docs/KERNELS.md).

Usage: python tools/bench_cluster.py [--spp 64] [--levels 1 2 3]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def time_best(fn, *args, reps=3):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--spp-chunks", type=int, default=4)
    ap.add_argument("--levels", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--skip-off", action="store_true",
                    help="measure only the clustered variant")
    ap.add_argument("--cluster-k", type=int, default=16,
                    help="triangles per leaf cluster (sweep 8/16/32)")
    ap.add_argument("--super-m", type=int, default=8,
                    help="leaves per super cluster (1 = single level)")
    args = ap.parse_args()

    from drt_tpu.config import RenderConfig
    from drt_tpu.fused import make_dyn_image_renderer, seeds_from_key
    from drt_tpu.models import gallery
    from drt_tpu.ops.dynkernel import DynScene

    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       min_bounces=1, absorb_prob=0.5,
                       max_depth=args.depth, spp_chunks=args.spp_chunks)
    n_rays = cfg.width * cfg.height * cfg.spp
    seeds = seeds_from_key(jax.random.key(0))
    out = {"n_rays": n_rays, "depth": args.depth,
           "backend": jax.default_backend()}

    def measure(render, params, tag):
        @jax.jit
        def fwd(p, s):
            return render(p, s)

        @jax.jit
        def fwdbwd(p, s):
            return jax.value_and_grad(lambda pp: render(pp, s).sum())(p)

        t_f = time_best(fwd, params, seeds)
        out[f"{tag}_fwd_mrays_s"] = round(n_rays / t_f / 1e6, 2)
        print(f"# {tag}_fwd_mrays_s = {out[f'{tag}_fwd_mrays_s']}",
              flush=True)
        t_fb = time_best(fwdbwd, params, seeds)
        out[f"{tag}_fwdbwd_mrays_s"] = round(n_rays / t_fb / 1e6, 2)
        print(f"# {tag}_fwdbwd_mrays_s = {out[f'{tag}_fwdbwd_mrays_s']}",
              flush=True)
        return np.asarray(fwd(params, seeds))

    for level in args.levels:
        scene, params, cam = gallery.build_mesh(level=level,
                                                dtype=jnp.float32)
        ds_on = DynScene(scene, cluster_k=args.cluster_k,
                         super_m=args.super_m)
        tag = f"mesh{scene.num_shapes}_k{args.cluster_k}m{args.super_m}"
        out[f"{tag}_clusters"] = ds_on.n_clusters
        out[f"{tag}_supers"] = ds_on.n_super
        t0 = time.perf_counter()
        r_on = make_dyn_image_renderer(ds_on, cam, cfg)
        img_on = measure(r_on, params, f"{tag}_cluster")
        out[f"{tag}_cluster_build_compile_s"] = round(
            time.perf_counter() - t0, 1)
        out[f"{tag}_finite"] = bool(np.isfinite(img_on).all())
        if not args.skip_off:
            ds_off = DynScene(scene, cluster_min_tris=10**9)
            r_off = make_dyn_image_renderer(ds_off, cam, cfg)
            img_off = measure(r_off, params, f"{tag}_flat")
            out[f"{tag}_bit_equal"] = bool((img_on == img_off).all())
            out[f"{tag}_speedup_fwd"] = round(
                out[f"{tag}_cluster_fwd_mrays_s"]
                / out[f"{tag}_flat_fwd_mrays_s"], 2)
            out[f"{tag}_speedup_fwdbwd"] = round(
                out[f"{tag}_cluster_fwdbwd_mrays_s"]
                / out[f"{tag}_flat_fwdbwd_mrays_s"], 2)
        print("# partial:", json.dumps(out), flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
