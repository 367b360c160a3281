"""On-chip validation + benchmark of the memory-resident (dyn) kernels.

Measures, on the real TPU chip:
  1. dyn vs baked megakernel on the SAME small scene (cbox) — the cost
     of memory-resident dispatch vs baked literals;
  2. dyn on the 87-shape triangle-mesh scene (gallery.build_mesh) vs the
     XLA wavefront on the same scene — the 24-shape-cliff fix headline;
  3. value sanity: dyn internal-RNG render is finite and statistically
     consistent with the XLA render of the same scene.

Usage: python tools/bench_dyn.py [--spp 256] [--depth 5]
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
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--spp-chunks", type=int, default=16)
    ap.add_argument("--skip-xla", action="store_true",
                    help="skip the (slow) XLA mesh-scene baseline")
    args = ap.parse_args()

    from drt_tpu.adjoint import make_diff_image_renderer
    from drt_tpu.config import RenderConfig
    from drt_tpu.fused import (make_dyn_image_renderer,
                               make_fused_image_renderer, seeds_from_key)
    from drt_tpu.models import cbox, gallery

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
        out[f"{tag}_fwd_mrays_s"] = round(n_rays / t_f / 1e6, 1)
        print(f"# {tag}_fwd_mrays_s = {out[f'{tag}_fwd_mrays_s']}",
              flush=True)
        t_fb = time_best(fwdbwd, params, seeds)
        out[f"{tag}_fwdbwd_mrays_s"] = round(n_rays / t_fb / 1e6, 1)
        print(f"# {tag}_fwdbwd_mrays_s = {out[f'{tag}_fwdbwd_mrays_s']}",
              flush=True)
        img = np.asarray(fwd(params, seeds))
        out[f"{tag}_finite"] = bool(np.isfinite(img).all())
        out[f"{tag}_mean"] = round(float(img.mean()), 5)
        return img

    # 1. cbox: baked vs dyn on the same 9-shape scene.
    scene_c, params_c, cam_c = cbox.build(dtype=jnp.float32)
    t0 = time.perf_counter()
    baked = make_fused_image_renderer(scene_c, cam_c, cfg)
    measure(baked, params_c, "cbox_baked")
    out["cbox_baked_build_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    dyn_c = make_dyn_image_renderer(scene_c, cam_c, cfg)
    measure(dyn_c, params_c, "cbox_dyn")
    out["cbox_dyn_build_compile_s"] = round(time.perf_counter() - t0, 1)

    # 2. mesh-87 scene: dyn (fori_loop over 80 triangles) vs XLA.
    scene_m, params_m, cam_m = gallery.build_mesh(level=1,
                                                  dtype=jnp.float32)
    out["mesh_shapes"] = int(scene_m.num_shapes)
    t0 = time.perf_counter()
    dyn_m = make_dyn_image_renderer(scene_m, cam_m, cfg)
    img_dyn = measure(dyn_m, params_m, "mesh_dyn")
    out["mesh_dyn_build_compile_s"] = round(time.perf_counter() - t0, 1)

    print("# partial:", json.dumps(out), flush=True)
    if not args.skip_xla:
        diff_xla = make_diff_image_renderer(scene_m, cam_m, cfg)

        @jax.jit
        def fwdbwd_xla(p, key):
            return jax.value_and_grad(
                lambda pp: diff_xla(pp, jax.random.key_data(key)).sum())(p)

        @jax.jit
        def fwd_xla(p, key):
            return diff_xla(p, jax.random.key_data(key))

        try:
            t_f = time_best(fwd_xla, params_m, jax.random.key(0), reps=2)
            out["mesh_xla_fwd_mrays_s"] = round(n_rays / t_f / 1e6, 2)
            print(f"# mesh_xla_fwd_mrays_s = "
                  f"{out['mesh_xla_fwd_mrays_s']}", flush=True)
            img_xla = np.asarray(fwd_xla(params_m, jax.random.key(0)))
            # Statistical consistency (different streams, same
            # estimator).
            out["mesh_dyn_vs_xla_mean_rel"] = round(
                float(abs(img_dyn.mean() - img_xla.mean())
                      / img_xla.mean()), 4)
            t_fb = time_best(fwdbwd_xla, params_m, jax.random.key(0),
                             reps=2)
            out["mesh_xla_fwdbwd_mrays_s"] = round(n_rays / t_fb / 1e6, 2)
        except Exception as e:  # keep earlier measurements
            out["mesh_xla_error"] = f"{type(e).__name__}: {e}"[:200]

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
