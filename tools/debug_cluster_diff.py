"""Diagnose the L2 (327-shape) culled-vs-flat bit mismatch.

bench_cluster.py round-4 capture: bit_equal TRUE at levels 1 and 3 but
FALSE at level 2 (20 clusters, 3 supers). Hypotheses:
  (a) fastmath ratio-carry near-tie order sensitivity — reseg reorders
      the triangle visit order, and the cross-multiplied nearest-hit
      compare rounds differently per order on near-ties → ulp-level
      pixel diffs, goes away with fastmath=False;
  (b) a real culling bug (skipping a cluster that holds the true hit)
      → large pixel diffs, persists with fastmath=False.

Prints bit-equality, max abs diff, and differing-pixel count for
fastmath on/off × (two-level, single-level, flat) at the bench config.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from drt_tpu.config import RenderConfig
from drt_tpu.fused import make_dyn_image_renderer, seeds_from_key
from drt_tpu.models import gallery
from drt_tpu.ops.dynkernel import DynScene


def main():
    cfg = RenderConfig(width=640, height=480, spp=64, min_bounces=1,
                       absorb_prob=0.5, max_depth=5, spp_chunks=4)
    seeds = seeds_from_key(jax.random.key(0))
    scene, params, cam = gallery.build_mesh(level=2, dtype=jnp.float32)
    out = {}
    for fm in (True, False):
        imgs = {}
        for tag, ds in (
                ("two_level", DynScene(scene, cluster_k=16, super_m=8)),
                ("one_level", DynScene(scene, cluster_k=16, super_m=1)),
                ("flat", DynScene(scene, cluster_min_tris=10**9))):
            r = make_dyn_image_renderer(ds, cam, cfg, fastmath=fm)
            imgs[tag] = np.asarray(jax.jit(r)(params, seeds))
            print(f"# done fm={fm} {tag}", flush=True)
        for tag in ("two_level", "one_level"):
            a, b = imgs[tag], imgs["flat"]
            key = f"fm{int(fm)}_{tag}_vs_flat"
            out[key] = {
                "bit_equal": bool((a == b).all()),
                "max_abs_diff": float(np.abs(a - b).max()),
                "n_diff_px": int((a != b).any(-1).sum()),
            }
            print(f"# {key}: {out[key]}", flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
