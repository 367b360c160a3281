"""VPU roofline for the fused megakernel (VERDICT r1 item 2).

Counts the kernel's per-bounce-ray vector work by tracing the exact
kernel body (`megakernel._wavefront_body` + in-kernel camera) to a jaxpr
on one (tile_rows, 128) tile and weighting every primitive by an
estimated VPU issue cost. Literal folding (baked scene, literal camera
eye, unit-throughput bounce 0) happens at trace time, so the count
reflects what Mosaic actually schedules, up to backend fusion.

Cost model (documented estimate, not a cycle-accurate simulation):
  1 op/element   — add/sub/mul/select/compare/min/max/bitwise/convert
  8 ops/element  — div, sqrt, rsqrt (Newton-iteration sequences on VPU)
 20 ops/element  — sin, cos, log, exp (polynomial expansions)
 40 ops/element  — pow (exp . log)

v5e VPU peak (public figures: one TensorCore per chip, VPU is an
(8, 128)-lane vector unit with 4 independent ALUs per lane position,
~1.74 GHz): 8 * 128 * 4 * 1.74e9 ~= 7.13 T f32 ops/s.

Usage:
  python tools/roofline.py [--depth 5] [--mrays FWD_MRAYS_PER_S]

With --mrays (a measured forward throughput), prints estimated VPU
utilization = ops/ray * rays/s / peak.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

V5E_VPU_PEAK = 8 * 128 * 4 * 1.74e9  # f32 ops/s, one TensorCore

COST = {
    # transcendental / iterative
    "div": 8.0, "sqrt": 8.0, "rsqrt": 8.0,
    "sin": 20.0, "cos": 20.0, "log": 20.0, "exp": 20.0,
    "pow": 40.0, "integer_pow": 8.0,
    # everything else defaults to 1 op/element
}

IGNORE = {"reshape", "broadcast_in_dim", "squeeze", "convert_element_type",
          "transpose", "copy", "slice", "concatenate", "iota"}
# iota/broadcast/reshape are layout ops the Mosaic scheduler largely
# folds; counting them as 0 keeps the estimate conservative for
# utilization (fewer counted ops -> lower, not inflated, utilization).


def count_jaxpr(jaxpr, counts):
    for eqn in jaxpr.eqns:
        for sub in (v for v in eqn.params.values()
                    if hasattr(v, "jaxpr")):
            count_jaxpr(sub.jaxpr, counts)
        if eqn.primitive.name in ("pjit", "jit", "closed_call",
                                  "custom_jvp_call",
                                  "custom_vjp_call_jaxpr"):
            continue  # container eqns: already counted via recursion
        name = eqn.primitive.name
        if name in IGNORE:
            continue
        elems = sum(int(np.prod(ov.aval.shape)) for ov in eqn.outvars
                    if ov.aval.shape)
        if elems == 0:
            elems = 1
        counts[name] = counts.get(name, 0) + elems


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--tile-rows", type=int, default=16)
    ap.add_argument("--mrays", type=float, default=None,
                    help="measured forward Mrays/s to turn the op count "
                         "into a VPU utilization")
    ap.add_argument("--adjoint", action="store_true",
                    help="count the stored-residual sweep body instead")
    ap.add_argument("--fastmath", action="store_true",
                    help="count the fastmath kernel forms (the "
                         "internal-RNG production default)")
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")

    from drt_tpu.config import RenderConfig
    from drt_tpu.models import cbox
    from drt_tpu.ops import megakernel as mk
    from drt_tpu.scene import albedo_table, emission_table

    scene, params, cam = cbox.build(dtype=jnp.float32)
    cfg = RenderConfig(width=640, height=480, spp=16,
                       max_depth=args.depth)
    ss = mk.StaticScene(scene)
    sc = mk.StaticCamera(cam, cfg.width, cfg.height)
    tile_rows = args.tile_rows
    shape = (tile_rows, mk.LANES)
    dtype = np.float32
    alb = albedo_table(scene, params)
    emi = emission_table(scene, params)

    def fwd_body(alb, emi, cu0, cu1, u):
        o, d = mk._camera_rays_static(sc, cfg.spp, tile_rows, 0,
                                      cu0, cu1, dtype,
                                      fastmath=args.fastmath)
        return mk._wavefront_body(
            ss, cfg, alb, emi, o, d,
            lambda lb: (u[lb, 0], u[lb, 1], u[lb, 2]), dtype,
            fastmath=args.fastmath)

    def sweep_body(alb, emi, rsc, rbest, gx, gy, gz):
        # Mirrors make_fused_sweep_adjoint's kernel body exactly,
        # including the albedos= reuse (the sweep-albedo-reuse opt).
        from drt_tpu.ops.vecmath import V3
        inv_keep = dtype(1.0 / (1.0 - cfg.absorb_prob))
        T = V3(dtype(1.0), dtype(1.0), dtype(1.0))
        Px, Py, Pz, scs, gates, bests, albs = [], [], [], [], [], [], []
        for b in range(cfg.max_depth):
            sc_b, best = rsc[b], rbest[b]
            rr = inv_keep if b >= cfg.min_bounces else dtype(1.0)
            gate = jnp.where(best > 0, rr, dtype(0.0))
            P = V3(T.x * gate, T.y * gate, T.z * gate)
            masks = [best == (s + 1) for s in range(ss.n_shapes)]
            a = mk._albedo_select(ss, masks, alb, shape, dtype)
            T = V3(P.x * a.x * sc_b, P.y * a.y * sc_b, P.z * a.z * sc_b)
            Px.append(P.x); Py.append(P.y); Pz.append(P.z)
            scs.append(sc_b); gates.append(gate); bests.append(best)
            albs.append(a)
        g = V3(gx, gy, gz)
        return mk._reverse_sweep(ss, alb, emi, g,
                                 (Px, Py, Pz, scs, gates, bests),
                                 cfg.max_depth, shape, dtype,
                                 albedos=albs)[1]

    f = jnp.zeros(shape, jnp.float32)
    u = jnp.zeros((cfg.max_depth, 3) + shape, jnp.float32)
    ri = jnp.zeros((cfg.max_depth,) + shape, jnp.int32)
    if args.adjoint:
        jaxpr = jax.make_jaxpr(sweep_body)(alb, emi, u[:, 0], ri, f, f, f)
        label = "stored-sweep adjoint"
    else:
        jaxpr = jax.make_jaxpr(fwd_body)(alb, emi, f, f, u)
        label = "forward megakernel"

    counts: dict[str, int] = {}
    count_jaxpr(jaxpr.jaxpr, counts)
    tile_elems = tile_rows * mk.LANES
    total_ops = 0.0
    print(f"# {label}, depth {cfg.max_depth}, "
          f"tile {tile_rows}x{mk.LANES}, cbox scene "
          f"({ss.n_shapes} shapes)")
    print(f"{'primitive':24s} {'elems/tile':>12s} {'cost':>5s} "
          f"{'ops/ray':>9s}")
    for name in sorted(counts, key=lambda k: -counts[k] * COST.get(k, 1.0)):
        w = COST.get(name, 1.0)
        ops = counts[name] * w
        total_ops += ops
        print(f"{name:24s} {counts[name]:12d} {w:5.0f} "
              f"{ops / tile_elems:9.1f}")
    per_ray = total_ops / tile_elems
    per_bounce_ray = per_ray / cfg.max_depth
    print(f"\nTOTAL weighted VPU ops: {per_ray:.0f} /ray, "
          f"{per_bounce_ray:.0f} /bounce-ray")
    print(f"v5e VPU peak: {V5E_VPU_PEAK / 1e12:.2f} T f32 ops/s")
    if args.mrays:
        util = per_ray * args.mrays * 1e6 / V5E_VPU_PEAK
        print(f"measured {args.mrays:.0f} Mrays/s -> "
              f"{per_ray * args.mrays / 1e6:.2f} T ops/s "
              f"= {100 * util:.0f}% of VPU peak")


if __name__ == "__main__":
    main()
