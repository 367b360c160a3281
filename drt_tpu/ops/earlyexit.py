"""Experimental per-tile early-exit forward tracer (VERDICT r1 item 3).

Russian roulette kills ~`absorb` of the wavefront per bounce past
`min_bounces`, but the lockstep megakernel pays every lane at every
bounce (~58% idle lanes at depth 5, worse deeper). XLA-side stream
compaction was measured net-negative on v5e (gathers take the scalar
path — docs/KERNELS.md). This module tries the *Pallas-level*
alternative: keep the bounce loop in ONE kernel, carry the ray state in
VMEM scratch refs, and wrap each bounce's intersect+shade in
`pl.when(any_alive)` where `any_alive` is a cheap in-tile scalar
reduction — a tile whose rays are ALL dead skips the remaining bounces'
compute entirely, with zero HBM round-trips and no gathers.

Expected value (analytic): P(all k lanes dead at bounce b) =
(1 - (1-absorb)^(b-min_bounces))^k — negligible for 2048-lane tiles
until depth ~12, material for 128-lane tiles (tile_rows=1) past bounce
~8. Forward-only experiment; measured results in docs/KERNELS.md.

Streams are identical to make_fused_tracer (all uniforms drawn up
front), so the radiance equals the lockstep kernel's exactly.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drt_tpu.config import RenderConfig
from drt_tpu.ops.megakernel import (LANES, StaticCamera, StaticScene,
                                    _camera_rays_static, _pad_rows,
                                    _seg_spec_helpers,
                                    _uniform_from_bits, _wavefront_body)
from drt_tpu.ops.vecmath import V3
from drt_tpu.scene import Scene


def make_earlyexit_tracer(scene: Scene, cam, cfg: RenderConfig,
                          tile_rows: int = 16, rng: str = "internal",
                          interpret: bool | None = None,
                          n_rays: int | None = None):
    """Forward tracer with per-tile-per-bounce early exit.

    Same signature/streams as megakernel.make_fused_tracer:
      internal: trace(alb, emi, seeds, tile_base=0) -> V3[n]
      tape:     trace(alb, emi, cam_u, u, tile_base=0) -> V3[n]
    """
    ss = StaticScene(scene)
    sc = StaticCamera(cam, cfg.width, cfg.height)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret is True and rng == "internal":
        interpret = pltpu.InterpretParams()
    D = cfg.max_depth
    spp_c = cfg.spp // cfg.spp_chunks
    n = (cfg.width * cfg.height * spp_c) if n_rays is None else n_rays
    rows, padded = _pad_rows(n, tile_rows)
    grid = rows // tile_rows
    tile, ray_spec, smem = _seg_spec_helpers(tile_rows)

    def kernel(*refs):
        it = iter(refs)
        tb_ref = next(it)
        seed_ref = next(it) if rng == "internal" else None
        alb_ref = next(it)
        emis_ref = next(it)
        cu_ref = u_ref = None
        if rng == "tape":
            cu_ref = next(it)
            u_ref = next(it)
        lx, ly, lz = (next(it) for _ in range(3))
        (ox, oy, oz, dxr, dyr, dzr, tx, ty, tz, al) = (next(it)
                                                       for _ in range(10))
        dtype = lx.dtype.type
        i = pl.program_id(0)
        gi = tb_ref[0] + i

        if rng == "internal":
            pltpu.prng_seed(seed_ref[0], gi)
            cam_u = _uniform_from_bits((2, tile_rows, LANES), dtype)
            pltpu.prng_seed(seed_ref[1], gi)
            u = _uniform_from_bits((D, 3, tile_rows, LANES), dtype)
            u_s, u_t = cam_u[0], cam_u[1]

            def get_u(b):
                return u[b, 0], u[b, 1], u[b, 2]
        else:
            u_s, u_t = cu_ref[0], cu_ref[1]

            def get_u(b):
                return u_ref[b, 0], u_ref[b, 1], u_ref[b, 2]

        o0, d0 = _camera_rays_static(sc, spp_c, tile_rows, gi
                                     * (tile_rows * LANES), u_s, u_t,
                                     dtype)
        shape = d0.x.shape
        ox[...] = jnp.broadcast_to(jnp.asarray(o0.x, dtype), shape)
        oy[...] = jnp.broadcast_to(jnp.asarray(o0.y, dtype), shape)
        oz[...] = jnp.broadcast_to(jnp.asarray(o0.z, dtype), shape)
        dxr[...] = d0.x
        dyr[...] = d0.y
        dzr[...] = d0.z
        one = jnp.ones(shape, dtype)
        tx[...] = one
        ty[...] = one
        tz[...] = one
        al[...] = jnp.ones(shape, jnp.int32)
        zero = jnp.zeros(shape, dtype)
        lx[...] = zero
        ly[...] = zero
        lz[...] = zero

        for b in range(D):
            n_alive = jnp.sum(al[...])

            @pl.when(n_alive > 0)
            def _bounce(b=b):
                o = V3(ox[...], oy[...], oz[...])
                d = V3(dxr[...], dyr[...], dzr[...])
                T = V3(tx[...], ty[...], tz[...])
                alive = al[...] > 0
                ub = get_u(b)
                L, o2, d2, T2, alive2 = _wavefront_body(
                    ss, cfg, alb_ref, emis_ref, o, d,
                    lambda lb: ub, dtype, b_start=b, b_end=b + 1,
                    T=T, alive=alive, full_output=True)
                lx[...] = lx[...] + L.x
                ly[...] = ly[...] + L.y
                lz[...] = lz[...] + L.z
                ox[...] = o2.x
                oy[...] = o2.y
                oz[...] = o2.z
                dxr[...] = d2.x
                dyr[...] = d2.y
                dzr[...] = d2.z
                tx[...] = T2.x
                ty[...] = T2.y
                tz[...] = T2.z
                al[...] = alive2.astype(jnp.int32)

    def trace(albedo_tab, emission_tab, *args, tile_base=0):
        dtype = albedo_tab.dtype
        tb = jnp.asarray(tile_base, jnp.int32).reshape(1)
        it = iter(args)
        call_args = [tb]
        in_specs = [smem]
        if rng == "internal":
            call_args.append(next(it))
            in_specs.append(smem)
        call_args += [albedo_tab, emission_tab]
        in_specs += [smem, smem]
        if rng == "tape":
            cam_u = next(it)
            cu = jnp.pad(cam_u.reshape(2, -1), ((0, 0), (0, padded - n))) \
                .reshape(2, rows, LANES)
            call_args.append(cu)
            in_specs.append(pl.BlockSpec((2, tile_rows, LANES),
                                         lambda i: (0, i, 0),
                                         memory_space=pltpu.VMEM))
            u = next(it)
            ut = jnp.pad(u.reshape(D, 3, -1),
                         ((0, 0), (0, 0), (0, padded - n))) \
                .reshape(D, 3, rows, LANES)
            call_args.append(ut)
            in_specs.append(pl.BlockSpec((D, 3, tile_rows, LANES),
                                         lambda i: (0, 0, i, 0),
                                         memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=[ray_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((rows, LANES), dtype)] * 3,
            scratch_shapes=[pltpu.VMEM((tile_rows, LANES), dtype)] * 9
            + [pltpu.VMEM((tile_rows, LANES), jnp.int32)],
            interpret=interpret,
        )(*call_args)
        return V3(*(c.reshape(padded)[:n] for c in out))

    return trace
