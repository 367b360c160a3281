"""Path-regeneration kernels over MEMORY-RESIDENT scenes.

Combines the two round-3 kernel families: the dyn kernels'
runtime-scene nearest-hit sweep (ops/dynkernel.py — SMEM shape arrays,
typed fori_loops, compile time independent of scene size; the TPU form
of the reference's O(S) dispatch, pathtracer.hpp:72-89) with the regen
kernels' dead-lane refill (ops/regen.py — lanes are pixels, a
while_loop trip loop, stateless hash-keyed RNG). Triangle-mesh scenes
spend the same ~60% of lockstep trips on dead lanes as the baked cbox
does, and their per-trip cost is far higher (O(S) intersect), so the
regen trip reduction is worth proportionally more here.

Residual packing for the stored sweep extends the dyn scheme
(ar | er<<8 | live<<16) with the regen bits (want<<17 | rr_on<<18);
see ops/regen.py for why the bounce index is dynamic.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drt_tpu.config import RenderConfig
from drt_tpu.constants import RAY_EPS
from drt_tpu.ops.dynkernel import (_N_SCN, _ROW_BITS, _ROW_CAP, DynScene,
                                   _dyn_intersect, _dyn_shade, _flat_scn,
                                   _pack_meta, _unpack_meta,
                                   _rows_select)
from drt_tpu.ops.megakernel import (LANES, StaticCamera,
                                    _accumulate_grad_smem,
                                    _camera_ray_from_pix, _inv_sqrt,
                                    _pad_rows, _to_tiles)
from drt_tpu.ops.regen import _bits_to_open_unit, _hash_bits, _kernel_bitcast
from drt_tpu.ops.vecmath import V3
from drt_tpu.scene import NULL_BXDF, PLANE, SPHERE

_LIVE_BIT = 2 * _ROW_BITS
_WANT_BIT = _LIVE_BIT + 1
_RRON_BIT = _LIVE_BIT + 2


def make_dyn_regen_tracer(scene, cam, cfg: RenderConfig,
                          tile_rows: int = 8,
                          interpret: bool | None = None,
                          fastmath: bool = False,
                          n_pix: int | None = None,
                          unroll_shapes: int = 16,
                          collect: bool = False,
                          n_chunks: int = 1):
    """Regeneration forward kernel over a memory-resident scene.

    Returns `trace(albedo_tab, emission_tab, scn, seeds: i32[2],
    tile_base=0, sample_base=0) -> (L: V3[n_pix] per-pixel radiance
    SUMS over spp_c samples, trips: i32[n_tiles])`; with collect=True,
    `(L, rsc, rrow, trips)` streaming the per-trip stored-sweep
    residuals (see module docstring for the rrow packing; rows past a
    tile's trip count are unwritten garbage bounded by `trips`).
    Hash-keyed internal RNG only (ops/regen.py hash_uniform /
    hash_tapes reproduce the draws XLA-side).

    n_chunks > 1 folds the spp-chunk loop into a (tiles, chunks) grid
    exactly as in ops/regen.make_regen_tracer (see there for the
    bit-equality argument and the chunked output/residual shapes).
    """
    ds = DynScene.of(scene)
    sc = StaticCamera(cam, cfg.width, cfg.height)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret is True:
        interpret = pltpu.InterpretParams()
    spp_c = cfg.spp // cfg.spp_chunks
    npix = cfg.width * cfg.height
    n = npix if n_pix is None else n_pix
    rows, padded = _pad_rows(n, tile_rows)
    grid = rows // tile_rows
    tile = (tile_rows, LANES)
    shape = tile
    t_cap = np.int32(spp_c * cfg.max_depth)
    inv_keep = 1.0 / (1.0 - cfg.absorb_prob)

    def kernel(*refs):
        it = iter(refs)
        tb_ref = next(it)
        sb_ref = next(it)
        seed_ref = next(it)
        alb_ref = next(it)
        emis_ref = next(it)
        scn_refs = tuple(next(it) for _ in range(_N_SCN))
        lx_ref, ly_ref, lz_ref, trips_ref = (next(it) for _ in range(4))
        rsc_ref = rrow_ref = None
        if collect:
            rsc_ref = next(it)
            rrow_ref = next(it)
        dtype = lx_ref.dtype.type
        bc = _kernel_bitcast
        i = pl.program_id(0)
        gi = tb_ref[0] + i
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        pix = gi * (tile_rows * LANES) + row * LANES + lane
        pix = jnp.minimum(pix, np.int32(npix - 1))
        pix_u = bc(pix, jnp.uint32)
        seed_cam = bc(jnp.full(shape, seed_ref[0], jnp.int32), jnp.uint32)
        seed_bnc = bc(jnp.full(shape, seed_ref[1], jnp.int32), jnp.uint32)
        if n_chunks == 1:
            ck = None
            sbase = sb_ref[0]
        else:
            ck = pl.program_id(1)
            sbase = sb_ref[0] + np.int32(spp_c) * ck

        # Mosaic layout pin: constant-initialized while_loop carries
        # get a replicated layout the backedge can't restore (see
        # regen.py) — derive the zeros from the lane-varying pix.
        izero = jnp.minimum(pix, 0)
        zero = izero.astype(dtype)
        n_alb = alb_ref.shape[0]
        n_emit = emis_ref.shape[0]

        def draw(seed_u, s, b, dim):
            return _bits_to_open_unit(
                _hash_bits(seed_u, pix_u, bc(s, jnp.uint32),
                           bc(b, jnp.uint32), dim), dtype, bc)

        # alive rides the carry as i32 0/1, not bool (vector<i1>
        # scf.yield fails to legalize in Mosaic — see regen.py).
        def cond(c):
            trip, s, b, alive_i = c[0], c[13], c[14], c[15]
            active = (alive_i != 0) | (s < np.int32(spp_c - 1))
            return (trip < t_cap) & jnp.any(active)

        def body(c):
            (trip, ox, oy, oz, dx, dy, dz, tx, ty, tz,
             llx, lly, llz, s, b, alive_i) = c
            alive = alive_i != 0
            want = (~alive) & (s < np.int32(spp_c - 1))
            s = jnp.where(want, s + 1, s)
            sg = s + sbase
            u_s = draw(seed_cam, sg, izero, 0)
            u_t = draw(seed_cam, sg, izero, 1)
            o_n, d_n = _camera_ray_from_pix(sc, pix, u_s, u_t, dtype,
                                            fastmath=fastmath)
            ox = jnp.where(want, o_n.x, ox)
            oy = jnp.where(want, o_n.y, oy)
            oz = jnp.where(want, o_n.z, oz)
            dx = jnp.where(want, d_n.x, dx)
            dy = jnp.where(want, d_n.y, dy)
            dz = jnp.where(want, d_n.z, dz)
            tx = jnp.where(want, dtype(1.0), tx)
            ty = jnp.where(want, dtype(1.0), ty)
            tz = jnp.where(want, dtype(1.0), tz)
            b = jnp.where(want, 0, b)
            alive = alive | want

            # one bounce (op order of dynkernel._dyn_wavefront_body)
            u_rr = draw(seed_bnc, sg, b, 0)
            u1 = draw(seed_bnc, sg, b, 1)
            u2 = draw(seed_bnc, sg, b, 2)
            rr_on = b >= np.int32(cfg.min_bounces)
            alive = alive & ~(rr_on & (u_rr < dtype(cfg.absorb_prob)))
            rr_scale = jnp.where(rr_on, dtype(inv_keep), dtype(1.0))

            o = V3(ox, oy, oz)
            d = V3(dx, dy, dz)
            best_t, hit, aux, meta, ex = _dyn_intersect(
                ds, scn_refs, o, d, dtype, unroll_shapes,
                fastmath=fastmath, alive=alive)
            alive = alive & hit
            gate = jnp.where(alive, rr_scale, dtype(0.0))
            meta = jnp.where(alive, meta, _pack_meta(
                n_alb - 1, n_emit - 1, NULL_BXDF, PLANE))
            ar, er, mt, st = _unpack_meta(meta)
            aux = V3(jnp.where(alive, aux.x, 0.0),
                     jnp.where(alive, aux.y, 0.0),
                     jnp.where(alive, aux.z, 0.0))

            px = V3(tx * gate, ty * gate, tz * gate)
            e = _rows_select(emis_ref, er, n_emit - 1, 0.0, shape, dtype)
            llx = llx + px.x * e.x
            lly = lly + px.y * e.y
            llz = llz + px.z * e.z

            p = V3(ox + dx * best_t, oy + dy * best_t, oz + dz * best_t)
            p = V3(jnp.where(alive, p.x, 0.0), jnp.where(alive, p.y, 0.0),
                   jnp.where(alive, p.z, 0.0))
            sx, sy, sz = p.x - aux.x, p.y - aux.y, p.z - aux.z
            sinv = _inv_sqrt(sx * sx + sy * sy + sz * sz, fastmath)
            is_sph = st == SPHERE
            normal = V3(jnp.where(is_sph, sx * sinv, aux.x),
                        jnp.where(is_sph, sy * sinv, aux.y),
                        jnp.where(is_sph, sz * sinv, aux.z))
            d_in = V3(-dx, -dy, -dz)
            dir_out, sc_raw = _dyn_shade(ds, mt, ex, normal, d_in, u1, u2,
                                         dtype, fastmath=fastmath)
            sc_v = jnp.where(alive, sc_raw, dtype(0.0))
            if collect:
                pack = (ar + (er << _ROW_BITS)
                        + (alive.astype(jnp.int32) << _LIVE_BIT)
                        + (want.astype(jnp.int32) << _WANT_BIT)
                        + (rr_on.astype(jnp.int32) << _RRON_BIT))
                if n_chunks == 1:
                    rsc_ref[pl.ds(trip, 1)] = sc_v[None]
                    rrow_ref[pl.ds(trip, 1)] = pack[None]
                else:
                    rsc_ref[0, pl.ds(trip, 1)] = sc_v[None]
                    rrow_ref[0, pl.ds(trip, 1)] = pack[None]
            a = _rows_select(alb_ref, ar, n_alb - 1, 1.0, shape, dtype)
            tx = px.x * a.x * sc_v
            ty = px.y * a.y * sc_v
            tz = px.z * a.z * sc_v
            ox = jnp.where(alive, p.x + dir_out.x * RAY_EPS, 0.0)
            oy = jnp.where(alive, p.y + dir_out.y * RAY_EPS, 0.0)
            oz = jnp.where(alive, p.z + dir_out.z * RAY_EPS, 0.0)
            dx = jnp.where(alive, dir_out.x, 0.0)
            dy = jnp.where(alive, dir_out.y, 0.0)
            dz = jnp.where(alive, dir_out.z, 0.0)
            b = b + 1
            alive = alive & (b < np.int32(cfg.max_depth))
            return (trip + np.int32(1), ox, oy, oz, dx, dy, dz,
                    tx, ty, tz, llx, lly, llz, s, b,
                    alive.astype(jnp.int32))

        init = (np.int32(0), zero, zero, zero, zero, zero, zero,
                zero, zero, zero, zero, zero, zero,
                izero - 1, izero, izero)
        out = jax.lax.while_loop(cond, body, init)
        if n_chunks == 1:
            lx_ref[...] = out[10]
            ly_ref[...] = out[11]
            lz_ref[...] = out[12]
            trips_ref[i] = out[0]
        else:
            @pl.when(ck == 0)
            def _init():
                lx_ref[...] = out[10]
                ly_ref[...] = out[11]
                lz_ref[...] = out[12]

            @pl.when(ck != 0)
            def _acc():
                lx_ref[...] = lx_ref[...] + out[10]
                ly_ref[...] = ly_ref[...] + out[11]
                lz_ref[...] = lz_ref[...] + out[12]

            trips_ref[i, ck] = out[0]

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if n_chunks == 1:
        ray_spec = pl.BlockSpec(tile, lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        res_spec = pl.BlockSpec((t_cap, tile_rows, LANES),
                                lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        trips_spec = pl.BlockSpec((grid,), lambda i: (0,),
                                  memory_space=pltpu.SMEM)
        trips_shape = (grid,)
        res_shape = (t_cap, rows, LANES)
        launch_grid = (grid,)
    else:
        ray_spec = pl.BlockSpec(tile, lambda i, c: (i, 0),
                                memory_space=pltpu.VMEM)
        res_spec = pl.BlockSpec((1, t_cap, tile_rows, LANES),
                                lambda i, c: (c, 0, i, 0),
                                memory_space=pltpu.VMEM)
        trips_spec = pl.BlockSpec((grid, n_chunks), lambda i, c: (0, 0),
                                  memory_space=pltpu.SMEM)
        trips_shape = (grid, n_chunks)
        res_shape = (n_chunks, t_cap, rows, LANES)
        launch_grid = (grid, n_chunks)

    def trace(albedo_tab, emission_tab, scn, seeds, tile_base=0,
              sample_base=0):
        dtype = albedo_tab.dtype
        if collect and (albedo_tab.shape[0] > _ROW_CAP
                        or emission_tab.shape[0] > _ROW_CAP):
            raise ValueError(
                f"dyn stored residuals pack rows into {_ROW_BITS} bits: "
                f"{albedo_tab.shape[0]} albedo / {emission_tab.shape[0]} "
                "emission rows exceed that (use adjoint='retrace')")
        tb = jnp.asarray(tile_base, jnp.int32).reshape(1)
        sb = jnp.asarray(sample_base, jnp.int32).reshape(1)
        out_shape = ([jax.ShapeDtypeStruct((rows, LANES), dtype)] * 3
                     + [jax.ShapeDtypeStruct(trips_shape, jnp.int32)])
        out_specs = [ray_spec] * 3 + [trips_spec]
        if collect:
            out_shape += [
                jax.ShapeDtypeStruct(res_shape, dtype),
                jax.ShapeDtypeStruct(res_shape, jnp.int32)]
            out_specs += [res_spec, res_spec]
        out = pl.pallas_call(
            kernel,
            grid=launch_grid,
            in_specs=[smem] * (5 + _N_SCN),
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(tb, sb, seeds, albedo_tab, emission_tab, *_flat_scn(scn))
        flat = [c.reshape(padded)[:n] for c in out[:3]]
        if collect:
            if n_chunks == 1:
                rsc = out[4].reshape(t_cap, padded)[:, :n]
                rrow = out[5].reshape(t_cap, padded)[:, :n]
            else:
                rsc = out[4].reshape(n_chunks, t_cap, padded)[:, :, :n]
                rrow = out[5].reshape(n_chunks, t_cap, padded)[:, :, :n]
            return V3(*flat), rsc, rrow, out[3]
        return V3(*flat), out[3]

    return trace


def make_dyn_regen_sweep_adjoint(scene, cfg: RenderConfig,
                                 tile_rows: int = 8,
                                 interpret: bool | None = None,
                                 n_pix: int | None = None,
                                 n_chunks: int = 1):
    """Reverse-sweep adjoint over the dyn-regen stored residuals: the
    dynamic-trip form of dynkernel.make_dyn_sweep_adjoint (see
    ops/regen.make_regen_sweep_adjoint for the trip/want/suffix-reset
    mechanics; here attribute rows come from the packed rrow instead of
    shape masks).

    Returns `sweep(alb, emi, rsc: f[t_cap, n], rrow: i32[t_cap, n],
    trips: i32[n_tiles], g: V3[n]) -> (d_albedo, d_emission)`.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret is True:
        interpret = pltpu.InterpretParams()
    spp_c = cfg.spp // cfg.spp_chunks
    npix = cfg.width * cfg.height
    n = npix if n_pix is None else n_pix
    rows, padded = _pad_rows(n, tile_rows)
    grid = rows // tile_rows
    tile = (tile_rows, LANES)
    t_cap = int(spp_c * cfg.max_depth)
    inv_keep = 1.0 / (1.0 - cfg.absorb_prob)
    mask = _ROW_CAP - 1

    def kernel(alb_ref, emis_ref, rsc_ref, rrow_ref, trips_ref,
               gx, gy, gz, da_ref, de_ref, px_s, py_s, pz_s):
        dtype = gx.dtype.type
        shape = gx.shape
        n_alb = alb_ref.shape[0]
        n_emit = emis_ref.shape[0]
        ti = pl.program_id(0)
        t_act = (trips_ref[ti] if n_chunks == 1
                 else trips_ref[ti, pl.program_id(1)])
        one = jnp.ones(shape, dtype)
        zero = jnp.zeros(shape, dtype)

        def unpack(t):
            sc_v = rsc_ref[t] if n_chunks == 1 else rsc_ref[0, t]
            pack = rrow_ref[t] if n_chunks == 1 else rrow_ref[0, t]
            ar = pack & mask
            er = (pack >> _ROW_BITS) & mask
            live = (pack >> _LIVE_BIT) & 1
            want = (pack >> _WANT_BIT) & 1
            rr_on = (pack >> _RRON_BIT) & 1
            rr_scale = jnp.where(rr_on == 1, dtype(inv_keep), dtype(1.0))
            gate = jnp.where(live == 1, rr_scale, dtype(0.0))
            return sc_v, ar, er, want, gate

        def fwd_body(t, T):
            tx, ty, tz = T
            sc_v, ar, er, want, gate = unpack(t)
            tx = jnp.where(want == 1, one, tx)
            ty = jnp.where(want == 1, one, ty)
            tz = jnp.where(want == 1, one, tz)
            px = tx * gate
            py = ty * gate
            pz = tz * gate
            px_s[pl.ds(t, 1)] = px[None]
            py_s[pl.ds(t, 1)] = py[None]
            pz_s[pl.ds(t, 1)] = pz[None]
            a = _rows_select(alb_ref, ar, n_alb - 1, 1.0, shape, dtype)
            return (px * a.x * sc_v, py * a.y * sc_v, pz * a.z * sc_v)

        jax.lax.fori_loop(0, t_act, fwd_body, (zero, zero, zero))

        g = V3(gx[...], gy[...], gz[...])

        def rev_body(i, c):
            sx, sy, sz = c[0], c[1], c[2]
            da_acc = [list(r) for r in c[3]]
            de_acc = [list(r) for r in c[4]]
            t = t_act - 1 - i
            sc_v, ar, er, want, gate = unpack(t)
            P = V3(px_s[t], py_s[t], pz_s[t])
            e = _rows_select(emis_ref, er, n_emit - 1, 0.0, shape, dtype)
            gP = V3(g.x * P.x, g.y * P.y, g.z * P.z)
            for rw in range(n_emit - 1):
                m = er == rw
                for ci, gc in enumerate((gP.x, gP.y, gP.z)):
                    de_acc[rw][ci] = de_acc[rw][ci] + jnp.sum(
                        jnp.where(m, gc, 0.0))
            gPsS = (gP.x * sc_v * sx, gP.y * sc_v * sy, gP.z * sc_v * sz)
            for rw in range(n_alb - 1):
                m = ar == rw
                for ci in range(3):
                    da_acc[rw][ci] = da_acc[rw][ci] + jnp.sum(
                        jnp.where(m, gPsS[ci], 0.0))
            a = _rows_select(alb_ref, ar, n_alb - 1, 1.0, shape, dtype)
            sx = (e.x + a.x * sc_v * sx) * gate
            sy = (e.y + a.y * sc_v * sy) * gate
            sz = (e.z + a.z * sc_v * sz) * gate
            sx = jnp.where(want == 1, dtype(0.0), sx)
            sy = jnp.where(want == 1, dtype(0.0), sy)
            sz = jnp.where(want == 1, dtype(0.0), sz)
            return (sx, sy, sz,
                    tuple(tuple(r) for r in da_acc),
                    tuple(tuple(r) for r in de_acc))

        da0 = tuple(tuple(jnp.zeros((), dtype) for _ in range(3))
                    for _ in range(n_alb))
        de0 = tuple(tuple(jnp.zeros((), dtype) for _ in range(3))
                    for _ in range(n_emit))
        out = jax.lax.fori_loop(0, t_act, rev_body,
                                (zero, zero, zero, da0, de0))
        da_acc = [list(r) for r in out[3]]
        de_acc = [list(r) for r in out[4]]
        first = pl.program_id(0) == 0
        if n_chunks > 1:
            first = first & (pl.program_id(1) == 0)
        _accumulate_grad_smem(da_ref, de_ref, da_acc, de_acc, dtype,
                              first=first)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if n_chunks == 1:
        ray_spec = pl.BlockSpec(tile, lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        res_spec = pl.BlockSpec((t_cap, tile_rows, LANES),
                                lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        trips_spec = pl.BlockSpec((grid,), lambda i: (0,),
                                  memory_space=pltpu.SMEM)
        acc_idx = lambda i: (0, 0)
        launch_grid = (grid,)
    else:
        ray_spec = pl.BlockSpec(tile, lambda i, c: (i, 0),
                                memory_space=pltpu.VMEM)
        res_spec = pl.BlockSpec((1, t_cap, tile_rows, LANES),
                                lambda i, c: (c, 0, i, 0),
                                memory_space=pltpu.VMEM)
        trips_spec = pl.BlockSpec((grid, n_chunks), lambda i, c: (0, 0),
                                  memory_space=pltpu.SMEM)
        acc_idx = lambda i, c: (0, 0)
        launch_grid = (grid, n_chunks)

    def sweep(albedo_tab, emission_tab, rsc, rrow, trips, g: V3):
        n_alb = albedo_tab.shape[0]
        n_emit = emission_tab.shape[0]
        dtype = g.x.dtype
        if n_chunks == 1:
            rsc_t = jnp.pad(rsc, ((0, 0), (0, padded - n))) \
                .reshape(t_cap, rows, LANES)
            rrow_t = jnp.pad(rrow, ((0, 0), (0, padded - n))) \
                .reshape(t_cap, rows, LANES)
        else:
            rsc_t = jnp.pad(rsc, ((0, 0), (0, 0), (0, padded - n))) \
                .reshape(n_chunks, t_cap, rows, LANES)
            rrow_t = jnp.pad(rrow, ((0, 0), (0, 0), (0, padded - n))) \
                .reshape(n_chunks, t_cap, rows, LANES)
        gargs = [_to_tiles(c, padded, rows) for c in (g.x, g.y, g.z)]
        acc_a = pl.BlockSpec((n_alb, 3), acc_idx,
                             memory_space=pltpu.SMEM)
        acc_e = pl.BlockSpec((n_emit, 3), acc_idx,
                             memory_space=pltpu.SMEM)
        scratch = [pltpu.VMEM((t_cap, tile_rows, LANES), dtype)] * 3
        da, de = pl.pallas_call(
            kernel,
            grid=launch_grid,
            in_specs=[smem, smem, res_spec, res_spec, trips_spec]
            + [ray_spec] * 3,
            out_specs=[acc_a, acc_e],
            out_shape=[jax.ShapeDtypeStruct((n_alb, 3), dtype),
                       jax.ShapeDtypeStruct((n_emit, 3), dtype)],
            scratch_shapes=scratch,
            interpret=interpret,
        )(albedo_tab, emission_tab, rsc_t, rrow_t, trips, *gargs)
        return da, de

    return sweep
