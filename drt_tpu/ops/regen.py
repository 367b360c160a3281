"""Path-regeneration megakernel: pack dead lanes with the pixel's next
sample.

The lockstep fused kernels (ops/megakernel.py) run every ray for
`max_depth` trips; with the reference's Russian-roulette termination
(pathtracer.hpp:121-136, absorb_prob=0.5 after min_bounces=1) the
measured live-lane fraction at depth 5 is only ~38.5% (docs/KERNELS.md
roofline), i.e. ~2.6x of the bounce work is masked waste. Round-2
measured that *skipping* dead work (per-tile early exit, XLA
compaction) loses on this hardware; this kernel instead *fills* it:

- one lane == one PIXEL; each lane renders its `spp` samples
  sequentially, regenerating the next sample's camera ray in the same
  trip its previous path dies;
- the trip loop is a `lax.while_loop` that ends when every lane in the
  tile has finished all samples (worst case spp*max_depth trips, typical
  ~spp*E[path length] ~= 2.6x fewer at the headline depth 5);
- sampling uses a STATELESS counter-based hash RNG keyed by
  (seed, pixel, sample, bounce, dim) — unlike the sequential per-core
  PRNG streams of the lockstep kernels, draws are position-independent,
  so divergent lanes (each at a different (sample, bounce)) still get
  exactly the logical stream, and a lockstep oracle keyed the same way
  reproduces identical per-sample radiance for testing.

Per-sample bounce math is shared with the lockstep kernels
(_intersect_static / _shade / _emission_select / _albedo_select and the
exact masking order of _wavefront_body), so a single sample's radiance
is bit-equal to the tape-mode lockstep kernel fed the hash uniforms;
only the in-lane accumulation order over samples differs from the
XLA-side spp mean.

Reference semantics covered: pathtracer.hpp:72-136 (trace loop, RR) and
camera.hpp:51-60 via _camera_ray_from_pix; termination depth bound as in
config.py (max_depth static truncation of the reference's unbounded
recursion).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drt_tpu.config import RenderConfig
from drt_tpu.constants import RAY_EPS
from drt_tpu.ops.vecmath import V3
from drt_tpu.scene import Scene
from drt_tpu.ops.megakernel import (
    LANES,
    StaticCamera,
    StaticScene,
    _albedo_select,
    _camera_ray_from_pix,
    _emission_select,
    _intersect_static,
    _normal_static,
    _pad_rows,
    _shade,
    _to_tiles,
)

# murmur3 fmix32 constants + Weyl/dim salts (public-domain mixer; the
# production internal-RNG path is verified statistically, like the
# lockstep kernels' hardware PRNG — reference rand() is libc LCG,
# random.hpp:7-10, also only statistically comparable).
_C1 = np.uint32(0x85EBCA6B)
_C2 = np.uint32(0xC2B2AE35)
_GOLD = np.uint32(0x9E3779B9)
_DIMSALT = np.uint32(0x27D4EB2F)


def _fmix(x):
    """murmur3 finalizer on uint32 (full avalanche)."""
    x = x ^ (x >> np.uint32(16))
    x = x * _C1
    x = x ^ (x >> np.uint32(13))
    x = x * _C2
    x = x ^ (x >> np.uint32(16))
    return x


def _hash_bits(seed, pix, s, b, dim: int):
    """32 keyed bits for draw (seed, pixel, sample, bounce, dim).

    All operands uint32 (cast i32 inputs with the caller's bitcast).
    Two chained fmix rounds over distinct-multiplier key words.
    """
    h = _fmix(pix * _GOLD + seed)
    h = _fmix(h ^ (s * _C1) ^ (b * _C2) ^ (np.uint32(dim) * _DIMSALT))
    return h


def _bits_to_open_unit(bits_u32, dtype, bitcast):
    """(0,1) uniform from 32 bits: same 23-bit half-ulp-offset scheme as
    megakernel._uniform_from_bits (see there for why 23 bits and why the
    open interval)."""
    dtype = np.dtype(dtype).type
    i23 = bitcast(bits_u32 >> np.uint32(9), jnp.int32)
    return (i23.astype(dtype) + dtype(0.5)) * dtype(1.0 / (1 << 23))


def _kernel_bitcast(x, dt):
    return pltpu.bitcast(x, dt)


def _xla_bitcast(x, dt):
    return jax.lax.bitcast_convert_type(x, dt)


def hash_uniform(seed, pix, s, b, dim: int, dtype, bitcast=_xla_bitcast):
    """The keyed uniform as drawn by the regen kernel, evaluable both
    in-kernel (bitcast=pltpu.bitcast) and XLA-side for oracles."""
    u32 = lambda v: bitcast(jnp.asarray(v, jnp.int32), jnp.uint32)
    return _bits_to_open_unit(
        _hash_bits(u32(seed), u32(pix), u32(s), u32(b), dim),
        dtype, bitcast)


def hash_tapes(seeds, npix: int, spp: int, depth: int, dtype,
               sample_base: int = 0):
    """XLA-side oracle tapes of the regen kernel's draws, in the
    lockstep kernels' SPP-OUTER ray order (ray i -> pixel i % npix,
    sample i // npix): returns (cam_u f[2, N], tape f[depth, 3, N]) with
    N = npix * spp — feed to camera_rays / trace_rays(tape=...) to
    reproduce the regen kernel's exact sample set."""
    i = jnp.arange(npix * spp, dtype=jnp.int32)
    pix = i % npix
    s = i // npix + jnp.int32(sample_base)
    cam = jnp.stack([
        hash_uniform(seeds[0], pix, s, 0, dim, dtype) for dim in (0, 1)])
    tape = jnp.stack([
        jnp.stack([hash_uniform(seeds[1], pix, s, b, dim, dtype)
                   for dim in (0, 1, 2)])
        for b in range(depth)])
    return cam, tape


def make_regen_tracer(scene: Scene, cam, cfg: RenderConfig,
                      tile_rows: int = 32,
                      interpret: bool | None = None,
                      fastmath: bool = False,
                      n_pix: int | None = None,
                      collect: bool = False,
                      n_chunks: int = 1):
    """Build the regeneration forward kernel.

    Returns `trace(albedo_tab, emission_tab, seeds: i32[2], tile_base=0,
    sample_base=0) -> (L: V3 of f[n_pix] per-pixel RADIANCE SUMS over
    spp_c samples, trips: i32[n_tiles])`. Divide by cfg.spp for the
    image; `trips` is the per-tile while-loop trip count (diagnostic:
    packing efficiency = spp_c * E[len] / trips).

    collect=True additionally streams per-trip adjoint residuals
    `(rsc: f[t_cap, n_pix], rmeta: i32[t_cap, n_pix])` to HBM for the
    stored-sweep backward (make_regen_sweep_adjoint) — the regen
    analogue of make_fused_collect_tracer's 8 B/bounce-ray scheme, with
    meta packing `best | want<<8 | rr_on<<9` (the per-lane bounce index
    is dynamic here, so the regen/RR flags ride along instead of being
    static loop constants). Rows past the tile's trip count are
    UNWRITTEN garbage; consumers must bound by `trips`. Return becomes
    `(L, rsc, rmeta, trips)`.

    sample_base offsets the per-lane sample index (spp chunking across
    launches); tile_base offsets the pixel tiles (sharding), as in the
    lockstep kernels.

    n_chunks > 1 folds the spp-chunk loop into the kernel grid
    (tiles, chunks), chunk minor — the megakernel chunk-grid scheme
    (VERDICT r3 #2a) applied to regen. The chunk's sample offset is
    `sample_base + chunk * spp_c` computed in-kernel, and the hash RNG
    keys on the ABSOLUTE sample index, so the one-launch radiance is
    bit-equal to n_chunks separate launches (unlike the lockstep PRNG
    this is exactly CPU-verifiable: tests/test_regen.py). L becomes the
    per-pixel sum over ALL n_chunks*spp_c samples; trips becomes
    i32[n_tiles, n_chunks] and collect residuals gain a chunk-major dim
    (rsc: f[n_chunks, t_cap, n_pix]).
    """
    ss = StaticScene(scene)
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

    def kernel(tb_ref, sb_ref, seed_ref, alb_ref, emis_ref,
               lx_ref, ly_ref, lz_ref, trips_ref,
               rsc_ref=None, rmeta_ref=None):
        dtype = lx_ref.dtype.type
        bc = _kernel_bitcast
        i = pl.program_id(0)
        gi = tb_ref[0] + i
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        pix = gi * (tile_rows * LANES) + row * LANES + lane
        pix = jnp.minimum(pix, np.int32(npix - 1))  # clamp padding lanes
        pix_u = bc(pix, jnp.uint32)
        seed_cam = bc(jnp.full(shape, seed_ref[0], jnp.int32), jnp.uint32)
        seed_bnc = bc(jnp.full(shape, seed_ref[1], jnp.int32), jnp.uint32)
        if n_chunks == 1:
            ck = None
            sbase = sb_ref[0]
        else:
            ck = pl.program_id(1)
            sbase = sb_ref[0] + np.int32(spp_c) * ck

        # Mosaic layout pin (v5e): while_loop carries initialized from
        # pure constants get a REPLICATED vector layout, but the body
        # computes lane-varying values, and Mosaic cannot relayout
        # non-replicated -> replicated at the loop backedge ("Invalid
        # relayout: Non-singleton logical dimension is replicated in
        # destination but not in source"). Derive the init zeros from
        # the lane-varying pix vector so every carry starts with a
        # concrete per-lane layout. Values are exactly 0 (pix >= 0).
        izero = jnp.minimum(pix, 0)
        zero = izero.astype(dtype)

        def draw(seed_u, s, b, dim):
            return _bits_to_open_unit(
                _hash_bits(seed_u, pix_u, bc(s, jnp.uint32),
                           bc(b, jnp.uint32), dim), dtype, bc)

        # alive rides the carry as i32 0/1, not bool: Mosaic cannot
        # legalize a vector<i1> operand of the while backedge's
        # scf.yield ("failed to legalize operation 'scf.yield'").
        def cond(c):
            trip, s, b, alive_i = c[0], c[13], c[14], c[15]
            active = (alive_i != 0) | (s < np.int32(spp_c - 1))
            return (trip < t_cap) & jnp.any(active)

        def body(c):
            (trip, ox, oy, oz, dx, dy, dz, tx, ty, tz,
             llx, lly, llz, s, b, alive_i) = c
            alive = alive_i != 0
            # --- regenerate: dead lanes with samples left start the next
            # sample's camera ray in this same trip.
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

            # --- one bounce at per-lane depth b (same op order as
            # megakernel._wavefront_body; RR gate selected per lane since
            # b is no longer a loop constant).
            u_rr = draw(seed_bnc, sg, b, 0)
            u1 = draw(seed_bnc, sg, b, 1)
            u2 = draw(seed_bnc, sg, b, 2)
            rr_on = b >= np.int32(cfg.min_bounces)
            alive = alive & ~(rr_on & (u_rr < dtype(cfg.absorb_prob)))
            rr_scale = jnp.where(rr_on, dtype(inv_keep), dtype(1.0))

            o = V3(ox, oy, oz)
            d = V3(dx, dy, dz)
            best_t, masks = _intersect_static(
                ss, o, d, jnp.full(shape, jnp.inf, dtype), dtype,
                fastmath=fastmath)
            hit_any = jnp.zeros(shape, bool)
            for m in masks:
                hit_any = hit_any | m
            alive = alive & hit_any
            masks = [m & alive for m in masks]
            gate = jnp.where(alive, rr_scale, dtype(0.0))

            px = V3(tx * gate, ty * gate, tz * gate)
            e = _emission_select(ss, masks, emis_ref, shape, dtype)
            llx = llx + px.x * e.x
            lly = lly + px.y * e.y
            llz = llz + px.z * e.z

            p = V3(ox + dx * best_t, oy + dy * best_t, oz + dz * best_t)
            p = V3(jnp.where(alive, p.x, 0.0), jnp.where(alive, p.y, 0.0),
                   jnp.where(alive, p.z, 0.0))
            normal = _normal_static(ss, masks, p, dtype, fastmath=fastmath)
            d_in = V3(-dx, -dy, -dz)
            dir_out, sc_raw = _shade(ss, masks, normal, d_in, u1, u2,
                                     dtype, fastmath=fastmath)
            sc_v = jnp.where(alive, sc_raw, dtype(0.0))
            if collect:
                best = jnp.zeros(shape, jnp.int32)  # 0 = no hit / dead
                for si, m in enumerate(masks):
                    best = jnp.where(m, si + 1, best)
                meta = (best | (want.astype(jnp.int32) << 8)
                        | (rr_on.astype(jnp.int32) << 9))
                if n_chunks == 1:
                    rsc_ref[pl.ds(trip, 1)] = sc_v[None]
                    rmeta_ref[pl.ds(trip, 1)] = meta[None]
                else:
                    rsc_ref[0, pl.ds(trip, 1)] = sc_v[None]
                    rmeta_ref[0, pl.ds(trip, 1)] = meta[None]
            a = _albedo_select(ss, masks, alb_ref, shape, dtype)
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
            # static depth truncation, per lane (the lockstep kernels'
            # loop end; config.py tail bound)
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
            # Chunk minor: this ray tile's radiance block stays
            # VMEM-resident across the chunk dim and accumulates.
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

    # trips is a tiny per-(tile[, chunk]) scalar table: Mosaic rejects
    # sub-tile VMEM-style blocks for it, so keep the FULL array SMEM-
    # resident across the sequential grid (same pattern as the grad
    # accumulators, megakernel.py:962) and index by program id.
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

    def trace(albedo_tab, emission_tab, seeds, tile_base=0, sample_base=0):
        dtype = albedo_tab.dtype
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
            in_specs=[smem, smem, smem, smem, smem],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(tb, sb, seeds, albedo_tab, emission_tab)
        flat = [c.reshape(padded)[:n] for c in out[:3]]
        if collect:
            if n_chunks == 1:
                rsc = out[4].reshape(t_cap, padded)[:, :n]
                rmeta = out[5].reshape(t_cap, padded)[:, :n]
            else:
                rsc = out[4].reshape(n_chunks, t_cap, padded)[:, :, :n]
                rmeta = out[5].reshape(n_chunks, t_cap, padded)[:, :, :n]
            return V3(*flat), rsc, rmeta, out[3]
        return V3(*flat), out[3]

    return trace


def make_regen_sweep_adjoint(scene: Scene, cfg: RenderConfig,
                             tile_rows: int = 32,
                             interpret: bool | None = None,
                             n_pix: int | None = None,
                             n_chunks: int = 1):
    """Reverse-sweep adjoint over the regen kernel's stored residuals —
    the regen analogue of make_fused_sweep_adjoint (same radiative-
    backprop math, adjoint.py _param_grads; reference semantics
    include/drt/integrate.hpp:26-37 biased replay).

    Differences from the lockstep sweep, both forced by the dynamic
    per-lane bounce index:
      - gate reconstruction reads the rr_on bit from meta instead of a
        static per-bounce constant, and the throughput recurrence resets
        T := 1 at want-marked trips (sample starts);
      - the suffix radiance S resets to 0 when the reverse walk crosses
        a want-marked trip (the previous trip belongs to the lane's
        PREVIOUS sample, whose suffix is independent);
      - the per-lane cotangent is per PIXEL (regen lanes are pixels),
        constant across that pixel's samples;
      - both passes run `lax.fori_loop` bounded by the tile's stored
        trip count (rows past it are unwritten garbage), with the
        reconstructed P streamed through VMEM scratch.

    Returns `sweep(alb, emi, rsc: f[t_cap, n], rmeta: i32[t_cap, n],
    trips: i32[n_tiles], g: V3[n]) -> (d_albedo, d_emission)`.

    n_chunks > 1 consumes the chunk-grid collect tracer's residuals
    (`rsc: f[n_chunks, t_cap, n]`, `trips: i32[n_tiles, n_chunks]`) and
    accumulates every chunk's gradient partials in ONE launch over a
    (tiles, chunks) grid — g is per PIXEL, identical across chunks.
    """
    ss = StaticScene(scene)
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
    from drt_tpu.ops.megakernel import (_accumulate_grad_smem,
                                        _class_masks)

    def kernel(alb_ref, emis_ref, rsc_ref, rmeta_ref, trips_ref,
               gx, gy, gz, da_ref, de_ref, px_s, py_s, pz_s):
        dtype = gx.dtype.type
        shape = gx.shape
        n_alb = alb_ref.shape[0]
        n_emit = emis_ref.shape[0]
        ti = pl.program_id(0)
        t_act = (trips_ref[ti] if n_chunks == 1
                 else trips_ref[ti, pl.program_id(1)])
        one = jnp.ones(shape, dtype)

        def _res(ref, t):
            return ref[t] if n_chunks == 1 else ref[0, t]

        # Pass 1: reconstruct P_t (bit-equal: same op order as the
        # forward's T/P recurrence) into VMEM scratch.
        def fwd_body(t, T):
            tx, ty, tz = T
            sc_v = _res(rsc_ref, t)
            meta = _res(rmeta_ref, t)
            best = meta & 0xFF
            want = (meta >> 8) & 1
            rr_on = (meta >> 9) & 1
            tx = jnp.where(want == 1, one, tx)
            ty = jnp.where(want == 1, one, ty)
            tz = jnp.where(want == 1, one, tz)
            rr_scale = jnp.where(rr_on == 1, dtype(inv_keep), dtype(1.0))
            gate = jnp.where(best > 0, rr_scale, dtype(0.0))
            px = tx * gate
            py = ty * gate
            pz = tz * gate
            px_s[pl.ds(t, 1)] = px[None]
            py_s[pl.ds(t, 1)] = py[None]
            pz_s[pl.ds(t, 1)] = pz[None]
            masks = [best == (s + 1) for s in range(ss.n_shapes)]
            a = _albedo_select(ss, masks, alb_ref, shape, dtype)
            return (px * a.x * sc_v, py * a.y * sc_v, pz * a.z * sc_v)

        zero = jnp.zeros(shape, dtype)
        jax.lax.fori_loop(0, t_act, fwd_body, (zero, zero, zero))

        g = V3(gx[...], gy[...], gz[...])

        # Pass 2: reverse suffix sweep (megakernel._reverse_sweep math,
        # dynamic-trip form with per-sample S resets).
        def rev_body(i, c):
            sx, sy, sz = c[0], c[1], c[2]
            da_acc, de_acc = c[3], c[4]
            t = t_act - 1 - i
            sc_v = _res(rsc_ref, t)
            meta = _res(rmeta_ref, t)
            best = meta & 0xFF
            want = (meta >> 8) & 1
            rr_on = (meta >> 9) & 1
            rr_scale = jnp.where(rr_on == 1, dtype(inv_keep), dtype(1.0))
            gate = jnp.where(best > 0, rr_scale, dtype(0.0))
            P = V3(px_s[t], py_s[t], pz_s[t])
            masks = [best == (s + 1) for s in range(ss.n_shapes)]
            e = _emission_select(ss, masks, emis_ref, shape, dtype)
            gP = V3(g.x * P.x, g.y * P.y, g.z * P.z)
            _, by_alb, by_emit, _ = _class_masks(ss, masks)
            de_acc = list(list(r) for r in de_acc)
            da_acc = list(list(r) for r in da_acc)
            for row, m in by_emit.items():
                if row >= n_emit - 1:
                    continue
                for ci, gc in enumerate((gP.x, gP.y, gP.z)):
                    de_acc[row][ci] = de_acc[row][ci] + jnp.sum(
                        jnp.where(m, gc, 0.0))
            gPsS = (gP.x * sc_v * sx, gP.y * sc_v * sy, gP.z * sc_v * sz)
            for row, m in by_alb.items():
                if row >= n_alb - 1:
                    continue
                for ci in range(3):
                    da_acc[row][ci] = da_acc[row][ci] + jnp.sum(
                        jnp.where(m, gPsS[ci], 0.0))
            a = _albedo_select(ss, masks, alb_ref, shape, dtype)
            sx = (e.x + a.x * sc_v * sx) * gate
            sy = (e.y + a.y * sc_v * sy) * gate
            sz = (e.z + a.z * sc_v * sz) * gate
            # crossing below a sample start: previous trip is the
            # previous sample's last bounce — fresh suffix
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

    def sweep(albedo_tab, emission_tab, rsc, rmeta, trips, g: V3):
        n_alb = albedo_tab.shape[0]
        n_emit = emission_tab.shape[0]
        dtype = g.x.dtype
        if n_chunks == 1:
            rsc_t = jnp.pad(rsc, ((0, 0), (0, padded - n))) \
                .reshape(t_cap, rows, LANES)
            rmeta_t = jnp.pad(rmeta, ((0, 0), (0, padded - n))) \
                .reshape(t_cap, rows, LANES)
        else:
            rsc_t = jnp.pad(rsc, ((0, 0), (0, 0), (0, padded - n))) \
                .reshape(n_chunks, t_cap, rows, LANES)
            rmeta_t = jnp.pad(rmeta, ((0, 0), (0, 0), (0, padded - n))) \
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
        )(albedo_tab, emission_tab, rsc_t, rmeta_t, trips, *gargs)
        return da, de

    return sweep
