"""Pallas TPU megakernels: the full wavefront loop fused into one kernel.

The XLA wavefront (drt_tpu/renderer.py) is a `lax.scan` over bounces whose
carry (origins, directions, throughput, radiance, liveness — ~14 f32 per
ray) round-trips HBM on every bounce: XLA cannot fuse across while-loop
iterations. These kernels instead tile the ray wavefront over a Pallas
grid and run ALL `max_depth` bounces on a tile while it sits in
VMEM/registers: HBM traffic per ray drops from O(depth * carry) to one
read of the primary ray + the uniform tape and one write of the radiance
(forward), plus the parameter-gradient partials (adjoint).

Static-scene specialization: the scene geometry, shape->material and
shape->emitter maps are *baked into the kernel as Python literals* at
build time (the reference hard-codes its scene in main() the same way,
reference: src/render.cpp:26-59). The nearest-hit loop
(reference: include/drt/pathtracer.hpp:72-89) unrolls over shapes with
literal plane normals / sphere centers / triangle edges; material dispatch
(reference: include/drt/bxdf.hpp:12-25) reduces to masked select chains
over only the material classes present in the scene. Only the
differentiable tables (albedo, emission — the reference's `VariableNode`
leaves, src/render.cpp:26-29) remain traced inputs, read as scalars from
SMEM.

Math identities used (exact in real arithmetic, so they agree with the
XLA path to f32 rounding):
  cosine sampling  theta = asin(sqrt(u1))  =>  cos(theta) = sqrt(1-u1),
                                               sin(theta) = sqrt(u1)
  specular sampling theta = acos(sqrt(u1^(2/(e+2))))
                                           =>  cos(theta) = u1^(1/(e+2))
(reference forms: bxdf.hpp:69-79, :106-120; the XLA path keeps the
reference's literal asin/acos forms for documentation parity.)

The adjoint kernel implements radiative backprop (reference:
include/drt/integrate.hpp:11-52) exactly like drt_tpu/adjoint.py: retrace
the wavefront, keep per-bounce residuals (P, sc, gate, best-hit index) in
VMEM scratch, sweep bounces in reverse computing the suffix radiance S,
and accumulate d(albedo)/d(emission) partials in SMEM across the
sequential grid, so the whole backward is ONE pass over HBM.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drt_tpu.config import RenderConfig
from drt_tpu.constants import PI, RAY_EPS
from drt_tpu.ops.vecmath import V3
from drt_tpu.scene import DIFFUSE, MIRROR, PLANE, SPECULAR, SPHERE, Scene

LANES = 128
_TRI_DET_EPS = 1e-9  # matches drt_tpu/ops/intersect.py

# Per-spp-chunk seed strides (distinct odd constants; i32 wrap is fine).
# Chunk c's streams are seeded with (seeds[0] + CAM_CHUNK_STRIDE * c,
# seeds[1] + BOUNCE_CHUNK_STRIDE * c) — identical whether the chunks run
# as separate launches (fused.py host loop) or as the minor grid
# dimension of ONE kernel (n_chunks > 1 below), so the two forms are
# bit-equal per ray.
CAM_CHUNK_STRIDE = np.int32(-1640531527)  # 0x9E3779B9 as signed
BOUNCE_CHUNK_STRIDE = np.int32(40503)


def _chunk_seed_pair(seed_ref, c, n_chunks: int):
    """The (cam, bounce) seed words for chunk c read from the i32[2]
    SMEM seeds — in-kernel mirror of fused._chunk_seeds."""
    if n_chunks == 1:
        return seed_ref[0], seed_ref[1]
    return (seed_ref[0] + CAM_CHUNK_STRIDE * c,
            seed_ref[1] + BOUNCE_CHUNK_STRIDE * c)


class StaticScene:
    """Scene arrays frozen to Python/numpy literals for kernel baking."""

    def __init__(self, scene: Scene):
        self.shape_type = np.asarray(scene.shape_type).tolist()
        self.geo = np.asarray(scene.shape_geo, np.float64)
        shape_mat = np.asarray(scene.shape_mat)
        mat_type = np.asarray(scene.mat_type)
        mat_albedo = np.asarray(scene.mat_albedo)
        mat_exponent = np.asarray(scene.mat_exponent, np.float64)
        self.n_shapes = len(self.shape_type)
        # Per-shape static material attributes.
        self.mat_type = [int(mat_type[m]) for m in shape_mat]
        self.exponent = [float(mat_exponent[m]) for m in shape_mat]
        self.albedo_row = [int(mat_albedo[m]) for m in shape_mat]
        self.emit_row = np.asarray(scene.shape_emit).tolist()


def _dot(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _inv_sqrt(x, fastmath: bool):
    """1/sqrt(x): hardware rsqrt in fast-math kernels (last-ulp
    differences vs the exact two-op form), the reference's literal
    sqrt-then-divide otherwise (tape-parity kernels)."""
    return jax.lax.rsqrt(x) if fastmath else 1.0 / jnp.sqrt(x)


def _mul_lit(arr, c: float):
    """arr * literal with exact folding: drops 0-terms, folds +/-1.
    Bit-exact vs the unfolded form for finite arr (all per-ray operands
    here are sanitized finite)."""
    if c == 0.0:
        return None
    if c == 1.0:
        return arr
    if c == -1.0:
        return -arr
    return arr * c


def _dot_lit(vx, vy, vz, c):
    """dot((vx,vy,vz), literal 3-vector) with zero-term elimination,
    preserving x->y->z addition order for the surviving terms."""
    total = None
    for t in (_mul_lit(vx, float(c[0])), _mul_lit(vy, float(c[1])),
              _mul_lit(vz, float(c[2]))):
        if t is None:
            continue
        total = t if total is None else total + t
    return 0.0 if total is None else total


def _axpy_lit(acc, arr, c: float):
    """acc + arr * literal with folding; acc may be None (absent)."""
    t = _mul_lit(arr, c)
    if t is None:
        return acc
    return t if acc is None else acc + t


def _intersect_static(ss: StaticScene, o: V3, d: V3, best_t, dtype,
                      fastmath: bool = False):
    """Unrolled nearest-hit over baked shapes. Returns (best_t, hit_masks)
    where hit_masks[s] is the boolean 'nearest hit is shape s' mask
    (reference: pathtracer.hpp:72-89; per-shape math mirrors
    drt_tpu/ops/intersect.py which cites shape.hpp).
    fastmath folds the sphere-root /2.0 into *0.5 (value-identical for
    binary IEEE, kept off in tape kernels purely for op-shape parity)
    and carries plane/triangle hit distances as sign-normalized
    (num, den > 0) RATIOS — no divide in the sweep; candidates compare
    by cross-multiplication and ONE divide recovers the winner's t
    (mirrors ops/dynkernel._dyn_intersect; `dens[s] is None` marks an
    exact t with literal denominator 1)."""
    ts = []
    dens = []
    valids = []
    for s in range(ss.n_shapes):
        g = ss.geo[s]
        st = ss.shape_type[s]
        den = None
        if st == PLANE:
            n3 = [dtype(g[0]), dtype(g[1]), dtype(g[2])]
            off = float(g[3])
            h = _dot_lit(o.x, o.y, o.z, n3)
            if off != 0.0:
                h = h - dtype(off)
            denom = _dot_lit(d.x, d.y, d.z, [-n3[0], -n3[1], -n3[2]])
            if fastmath:
                # t = h/denom > 0 <=> same signs <=> num > 0, den > 0.
                t = jnp.where(denom < 0, -h, h)
                den = jnp.abs(denom)
                valid = (t > 0) & (den > 0)
            else:
                t = h / denom
                valid = t > 0
        elif st == SPHERE:
            cx, cy, cz = (dtype(g[0]), dtype(g[1]), dtype(g[2]))
            r2 = dtype(g[3] * g[3])
            ocx, ocy, ocz = o.x - cx, o.y - cy, o.z - cz
            b2 = 2.0 * _dot(ocx, ocy, ocz, d.x, d.y, d.z)
            cc = _dot(ocx, ocy, ocz, ocx, ocy, ocz) - r2
            disc = b2 * b2 - 4.0 * cc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            if fastmath:
                t1 = (-b2 - sq) * 0.5
                t2 = (-b2 + sq) * 0.5
            else:
                t1 = (-b2 - sq) / 2.0
                t2 = (-b2 + sq) / 2.0
            t = jnp.where(t1 > 0, t1, t2)
            valid = (disc >= 0) & (t > 0)
        else:  # TRIANGLE (Moller-Trumbore), framework extension
            v0 = g[0:3]
            e1 = g[3:6] - v0
            e2 = g[6:9] - v0
            # p = cross(d, e2) with literal e2
            px = d.y * dtype(e2[2]) - d.z * dtype(e2[1])
            py = d.z * dtype(e2[0]) - d.x * dtype(e2[2])
            pz = d.x * dtype(e2[1]) - d.y * dtype(e2[0])
            det = _dot_lit(px, py, pz, e1)
            tvx, tvy, tvz = (o.x - dtype(v0[0]), o.y - dtype(v0[1]),
                             o.z - dtype(v0[2]))
            u_raw = _dot(tvx, tvy, tvz, px, py, pz)
            # q = cross(tvec, e1) with literal e1
            qx = tvy * dtype(e1[2]) - tvz * dtype(e1[1])
            qy = tvz * dtype(e1[0]) - tvx * dtype(e1[2])
            qz = tvx * dtype(e1[1]) - tvy * dtype(e1[0])
            v_raw = _dot(d.x, d.y, d.z, qx, qy, qz)
            t_raw = _dot_lit(qx, qy, qz, e2)
            if fastmath:
                neg = det < 0
                den = jnp.abs(det)
                u_n = jnp.where(neg, -u_raw, u_raw)
                v_n = jnp.where(neg, -v_raw, v_raw)
                t = jnp.where(neg, -t_raw, t_raw)
                valid = ((den > _TRI_DET_EPS) & (u_n >= 0) & (v_n >= 0)
                         & (u_n + v_n <= den) & (t > 0))
            else:
                inv = 1.0 / det
                u = u_raw * inv
                v = v_raw * inv
                t = t_raw * inv
                valid = ((jnp.abs(det) > _TRI_DET_EPS) & (u >= 0)
                         & (v >= 0) & (u + v <= 1) & (t > 0))
        ts.append(t)
        dens.append(den)
        valids.append(valid)

    best_i = jnp.zeros_like(best_t, jnp.int32)
    if fastmath:
        best_num, best_den = best_t, jnp.ones_like(best_t)
        for s in range(ss.n_shapes):
            den = dens[s]
            lhs = ts[s] * best_den
            rhs = best_num if den is None else best_num * den
            closer = valids[s] & (lhs < rhs)  # strict <: keep-first
            best_num = jnp.where(closer, ts[s], best_num)
            best_den = jnp.where(closer,
                                 jnp.ones_like(best_den) if den is None
                                 else den, best_den)
            best_i = jnp.where(closer, s, best_i)
        hit_valid = jnp.isfinite(best_num)
        best_t = best_num / best_den
    else:
        for s in range(ss.n_shapes):
            closer = valids[s] & (ts[s] < best_t)  # keep-first ties
            best_t = jnp.where(closer, ts[s], best_t)
            best_i = jnp.where(closer, s, best_i)
        hit_valid = jnp.isfinite(best_t)
    masks = [(best_i == s) & hit_valid for s in range(ss.n_shapes)]
    return best_t, masks


def _normal_static(ss: StaticScene, masks, p: V3, dtype,
                   fastmath: bool = False) -> V3:
    """Hit normal via per-shape masked select. Plane normals are stored
    raw/unnormalized (reference: shape.hpp:58-59); triangle normals are
    constant and precomputed; sphere normals normalize(p - c)
    (shape.hpp:105-106)."""
    nx = jnp.zeros_like(p.x)
    ny = jnp.zeros_like(p.x)
    nz = jnp.zeros_like(p.x)
    for s in range(ss.n_shapes):
        g = ss.geo[s]
        st = ss.shape_type[s]
        m = masks[s]
        if st == PLANE:
            cn = g[0:3]
            nx = jnp.where(m, dtype(cn[0]), nx)
            ny = jnp.where(m, dtype(cn[1]), ny)
            nz = jnp.where(m, dtype(cn[2]), nz)
        elif st == SPHERE:
            sx, sy, sz = p.x - dtype(g[0]), p.y - dtype(g[1]), p.z - dtype(g[2])
            inv = _inv_sqrt(_dot(sx, sy, sz, sx, sy, sz), fastmath)
            nx = jnp.where(m, sx * inv, nx)
            ny = jnp.where(m, sy * inv, ny)
            nz = jnp.where(m, sz * inv, nz)
        else:
            v0 = g[0:3]
            cn = np.cross(g[3:6] - v0, g[6:9] - v0)
            cn = cn / np.linalg.norm(cn)
            nx = jnp.where(m, dtype(cn[0]), nx)
            ny = jnp.where(m, dtype(cn[1]), ny)
            nz = jnp.where(m, dtype(cn[2]), nz)
    return V3(nx, ny, nz)


def _class_masks(ss: StaticScene, masks):
    """OR together per-shape hit masks by static attribute."""
    by_mat: dict[int, object] = {}
    by_alb: dict[int, object] = {}
    by_emit: dict[int, object] = {}
    by_exp: dict[float, object] = {}

    def _or(d, k, m):
        d[k] = m if k not in d else (d[k] | m)

    for s in range(ss.n_shapes):
        _or(by_mat, ss.mat_type[s], masks[s])
        _or(by_alb, ss.albedo_row[s], masks[s])
        _or(by_emit, ss.emit_row[s], masks[s])
        if ss.mat_type[s] == SPECULAR:
            _or(by_exp, ss.exponent[s], masks[s])
    return by_mat, by_alb, by_emit, by_exp


def _gather_table(tab_ref, by_row: dict, shape, dtype, default: float):
    """Masked select-chain 'gather' of a tiny SMEM table by row masks.
    The table's last row is the padded sentinel (constant `default`,
    drt_tpu/scene.py albedo_table/emission_table)."""
    sentinel = tab_ref.shape[0] - 1
    out = [jnp.full(shape, default, dtype) for _ in range(3)]
    for row, m in by_row.items():
        if row >= sentinel:
            continue  # sentinel row: keep default
        for c in range(3):
            out[c] = jnp.where(m, tab_ref[row, c], out[c])
    return V3(*out)


def _shade(ss: StaticScene, masks, normal: V3, d_in: V3, u1, u2, dtype,
           fastmath: bool = False):
    """Branch-free BxDF sample + scalar eval over the material classes
    present in the scene (mirrors drt_tpu/ops/bxdf.py, which cites
    bxdf.hpp:29-41, :56-124, :126-144). Returns (dir_out, sc_raw) where
    sc_raw = s * cos(theta) / pdf, unsanitized.

    fastmath (internal-RNG production kernels only — those are already
    only statistically equal to the XLA path): hardware rsqrt for the
    frame/halfway normalizations, algebraic cancellation of the
    diffuse and mirror s*cos/pdf quotients. Same estimator, last-ulp
    value differences; tape kernels keep the reference-exact forms."""
    by_mat, _, _, by_exp = _class_masks(ss, masks)
    have_diffuse = DIFFUSE in by_mat
    have_specular = SPECULAR in by_mat
    have_mirror = MIRROR in by_mat

    # Frame about the raw normal (bxdf.hpp:29-41) — needed by diffuse and
    # specular sampling only.
    if have_diffuse or have_specular:
        use_e1 = jnp.abs(normal.x) < jnp.abs(normal.y)
        tvx = jnp.where(use_e1, 1.0 - normal.x * normal.x,
                        -normal.x * normal.y)
        tvy = jnp.where(use_e1, -normal.y * normal.x,
                        1.0 - normal.y * normal.y)
        tvz = jnp.where(use_e1, -normal.z * normal.x, -normal.z * normal.y)
        tinv = _inv_sqrt(_dot(tvx, tvy, tvz, tvx, tvy, tvz), fastmath)
        tx, ty, tz = tvx * tinv, tvy * tinv, tvz * tinv
        bx = normal.y * tz - normal.z * ty
        by = normal.z * tx - normal.x * tz
        bz = normal.x * ty - normal.y * tx
        binv = _inv_sqrt(_dot(bx, by, bz, bx, by, bz), fastmath)
        bx, by, bz = bx * binv, by * binv, bz * binv
        cos_phi = jnp.cos(2.0 * PI * u2)
        sin_phi = jnp.sin(2.0 * PI * u2)

    def frame_dir(cos_t, sin_t):
        fx = cos_phi * sin_t
        fy = sin_phi * sin_t
        return V3(tx * fx + bx * fy + normal.x * cos_t,
                  ty * fx + by * fy + normal.y * cos_t,
                  tz * fx + bz * fy + normal.z * cos_t)

    def reflect(v: V3, n: V3) -> V3:
        k = 2.0 * _dot(n.x, n.y, n.z, v.x, v.y, v.z)
        return V3(-v.x + k * n.x, -v.y + k * n.y, -v.z + k * n.z)

    dir_out = V3(jnp.zeros_like(u1), jnp.zeros_like(u1), jnp.zeros_like(u1))
    sc = jnp.zeros_like(u1)

    if have_diffuse:
        # theta = asin(sqrt(u1)): cos = sqrt(1-u1), sin = sqrt(u1)
        # (bxdf.hpp:69-79); eval = 1/pi, pdf = cos/pi so s*cos/pdf = 1... but
        # keep the factored form so cos uses the RAW normal dot like the
        # tracer (pathtracer.hpp:103) — the frame z is the raw normal, so
        # dot(normal, dir) = |n|^2 cos-ish for unnormalized plane normals:
        # replicate by computing cos_t from the actual dot below.
        cos_t = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
        sin_t = jnp.sqrt(u1)
        dd = frame_dir(cos_t, sin_t)
        cos_geom = _dot(normal.x, normal.y, normal.z, dd.x, dd.y, dd.z)
        # pdf > 0 guard (matches renderer.py _bounce): u1 == 1 exactly
        # (possible on injected tapes; the reference's rand()/RAND_MAX
        # includes 1) makes cos_t = 0 -> pdf = 0 -> 0/0.
        if fastmath:
            # s*cos/pdf = (1/pi)*cos_geom*pi/cos_t = cos_geom/sqrt(1-u1):
            # one rsqrt replaces sqrt+mul+div (pdf>0 <=> u1 < 1).
            sc_d = jnp.where(u1 < 1.0,
                             cos_geom * jax.lax.rsqrt(1.0 - u1),
                             dtype(0.0))
        else:
            pdf = cos_t / PI
            s_val = 1.0 / PI
            sc_d = jnp.where(pdf > 0, s_val * cos_geom / pdf, dtype(0.0))
        m = by_mat[DIFFUSE]
        dir_out = V3(jnp.where(m, dd.x, dir_out.x),
                     jnp.where(m, dd.y, dir_out.y),
                     jnp.where(m, dd.z, dir_out.z))
        sc = jnp.where(m, sc_d, sc)

    if have_specular:
        # Half-vector sampling (bxdf.hpp:106-120), one exponent class at a
        # time (exponents are static per material).
        for expo, m in by_exp.items():
            e = dtype(expo)
            cos_h = jnp.power(u1, 1.0 / (expo + 2.0))
            sin_h = jnp.sqrt(jnp.maximum(1.0 - cos_h * cos_h, 0.0))
            h = frame_dir(cos_h, sin_h)
            flip = _dot(h.x, h.y, h.z, d_in.x, d_in.y, d_in.z) < 0
            hf = reflect(h, normal)
            h = V3(jnp.where(flip, hf.x, h.x), jnp.where(flip, hf.y, h.y),
                   jnp.where(flip, hf.z, h.z))
            dd = reflect(d_in, h)
            # eval (bxdf.hpp:93-104): (e+2)/(2pi) cos^e(th_h') sin(th_h')
            # with th_h' from the *possibly flipped* halfway vector
            # recomputed against dir_in/dir_out.
            hwx, hwy, hwz = d_in.x + dd.x, d_in.y + dd.y, d_in.z + dd.z
            hw2 = _dot(hwx, hwy, hwz, hwx, hwy, hwz)
            hinv = _inv_sqrt(hw2, fastmath)
            hwx, hwy, hwz = hwx * hinv, hwy * hinv, hwz * hinv
            cos_he = _dot(normal.x, normal.y, normal.z, hwx, hwy, hwz)
            sin_he = jnp.sqrt(jnp.maximum(1.0 - cos_he * cos_he, 0.0))
            # C++ pow semantics for negative base w/ integral exponent
            # (see drt_tpu/ops/bxdf.py:_pow_cpp).
            mag = jnp.power(jnp.abs(cos_he), e)
            if float(expo) == int(expo):
                sgn = (jnp.where(cos_he < 0, dtype(-1.0), dtype(1.0))
                       if int(expo) % 2 == 1 else dtype(1.0))
                powv = mag * sgn
            else:
                powv = jnp.where(cos_he < 0, jnp.nan, mag)
            cos_geom = _dot(normal.x, normal.y, normal.z, dd.x, dd.y, dd.z)
            # pdf > 0 guard (matches renderer.py _bounce): in f32 a u1
            # within ~(e+2)*2^-25 of 1 rounds cos_h to exactly 1 and the
            # pdf to 0 -> 0/0 NaN radiance (~1e-6 of specular draws;
            # never fires in f64, so reference parity is untouched).
            # Degenerate-halfway guard (hw2 > 0, ops/bxdf.py eval_scale).
            if fastmath:
                # s*cos/pdf with the shared (e+2)/(2pi) cancelled:
                # powv*sin_he*cos_geom / (cos_h^(e+1)*sin_h).
                denom = jnp.power(cos_h, e + 1.0) * sin_h
                sc_s = jnp.where((denom > 0) & (hw2 > 0),
                                 powv * sin_he * cos_geom / denom,
                                 dtype(0.0))
            else:
                pdf = ((e + 2.0) / (2.0 * PI)
                       * jnp.power(cos_h, e + 1.0) * sin_h)
                s_val = (e + 2.0) / (2.0 * PI) * powv * sin_he
                s_val = jnp.where(hw2 > 0, s_val, dtype(0.0))
                sc_s = jnp.where(pdf > 0, s_val * cos_geom / pdf,
                                 dtype(0.0))
            dir_out = V3(jnp.where(m, dd.x, dir_out.x),
                         jnp.where(m, dd.y, dir_out.y),
                         jnp.where(m, dd.z, dir_out.z))
            sc = jnp.where(m, sc_s, sc)

    if have_mirror:
        dd = reflect(d_in, normal)
        cos_geom = _dot(normal.x, normal.y, normal.z, dd.x, dd.y, dd.z)
        # eval = 1/cos(theta_out), pdf = 1 => sc = 1 exactly, but keep the
        # quotient for f32-parity with the XLA path (bxdf.hpp:131-136).
        # Guarded like ops/bxdf.py: cos == 0 (grazing f32 hit) would give
        # inf * 0 = NaN. fastmath: (1/c)*c == 1 algebraically — skip the
        # divide (the quotient's f32 value can differ from 1.0 by an ulp,
        # which only the tape kernels must preserve).
        if fastmath:
            sc_m = jnp.where(cos_geom != 0, dtype(1.0), dtype(0.0))
        else:
            sc_m = jnp.where(cos_geom != 0, (1.0 / cos_geom) * cos_geom,
                             dtype(0.0))
        m = by_mat[MIRROR]
        dir_out = V3(jnp.where(m, dd.x, dir_out.x),
                     jnp.where(m, dd.y, dir_out.y),
                     jnp.where(m, dd.z, dir_out.z))
        sc = jnp.where(m, sc_m, sc)

    # NULL_BXDF shapes / misses keep dir_out = 0, sc = 0.
    return dir_out, sc


def _emission_select(ss: StaticScene, masks, emis_ref, shape, dtype) -> V3:
    """Per-ray emission via masked reads of the tiny emission table
    (reference: emitter.hpp:20-21 via pathtracer.hpp:113-114)."""
    _, _, by_emit, _ = _class_masks(ss, masks)
    return _gather_table(emis_ref, by_emit, shape, dtype, 0.0)


def _albedo_select(ss: StaticScene, masks, alb_ref, shape, dtype) -> V3:
    """Per-ray albedo; sentinel (mirror / null-material) rows read 1
    (the padded ones row, drt_tpu/scene.py:albedo_table)."""
    _, by_alb, _, _ = _class_masks(ss, masks)
    return _gather_table(alb_ref, by_alb, shape, dtype, 1.0)


def _wavefront_body(ss: StaticScene, cfg: RenderConfig, alb_ref, emis_ref,
                    o: V3, d: V3, get_u, dtype, on_residual=None,
                    b_start: int = 0, b_end: int | None = None,
                    T: V3 | None = None, alive=None, full_output=False,
                    fastmath: bool = False):
    """The bounce loop over [b_start, b_end) on one VMEM-resident ray
    tile. get_u(lb) -> (u_rr, u1, u2), indexed by the segment-LOCAL
    bounce lb; Russian roulette uses the absolute depth b_start + lb.
    on_residual(lb, P, sc, gate, masks): store adjoint residuals.
    T / alive: entry throughput & liveness (segment continuation; default
    fresh rays). Returns the segment radiance V3, or with full_output the
    tuple (L, o, d, T, alive) for segment chaining (mirrors
    drt_tpu/renderer.py _bounce, which cites pathtracer.hpp)."""
    b_end = cfg.max_depth if b_end is None else b_end
    shape = d.x.shape  # o may carry literal (scalar) camera components
    zero = jnp.zeros(shape, dtype)
    if T is None:
        # Literal unit throughput: bounce-0's P = T * gate and
        # T' = P * a * sc fold the 1-multiplies away (1 * x == x exactly).
        T = V3(dtype(1.0), dtype(1.0), dtype(1.0))
    if alive is None:
        alive = True  # folds the bounce-0 liveness ANDs
    L = V3(zero, zero, zero)
    inv_keep = dtype(1.0 / (1.0 - cfg.absorb_prob))

    for lb, b in enumerate(range(b_start, b_end)):
        u_rr, u1, u2 = get_u(lb)
        if b >= cfg.min_bounces:
            alive = alive & ~(u_rr < cfg.absorb_prob)
            rr_scale = inv_keep
        else:
            rr_scale = dtype(1.0)

        best_t, masks = _intersect_static(
            ss, o, d, jnp.full(shape, jnp.inf, dtype), dtype,
            fastmath=fastmath)
        hit_any = jnp.zeros(shape, bool)
        for m in masks:
            hit_any = hit_any | m
        alive = alive & hit_any
        masks = [m & alive for m in masks]
        gate = jnp.where(alive, rr_scale, dtype(0.0))

        P = V3(T.x * gate, T.y * gate, T.z * gate)
        e = _emission_select(ss, masks, emis_ref, shape, dtype)
        L = V3(L.x + P.x * e.x, L.y + P.y * e.y, L.z + P.z * e.z)

        p = V3(o.x + d.x * best_t, o.y + d.y * best_t, o.z + d.z * best_t)
        # Dead-ray hit data is garbage (inf/NaN); zero it before use so
        # NaN never reaches throughput (cf. renderer.py _bounce).
        p = V3(jnp.where(alive, p.x, 0.0), jnp.where(alive, p.y, 0.0),
               jnp.where(alive, p.z, 0.0))
        normal = _normal_static(ss, masks, p, dtype, fastmath=fastmath)
        d_in = V3(-d.x, -d.y, -d.z)
        dir_out, sc_raw = _shade(ss, masks, normal, d_in, u1, u2, dtype,
                                 fastmath=fastmath)
        sc = jnp.where(alive, sc_raw, dtype(0.0))

        if on_residual is not None:
            on_residual(lb, P, sc, gate, masks)

        a = _albedo_select(ss, masks, alb_ref, shape, dtype)
        T = V3(P.x * a.x * sc, P.y * a.y * sc, P.z * a.z * sc)
        o = V3(jnp.where(alive, p.x + dir_out.x * RAY_EPS, 0.0),
               jnp.where(alive, p.y + dir_out.y * RAY_EPS, 0.0),
               jnp.where(alive, p.z + dir_out.z * RAY_EPS, 0.0))
        d = V3(jnp.where(alive, dir_out.x, 0.0),
               jnp.where(alive, dir_out.y, 0.0),
               jnp.where(alive, dir_out.z, 0.0))
    if full_output:
        return L, o, d, T, alive
    return L


def _make_residual_writer(rP_x, rP_y, rP_z, rsc, rgate, rbest, n_shapes):
    """on_residual callback storing per-bounce adjoint residuals into the
    VMEM scratch buffers, indexed by segment-local bounce."""

    def on_residual(lb, P, sc_b, gate, masks):
        rP_x[lb] = P.x
        rP_y[lb] = P.y
        rP_z[lb] = P.z
        rsc[lb] = sc_b
        rgate[lb] = gate
        best = jnp.zeros(P.x.shape, jnp.int32)  # 0 = no hit
        for s, m in enumerate(masks):
            best = jnp.where(m, s + 1, best)
        rbest[lb] = best

    return on_residual


def _reverse_sweep(ss: StaticScene, alb_ref, emis_ref, g: V3, scratch,
                   seg_len: int, shape, dtype, S_end: V3 | None = None,
                   albedos=None):
    """Reverse suffix sweep over a segment's stored residuals
    (adjoint.py _param_grads math):
      S_lb = gate_lb (e_lb + w_lb S_{lb+1}),  w = albedo * sc
      d emission_l += sum g.P [eid=l];  d albedo_k += sum g.P sc S [aid=k]
    S_end seeds the recursion (the next segment's S_start; zeros for the
    final segment). Returns (S_start, da_acc, de_acc) with the grad
    accumulators as seg-summed scalars [rows][3].

    albedos: optional per-bounce list of precomputed per-ray albedo V3s
    (the stored-sweep kernel's forward recurrence already selected them;
    identical values, so reusing them is exact)."""
    rP_x, rP_y, rP_z, rsc, rgate, rbest = scratch
    n_alb = alb_ref.shape[0]
    n_emit = emis_ref.shape[0]
    if S_end is None:
        z = jnp.zeros(shape, dtype)
        S = V3(z, z, z)
    else:
        S = S_end
    da_acc = [[jnp.zeros((), dtype) for _ in range(3)]
              for _ in range(n_alb)]
    de_acc = [[jnp.zeros((), dtype) for _ in range(3)]
              for _ in range(n_emit)]
    for lb in reversed(range(seg_len)):
        P = V3(rP_x[lb], rP_y[lb], rP_z[lb])
        sc_b = rsc[lb]
        gate = rgate[lb]
        best = rbest[lb]
        masks = [best == (s + 1) for s in range(ss.n_shapes)]
        e = _emission_select(ss, masks, emis_ref, shape, dtype)
        gP = V3(g.x * P.x, g.y * P.y, g.z * P.z)
        _, by_alb, by_emit, _ = _class_masks(ss, masks)
        for row, m in by_emit.items():
            if row >= n_emit - 1:
                continue
            for c, gc in enumerate((gP.x, gP.y, gP.z)):
                de_acc[row][c] = de_acc[row][c] + jnp.sum(
                    jnp.where(m, gc, 0.0))
        gPsS = (gP.x * sc_b * S.x, gP.y * sc_b * S.y, gP.z * sc_b * S.z)
        for row, m in by_alb.items():
            if row >= n_alb - 1:
                continue
            for c in range(3):
                da_acc[row][c] = da_acc[row][c] + jnp.sum(
                    jnp.where(m, gPsS[c], 0.0))
        a = (albedos[lb] if albedos is not None
             else _albedo_select(ss, masks, alb_ref, shape, dtype))
        S = V3((e.x + a.x * sc_b * S.x) * gate,
               (e.y + a.y * sc_b * S.y) * gate,
               (e.z + a.z * sc_b * S.z) * gate)
    return S, da_acc, de_acc


def _accumulate_grad_smem(da_ref, de_ref, da_acc, de_acc, dtype,
                          first=None):
    """Zero-init the SMEM accumulators on the first grid step, then add
    this tile's partials (SMEM takes scalar stores only). `first` is the
    first-grid-step predicate for kernels with extra grid dimensions
    (default: program_id(0) == 0)."""
    n_alb = da_ref.shape[0]
    n_emit = de_ref.shape[0]
    if first is None:
        first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        for k in range(n_alb):
            for c in range(3):
                da_ref[k, c] = dtype(0.0)
        for l in range(n_emit):
            for c in range(3):
                de_ref[l, c] = dtype(0.0)

    for k in range(n_alb):
        for c in range(3):
            da_ref[k, c] = da_ref[k, c] + da_acc[k][c]
    for l in range(n_emit):
        for c in range(3):
            de_ref[l, c] = de_ref[l, c] + de_acc[l][c]


def _pad_rows(n: int, tile_rows: int) -> tuple[int, int]:
    """Ray count n -> (rows, padded_n) with rows % tile_rows == 0."""
    rows = -(-n // LANES)
    rows = -(-rows // tile_rows) * tile_rows
    return rows, rows * LANES


def _to_tiles(x: jnp.ndarray, padded: int, rows: int) -> jnp.ndarray:
    pad = padded - x.shape[0]
    if pad:
        x = jnp.pad(x, (0, pad))
    return x.reshape(rows, LANES)


def make_pallas_tracer(scene: Scene, cfg: RenderConfig, tile_rows: int = 32,
                       interpret: bool | None = None):
    """Build the fused forward tracer.

    Returns `trace(albedo_tab, emission_tab, o: V3[N], d: V3[N],
    u: f32[max_depth, 3, N]) -> V3[N]` — semantically identical to
    `trace_rays(..., tape=u)` (tested in tests/test_megakernel.py).
    """
    ss = StaticScene(scene)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = cfg.max_depth

    def kernel(alb_ref, emis_ref, ox, oy, oz, dx, dy, dz, u_ref,
               lx, ly, lz):
        dtype = ox.dtype.type  # scalar constructor doubling as dtype
        o = V3(ox[...], oy[...], oz[...])
        d = V3(dx[...], dy[...], dz[...])

        def get_u(b):
            return u_ref[b, 0], u_ref[b, 1], u_ref[b, 2]

        L = _wavefront_body(ss, cfg, alb_ref, emis_ref, o, d, get_u, dtype)
        lx[...] = L.x
        ly[...] = L.y
        lz[...] = L.z

    def trace(albedo_tab, emission_tab, o: V3, d: V3, u: jnp.ndarray) -> V3:
        n = o.x.shape[0]
        dtype = o.x.dtype
        rows, padded = _pad_rows(n, tile_rows)
        grid = rows // tile_rows
        tile = (tile_rows, LANES)
        ray_spec = pl.BlockSpec(tile, lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        u3 = u.reshape(D, 3, -1)
        u_tiled = jnp.pad(u3, ((0, 0), (0, 0), (0, padded - n))) \
            .reshape(D, 3, rows, LANES)
        args = [_to_tiles(c, padded, rows) for c in
                (o.x, o.y, o.z, d.x, d.y, d.z)]
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # albedo table
                pl.BlockSpec(memory_space=pltpu.SMEM),  # emission table
                *[ray_spec] * 6,
                pl.BlockSpec((D, 3, tile_rows, LANES),
                             lambda i: (0, 0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[ray_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((rows, LANES), dtype)] * 3,
            interpret=interpret,
        )(albedo_tab, emission_tab, *args, u_tiled)
        return V3(*(c.reshape(padded)[:n] for c in out))

    return trace


class StaticCamera:
    """Camera basis frozen to literals for kernel baking (the reference
    hard-codes its camera in main() too, src/render.cpp:62-65)."""

    def __init__(self, cam, width: int, height: int):
        self.eye = np.asarray(cam.eye, np.float64)
        self.forward = np.asarray(cam.forward, np.float64)
        self.right = np.asarray(cam.right, np.float64)
        self.up = np.asarray(cam.up, np.float64)
        self.half = float(np.tan(float(cam.vfov) / 2.0))
        self.aspect = float(width) / float(height)
        self.width = width
        self.height = height


def _camera_rays_static(sc: StaticCamera, spp_c: int, tile_rows: int,
                        base_idx, u_s, u_t, dtype, fastmath: bool = False):
    """In-kernel primary-ray generation (reference: camera.hpp:51-60,
    mirroring drt_tpu/camera.py camera_rays). Ray ordering is SPP-OUTER:
    ray i maps to pixel i % (W*H), sample i // (W*H). This keeps the
    huge pixel axis minor so the downstream per-pixel spp-mean reduces
    over the MAJOR axis — a spp-minor layout forces a pathological
    (spp -> 128 lane) relayout on TPU (~19 ms/chunk measured at spp 2)."""
    shape = (tile_rows, LANES)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = base_idx + row * LANES + lane
    npix = sc.width * sc.height
    pix = idx - (idx // npix) * npix  # idx % npix
    pix = jnp.minimum(pix, npix - 1)  # clamp padding rays
    return _camera_ray_from_pix(sc, pix, u_s, u_t, dtype, fastmath=fastmath)


def _camera_ray_from_pix(sc: StaticCamera, pix, u_s, u_t, dtype,
                         fastmath: bool = False):
    """Primary ray for explicit per-lane PIXEL indices (camera.hpp:51-60).
    Factored from _camera_rays_static (same ops, bit-exact) so the
    regeneration kernel — whose lanes are pixels at varying sample
    indices — shares the exact camera math."""
    shape = pix.shape
    y = pix // sc.width
    x = pix - y * sc.width
    s = (x.astype(dtype) + u_s) / dtype(sc.width)
    t = (y.astype(dtype) + u_t) / dtype(sc.height)
    a = (2.0 * s - 1.0) * dtype(sc.aspect * sc.half)
    b = (2.0 * t - 1.0) * dtype(sc.half)
    # d = normalize(forward + right * a - up * b)  (t-axis uses -up,
    # camera.hpp:57). The basis usually has exact-zero components (e.g.
    # the sample app's axis-aligned camera) — fold those terms away.
    def comp(i):
        # Order-preserving fold of f + (r*a) + (-u*b): dropping exact-zero
        # terms is bit-exact; surviving terms keep their addition order.
        f = float(sc.forward[i])
        acc = None if f == 0.0 else dtype(f)
        acc = _axpy_lit(acc, a, float(sc.right[i]))
        acc = _axpy_lit(acc, b, -float(sc.up[i]))
        if acc is None:
            return jnp.zeros(shape, dtype)
        if not hasattr(acc, "shape") or acc.shape != shape:
            return jnp.broadcast_to(jnp.asarray(acc, dtype), shape)
        return acc

    dx, dy, dz = comp(0), comp(1), comp(2)
    inv = _inv_sqrt(dx * dx + dy * dy + dz * dz, fastmath)
    d = V3(dx * inv, dy * inv, dz * inv)
    # The eye is a compile-time LITERAL (scalar components, not filled
    # arrays): every origin-dependent term of the bounce-0 intersect
    # (plane h = dot(o, n) - off, sphere |o-c|^2 - r^2, triangle
    # tvec/q = cross(tvec, e1)) constant-folds at trace time — bit-exact,
    # since the folded scalars follow the same IEEE op order.
    o = V3(dtype(sc.eye[0]), dtype(sc.eye[1]), dtype(sc.eye[2]))
    return o, d


def _uniform_from_bits(shape, dtype):
    """(0, 1) uniforms from the per-core PRNG (24-bit mantissa). The raw
    bits are signed i32 — bitcast to u32 before the shift, else the
    arithmetic shift manufactures negative 'uniforms'.

    OPEN interval via the half-ulp offset (bits23 + 0.5) * 2^-23, i.e.
    u in [2^-24, 1 - 2^-24]: a uniform of exactly 0 (or 1) makes a
    sampling pdf zero -> 0/0 = NaN radiance (the reference has the same
    edge — rand()/RAND_MAX spans [0, 1] inclusive, random.hpp:7-10 — at
    ~2^-31 probability vs 2^-24 for short mantissas; observed ~1 NaN
    pixel per ~10M draws on-chip before this). 23 bits, not 24: i24+0.5
    needs 25 significand bits, so f32 rounds (2^24-1)+0.5 UP and the
    product becomes exactly 1.0 — i23+0.5 is exactly representable for
    all i23 < 2^23. The tape-mode kernels consume caller-provided
    uniforms and keep reference-exact behavior; the pdf>0 guards in
    _shade / renderer._bounce cover injected boundary tapes."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # Mosaic has no u32->f32 cast; the top bits fit in a non-negative
    # i32, which does cast.
    i23 = pltpu.bitcast(bits >> 9, jnp.int32)
    return (i23.astype(dtype) + dtype(0.5)) * dtype(1.0 / (1 << 23))


def make_fused_tracer(scene: Scene, cam, cfg: RenderConfig,
                      tile_rows: int = 32, rng: str = "internal",
                      interpret: bool | None = None,
                      n_rays: int | None = None,
                      fastmath: bool = False,
                      n_chunks: int = 1):
    """Build the fully-fused forward pass: camera ray generation, uniform
    sampling, and the whole wavefront loop in ONE kernel — per-ray HBM
    traffic is just the radiance write.

    rng="internal": uniforms from the TPU per-core PRNG, seeded per
      (seed, global tile); `trace(albedo_tab, emission_tab,
      seeds: i32[2], tile_base=0)`. seeds[0] drives the camera jitter,
      seeds[1] the bounce sampling (separated so unbiased-mode adjoints
      can redraw bounce samples while replaying the same primary rays,
      integrate.hpp:39-52).
    rng="tape": uniforms from inputs `(cam_u: f[2, N], u: f[D, 3, N])` —
      exact-parity testing against the XLA path on CPU (the TPU PRNG is
      not emulated in interpret mode).

    n_rays: rays handled by this kernel instance (default the full chunk
      W*H*(spp/spp_chunks)). Under shard_map each device builds the
      kernel with its local count and passes its global `tile_base`
      (device_index * local_tiles) so ray->pixel mapping and PRNG streams
      are globally consistent and collision-free across shards.

    Returns radiance V3 of f[n_rays]. (Thin wrapper over the
    [0, max_depth) segment kernel — identical streams and signature;
    the segment offset salt is 0 at b_start = 0.)
    """
    return make_fused_segment_tracer(scene, cam, cfg, 0, cfg.max_depth,
                                     n_rays=n_rays, tile_rows=tile_rows,
                                     rng=rng, interpret=interpret,
                                     fastmath=fastmath, n_chunks=n_chunks)


def make_fused_adjoint(scene: Scene, cam, cfg: RenderConfig,
                       tile_rows: int = 32, rng: str = "internal",
                       interpret: bool | None = None,
                       n_rays: int | None = None,
                       fastmath: bool = False,
                       n_chunks: int = 1):
    """Fused radiative-backprop adjoint for the fused tracer: regenerate
    the primary rays and uniforms in-kernel, retrace collecting residuals
    in VMEM scratch, reverse-sweep, and accumulate parameter-grad partials
    in SMEM across the sequential grid.

    rng="internal": `adj(albedo_tab, emission_tab, seeds: i32[2], g: V3[N],
      tile_base=0)` — pass the forward's seeds for biased mode
      (integrate.hpp:26-37) or a fresh seeds[1] for unbiased mode
      (integrate.hpp:39-52).
    rng="tape": `adj(albedo_tab, emission_tab, cam_u, u, g, tile_base=0)`.

    n_rays / tile_base: see make_fused_tracer — shard_map support.
    (Thin wrapper over the [0, max_depth) segment adjoint.)
    """
    seg = make_fused_segment_adjoint(scene, cam, cfg, 0, cfg.max_depth,
                                     n_rays=n_rays, tile_rows=tile_rows,
                                     rng=rng, interpret=interpret,
                                     fastmath=fastmath, n_chunks=n_chunks)
    if rng == "internal":
        def adjoint(albedo_tab, emission_tab, seeds, g: V3, tile_base=0):
            return seg(albedo_tab, emission_tab, seeds, g.x, g.y, g.z,
                       tile_base=tile_base)
    else:
        def adjoint(albedo_tab, emission_tab, cam_u, u, g: V3,
                    tile_base=0):
            return seg(albedo_tab, emission_tab, cam_u, u, g.x, g.y, g.z,
                       tile_base=tile_base)
    return adjoint


def make_pallas_adjoint(scene: Scene, cfg: RenderConfig, tile_rows: int = 32,
                        interpret: bool | None = None):
    """Build the fused radiative-backprop adjoint.

    Returns `adj(albedo_tab, emission_tab, o, d, u, g: V3[N]) ->
    (d_albedo f[K+1,3], d_emission f[L+1,3])` — the parameter-gradient
    partials for this wavefront given per-ray radiance cotangents g.
    One kernel: retrace + reverse suffix sweep + reduction
    (the fused equivalent of adjoint.py _forward(collect=True) +
    _param_grads; radiative backprop per integrate.hpp:11-52).
    """
    ss = StaticScene(scene)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = cfg.max_depth

    def kernel(alb_ref, emis_ref, ox, oy, oz, dx, dy, dz, u_ref,
               gx, gy, gz, da_ref, de_ref, *scratch):
        dtype = ox.dtype.type  # scalar constructor doubling as dtype
        o = V3(ox[...], oy[...], oz[...])
        d = V3(dx[...], dy[...], dz[...])

        def get_u(b):
            return u_ref[b, 0], u_ref[b, 1], u_ref[b, 2]

        on_residual = _make_residual_writer(*scratch, ss.n_shapes)
        _wavefront_body(ss, cfg, alb_ref, emis_ref, o, d, get_u, dtype,
                        on_residual=on_residual)
        g = V3(gx[...], gy[...], gz[...])
        _, da_acc, de_acc = _reverse_sweep(ss, alb_ref, emis_ref, g,
                                           scratch, D, g.x.shape, dtype)
        _accumulate_grad_smem(da_ref, de_ref, da_acc, de_acc, dtype)

    def adjoint(albedo_tab, emission_tab, o: V3, d: V3, u: jnp.ndarray,
                g: V3):
        n = o.x.shape[0]
        n_alb = albedo_tab.shape[0]
        n_emit = emission_tab.shape[0]
        dtype = o.x.dtype
        rows, padded = _pad_rows(n, tile_rows)
        grid = rows // tile_rows
        tile = (tile_rows, LANES)
        ray_spec = pl.BlockSpec(tile, lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        u3 = u.reshape(D, 3, -1)
        u_tiled = jnp.pad(u3, ((0, 0), (0, 0), (0, padded - n))) \
            .reshape(D, 3, rows, LANES)
        args = [_to_tiles(c, padded, rows) for c in
                (o.x, o.y, o.z, d.x, d.y, d.z)]
        gargs = [_to_tiles(c, padded, rows) for c in (g.x, g.y, g.z)]
        acc_spec = pl.BlockSpec((n_alb, 3), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
        acc_spec_e = pl.BlockSpec((n_emit, 3), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)
        da, de = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                *[ray_spec] * 6,
                pl.BlockSpec((D, 3, tile_rows, LANES),
                             lambda i: (0, 0, i, 0),
                             memory_space=pltpu.VMEM),
                *[ray_spec] * 3,
            ],
            out_specs=[acc_spec, acc_spec_e],
            out_shape=[jax.ShapeDtypeStruct((n_alb, 3), dtype),
                       jax.ShapeDtypeStruct((n_emit, 3), dtype)],
            scratch_shapes=[
                pltpu.VMEM((D, tile_rows, LANES), dtype),  # P.x
                pltpu.VMEM((D, tile_rows, LANES), dtype),  # P.y
                pltpu.VMEM((D, tile_rows, LANES), dtype),  # P.z
                pltpu.VMEM((D, tile_rows, LANES), dtype),  # sc
                pltpu.VMEM((D, tile_rows, LANES), dtype),  # gate
                pltpu.VMEM((D, tile_rows, LANES), jnp.int32),  # best+1
            ],
            interpret=interpret,
        )(albedo_tab, emission_tab, *args, u_tiled, *gargs)
        return da, de

    return adjoint


# ---------------------------------------------------------------------------
# Segmented wavefront kernels (for inter-segment ray compaction).
#
# Russian roulette kills ~absorb of the wavefront per bounce past
# min_bounces, but the lockstep kernel pays for every lane at every
# bounce. Splitting the loop into segments lets XLA-side stream
# compaction (nonzero + gather — measured ~0.25 ms for a 4.9M-ray
# wavefront) shrink the later segments to the surviving rays. The
# adjoint stitches segments through the boundary suffix radiance
# S_b = gate_b (e_b + w_b S_{b+1}): a later segment's adjoint outputs its
# S at entry, which seeds the earlier segment's reverse sweep.
# ---------------------------------------------------------------------------

def _seg_spec_helpers(tile_rows, n_chunks: int = 1):
    """Block specs for per-ray tiles. With n_chunks > 1 the grid is
    (tiles, chunks) — chunk minor, so a ray tile's output block is
    revisited on consecutive grid steps (stays VMEM-resident) while the
    kernel accumulates the per-chunk radiance into it."""
    tile = (tile_rows, LANES)
    if n_chunks == 1:
        idx = lambda i: (i, 0)
    else:
        idx = lambda i, c: (i, 0)
    ray_spec = pl.BlockSpec(tile, idx, memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return tile, ray_spec, smem


def make_fused_segment_tracer(scene: Scene, cam, cfg: RenderConfig,
                              b_start: int, b_end: int,
                              n_rays: int | None = None,
                              tile_rows: int = 32, rng: str = "internal",
                              interpret: bool | None = None,
                              fastmath: bool = False,
                              n_chunks: int = 1):
    """Forward kernel for bounces [b_start, b_end) of the wavefront.

    b_start == 0 generates camera rays in-kernel; otherwise the segment
    resumes from explicit state `(o3, d3, T3, alive_i32)` (10 arrays of
    f[n]/i32[n], as produced by the previous segment). Unless b_end ==
    max_depth, the final state is returned after the radiance.

    internal rng: `trace(alb, emi, seeds, [state...], tile_base=0)`.
      Bounce streams are seeded per (seeds[1], b_start, global tile), so
      segments draw independent, replayable streams.
    tape rng: `trace(alb, emi, [cam_u,] u, [state...], tile_base=0)` with
      u: f[b_end - b_start, 3, n].

    n_chunks > 1 (full-depth internal rng only) folds the spp-chunk loop
    into the kernel grid — grid (tiles, chunks), chunk minor — and the
    returned radiance is the per-ray-slot SUM over chunks (the chunk
    streams are seeded exactly as fused._chunk_seeds, so per-chunk
    radiance is bit-equal to n_chunks separate launches): ONE kernel
    dispatch per forward step instead of spp_chunks (VERDICT r3 #2a).
    """
    ss = StaticScene(scene)
    sc = StaticCamera(cam, cfg.width, cfg.height)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret is True and rng == "internal":
        interpret = pltpu.InterpretParams()
    entry_cam = b_start == 0
    final = b_end == cfg.max_depth
    seg_len = b_end - b_start
    assert 0 < seg_len and b_end <= cfg.max_depth
    assert n_chunks == 1 or (entry_cam and final and rng == "internal"), \
        "chunk-grid tracing is full-depth internal-RNG only"
    spp_c = cfg.spp // cfg.spp_chunks
    n = (cfg.width * cfg.height * spp_c) if n_rays is None else n_rays
    rows, padded = _pad_rows(n, tile_rows)
    grid = rows // tile_rows
    tile, ray_spec, smem = _seg_spec_helpers(tile_rows, n_chunks)

    n_state_in = 0 if entry_cam else 10
    n_out = 3 if final else 13

    def kernel(*refs):
        it = iter(refs)
        tb_ref = next(it)
        seed_ref = next(it) if rng == "internal" else None
        alb_ref = next(it)
        emis_ref = next(it)
        cu_ref = u_ref = None
        if rng == "tape":
            if entry_cam:
                cu_ref = next(it)
            u_ref = next(it)
        state_refs = [next(it) for _ in range(n_state_in)]
        out_refs = [next(it) for _ in range(n_out)]
        dtype = out_refs[0].dtype.type
        i = pl.program_id(0)
        gi = tb_ref[0] + i
        ck = pl.program_id(1) if n_chunks > 1 else 0

        if rng == "internal":
            seed0, seed1 = _chunk_seed_pair(seed_ref, ck, n_chunks)
            if entry_cam:
                pltpu.prng_seed(seed0, gi)
                cam_u = _uniform_from_bits((2, tile_rows, LANES), dtype)
            # Mosaic's prng_seed takes at most 2 values; fold the
            # segment offset into the seed word (mod 2^32, signed).
            _v = (0x6A09E667 * b_start) & 0xFFFFFFFF
            salt = np.int32(_v - (1 << 32) if _v >= (1 << 31) else _v)
            pltpu.prng_seed(seed1 + salt, gi)
            u = _uniform_from_bits((seg_len, 3, tile_rows, LANES), dtype)

            def get_u(lb):
                return u[lb, 0], u[lb, 1], u[lb, 2]
        else:
            def get_u(lb):
                return u_ref[lb, 0], u_ref[lb, 1], u_ref[lb, 2]

        if entry_cam:
            base_idx = gi * (tile_rows * LANES)
            if rng == "internal":
                u_s, u_t = cam_u[0], cam_u[1]
            else:
                u_s, u_t = cu_ref[0], cu_ref[1]
            o, d = _camera_rays_static(sc, spp_c, tile_rows, base_idx,
                                       u_s, u_t, dtype,
                                       fastmath=fastmath)
            T = None
            alive = None
        else:
            (ox, oy, oz, dx, dy, dz, tx, ty, tz, al) = state_refs
            o = V3(ox[...], oy[...], oz[...])
            d = V3(dx[...], dy[...], dz[...])
            T = V3(tx[...], ty[...], tz[...])
            alive = al[...] > 0

        L, o2, d2, T2, alive2 = _wavefront_body(
            ss, cfg, alb_ref, emis_ref, o, d, get_u, dtype,
            b_start=b_start, b_end=b_end, T=T, alive=alive,
            full_output=True, fastmath=fastmath)
        if n_chunks > 1:
            # The output ray tile is revisited across the minor chunk
            # grid dim: initialize on the first chunk, accumulate after.
            @pl.when(ck == 0)
            def _init():
                out_refs[0][...] = L.x
                out_refs[1][...] = L.y
                out_refs[2][...] = L.z

            @pl.when(ck != 0)
            def _acc():
                out_refs[0][...] = out_refs[0][...] + L.x
                out_refs[1][...] = out_refs[1][...] + L.y
                out_refs[2][...] = out_refs[2][...] + L.z
        else:
            out_refs[0][...] = L.x
            out_refs[1][...] = L.y
            out_refs[2][...] = L.z
        if not final:
            for ref, val in zip(out_refs[3:12],
                                (o2.x, o2.y, o2.z, d2.x, d2.y, d2.z,
                                 T2.x, T2.y, T2.z)):
                ref[...] = val
            out_refs[12][...] = alive2.astype(jnp.int32)

    def trace(albedo_tab, emission_tab, *args, tile_base=0):
        dtype = albedo_tab.dtype
        tb = jnp.asarray(tile_base, jnp.int32).reshape(1)
        it = iter(args)
        call_args = [tb]
        in_specs = [smem]
        if rng == "internal":
            call_args.append(next(it))  # seeds
            in_specs.append(smem)
        call_args += [albedo_tab, emission_tab]
        in_specs += [smem, smem]
        if rng == "tape":
            if entry_cam:
                cam_u = next(it)  # f[2, n]
                cu = jnp.pad(cam_u.reshape(2, -1),
                             ((0, 0), (0, padded - n))) \
                    .reshape(2, rows, LANES)
                call_args.append(cu)
                in_specs.append(pl.BlockSpec((2, tile_rows, LANES),
                                             lambda i: (0, i, 0),
                                             memory_space=pltpu.VMEM))
            u = next(it)  # f[seg_len, 3, n]
            ut = jnp.pad(u.reshape(seg_len, 3, -1),
                         ((0, 0), (0, 0), (0, padded - n))) \
                .reshape(seg_len, 3, rows, LANES)
            call_args.append(ut)
            in_specs.append(pl.BlockSpec((seg_len, 3, tile_rows, LANES),
                                         lambda i: (0, 0, i, 0),
                                         memory_space=pltpu.VMEM))
        if not entry_cam:
            state = list(it)
            assert len(state) == 10, len(state)
            for c in state:
                call_args.append(_to_tiles(c, padded, rows))
                in_specs.append(ray_spec)
        out_shape = ([jax.ShapeDtypeStruct((rows, LANES), dtype)] * 3
                     if final else
                     [jax.ShapeDtypeStruct((rows, LANES), dtype)] * 12
                     + [jax.ShapeDtypeStruct((rows, LANES), jnp.int32)])
        out = pl.pallas_call(
            kernel,
            grid=(grid,) if n_chunks == 1 else (grid, n_chunks),
            in_specs=in_specs,
            out_specs=[ray_spec] * n_out,
            out_shape=out_shape,
            interpret=interpret,
        )(*call_args)
        flat = [c.reshape(padded)[:n] for c in out]
        L = V3(*flat[:3])
        if final:
            return L
        return L, tuple(flat[3:])

    return trace


def make_fused_collect_tracer(scene: Scene, cam, cfg: RenderConfig,
                              tile_rows: int = 32, rng: str = "internal",
                              interpret: bool | None = None,
                              n_rays: int | None = None,
                              fastmath: bool = False,
                              n_chunks: int = 1):
    """Full-depth fused forward tracer that ALSO writes the per-bounce
    adjoint residuals `(sc, best)` to HBM — the memory side of the
    store-vs-retrace tradeoff for radiative backprop.

    The retrace adjoint (make_fused_adjoint) re-runs the whole forward
    (intersect + shade, ~85% of its cost) to rebuild residuals in VMEM.
    Storing instead costs 8 B/bounce-ray of HBM (sc f32 + best i32; P and
    gate are NOT stored — they are recomputed exactly from (sc, best) by
    the sweep kernel's cheap throughput recurrence, and gate is a static
    per-bounce constant masked by best > 0), which at ~800 GB/s is orders
    of magnitude cheaper than the retrace. Biased (key-replay) mode only
    — the unbiased adjoint semantically REQUIRES fresh retraces
    (reference: include/drt/integrate.hpp:11-24).

    Returns `trace(alb, emi, seeds | (cam_u, u), tile_base=0) ->
    (L: V3[n], rsc: f[D, n], rbest: i32[D, n])`; L is computed by the
    identical op sequence as make_fused_tracer (bit-equal radiance).

    n_chunks > 1 (internal rng only) folds the spp-chunk loop into the
    grid as in make_fused_segment_tracer: L becomes the per-slot SUM
    over chunks and the residuals gain a leading chunk dim
    (rsc: f[n_chunks, D, n], rbest: i32[n_chunks, D, n]).
    """
    ss = StaticScene(scene)
    sc = StaticCamera(cam, cfg.width, cfg.height)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret is True and rng == "internal":
        interpret = pltpu.InterpretParams()
    assert n_chunks == 1 or rng == "internal", \
        "chunk-grid collection is internal-RNG only"
    D = cfg.max_depth
    spp_c = cfg.spp // cfg.spp_chunks
    n = (cfg.width * cfg.height * spp_c) if n_rays is None else n_rays
    rows, padded = _pad_rows(n, tile_rows)
    grid = rows // tile_rows
    tile, ray_spec, smem = _seg_spec_helpers(tile_rows, n_chunks)
    if n_chunks == 1:
        res_spec = pl.BlockSpec((D, tile_rows, LANES),
                                lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
    else:
        res_spec = pl.BlockSpec((1, D, tile_rows, LANES),
                                lambda i, c: (c, 0, i, 0),
                                memory_space=pltpu.VMEM)

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
        lx, ly, lz, rsc_ref, rbest_ref = (next(it) for _ in range(5))
        dtype = lx.dtype.type
        i = pl.program_id(0)
        gi = tb_ref[0] + i
        ck = pl.program_id(1) if n_chunks > 1 else 0

        if rng == "internal":
            seed0, seed1 = _chunk_seed_pair(seed_ref, ck, n_chunks)
            pltpu.prng_seed(seed0, gi)
            cam_u = _uniform_from_bits((2, tile_rows, LANES), dtype)
            pltpu.prng_seed(seed1, gi)
            u = _uniform_from_bits((D, 3, tile_rows, LANES), dtype)
            u_s, u_t = cam_u[0], cam_u[1]

            def get_u(lb):
                return u[lb, 0], u[lb, 1], u[lb, 2]
        else:
            u_s, u_t = cu_ref[0], cu_ref[1]

            def get_u(lb):
                return u_ref[lb, 0], u_ref[lb, 1], u_ref[lb, 2]

        base_idx = gi * (tile_rows * LANES)
        o, d = _camera_rays_static(sc, spp_c, tile_rows, base_idx,
                                   u_s, u_t, dtype, fastmath=fastmath)

        def on_residual(lb, P, sc_b, gate, masks):
            best = jnp.zeros(sc_b.shape, jnp.int32)  # 0 = no hit / dead
            for s, m in enumerate(masks):
                best = jnp.where(m, s + 1, best)
            if n_chunks == 1:
                rsc_ref[lb] = sc_b
                rbest_ref[lb] = best
            else:
                rsc_ref[0, lb] = sc_b
                rbest_ref[0, lb] = best

        L = _wavefront_body(ss, cfg, alb_ref, emis_ref, o, d, get_u,
                            dtype, on_residual=on_residual,
                            fastmath=fastmath)
        if n_chunks > 1:
            @pl.when(ck == 0)
            def _init():
                lx[...] = L.x
                ly[...] = L.y
                lz[...] = L.z

            @pl.when(ck != 0)
            def _acc():
                lx[...] = lx[...] + L.x
                ly[...] = ly[...] + L.y
                lz[...] = lz[...] + L.z
        else:
            lx[...] = L.x
            ly[...] = L.y
            lz[...] = L.z

    def trace(albedo_tab, emission_tab, *args, tile_base=0):
        dtype = albedo_tab.dtype
        tb = jnp.asarray(tile_base, jnp.int32).reshape(1)
        it = iter(args)
        call_args = [tb]
        in_specs = [smem]
        if rng == "internal":
            call_args.append(next(it))  # seeds
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
        if n_chunks == 1:
            res_shapes = [jax.ShapeDtypeStruct((D, rows, LANES), dtype),
                          jax.ShapeDtypeStruct((D, rows, LANES),
                                               jnp.int32)]
        else:
            res_shapes = [
                jax.ShapeDtypeStruct((n_chunks, D, rows, LANES), dtype),
                jax.ShapeDtypeStruct((n_chunks, D, rows, LANES),
                                     jnp.int32)]
        out = pl.pallas_call(
            kernel,
            grid=(grid,) if n_chunks == 1 else (grid, n_chunks),
            in_specs=in_specs,
            out_specs=[ray_spec] * 3 + [res_spec, res_spec],
            out_shape=[jax.ShapeDtypeStruct((rows, LANES), dtype)] * 3
            + res_shapes,
            interpret=interpret,
        )(*call_args)
        L = V3(*(c.reshape(padded)[:n] for c in out[:3]))
        if n_chunks == 1:
            rsc = out[3].reshape(D, padded)[:, :n]
            rbest = out[4].reshape(D, padded)[:, :n]
        else:
            rsc = out[3].reshape(n_chunks, D, padded)[:, :, :n]
            rbest = out[4].reshape(n_chunks, D, padded)[:, :, :n]
        return L, rsc, rbest

    return trace


def make_fused_sweep_adjoint(scene: Scene, cfg: RenderConfig,
                             tile_rows: int = 32,
                             interpret: bool | None = None,
                             n_chunks: int = 1):
    """Reverse-sweep-only adjoint over stored residuals — the backward
    half of the store-vs-retrace tradeoff (see make_fused_collect_tracer).

    Per tile: replay the throughput recurrence from the stored `(sc,
    best)` — `gate_b = rr_scale_b * [best_b > 0]` (rr_scale is a static
    per-bounce constant), `P_b = T_{b-1} * gate_b`, `T_b = P_b * a_b *
    sc_b` — in the forward's exact op order (bit-equal P/gate), then run
    the standard reverse suffix sweep and SMEM grad accumulation. ~20
    VPU ops per bounce-ray vs ~250 for the retrace adjoint.

    Returns `sweep(alb, emi, rsc: f[D, n], rbest: i32[D, n], g: V3[n])
    -> (d_albedo, d_emission)` (same shapes as make_fused_adjoint).

    n_chunks > 1 consumes the chunk-dim residuals of the chunk-grid
    collect tracer (`rsc: f[n_chunks, D, n]`, `rbest: i32[n_chunks, D,
    n]`) and accumulates all chunks' gradient partials in one launch
    (grid (tiles, chunks); g is per-ray, identical across chunks).
    """
    ss = StaticScene(scene)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = cfg.max_depth

    def kernel(alb_ref, emis_ref, rsc_ref, rbest_ref, gx, gy, gz,
               da_ref, de_ref):
        dtype = gx.dtype.type
        shape = gx.shape
        inv_keep = dtype(1.0 / (1.0 - cfg.absorb_prob))
        T = V3(dtype(1.0), dtype(1.0), dtype(1.0))
        Px, Py, Pz, scs, gates, bests, albs = [], [], [], [], [], [], []
        for b in range(D):
            if n_chunks == 1:
                sc_b = rsc_ref[b]
                best = rbest_ref[b]
            else:
                sc_b = rsc_ref[0, b]
                best = rbest_ref[0, b]
            rr = inv_keep if b >= cfg.min_bounces else dtype(1.0)
            gate = jnp.where(best > 0, rr, dtype(0.0))
            P = V3(T.x * gate, T.y * gate, T.z * gate)
            masks = [best == (s + 1) for s in range(ss.n_shapes)]
            a = _albedo_select(ss, masks, alb_ref, shape, dtype)
            T = V3(P.x * a.x * sc_b, P.y * a.y * sc_b, P.z * a.z * sc_b)
            Px.append(P.x)
            Py.append(P.y)
            Pz.append(P.z)
            scs.append(sc_b)
            gates.append(gate)
            bests.append(best)
            albs.append(a)
        g = V3(gx[...], gy[...], gz[...])
        scratch = (Px, Py, Pz, scs, gates, bests)
        _, da_acc, de_acc = _reverse_sweep(ss, alb_ref, emis_ref, g,
                                           scratch, D, g.x.shape, dtype,
                                           albedos=albs)
        first = pl.program_id(0) == 0
        if n_chunks > 1:
            first = first & (pl.program_id(1) == 0)
        _accumulate_grad_smem(da_ref, de_ref, da_acc, de_acc, dtype,
                              first=first)

    def sweep(albedo_tab, emission_tab, rsc, rbest, g: V3):
        n = g.x.shape[-1]
        n_alb = albedo_tab.shape[0]
        n_emit = emission_tab.shape[0]
        dtype = g.x.dtype
        rows, padded = _pad_rows(n, tile_rows)
        grid = rows // tile_rows
        tile, ray_spec, smem = _seg_spec_helpers(tile_rows, n_chunks)
        if n_chunks == 1:
            res_spec = pl.BlockSpec((D, tile_rows, LANES),
                                    lambda i: (0, i, 0),
                                    memory_space=pltpu.VMEM)
            rsc_t = jnp.pad(rsc, ((0, 0), (0, padded - n))) \
                .reshape(D, rows, LANES)
            rbest_t = jnp.pad(rbest, ((0, 0), (0, padded - n))) \
                .reshape(D, rows, LANES)
            acc_idx = lambda i: (0, 0)
        else:
            res_spec = pl.BlockSpec((1, D, tile_rows, LANES),
                                    lambda i, c: (c, 0, i, 0),
                                    memory_space=pltpu.VMEM)
            rsc_t = jnp.pad(rsc, ((0, 0), (0, 0), (0, padded - n))) \
                .reshape(n_chunks, D, rows, LANES)
            rbest_t = jnp.pad(rbest, ((0, 0), (0, 0), (0, padded - n))) \
                .reshape(n_chunks, D, rows, LANES)
            acc_idx = lambda i, c: (0, 0)
        gargs = [_to_tiles(c, padded, rows) for c in (g.x, g.y, g.z)]
        acc_a = pl.BlockSpec((n_alb, 3), acc_idx,
                             memory_space=pltpu.SMEM)
        acc_e = pl.BlockSpec((n_emit, 3), acc_idx,
                             memory_space=pltpu.SMEM)
        da, de = pl.pallas_call(
            kernel,
            grid=(grid,) if n_chunks == 1 else (grid, n_chunks),
            in_specs=[smem, smem, res_spec, res_spec] + [ray_spec] * 3,
            out_specs=[acc_a, acc_e],
            out_shape=[jax.ShapeDtypeStruct((n_alb, 3), dtype),
                       jax.ShapeDtypeStruct((n_emit, 3), dtype)],
            interpret=interpret,
        )(albedo_tab, emission_tab, rsc_t, rbest_t, *gargs)
        return da, de

    return sweep


def make_fused_segment_adjoint(scene: Scene, cam, cfg: RenderConfig,
                               b_start: int, b_end: int,
                               n_rays: int | None = None,
                               tile_rows: int = 32, rng: str = "internal",
                               interpret: bool | None = None,
                               fastmath: bool = False,
                               n_chunks: int = 1):
    """Adjoint kernel for bounces [b_start, b_end): retrace the segment
    (replaying its streams / tape), reverse-sweep with the boundary
    suffix radiance, and accumulate parameter-gradient partials.

    Call (internal): `adj(alb, emi, seeds, [state...], g3, [S_end3],
    tile_base=0)`; S_end present iff b_end < max_depth. Returns
    (da, de[, S_start3]) with S_start returned iff b_start > 0.
    Tape mode replaces seeds by ([cam_u,] u) as in the tracer.

    n_chunks > 1 (full-depth internal rng only): the spp-chunk loop
    rides the grid as in make_fused_segment_tracer (seeds advanced per
    chunk in-kernel); g stays per-ray (identical across chunks) and the
    SMEM partials accumulate over all (tile, chunk) steps — one launch
    for the whole retrace backward.
    """
    ss = StaticScene(scene)
    sc = StaticCamera(cam, cfg.width, cfg.height)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret is True and rng == "internal":
        interpret = pltpu.InterpretParams()
    entry_cam = b_start == 0
    final = b_end == cfg.max_depth
    seg_len = b_end - b_start
    assert n_chunks == 1 or (entry_cam and final and rng == "internal"), \
        "chunk-grid adjoint is full-depth internal-RNG only"
    spp_c = cfg.spp // cfg.spp_chunks
    n = (cfg.width * cfg.height * spp_c) if n_rays is None else n_rays
    rows, padded = _pad_rows(n, tile_rows)
    grid = rows // tile_rows
    tile, ray_spec, smem = _seg_spec_helpers(tile_rows, n_chunks)

    n_state_in = 0 if entry_cam else 10
    n_send_in = 0 if final else 3
    n_sstart_out = 0 if entry_cam else 3

    def kernel(*refs):
        it = iter(refs)
        tb_ref = next(it)
        seed_ref = next(it) if rng == "internal" else None
        alb_ref = next(it)
        emis_ref = next(it)
        cu_ref = u_ref = None
        if rng == "tape":
            if entry_cam:
                cu_ref = next(it)
            u_ref = next(it)
        state_refs = [next(it) for _ in range(n_state_in)]
        gx, gy, gz = (next(it) for _ in range(3))
        send_refs = [next(it) for _ in range(n_send_in)]
        da_ref = next(it)
        de_ref = next(it)
        sstart_refs = [next(it) for _ in range(n_sstart_out)]
        scratch = list(it)
        dtype = gx.dtype.type
        i = pl.program_id(0)
        gi = tb_ref[0] + i
        ck = pl.program_id(1) if n_chunks > 1 else 0

        if rng == "internal":
            seed0, seed1 = _chunk_seed_pair(seed_ref, ck, n_chunks)
            if entry_cam:
                pltpu.prng_seed(seed0, gi)
                cam_u = _uniform_from_bits((2, tile_rows, LANES), dtype)
            # Mosaic's prng_seed takes at most 2 values; fold the
            # segment offset into the seed word (mod 2^32, signed).
            _v = (0x6A09E667 * b_start) & 0xFFFFFFFF
            salt = np.int32(_v - (1 << 32) if _v >= (1 << 31) else _v)
            pltpu.prng_seed(seed1 + salt, gi)
            u = _uniform_from_bits((seg_len, 3, tile_rows, LANES), dtype)

            def get_u(lb):
                return u[lb, 0], u[lb, 1], u[lb, 2]
        else:
            def get_u(lb):
                return u_ref[lb, 0], u_ref[lb, 1], u_ref[lb, 2]

        if entry_cam:
            base_idx = gi * (tile_rows * LANES)
            if rng == "internal":
                u_s, u_t = cam_u[0], cam_u[1]
            else:
                u_s, u_t = cu_ref[0], cu_ref[1]
            o, d = _camera_rays_static(sc, spp_c, tile_rows, base_idx,
                                       u_s, u_t, dtype,
                                       fastmath=fastmath)
            T = None
            alive = None
        else:
            (ox, oy, oz, dx, dy, dz, tx, ty, tz, al) = state_refs
            o = V3(ox[...], oy[...], oz[...])
            d = V3(dx[...], dy[...], dz[...])
            T = V3(tx[...], ty[...], tz[...])
            alive = al[...] > 0

        on_residual = _make_residual_writer(*scratch, ss.n_shapes)
        _wavefront_body(ss, cfg, alb_ref, emis_ref, o, d, get_u, dtype,
                        on_residual=on_residual, b_start=b_start,
                        b_end=b_end, T=T, alive=alive,
                        fastmath=fastmath)

        g = V3(gx[...], gy[...], gz[...])
        S_end = (V3(send_refs[0][...], send_refs[1][...],
                    send_refs[2][...]) if send_refs else None)
        S_start, da_acc, de_acc = _reverse_sweep(
            ss, alb_ref, emis_ref, g, scratch, seg_len, g.x.shape, dtype,
            S_end=S_end)
        first = pl.program_id(0) == 0
        if n_chunks > 1:
            first = first & (pl.program_id(1) == 0)
        _accumulate_grad_smem(da_ref, de_ref, da_acc, de_acc, dtype,
                              first=first)
        if sstart_refs:
            sstart_refs[0][...] = S_start.x
            sstart_refs[1][...] = S_start.y
            sstart_refs[2][...] = S_start.z

    def adjoint(albedo_tab, emission_tab, *args, tile_base=0):
        dtype = albedo_tab.dtype
        n_alb = albedo_tab.shape[0]
        n_emit = emission_tab.shape[0]
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
            if entry_cam:
                cam_u = next(it)
                cu = jnp.pad(cam_u.reshape(2, -1),
                             ((0, 0), (0, padded - n))) \
                    .reshape(2, rows, LANES)
                call_args.append(cu)
                in_specs.append(pl.BlockSpec((2, tile_rows, LANES),
                                             lambda i: (0, i, 0),
                                             memory_space=pltpu.VMEM))
            u = next(it)
            ut = jnp.pad(u.reshape(seg_len, 3, -1),
                         ((0, 0), (0, 0), (0, padded - n))) \
                .reshape(seg_len, 3, rows, LANES)
            call_args.append(ut)
            in_specs.append(pl.BlockSpec((seg_len, 3, tile_rows, LANES),
                                         lambda i: (0, 0, i, 0),
                                         memory_space=pltpu.VMEM))
        rest = list(it)
        state = rest[:n_state_in]
        g3 = rest[n_state_in:n_state_in + 3]
        send = rest[n_state_in + 3:]
        assert len(g3) == 3 and len(send) == n_send_in, (len(rest),)
        for c in state + g3 + send:
            call_args.append(_to_tiles(c, padded, rows))
            in_specs.append(ray_spec)

        acc_idx = (lambda i: (0, 0)) if n_chunks == 1 \
            else (lambda i, c: (0, 0))
        acc_a = pl.BlockSpec((n_alb, 3), acc_idx,
                             memory_space=pltpu.SMEM)
        acc_e = pl.BlockSpec((n_emit, 3), acc_idx,
                             memory_space=pltpu.SMEM)
        out_specs = [acc_a, acc_e] + [ray_spec] * n_sstart_out
        out_shape = ([jax.ShapeDtypeStruct((n_alb, 3), dtype),
                      jax.ShapeDtypeStruct((n_emit, 3), dtype)]
                     + [jax.ShapeDtypeStruct((rows, LANES), dtype)]
                     * n_sstart_out)
        out = pl.pallas_call(
            kernel,
            grid=(grid,) if n_chunks == 1 else (grid, n_chunks),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((seg_len, tile_rows, LANES), dtype)] * 5
            + [pltpu.VMEM((seg_len, tile_rows, LANES), jnp.int32)],
            interpret=interpret,
        )(*call_args)
        da, de = out[0], out[1]
        if n_sstart_out:
            S = V3(*(c.reshape(padded)[:n] for c in out[2:5]))
            return da, de, S
        return da, de

    return adjoint
