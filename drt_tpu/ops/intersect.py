"""Vectorized ray-scene intersection (nearest hit), scalarized SoA.

Replaces the reference's per-ray linear scan with virtual dispatch
(reference: include/drt/pathtracer.hpp:72-89 `raycast`, shape.hpp:20-24)
by a masked, branch-free sweep. All per-ray vectors are `V3`s of f[N]
(scalarized SoA — see drt_tpu/ops/vecmath.py for why). The shape loop is
unrolled in Python (static, small scene) with a running (t, index)
minimum, so live buffers stay O(N) regardless of shape count; XLA fuses
the unrolled chain into one elementwise pass over the wavefront. Strict
`<` on the running minimum reproduces the reference's keep-first tie
behavior (`t >= tmin` skips, pathtracer.hpp:79).

Faithfully reproduced quirks:
  - plane: `t = (dot(o, n) - offset) / dot(d, -n)`, hit iff t > 0, with no
    epsilon and IEEE inf/nan semantics on a parallel ray
    (reference: shape.hpp:49-56);
  - plane normal is returned *as stored*, unnormalized if the scene says so
    (reference: shape.hpp:58-59, src/render.cpp:42);
  - sphere: smallest positive quadratic root, miss iff discriminant < 0
    (reference: shape.hpp:78-103); normal = normalize(p - c)
    (shape.hpp:105-106).

Triangles (Moller-Trumbore) are a framework extension with no reference
analogue (north star: BASELINE.json).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from drt_tpu.scene import Scene, PLANE, SPHERE
from drt_tpu.ops.vecmath import V3, crossv, dotv, normalizev, wherev

_TRI_DET_EPS = 1e-9


class Hit(NamedTuple):
    t: jnp.ndarray  # f[N] distance (+inf on miss)
    point: V3  # V3 of f[N]
    normal: V3  # V3 of f[N] (raw plane normal; unit sphere/tri normal)
    mat: jnp.ndarray  # i32[N] material row (null sentinel on miss)
    emit: jnp.ndarray  # i32[N] emission row (zero sentinel on miss)
    valid: jnp.ndarray  # bool[N]


def _cv3(geo, i) -> V3:
    """Three scalar entries of a static geo row as a broadcastable V3."""
    return V3(geo[i], geo[i + 1], geo[i + 2])


def _plane_t(geo, o: V3, d: V3):
    n = _cv3(geo, 0)
    off = geo[3]
    h = dotv(o, n) - off  # [N]
    denom = dotv(d, -n)
    t = h / denom
    return t, t > 0


def _sphere_t(geo, o: V3, d: V3):
    c = _cv3(geo, 0)
    r = geo[3]
    oc = o - c
    b = 2.0 * dotv(oc, d)
    cc = dotv(oc, oc) - r * r
    disc = b * b - 4.0 * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / 2.0
    t2 = (-b + sq) / 2.0
    t = jnp.where(t1 > 0, t1, t2)
    return t, (disc >= 0) & (t > 0)


def _triangle_t(geo, o: V3, d: V3):
    v0 = _cv3(geo, 0)
    e1 = _cv3(geo, 3) - v0
    e2 = _cv3(geo, 6) - v0
    p = crossv(d, e2)
    det = dotv(e1, p)
    inv = 1.0 / det
    tvec = o - v0
    u = dotv(tvec, p) * inv
    q = crossv(tvec, e1)
    v = dotv(d, q) * inv
    t = dotv(e2, q) * inv
    valid = (
        (jnp.abs(det) > _TRI_DET_EPS)
        & (u >= 0)
        & (v >= 0)
        & (u + v <= 1)
        & (t > 0)
    )
    return t, valid


# Above this shape count, the nearest-hit sweep compiles as a lax.scan
# over the scene SoA instead of a Python-unrolled chain: identical
# numerics, O(1) compile time in shape count (the reference's analogous
# structure is its runtime O(S) loop, pathtracer.hpp:78-80).
UNROLL_MAX_SHAPES = 24


def _shape_t(stype, geo, o: V3, d: V3, best_t, best_i, i):
    """One shape's (t, valid) -> running (best_t, best_i) update."""
    t_pl, v_pl = _plane_t(geo, o, d)
    t_sp, v_sp = _sphere_t(geo, o, d)
    t_tr, v_tr = _triangle_t(geo, o, d)
    t = jnp.where(stype == PLANE, t_pl,
                  jnp.where(stype == SPHERE, t_sp, t_tr))
    valid = jnp.where(stype == PLANE, v_pl,
                      jnp.where(stype == SPHERE, v_sp, v_tr))
    # NaN t (e.g. 0/0 on a degenerate plane ray) compares False,
    # matching the C++ comparisons (pathtracer.hpp:79); +inf t never
    # beats the running minimum. Strict < keeps the first of tied shapes.
    closer = valid & (t < best_t)
    return (jnp.where(closer, t, best_t),
            jnp.where(closer, i, best_i))


def intersect_scene(scene: Scene, o: V3, d: V3,
                    emit_sentinel: int) -> Hit:
    """Nearest-hit over all shapes. o, d: V3 of f[N].

    emit_sentinel: index of the zero row in the padded emission table
    (= number of emission params L); assigned to missed rays so downstream
    gathers read zeros without masking.
    """
    dtype = o.x.dtype
    geo_all = scene.shape_geo.astype(dtype)
    n_shapes = scene.shape_type.shape[0]
    n_rays = o.x.shape[0]

    best_t = jnp.full(n_rays, jnp.inf, dtype)
    best_i = jnp.zeros(n_rays, jnp.int32)
    if n_shapes <= UNROLL_MAX_SHAPES:
        for i in range(n_shapes):
            best_t, best_i = _shape_t(scene.shape_type[i], geo_all[i],
                                      o, d, best_t, best_i, i)
    else:
        def body(carry, xs):
            bt, bi = carry
            stype, geo, i = xs
            return _shape_t(stype, geo, o, d, bt, bi, i), None

        (best_t, best_i), _ = jax.lax.scan(
            body, (best_t, best_i),
            (scene.shape_type, geo_all,
             jnp.arange(n_shapes, dtype=jnp.int32)))

    hit_valid = jnp.isfinite(best_t)
    # Per-column gathers of hit geometry (each a [N] gather from a tiny
    # [S] column — no [N, 12] intermediate).
    def gcol(j):
        return geo_all[:, j][best_i]

    g0 = V3(gcol(0), gcol(1), gcol(2))
    hit_type = scene.shape_type[best_i]
    point = o + d * best_t
    # Per-type normals, selected by hit shape type.
    n_plane = g0
    n_sphere = normalizev(point - g0)
    tri_e1 = V3(gcol(3), gcol(4), gcol(5)) - g0
    tri_e2 = V3(gcol(6), gcol(7), gcol(8)) - g0
    n_tri = normalizev(crossv(tri_e1, tri_e2))
    normal = wherev(hit_type == PLANE, n_plane,
                    wherev(hit_type == SPHERE, n_sphere, n_tri))

    null_mat = scene.mat_type.shape[0] - 1
    mat = jnp.where(hit_valid, scene.shape_mat[best_i], null_mat)
    emit = jnp.where(hit_valid, scene.shape_emit[best_i], emit_sentinel)
    return Hit(t=best_t, point=point, normal=normal, mat=mat, emit=emit,
               valid=hit_valid)
