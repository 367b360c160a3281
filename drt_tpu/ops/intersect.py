"""Vectorized ray-scene intersection (nearest hit).

Replaces the reference's per-ray linear scan with virtual dispatch
(reference: include/drt/pathtracer.hpp:72-89 `raycast`, shape.hpp:20-24)
by a masked, branch-free sweep: every ray is tested against every shape
(the scene is small and replicated), invalid hits map to +inf, and the
nearest hit is a first-min argmin — which reproduces the reference's
keep-first tie behavior (`t >= tmin` skips, pathtracer.hpp:79).

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

import jax.numpy as jnp

from drt_tpu.scene import Scene, PLANE, SPHERE, TRIANGLE
from drt_tpu.ops.vecmath import cross, normalize

_TRI_DET_EPS = 1e-9


class Hit(NamedTuple):
    t: jnp.ndarray  # f[N] distance (+inf on miss)
    point: jnp.ndarray  # f[N, 3]
    normal: jnp.ndarray  # f[N, 3] (raw plane normal; unit sphere/tri normal)
    mat: jnp.ndarray  # i32[N] material row (null sentinel on miss)
    emit: jnp.ndarray  # i32[N] emission row (zero sentinel on miss)
    valid: jnp.ndarray  # bool[N]


def _plane_t(geo, o, d):
    n = geo[None, :, 0:3]  # [1,S,3]
    off = geo[None, :, 3]  # [1,S]
    h = jnp.sum(o[:, None, :] * n, axis=-1) - off  # [N,S]
    denom = jnp.sum(d[:, None, :] * (-n), axis=-1)
    t = h / denom
    return t, t > 0


def _sphere_t(geo, o, d):
    c = geo[None, :, 0:3]
    r = geo[None, :, 3]
    oc = o[:, None, :] - c  # [N,S,3]
    b = 2.0 * jnp.sum(oc * d[:, None, :], axis=-1)
    cc = jnp.sum(oc * oc, axis=-1) - r * r
    disc = b * b - 4.0 * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / 2.0
    t2 = (-b + sq) / 2.0
    t = jnp.where(t1 > 0, t1, t2)
    return t, (disc >= 0) & (t > 0)


def _triangle_t(geo, o, d):
    v0 = geo[None, :, 0:3]
    e1 = geo[None, :, 3:6] - v0
    e2 = geo[None, :, 6:9] - v0
    dN = d[:, None, :]
    p = cross(dN, e2)  # [N,S,3]
    det = jnp.sum(e1 * p, axis=-1)
    inv = 1.0 / det
    tvec = o[:, None, :] - v0
    u = jnp.sum(tvec * p, axis=-1) * inv
    q = cross(tvec, e1)
    v = jnp.sum(dN * q, axis=-1) * inv
    t = jnp.sum(e2 * q, axis=-1) * inv
    valid = (
        (jnp.abs(det) > _TRI_DET_EPS)
        & (u >= 0)
        & (v >= 0)
        & (u + v <= 1)
        & (t > 0)
    )
    return t, valid


def intersect_scene(scene: Scene, o: jnp.ndarray, d: jnp.ndarray,
                    emit_sentinel: int) -> Hit:
    """Nearest-hit over all shapes. o, d: f[N, 3].

    emit_sentinel: index of the zero row in the padded emission table
    (= number of emission params L); assigned to missed rays so downstream
    gathers read zeros without masking.
    """
    dtype = o.dtype
    geo = scene.shape_geo.astype(dtype)
    stype = scene.shape_type[None, :]  # [1,S]

    t_pl, v_pl = _plane_t(geo, o, d)
    t_sp, v_sp = _sphere_t(geo, o, d)
    t_tr, v_tr = _triangle_t(geo, o, d)

    t = jnp.where(stype == PLANE, t_pl,
                  jnp.where(stype == SPHERE, t_sp, t_tr))
    valid = jnp.where(stype == PLANE, v_pl,
                      jnp.where(stype == SPHERE, v_sp, v_tr))
    # NaN t (e.g. 0/0 on a degenerate plane ray) compares False above,
    # matching the C++ comparisons (pathtracer.hpp:79).
    valid = valid & ~jnp.isnan(t)
    tt = jnp.where(valid, t, jnp.inf)

    best = jnp.argmin(tt, axis=1)  # first min -> keep-first ties
    t_hit = jnp.take_along_axis(tt, best[:, None], axis=1)[:, 0]
    hit_valid = jnp.isfinite(t_hit)

    hit_geo = scene.shape_geo[best].astype(dtype)  # [N,12]
    hit_type = scene.shape_type[best]
    point = o + t_hit[:, None] * d
    # Per-type normals, selected by hit shape type.
    n_plane = hit_geo[:, 0:3]
    n_sphere = normalize(point - hit_geo[:, 0:3])
    tri_e1 = hit_geo[:, 3:6] - hit_geo[:, 0:3]
    tri_e2 = hit_geo[:, 6:9] - hit_geo[:, 0:3]
    n_tri = normalize(cross(tri_e1, tri_e2))
    normal = jnp.where((hit_type == PLANE)[:, None], n_plane,
                       jnp.where((hit_type == SPHERE)[:, None], n_sphere,
                                 n_tri))

    null_mat = scene.mat_type.shape[0] - 1
    mat = jnp.where(hit_valid, scene.shape_mat[best], null_mat)
    emit = jnp.where(hit_valid, scene.shape_emit[best], emit_sentinel)
    return Hit(t=t_hit, point=point, normal=normal, mat=mat, emit=emit,
               valid=hit_valid)
