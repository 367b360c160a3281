"""Memory-resident-scene Pallas megakernels (the "dyn" kernel family).

The baked megakernels (drt_tpu/ops/megakernel.py) specialize the kernel
on the scene: geometry becomes Python literals, the nearest-hit loop
unrolls per shape, and material dispatch reduces to the classes present.
That is the fastest possible form for a small fixed scene, but it has
two costs the framework cannot accept for real meshes: kernel build
time grows with n_shapes * max_depth (the round-2 `auto` router caps it
at 24 shapes), and ANY scene edit rebuilds the kernel.

These kernels instead keep the scene **in memory**: the shape arrays
(geometry, per-shape material attributes) are traced kernel inputs read
from SMEM as scalars, and the nearest-hit sweep is a `lax.fori_loop`
over the shape arrays — compile time is O(max_depth), independent of
scene size, and geometry/material VALUE edits re-run the same compiled
kernel. This is the TPU replacement for the reference's runtime O(S)
dispatch loop (reference: include/drt/pathtracer.hpp:72-89 `raycast`
over `Shape*` virtual dispatch, shape.hpp:20-24; material dispatch
bxdf.hpp:12-25) — the same dynamic-scene contract, vectorized over a
VMEM-resident ray tile.

Design notes:
  - Shapes are HOST-SORTED by type (planes, spheres, triangles) so each
    typed sub-loop runs only its own intersection math — no per-shape
    3-way select waste. Nearest-hit ties are broken by ORIGINAL scene
    index (lexicographic (t, orig) minimum), reproducing the XLA path's
    keep-first semantics (ops/intersect.py, pathtracer.hpp:79)
    regardless of the visit order.
  - The intersect loop carries the winning shape's attributes directly
    (hit-normal source, material type/albedo-row/emission-row/exponent,
    shape type) — ~10 masked selects per shape — so no per-lane gather
    is ever needed after the loop.
  - Material dispatch is branch-free over the classes PRESENT in the
    scene (statically known from the topology; values stay traced),
    with the specular exponent as a per-ray vector (runtime pow).
  - Small typed loops unroll in Python (<= `unroll_shapes`), so tiny
    scenes keep baked-kernel-style scheduling freedom.

Adjoints mirror the baked family: a retrace adjoint (replay streams,
VMEM residuals, reverse suffix sweep — radiative backprop per
include/drt/integrate.hpp:11-52) and a stored adjoint pair
(forward writes (sc, packed rows) residuals at 8 B/bounce-ray; backward
is a retrace-free reverse sweep, bit-equal by construction). Gradients
accumulate in SMEM across the sequential grid exactly like the baked
kernels.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drt_tpu.config import RenderConfig
from drt_tpu.constants import PI, RAY_EPS
from drt_tpu.ops.megakernel import (LANES, StaticCamera, _accumulate_grad_smem,
                                    _camera_rays_static, _chunk_seed_pair,
                                    _inv_sqrt, _pad_rows,
                                    _seg_spec_helpers, _to_tiles,
                                    _uniform_from_bits)
from drt_tpu.ops.vecmath import V3
from drt_tpu.scene import (DIFFUSE, MIRROR, NULL_BXDF, PLANE, SPECULAR,
                           SPHERE, TRIANGLE, Scene)

_TRI_DET_EPS = 1e-9  # matches drt_tpu/ops/intersect.py

# Row packing in the stored-adjoint residual (albedo row | emission row
# | live flag in one i32): 8 bits per row index.
_ROW_BITS = 8
_ROW_CAP = 1 << _ROW_BITS

# Per-shape attribute packing in the `meta` SMEM operand: the nearest-
# hit sweep carries ONE i32 per candidate instead of four (albedo row,
# emission row, material type, shape type) — 3 fewer vector selects per
# shape test per bounce; unpacked once per bounce after the sweep.
_META_MT_SHIFT = 2 * _ROW_BITS
_META_ST_SHIFT = _META_MT_SHIFT + 2

# cluster_k=None auto rule: meshes at/above this many triangles default
# to K=32 leaves (measured win at scale), smaller ones to K=16 (parity
# or ahead, less unrolled cluster body). Sweep: docs/ROUND5_NOTES.md §4.
_AUTO_K32_TRIS = 1024


def _pack_meta(arow, erow, mtype, stype):
    return (arow | (erow << _ROW_BITS) | (mtype << _META_MT_SHIFT)
            | (stype << _META_ST_SHIFT))


def _unpack_meta(meta):
    """meta i32 -> (albedo row, emission row, material type, shape
    type); inverse of _pack_meta (vector form, ~6 cheap int ops)."""
    mask = _ROW_CAP - 1
    ar = meta & mask
    er = (meta >> _ROW_BITS) & mask
    mt = (meta >> _META_MT_SHIFT) & 3
    st = meta >> _META_ST_SHIFT
    return ar, er, mt, st


class DynScene:
    """Host-side preparation of a Scene for the memory-resident kernels.

    Static (compile-time) facts: shape counts per type, table sizes,
    material classes present. Traced (runtime) data: `operands`, the
    tuple of 6 arrays the kernels read from SMEM — geo (S,12; triangle
    rows as v0/e1/e2 edge form), aux (S,3 normal source), orig (S,
    original index), meta (S, packed rows+material+shape type —
    _pack_meta), expo (S), caabb (cluster AABBs). Editing operand
    VALUES (geometry positions, exponents) re-runs the same compiled
    kernel; only topology changes (counts) rebuild.

    Triangle clustering (the TPU acceleration structure): when the mesh
    has more than `cluster_min_tris` triangles, they are host-sorted
    into spatial clusters of `cluster_k` (median split on the longest
    centroid axis — a flattened BVH leaf list), each with a conservative
    AABB. `cluster_k=None` (default) adapts to mesh size: 16 below
    `_AUTO_K32_TRIS` triangles, 32 at or above it — the on-chip sweep
    (docs/ROUND5_NOTES.md §4-5, logs/r5_bench_cluster_k*.log) measured
    K=32 +6.4% fwd / +6.1% fwd+bwd over K=16 at 1280 triangles for
    +24% compile (48.8 s vs 39.5 s), while at 80-320 triangles K=16 is
    at parity or ahead. The kernel slab-tests each cluster AABB against the whole ray
    tile and SKIPS the cluster's triangle tests when no lane's ray
    enters the box short of its current best hit — whole-tile culling
    is the SIMD-lockstep replacement for the reference's per-ray BVH
    descent (which per-lane stacks would serialize on the VPU). Past
    `super_m` leaves a second level activates: `super_m` consecutive
    leaves union into a super-AABB whose one slab test skips all M
    leaf tests (two-level flattened BVH, docs/KERNELS.md).
    Nearest-hit results are BIT-IDENTICAL with clustering on or off:
    the (t, original-index) lexicographic winner is visit-order
    independent and padding triangles are degenerate (det == 0).
    """

    def __init__(self, scene: Scene, cluster_k: int | None = None,
                 cluster_min_tris: int = 32, super_m: int = 8):
        self.scene = scene  # the original Scene (material tables etc.)
        stype = np.asarray(scene.shape_type)
        geo = np.asarray(scene.shape_geo, np.float32)
        if np.asarray(scene.shape_geo).dtype != np.float32:
            raise ValueError("dyn kernels are f32-only (Mosaic has no f64)")
        shape_mat = np.asarray(scene.shape_mat)
        mat_type = np.asarray(scene.mat_type)
        mat_albedo = np.asarray(scene.mat_albedo)
        mat_exponent = np.asarray(scene.mat_exponent, np.float32)
        S = stype.shape[0]

        # Stable type sort: planes, spheres, triangles.
        perm = np.argsort(stype, kind="stable")
        self.n_plane = int((stype == PLANE).sum())
        self.n_sphere = int((stype == SPHERE).sum())
        self.n_tri = int((stype == TRIANGLE).sum())
        self.n_shapes = S

        geo_s = geo[perm]
        orig = perm.astype(np.int32)
        mtype = mat_type[shape_mat][perm].astype(np.int32)
        arow = mat_albedo[shape_mat][perm].astype(np.int32)
        erow = np.asarray(scene.shape_emit)[perm].astype(np.int32)
        expo = mat_exponent[shape_mat][perm].astype(np.float32)
        if (arow.max(initial=0) >= _ROW_CAP
                or erow.max(initial=0) >= _ROW_CAP):
            raise ValueError(
                f"dyn kernels pack table rows into {_ROW_BITS} bits "
                f"(meta operand + stored residuals): max row is "
                f"{int(max(arow.max(initial=0), erow.max(initial=0)))} "
                f">= {_ROW_CAP}")
        meta = _pack_meta(arow, erow, mtype,
                          stype[perm].astype(np.int32)).astype(np.int32)

        # Hit-normal source per shape: the plane's raw stored normal
        # (shape.hpp:58-59 — never normalized), the sphere's center
        # (normal recomputed per hit, shape.hpp:105-106), the triangle's
        # unit normal — precomputed here with EXACTLY the f32 op order
        # of the XLA path (ops/intersect.py: e1/e2 diffs, crossv, then
        # normalizev = v * (1/sqrt(dotv))) so tape parity stays tight.
        aux = geo_s[:, 0:3].copy()
        tri = np.nonzero(stype[perm] == TRIANGLE)[0]
        if tri.size:
            g = geo_s[tri]
            v0 = g[:, 0:3]
            e1 = g[:, 3:6] - v0
            e2 = g[:, 6:9] - v0
            cx = e1[:, 1] * e2[:, 2] - e1[:, 2] * e2[:, 1]
            cy = e1[:, 2] * e2[:, 0] - e1[:, 0] * e2[:, 2]
            cz = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
            inv = np.float32(1.0) / np.sqrt(cx * cx + cy * cy + cz * cz)
            aux[tri, 0] = cx * inv
            aux[tri, 1] = cy * inv
            aux[tri, 2] = cz * inv

        # Static class presence (topology): which material branches to
        # instantiate. Values (exponents, rows) remain traced.
        self.have_diffuse = bool((mtype == DIFFUSE).any())
        self.have_specular = bool((mtype == SPECULAR).any())
        self.have_mirror = bool((mtype == MIRROR).any())

        # Triangle clustering: leaf-contiguous visit order with
        # degenerate padding to a static cluster_k per cluster, plus
        # per-cluster conservative AABBs (the 8th SMEM operand).
        self.n_clusters = 0
        if cluster_k is None:
            cluster_k = 32 if self.n_tri >= _AUTO_K32_TRIS else 16
        self.cluster_k = cluster_k
        self.n_super = 0
        self.super_m = super_m
        self.n_clusters_pad = 0
        caabb = np.zeros((1, 6), np.float32)
        t0 = self.n_plane + self.n_sphere
        if self.n_tri > cluster_min_tris:
            slots, caabb = _cluster_tris(geo_s[t0:], cluster_k)
            self.n_clusters = caabb.shape[0]
            self.n_clusters_pad = self.n_clusters
            if super_m > 1 and self.n_clusters > super_m:
                # Second culling level (two-level flattened BVH): group
                # `super_m` CONSECUTIVE leaves (the median-split visit
                # order is spatially coherent) under a union AABB; the
                # kernel slab-tests the super box once and skips all M
                # leaf tests when no lane enters. Leaf rows pad to a
                # multiple of M with inverted boxes (lo=+big > hi=-big —
                # the identity of the super-row union). NOTE the slab
                # test does NOT skip them: per-axis min/max NORMALIZES
                # an inverted box into one that covers every t, so a
                # padded row always "enters" (measured on-chip, round
                # 4: 10k wrong pixels at level 2, the only config with
                # pad > 0). The kernel guards padded rows by INDEX
                # (cluster_body: c < n_clusters), and — defense in
                # depth — their triangle slots are real in-range rows
                # of degenerate (det == 0, valid == False) triangles,
                # so even an entered padded cluster cannot change the
                # nearest hit. Super rows append AFTER the padded leaf
                # rows in the same SMEM operand.
                M = super_m
                C = self.n_clusters
                n_super = -(-C // M)
                pad = n_super * M - C
                if pad:
                    empty = np.empty((pad, 6), np.float32)
                    empty[:, :3] = 1e30
                    empty[:, 3:] = -1e30
                    caabb = np.concatenate([caabb, empty])
                    slots = np.concatenate(
                        [slots, np.full(pad * cluster_k, -1,
                                        slots.dtype)])
                grp = caabb.reshape(n_super, M, 6)
                sup = np.concatenate([grp[:, :, :3].min(1),
                                      grp[:, :, 3:].max(1)], axis=1)
                caabb = np.concatenate([caabb, sup.astype(np.float32)])
                self.n_super = n_super
                self.n_clusters_pad = n_super * M

            def reseg(a, fill):
                seg = a[t0:][np.maximum(slots, 0)].copy()
                seg[slots < 0] = fill
                return np.concatenate([a[:t0], seg])

            geo_s = reseg(geo_s, 0.0)
            aux = reseg(aux, 0.0)
            orig = reseg(orig, S)
            # Padding rows are degenerate triangles (det == 0, never
            # win); their attributes are inert.
            meta = reseg(meta, _pack_meta(0, 0, NULL_BXDF, TRIANGLE))
            expo = reseg(expo, 0.0)
        self.n_tri_pad = geo_s.shape[0] - t0 if self.n_clusters \
            else self.n_tri

        # Kernel geo form: triangle rows store (v0, e1 = v1-v0,
        # e2 = v2-v0) — the Moller-Trumbore edge diffs precomputed in
        # the SAME f32 subtraction the kernel used to do per test
        # (bit-identical values). `geo_vertex` keeps the (v0, v1, v2)
        # vertex form for tests/tools.
        self.geo_vertex = geo_s
        geo_k = geo_s.copy()
        if geo_k.shape[0] > t0:
            geo_k[t0:, 3:6] -= geo_k[t0:, 0:3]
            geo_k[t0:, 6:9] -= geo_k[t0:, 0:3]

        self.operands = (
            jnp.asarray(geo_k), jnp.asarray(aux), jnp.asarray(orig),
            jnp.asarray(meta), jnp.asarray(expo), jnp.asarray(caabb),
        )

    @staticmethod
    def of(scene) -> "DynScene":
        """Pass-through for prebuilt DynScenes — callers wanting custom
        cluster_k build `DynScene(scene, cluster_k=...)` and hand that
        to the factories."""
        return scene if isinstance(scene, DynScene) else DynScene(scene)


def _cluster_tris(tri_geo: np.ndarray, K: int):
    """Median-split triangle clustering (a flattened BVH leaf list).

    Recursively splits on the longest centroid axis, biasing the split
    point to a multiple of K so most leaves are full. Returns
    `(slots, aabbs)`: `slots` i64[C*K] maps each visit slot to a
    triangle index within the segment (-1 = degenerate padding), and
    `aabbs` f32[C, 6] are per-cluster (lo xyz, hi xyz) boxes expanded
    by a relative epsilon so f32 slab rounding in the kernel can never
    cull a true hit."""
    v = np.asarray(tri_geo[:, :9], np.float64).reshape(-1, 3, 3)
    lo = v.min(1)
    hi = v.max(1)
    cent = (lo + hi) * 0.5
    leaves: list[np.ndarray] = []

    def split(idx):
        if idx.size <= K:
            leaves.append(idx)
            return
        ext = cent[idx].max(0) - cent[idx].min(0)
        ax = int(np.argmax(ext))
        order = idx[np.argsort(cent[idx, ax], kind="stable")]
        mid = K * int(round(idx.size / 2 / K))
        mid = min(max(mid, K), ((idx.size - 1) // K) * K)
        split(order[:mid])
        split(order[mid:])

    split(np.arange(v.shape[0]))
    slots = np.full((len(leaves), K), -1, np.int64)
    aabbs = np.empty((len(leaves), 6), np.float32)
    for c, idx in enumerate(leaves):
        slots[c, :idx.size] = idx
        l = lo[idx].min(0)
        h = hi[idx].max(0)
        eps = 1e-5 * np.maximum(np.abs(l), np.abs(h)) + 1e-6
        aabbs[c, :3] = (l - eps).astype(np.float32)
        aabbs[c, 3:] = (h + eps).astype(np.float32)
    return slots.ravel(), aabbs


def _loop(lo: int, hi: int, body, carry, max_unroll: int):
    """Python-unrolled loop for small trip counts (scheduling freedom),
    lax.fori_loop otherwise (O(1) compile time in shape count)."""
    if hi - lo <= max_unroll:
        for i in range(lo, hi):
            carry = body(i, carry)
        return carry
    return jax.lax.fori_loop(lo, hi, body, carry)


def _dyn_intersect(ds: DynScene, scn_refs, o: V3, d: V3, dtype,
                   max_unroll: int, fastmath: bool = False, alive=None):
    """Nearest-hit over the memory-resident shape arrays.

    Returns (best_t, hit, aux V3, meta, expo) per ray, where `hit` is
    the boolean any-hit mask, `meta` is the winner's packed attributes
    (_unpack_meta -> albedo row, emission row, material type, shape
    type) and `expo` its specular exponent (zeros when the topology has
    no specular class — the carry is elided). Attribute vectors are
    garbage on no-hit lanes — the caller masks. Winner selection is the
    lexicographic (t, original index) minimum: strict-<
    keep-FIRST-in-scene-order tie behavior of the reference scan
    (pathtracer.hpp:78-80) independent of the type-sorted visit order.
    Per-type math mirrors ops/intersect.py (which cites
    shape.hpp:49-56, :78-103); triangle edge diffs (e1, e2) are
    precomputed host-side in the same f32 ops (DynScene)."""
    geo_ref, aux_ref, orig_ref, meta_ref, expo_ref = scn_refs[:5]
    caabb_ref = scn_refs[5]
    if len(geo_ref.shape) == 1:
        # Raveled SMEM form (_flat_scn) — view as (S, w) row-major.
        geo_ref = _View2D(geo_ref, 12)
        aux_ref = _View2D(aux_ref, 3)
        caabb_ref = _View2D(caabb_ref, 6)
    shape = d.x.shape
    inf = dtype(np.inf)
    one = jnp.ones(shape, dtype)

    # fastmath carries the best hit distance as a sign-normalized RATIO
    # (bnum, bden) with bden > 0, so no per-shape divide exists in the
    # sweep (plane h/denom and triangle 1/det become select + abs);
    # candidates compare by cross-multiplication (num*bden < bnum*den,
    # legal since both dens > 0 — overflow-safe for scene scales up to
    # ~5e12) and ONE divide per lane recovers the winner's t after the
    # loop. Exact mode keeps the reference-exact value forms
    # (shape.hpp:49-56) with den == 1.
    carry = (
        jnp.full(shape, inf, dtype),            # best_t (fm: numerator)
        one,                                    # fm: denominator (> 0)
        jnp.full(shape, ds.n_shapes, jnp.int32),  # best original index
        jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
        jnp.zeros(shape, dtype),                # aux (normal source)
        jnp.full(shape, _pack_meta(0, 0, NULL_BXDF, PLANE),
                 jnp.int32),                    # packed attributes
    )
    if ds.have_specular:
        carry = carry + (jnp.zeros(shape, dtype),)  # exponent

    def update(carry, i, num, den, valid, auxx, auxy, auxz):
        bn, bd, boi, ax, ay, az, meta = carry[:7]
        oi = orig_ref[i]
        if fastmath:
            lhs = num * bd
            rhs = bn * den
            closer = valid & ((lhs < rhs)
                              | ((lhs == rhs) & (bn < inf) & (oi < boi)))
        else:
            den = one
            closer = valid & ((num < bn)
                              | ((num == bn) & (bn < inf) & (oi < boi)))
        out = (jnp.where(closer, num, bn),
               jnp.where(closer, den, bd),
               jnp.where(closer, oi, boi),
               jnp.where(closer, auxx, ax),
               jnp.where(closer, auxy, ay),
               jnp.where(closer, auxz, az),
               jnp.where(closer, meta_ref[i], meta))
        if ds.have_specular:
            out = out + (jnp.where(closer, expo_ref[i], carry[7]),)
        return out

    def plane_body(i, carry):
        n0, n1, n2 = geo_ref[i, 0], geo_ref[i, 1], geo_ref[i, 2]
        off = geo_ref[i, 3]
        h = (o.x * n0 + o.y * n1 + o.z * n2) - off
        denom = d.x * (-n0) + d.y * (-n1) + d.z * (-n2)
        if fastmath:
            # t = h/denom > 0 <=> same signs <=> num > 0 with den > 0.
            neg = denom < 0
            num = jnp.where(neg, -h, h)
            den = jnp.abs(denom)
            return update(carry, i, num, den, (num > 0) & (den > 0),
                          n0, n1, n2)
        t = h / denom
        return update(carry, i, t, None, t > 0, n0, n1, n2)

    def sphere_body(i, carry):
        c0, c1, c2 = geo_ref[i, 0], geo_ref[i, 1], geo_ref[i, 2]
        r = geo_ref[i, 3]
        ocx, ocy, ocz = o.x - c0, o.y - c1, o.z - c2
        b = 2.0 * (ocx * d.x + ocy * d.y + ocz * d.z)
        cc = (ocx * ocx + ocy * ocy + ocz * ocz) - r * r
        disc = b * b - 4.0 * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        if fastmath:
            t1 = (-b - sq) * 0.5
            t2 = (-b + sq) * 0.5
        else:
            t1 = (-b - sq) / 2.0
            t2 = (-b + sq) / 2.0
        t = jnp.where(t1 > 0, t1, t2)
        return update(carry, i, t, one if fastmath else None,
                      (disc >= 0) & (t > 0), c0, c1, c2)

    def tri_body(i, carry):
        # Edge diffs e1 = v1-v0, e2 = v2-v0 are precomputed host-side
        # in the same f32 subtraction (DynScene geo form).
        v0x, v0y, v0z = geo_ref[i, 0], geo_ref[i, 1], geo_ref[i, 2]
        e1x, e1y, e1z = geo_ref[i, 3], geo_ref[i, 4], geo_ref[i, 5]
        e2x, e2y, e2z = geo_ref[i, 6], geo_ref[i, 7], geo_ref[i, 8]
        px = d.y * e2z - d.z * e2y
        py = d.z * e2x - d.x * e2z
        pz = d.x * e2y - d.y * e2x
        det = e1x * px + e1y * py + e1z * pz
        tvx, tvy, tvz = o.x - v0x, o.y - v0y, o.z - v0z
        u_raw = tvx * px + tvy * py + tvz * pz
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        v_raw = d.x * qx + d.y * qy + d.z * qz
        t_raw = e2x * qx + e2y * qy + e2z * qz
        if fastmath:
            # Barycentric/depth tests on sign-normalized numerators
            # (den = |det| > 0): u >= 0 <=> u_n >= 0, u+v <= 1 <=>
            # u_n+v_n <= den, t > 0 <=> t_n > 0. No divide.
            neg = det < 0
            den = jnp.abs(det)
            u_n = jnp.where(neg, -u_raw, u_raw)
            v_n = jnp.where(neg, -v_raw, v_raw)
            t_n = jnp.where(neg, -t_raw, t_raw)
            valid = ((den > _TRI_DET_EPS) & (u_n >= 0) & (v_n >= 0)
                     & (u_n + v_n <= den) & (t_n > 0))
            return update(carry, i, t_n, den, valid, aux_ref[i, 0],
                          aux_ref[i, 1], aux_ref[i, 2])
        inv = 1.0 / det
        u = u_raw * inv
        v = v_raw * inv
        t = t_raw * inv
        valid = ((jnp.abs(det) > _TRI_DET_EPS) & (u >= 0) & (v >= 0)
                 & (u + v <= 1) & (t > 0))
        return update(carry, i, t, None, valid, aux_ref[i, 0],
                      aux_ref[i, 1], aux_ref[i, 2])

    lo = 0
    carry = _loop(lo, lo + ds.n_plane, plane_body, carry, max_unroll)
    lo += ds.n_plane
    carry = _loop(lo, lo + ds.n_sphere, sphere_body, carry, max_unroll)
    lo += ds.n_sphere
    if ds.n_clusters:
        # Whole-tile cluster culling: slab-test the cluster AABB
        # against every lane; if no lane's ray enters the box short of
        # its current best hit, skip the cluster's cluster_k triangle
        # tests entirely (lax.cond — one scalar branch per cluster).
        # Near-zero direction components are clamped so the reciprocal
        # stays finite; such rays cannot reach a cluster box at huge t
        # anyway (the other axes' slabs bound t at scene scale), so the
        # cull stays conservative. `tmin <= bt` uses <= (plus slack for
        # f32 slab rounding): a tie t == best_t can still win on the
        # smaller original index.
        big = dtype(1e30)

        def _safe_inv(c):
            tiny = jnp.abs(c) < 1e-30
            return jnp.where(tiny, jnp.where(c < 0, -big, big), 1.0 / c)

        ivx, ivy, ivz = _safe_inv(d.x), _safe_inv(d.y), _safe_inv(d.z)
        t_lo, K = lo, ds.cluster_k

        def _slab_enter(row, bn, bd):
            tx1 = (caabb_ref[row, 0] - o.x) * ivx
            ty1 = (caabb_ref[row, 1] - o.y) * ivy
            tz1 = (caabb_ref[row, 2] - o.z) * ivz
            tx2 = (caabb_ref[row, 3] - o.x) * ivx
            ty2 = (caabb_ref[row, 4] - o.y) * ivy
            tz2 = (caabb_ref[row, 5] - o.z) * ivz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                           jnp.minimum(ty1, ty2)),
                               jnp.minimum(tz1, tz2))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                           jnp.maximum(ty1, ty2)),
                               jnp.maximum(tz1, tz2))
            if fastmath:
                # tmin <= (bn/bd)*(1+s) + s  (bd > 0), cross-multiplied.
                bound = tmin * bd <= bn * (1 + 1e-5) + 1e-5 * bd
            else:
                bound = tmin <= bn * (1 + 1e-5) + 1e-5
            enter = (tmax >= tmin) & (tmax > 0) & bound
            if alive is not None and not isinstance(alive, bool):
                # Dead lanes carry o=0, d=0: for an AABB straddling the
                # world origin on all axes the degenerate slab test
                # yields tmin=-huge/tmax=+huge with best == inf, so
                # `enter` would be true and ONE dead lane in the tile
                # would veto the cull for every such cluster (perf
                # only — results stay bit-identical). Mask them out.
                enter = enter & alive
            return enter

        def cluster_body(c, carry):
            enter = _slab_enter(c, carry[0], carry[1])
            pred = jnp.any(enter)
            if ds.n_clusters_pad > ds.n_clusters:
                # Padded leaf rows (inverted boxes, super-path only)
                # are NOT excluded by the slab test: min/max
                # normalization turns an inverted box into one
                # covering every t, so without this index guard a
                # padded cluster always runs its triangle slots —
                # which, pre round-4 fix, indexed past the reseg'd
                # triangle segment (OOB SMEM garbage hits on real
                # TPU; the interpret tests missed it because
                # interpret-mode OOB reads clamp to the last row,
                # which loses the (t, orig) tie-break).
                pred = pred & (c < ds.n_clusters)

            def run(cr):
                for j in range(K):
                    cr = tri_body(t_lo + c * K + j, cr)
                return cr

            return jax.lax.cond(pred, run, lambda cr: cr, carry)

        if ds.n_super:
            # Two-level cull: super row s (stored after the padded leaf
            # rows) unions leaves [s*M, (s+1)*M); one whole-tile slab
            # test skips all M leaf tests. Padding leaves ALWAYS pass
            # the normalized slab test (inverted boxes normalize to
            # lo<=hi); cluster_body excludes them via the
            # `c < n_clusters` guard, and their triangle slots are
            # degenerate in-range rows (see DynScene).
            # Both levels are fori_loops (NOT _loop's unroll): supers
            # only activate past 8 leaves (>128 tris), where exactly ONE
            # slab+cluster body instance keeps kernel size — and Mosaic
            # compile time — scene-size independent.
            M = ds.super_m
            s_off = ds.n_clusters_pad

            def super_body(s, carry):
                enter = _slab_enter(s_off + s, carry[0], carry[1])

                def run(cr):
                    return jax.lax.fori_loop(
                        0, M, lambda j, c2: cluster_body(s * M + j, c2),
                        cr)

                return jax.lax.cond(jnp.any(enter), run, lambda cr: cr,
                                    carry)

            carry = jax.lax.fori_loop(0, ds.n_super, super_body, carry)
        else:
            carry = _loop(0, ds.n_clusters, cluster_body, carry,
                          max_unroll)
    else:
        carry = _loop(lo, lo + ds.n_tri, tri_body, carry, max_unroll)

    bn, bd, boi, ax, ay, az, meta = carry[:7]
    ex = carry[7] if ds.have_specular else jnp.zeros(shape, dtype)
    hit = bn < inf
    # The one divide per lane (bd == 1 in exact mode: bn IS t, and
    # inf/1 == inf on no-hit lanes either way).
    bt = bn / bd if fastmath else bn
    return bt, hit, V3(ax, ay, az), meta, ex


def _rows_select(tab_ref, rows, n_param: int, default: float, shape,
                 dtype) -> V3:
    """Per-ray value of a tiny SMEM table selected by row index: a
    masked select chain over the n_param non-sentinel rows, starting
    from the sentinel constant (ones albedo row / zeros emission row,
    drt_tpu/scene.py tables)."""
    out = [jnp.full(shape, default, dtype) for _ in range(3)]
    for row in range(n_param):
        m = rows == row
        for c in range(3):
            out[c] = jnp.where(m, tab_ref[row, c], out[c])
    return V3(*out)


def _pow_cpp_vec(base, expo, dtype):
    """C++ std::pow semantics with a per-ray VECTOR exponent (the
    runtime counterpart of ops/bxdf.py:_pow_cpp): (-x)^n = |x|^n *
    (-1)^n for integral n; NaN for negative base with non-integral
    exponent."""
    mag = jnp.power(jnp.abs(base), expo)
    r = jnp.round(expo)
    is_int = expo == r
    odd = jnp.mod(r, 2.0) == 1.0
    neg = base < 0
    sign = jnp.where(neg & odd, dtype(-1.0), dtype(1.0))
    return jnp.where(neg & ~is_int, dtype(np.nan), mag * sign)


def _dyn_shade(ds: DynScene, mt, ex, normal: V3, d_in: V3, u1, u2, dtype,
               fastmath: bool = False):
    """Branch-free BxDF sample + scalar eval with RUNTIME material
    dispatch by per-ray type code and vector exponent. Identical math
    to megakernel._shade (which cites bxdf.hpp:29-41, :56-124,
    :126-144) with the static class masks replaced by `mt == CLASS`
    compares; only classes present in the scene topology are
    instantiated. Returns (dir_out, sc_raw = s * cos / pdf)."""
    have_d, have_s, have_m = (ds.have_diffuse, ds.have_specular,
                              ds.have_mirror)

    if have_d or have_s:
        use_e1 = jnp.abs(normal.x) < jnp.abs(normal.y)
        tvx = jnp.where(use_e1, 1.0 - normal.x * normal.x,
                        -normal.x * normal.y)
        tvy = jnp.where(use_e1, -normal.y * normal.x,
                        1.0 - normal.y * normal.y)
        tvz = jnp.where(use_e1, -normal.z * normal.x, -normal.z * normal.y)
        tinv = _inv_sqrt(tvx * tvx + tvy * tvy + tvz * tvz, fastmath)
        tx, ty, tz = tvx * tinv, tvy * tinv, tvz * tinv
        bx = normal.y * tz - normal.z * ty
        by = normal.z * tx - normal.x * tz
        bz = normal.x * ty - normal.y * tx
        binv = _inv_sqrt(bx * bx + by * by + bz * bz, fastmath)
        bx, by, bz = bx * binv, by * binv, bz * binv
        cos_phi = jnp.cos(2.0 * PI * u2)
        sin_phi = jnp.sin(2.0 * PI * u2)

    def frame_dir(cos_t, sin_t):
        fx = cos_phi * sin_t
        fy = sin_phi * sin_t
        return V3(tx * fx + bx * fy + normal.x * cos_t,
                  ty * fx + by * fy + normal.y * cos_t,
                  tz * fx + bz * fy + normal.z * cos_t)

    def dot3(a: V3, b: V3):
        return a.x * b.x + a.y * b.y + a.z * b.z

    def reflect(v: V3, n: V3) -> V3:
        k = 2.0 * dot3(n, v)
        return V3(-v.x + k * n.x, -v.y + k * n.y, -v.z + k * n.z)

    zero = jnp.zeros_like(u1)
    dir_out = V3(zero, zero, zero)
    sc = zero

    if have_d:
        cos_t = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
        sin_t = jnp.sqrt(u1)
        dd = frame_dir(cos_t, sin_t)
        cos_geom = dot3(normal, dd)
        if fastmath:
            sc_d = jnp.where(u1 < 1.0,
                             cos_geom * jax.lax.rsqrt(1.0 - u1),
                             dtype(0.0))
        else:
            pdf = cos_t / PI
            sc_d = jnp.where(pdf > 0, (1.0 / PI) * cos_geom / pdf,
                             dtype(0.0))
        m = mt == DIFFUSE
        dir_out = V3(jnp.where(m, dd.x, dir_out.x),
                     jnp.where(m, dd.y, dir_out.y),
                     jnp.where(m, dd.z, dir_out.z))
        sc = jnp.where(m, sc_d, sc)

    if have_s:
        e = ex
        cos_h = jnp.power(u1, 1.0 / (e + 2.0))
        sin_h = jnp.sqrt(jnp.maximum(1.0 - cos_h * cos_h, 0.0))
        h = frame_dir(cos_h, sin_h)
        flip = dot3(h, d_in) < 0
        hf = reflect(h, normal)
        h = V3(jnp.where(flip, hf.x, h.x), jnp.where(flip, hf.y, h.y),
               jnp.where(flip, hf.z, h.z))
        dd = reflect(d_in, h)
        pdf = ((e + 2.0) / (2.0 * PI)
               * jnp.power(cos_h, e + 1.0) * sin_h)
        hwx, hwy, hwz = d_in.x + dd.x, d_in.y + dd.y, d_in.z + dd.z
        hw2 = hwx * hwx + hwy * hwy + hwz * hwz
        hinv = _inv_sqrt(hw2, fastmath)
        hwx, hwy, hwz = hwx * hinv, hwy * hinv, hwz * hinv
        cos_he = normal.x * hwx + normal.y * hwy + normal.z * hwz
        sin_he = jnp.sqrt(jnp.maximum(1.0 - cos_he * cos_he, 0.0))
        powv = _pow_cpp_vec(cos_he, e, dtype)
        cos_geom = dot3(normal, dd)
        if fastmath:
            denom = jnp.power(cos_h, e + 1.0) * sin_h
            sc_s = jnp.where((denom > 0) & (hw2 > 0),
                             powv * sin_he * cos_geom / denom,
                             dtype(0.0))
        else:
            s_val = (e + 2.0) / (2.0 * PI) * powv * sin_he
            s_val = jnp.where(hw2 > 0, s_val, dtype(0.0))
            sc_s = jnp.where(pdf > 0, s_val * cos_geom / pdf, dtype(0.0))
        m = mt == SPECULAR
        dir_out = V3(jnp.where(m, dd.x, dir_out.x),
                     jnp.where(m, dd.y, dir_out.y),
                     jnp.where(m, dd.z, dir_out.z))
        sc = jnp.where(m, sc_s, sc)

    if have_m:
        dd = reflect(d_in, normal)
        cos_geom = dot3(normal, dd)
        if fastmath:
            sc_m = jnp.where(cos_geom != 0, dtype(1.0), dtype(0.0))
        else:
            sc_m = jnp.where(cos_geom != 0, (1.0 / cos_geom) * cos_geom,
                             dtype(0.0))
        m = mt == MIRROR
        dir_out = V3(jnp.where(m, dd.x, dir_out.x),
                     jnp.where(m, dd.y, dir_out.y),
                     jnp.where(m, dd.z, dir_out.z))
        sc = jnp.where(m, sc_m, sc)

    return dir_out, sc


def _dyn_wavefront_body(ds: DynScene, cfg: RenderConfig, scn_refs,
                        alb_ref, emis_ref, o: V3, d: V3, get_u, dtype,
                        max_unroll: int, on_residual=None,
                        fastmath: bool = False):
    """Full-depth bounce loop on one VMEM-resident ray tile over the
    memory-resident scene (structure mirrors megakernel._wavefront_body,
    which cites pathtracer.hpp). on_residual(lb, P, sc, gate, ar, er,
    alive) stores adjoint residuals with SANITIZED row indices (sentinel
    rows on dead lanes)."""
    shape = d.x.shape
    zero = jnp.zeros(shape, dtype)
    T = V3(dtype(1.0), dtype(1.0), dtype(1.0))
    alive = True
    L = V3(zero, zero, zero)
    inv_keep = dtype(1.0 / (1.0 - cfg.absorb_prob))

    for b in range(cfg.max_depth):
        u_rr, u1, u2 = get_u(b)
        if b >= cfg.min_bounces:
            alive = alive & ~(u_rr < cfg.absorb_prob)
            rr_scale = inv_keep
        else:
            rr_scale = dtype(1.0)

        best_t, hit, aux, meta, ex = _dyn_intersect(
            ds, scn_refs, o, d, dtype, max_unroll, fastmath=fastmath,
            alive=alive)
        alive = alive & hit
        gate = jnp.where(alive, rr_scale, dtype(0.0))
        # Sanitize the winner attributes on dead lanes: sentinel rows
        # (zero emission / ones albedo), null material, plane normal
        # source 0 — so no garbage reaches residuals or throughput.
        # One packed select covers rows + material + shape type.
        meta = jnp.where(alive, meta, _pack_meta(
            alb_ref.shape[0] - 1, emis_ref.shape[0] - 1, NULL_BXDF,
            PLANE))
        ar, er, mt, st = _unpack_meta(meta)
        aux = V3(jnp.where(alive, aux.x, 0.0),
                 jnp.where(alive, aux.y, 0.0),
                 jnp.where(alive, aux.z, 0.0))

        P = V3(T.x * gate, T.y * gate, T.z * gate)
        e = _rows_select(emis_ref, er, emis_ref.shape[0] - 1, 0.0, shape,
                         dtype)
        L = V3(L.x + P.x * e.x, L.y + P.y * e.y, L.z + P.z * e.z)

        p = V3(o.x + d.x * best_t, o.y + d.y * best_t,
               o.z + d.z * best_t)
        p = V3(jnp.where(alive, p.x, 0.0), jnp.where(alive, p.y, 0.0),
               jnp.where(alive, p.z, 0.0))
        # Normal: raw plane normal / precomputed unit triangle normal
        # straight from aux; sphere = normalize(p - center)
        # (shape.hpp:58-59, :105-106 via ops/intersect.py).
        sx, sy, sz = p.x - aux.x, p.y - aux.y, p.z - aux.z
        sinv = _inv_sqrt(sx * sx + sy * sy + sz * sz, fastmath)
        is_sph = st == SPHERE
        normal = V3(jnp.where(is_sph, sx * sinv, aux.x),
                    jnp.where(is_sph, sy * sinv, aux.y),
                    jnp.where(is_sph, sz * sinv, aux.z))

        d_in = V3(-d.x, -d.y, -d.z)
        dir_out, sc_raw = _dyn_shade(ds, mt, ex, normal, d_in, u1, u2,
                                     dtype, fastmath=fastmath)
        sc = jnp.where(alive, sc_raw, dtype(0.0))

        if on_residual is not None:
            on_residual(b, P, sc, gate, ar, er, alive)

        a = _rows_select(alb_ref, ar, alb_ref.shape[0] - 1, 1.0, shape,
                         dtype)
        T = V3(P.x * a.x * sc, P.y * a.y * sc, P.z * a.z * sc)
        o = V3(jnp.where(alive, p.x + dir_out.x * RAY_EPS, 0.0),
               jnp.where(alive, p.y + dir_out.y * RAY_EPS, 0.0),
               jnp.where(alive, p.z + dir_out.z * RAY_EPS, 0.0))
        d = V3(jnp.where(alive, dir_out.x, 0.0),
               jnp.where(alive, dir_out.y, 0.0),
               jnp.where(alive, dir_out.z, 0.0))
    return L


def _dyn_reverse_sweep(ds: DynScene, alb_ref, emis_ref, g: V3, scratch,
                       seg_len: int, shape, dtype, albedos=None):
    """Reverse suffix sweep over stored (P, sc, gate, arow, erow)
    residuals — adjoint.py _param_grads math with per-ray ROW indices
    in place of the baked kernels' shape masks:
      S_b = gate_b (e_b + w_b S_{b+1}),  w = albedo[arow] * sc
      d emission[l] += sum g.P [erow=l];  d albedo[k] += sum g.P sc S
    Returns (da_acc, de_acc) seg-summed scalars [rows][3]."""
    Px, Py, Pz, scs, gates, ars, ers = scratch
    n_alb = alb_ref.shape[0]
    n_emit = emis_ref.shape[0]
    z = jnp.zeros(shape, dtype)
    S = V3(z, z, z)
    da_acc = [[jnp.zeros((), dtype) for _ in range(3)]
              for _ in range(n_alb)]
    de_acc = [[jnp.zeros((), dtype) for _ in range(3)]
              for _ in range(n_emit)]
    for lb in reversed(range(seg_len)):
        P = V3(Px[lb], Py[lb], Pz[lb])
        sc_b = scs[lb]
        gate = gates[lb]
        ar = ars[lb]
        er = ers[lb]
        e = _rows_select(emis_ref, er, n_emit - 1, 0.0, shape, dtype)
        gP = V3(g.x * P.x, g.y * P.y, g.z * P.z)
        for row in range(n_emit - 1):
            m = er == row
            for c, gc in enumerate((gP.x, gP.y, gP.z)):
                de_acc[row][c] = de_acc[row][c] + jnp.sum(
                    jnp.where(m, gc, 0.0))
        gPsS = (gP.x * sc_b * S.x, gP.y * sc_b * S.y, gP.z * sc_b * S.z)
        for row in range(n_alb - 1):
            m = ar == row
            for c in range(3):
                da_acc[row][c] = da_acc[row][c] + jnp.sum(
                    jnp.where(m, gPsS[c], 0.0))
        a = (albedos[lb] if albedos is not None
             else _rows_select(alb_ref, ar, n_alb - 1, 1.0, shape, dtype))
        S = V3((e.x + a.x * sc_b * S.x) * gate,
               (e.y + a.y * sc_b * S.y) * gate,
               (e.z + a.z * sc_b * S.z) * gate)
    return S, da_acc, de_acc


def _resolve_interpret(interpret, rng):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret is True and rng == "internal":
        interpret = pltpu.InterpretParams()
    return interpret


_N_SCN = 6  # operand count of DynScene.operands (incl. cluster AABBs)


def _flat_scn(scn):
    """Ravel the 2-D scene tables (geo (S,12), aux (S,3), caabb (C,6))
    before they enter SMEM. Mosaic pads the minor dim of rank>=2 SMEM
    windows to 128 lanes — measured on v5e: the f32[1287,12] geo table
    alone costs 644 KB of the 1 MB SMEM budget (42x its 15 KB payload)
    and a 1287-shape scene fails to compile. Rank-1 SMEM arrays are
    packed exactly; kernels read them through _View2D."""
    return tuple(x.reshape(-1) if x.ndim == 2 else x for x in scn)


class _View2D:
    """(i, k) indexing over a raveled row-major (S, w) SMEM ref."""
    __slots__ = ("ref", "w")

    def __init__(self, ref, w):
        self.ref = ref
        self.w = w

    def __getitem__(self, idx):
        i, k = idx
        return self.ref[i * self.w + k]


def _prep_stream_specs(rng, entry_args, smem, tile_rows, D, rows,
                       padded, n):
    """Shared (seeds | cam_u + tape) call-arg/spec handling."""
    call_args, in_specs = [], []
    it = iter(entry_args)
    if rng == "internal":
        call_args.append(next(it))  # seeds i32[2]
        in_specs.append(smem)
    else:
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
    rest = list(it)
    return call_args, in_specs, rest


def make_dyn_tracer(scene, cam, cfg: RenderConfig, tile_rows: int = 32,
                    rng: str = "internal", interpret: bool | None = None,
                    n_rays: int | None = None, unroll_shapes: int = 16,
                    fastmath: bool = False, n_chunks: int = 1):
    """Fully-fused forward tracer over a memory-resident scene: camera
    ray generation, uniform sampling and the whole wavefront loop in one
    kernel, with the scene read from SMEM arrays at run time.

    Returns `trace(albedo_tab, emission_tab, scn, seeds | (cam_u, u),
    tile_base=0) -> V3[n]` where `scn = DynScene(scene).operands`.
    Stream layouts and seeding are IDENTICAL to the baked
    make_fused_tracer (megakernel.py), so the same seeds give the same
    sample sequences.

    n_chunks > 1 (internal rng only): the spp-chunk loop rides the grid
    and the result is the per-slot radiance SUM over chunks — one launch
    per forward (see megakernel.make_fused_segment_tracer)."""
    ds = DynScene.of(scene)
    sc = StaticCamera(cam, cfg.width, cfg.height)
    interpret = _resolve_interpret(interpret, rng)
    assert n_chunks == 1 or rng == "internal"
    D = cfg.max_depth
    spp_c = cfg.spp // cfg.spp_chunks
    n = (cfg.width * cfg.height * spp_c) if n_rays is None else n_rays
    rows, padded = _pad_rows(n, tile_rows)
    grid = rows // tile_rows
    tile, ray_spec, smem = _seg_spec_helpers(tile_rows, n_chunks)

    def kernel(*refs):
        it = iter(refs)
        tb_ref = next(it)
        seed_ref = next(it) if rng == "internal" else None
        cu_ref = u_ref = None
        if rng == "tape":
            cu_ref = next(it)
            u_ref = next(it)
        alb_ref = next(it)
        emis_ref = next(it)
        scn_refs = tuple(next(it) for _ in range(_N_SCN))
        lx, ly, lz = (next(it) for _ in range(3))
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
        L = _dyn_wavefront_body(ds, cfg, scn_refs, alb_ref, emis_ref,
                                o, d, get_u, dtype, unroll_shapes,
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

    def trace(albedo_tab, emission_tab, scn, *args, tile_base=0):
        dtype = albedo_tab.dtype
        tb = jnp.asarray(tile_base, jnp.int32).reshape(1)
        s_args, s_specs, rest = _prep_stream_specs(
            rng, args, smem, tile_rows, D, rows, padded, n)
        assert not rest, len(rest)
        call_args = [tb, *s_args, albedo_tab, emission_tab,
                     *_flat_scn(scn)]
        in_specs = [smem, *s_specs] + [smem] * (2 + _N_SCN)
        out = pl.pallas_call(
            kernel,
            grid=(grid,) if n_chunks == 1 else (grid, n_chunks),
            in_specs=in_specs,
            out_specs=[ray_spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((rows, LANES), dtype)] * 3,
            interpret=interpret,
        )(*call_args)
        return V3(*(c.reshape(padded)[:n] for c in out))

    return trace


def make_dyn_collect_tracer(scene, cam, cfg: RenderConfig,
                            tile_rows: int = 32, rng: str = "internal",
                            interpret: bool | None = None,
                            n_rays: int | None = None,
                            unroll_shapes: int = 16,
                            fastmath: bool = False, n_chunks: int = 1):
    """Forward tracer that ALSO writes per-bounce adjoint residuals to
    HBM: (sc f32, rrow i32) at 8 B/bounce-ray, where rrow packs
    (albedo row | emission row << 8 | live << 16). The dyn counterpart
    of megakernel.make_fused_collect_tracer; radiance is computed by the
    identical op sequence as make_dyn_tracer (bit-equal), biased
    (key-replay) gradient mode only (integrate.hpp:26-37).

    Returns `trace(alb, emi, scn, seeds | (cam_u, u), tile_base=0) ->
    (L: V3[n], rsc: f[D, n], rrow: i32[D, n])`.

    n_chunks > 1 (internal rng only): chunk-grid form — L is the
    per-slot SUM over chunks and the residuals gain a leading chunk dim
    (see megakernel.make_fused_collect_tracer)."""
    ds = DynScene.of(scene)
    sc = StaticCamera(cam, cfg.width, cfg.height)
    interpret = _resolve_interpret(interpret, rng)
    assert n_chunks == 1 or rng == "internal"
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
        cu_ref = u_ref = None
        if rng == "tape":
            cu_ref = next(it)
            u_ref = next(it)
        alb_ref = next(it)
        emis_ref = next(it)
        scn_refs = tuple(next(it) for _ in range(_N_SCN))
        lx, ly, lz, rsc_ref, rrow_ref = (next(it) for _ in range(5))
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

        def on_residual(lb, P, sc_b, gate, ar, er, alive):
            live = jnp.where(alive, 1 << (2 * _ROW_BITS), 0)
            if n_chunks == 1:
                rsc_ref[lb] = sc_b
                rrow_ref[lb] = ar + (er << _ROW_BITS) + live
            else:
                rsc_ref[0, lb] = sc_b
                rrow_ref[0, lb] = ar + (er << _ROW_BITS) + live

        L = _dyn_wavefront_body(ds, cfg, scn_refs, alb_ref, emis_ref,
                                o, d, get_u, dtype, unroll_shapes,
                                on_residual=on_residual,
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

    def trace(albedo_tab, emission_tab, scn, *args, tile_base=0):
        dtype = albedo_tab.dtype
        if (albedo_tab.shape[0] > _ROW_CAP
                or emission_tab.shape[0] > _ROW_CAP):
            raise ValueError(
                f"dyn stored residuals pack rows into {_ROW_BITS} bits: "
                f"{albedo_tab.shape[0]} albedo / {emission_tab.shape[0]} "
                "emission rows exceed that (use adjoint='retrace')")
        tb = jnp.asarray(tile_base, jnp.int32).reshape(1)
        s_args, s_specs, rest = _prep_stream_specs(
            rng, args, smem, tile_rows, D, rows, padded, n)
        assert not rest, len(rest)
        call_args = [tb, *s_args, albedo_tab, emission_tab,
                     *_flat_scn(scn)]
        in_specs = [smem, *s_specs] + [smem] * (2 + _N_SCN)
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
            rrow = out[4].reshape(D, padded)[:, :n]
        else:
            rsc = out[3].reshape(n_chunks, D, padded)[:, :, :n]
            rrow = out[4].reshape(n_chunks, D, padded)[:, :, :n]
        return L, rsc, rrow

    return trace


def make_dyn_sweep_adjoint(scene, cfg: RenderConfig, tile_rows: int = 32,
                           interpret: bool | None = None,
                           n_chunks: int = 1):
    """Reverse-sweep-only adjoint over stored (sc, rrow) residuals — the
    dyn counterpart of megakernel.make_fused_sweep_adjoint. Replays the
    throughput recurrence from the stored rows in the forward's exact op
    order (bit-equal P/gate), then the reverse suffix sweep + SMEM grad
    accumulation. Needs no geometry.

    Returns `sweep(alb, emi, rsc f[D,n], rrow i32[D,n], g: V3[n]) ->
    (d_albedo f[n_alb,3], d_emission f[n_emit,3])`.

    n_chunks > 1 consumes the chunk-grid collect tracer's chunk-dim
    residuals (f[n_chunks, D, n]) in one launch."""
    ds = DynScene.of(scene)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = cfg.max_depth

    def kernel(alb_ref, emis_ref, rsc_ref, rrow_ref, gx, gy, gz,
               da_ref, de_ref):
        dtype = gx.dtype.type
        shape = gx.shape
        inv_keep = dtype(1.0 / (1.0 - cfg.absorb_prob))
        T = V3(dtype(1.0), dtype(1.0), dtype(1.0))
        Px, Py, Pz, scs, gates, ars, ers, albs = ([] for _ in range(8))
        mask = _ROW_CAP - 1
        for b in range(D):
            if n_chunks == 1:
                sc_b = rsc_ref[b]
                pack = rrow_ref[b]
            else:
                sc_b = rsc_ref[0, b]
                pack = rrow_ref[0, b]
            live = (pack >> (2 * _ROW_BITS)) > 0
            ar = pack & mask
            er = (pack >> _ROW_BITS) & mask
            rr = inv_keep if b >= cfg.min_bounces else dtype(1.0)
            gate = jnp.where(live, rr, dtype(0.0))
            P = V3(T.x * gate, T.y * gate, T.z * gate)
            a = _rows_select(alb_ref, ar, alb_ref.shape[0] - 1, 1.0,
                             shape, dtype)
            T = V3(P.x * a.x * sc_b, P.y * a.y * sc_b, P.z * a.z * sc_b)
            Px.append(P.x)
            Py.append(P.y)
            Pz.append(P.z)
            scs.append(sc_b)
            gates.append(gate)
            ars.append(ar)
            ers.append(er)
            albs.append(a)
        g = V3(gx[...], gy[...], gz[...])
        scratch = (Px, Py, Pz, scs, gates, ars, ers)
        _, da_acc, de_acc = _dyn_reverse_sweep(ds, alb_ref, emis_ref, g,
                                               scratch, D, g.x.shape,
                                               dtype, albedos=albs)
        first = pl.program_id(0) == 0
        if n_chunks > 1:
            first = first & (pl.program_id(1) == 0)
        _accumulate_grad_smem(da_ref, de_ref, da_acc, de_acc, dtype,
                              first=first)

    def sweep(albedo_tab, emission_tab, rsc, rrow, g: V3):
        n = g.x.shape[0]
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
            rrow_t = jnp.pad(rrow, ((0, 0), (0, padded - n))) \
                .reshape(D, rows, LANES)
            acc_idx = lambda i: (0, 0)
        else:
            res_spec = pl.BlockSpec((1, D, tile_rows, LANES),
                                    lambda i, c: (c, 0, i, 0),
                                    memory_space=pltpu.VMEM)
            rsc_t = jnp.pad(rsc, ((0, 0), (0, 0), (0, padded - n))) \
                .reshape(n_chunks, D, rows, LANES)
            rrow_t = jnp.pad(rrow, ((0, 0), (0, 0), (0, padded - n))) \
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
        )(albedo_tab, emission_tab, rsc_t, rrow_t, *gargs)
        return da, de

    return sweep


def make_dyn_adjoint(scene, cam, cfg: RenderConfig, tile_rows: int = 32,
                     rng: str = "internal", interpret: bool | None = None,
                     n_rays: int | None = None, unroll_shapes: int = 16,
                     fastmath: bool = False, n_chunks: int = 1):
    """Retrace adjoint over a memory-resident scene: regenerate rays and
    uniforms in-kernel, retrace collecting residuals in VMEM scratch,
    reverse-sweep, accumulate parameter-grad partials in SMEM (radiative
    backprop, integrate.hpp:11-52 — pass the forward's seeds for biased
    mode, a fresh bounce seed for unbiased).

    Returns `adj(alb, emi, scn, seeds | (cam_u, u), g: V3[n],
    tile_base=0) -> (d_albedo, d_emission)`.

    n_chunks > 1 (internal rng only): the spp-chunk loop rides the grid
    (seeds advanced in-kernel, SMEM partials accumulate over all (tile,
    chunk) steps) — one launch for the whole backward."""
    ds = DynScene.of(scene)
    sc = StaticCamera(cam, cfg.width, cfg.height)
    interpret = _resolve_interpret(interpret, rng)
    assert n_chunks == 1 or rng == "internal"
    D = cfg.max_depth
    spp_c = cfg.spp // cfg.spp_chunks
    n = (cfg.width * cfg.height * spp_c) if n_rays is None else n_rays
    rows, padded = _pad_rows(n, tile_rows)
    grid = rows // tile_rows
    tile, ray_spec, smem = _seg_spec_helpers(tile_rows, n_chunks)

    def kernel(*refs):
        it = iter(refs)
        tb_ref = next(it)
        seed_ref = next(it) if rng == "internal" else None
        cu_ref = u_ref = None
        if rng == "tape":
            cu_ref = next(it)
            u_ref = next(it)
        alb_ref = next(it)
        emis_ref = next(it)
        scn_refs = tuple(next(it) for _ in range(_N_SCN))
        gx, gy, gz = (next(it) for _ in range(3))
        da_ref = next(it)
        de_ref = next(it)
        scratch = list(it)
        rPx, rPy, rPz, rsc, rgate, rar, rer = scratch
        dtype = gx.dtype.type
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

        def on_residual(lb, P, sc_b, gate, ar, er, alive):
            rPx[lb] = P.x
            rPy[lb] = P.y
            rPz[lb] = P.z
            rsc[lb] = sc_b
            rgate[lb] = gate
            rar[lb] = ar
            rer[lb] = er

        _dyn_wavefront_body(ds, cfg, scn_refs, alb_ref, emis_ref, o, d,
                            get_u, dtype, unroll_shapes,
                            on_residual=on_residual, fastmath=fastmath)
        g = V3(gx[...], gy[...], gz[...])
        _, da_acc, de_acc = _dyn_reverse_sweep(
            ds, alb_ref, emis_ref, g, scratch, D, g.x.shape, dtype)
        first = pl.program_id(0) == 0
        if n_chunks > 1:
            first = first & (pl.program_id(1) == 0)
        _accumulate_grad_smem(da_ref, de_ref, da_acc, de_acc, dtype,
                              first=first)

    def adjoint(albedo_tab, emission_tab, scn, *args, tile_base=0):
        dtype = albedo_tab.dtype
        n_alb = albedo_tab.shape[0]
        n_emit = emission_tab.shape[0]
        tb = jnp.asarray(tile_base, jnp.int32).reshape(1)
        s_args, s_specs, rest = _prep_stream_specs(
            rng, args, smem, tile_rows, D, rows, padded, n)
        assert len(rest) == 3, len(rest)  # g.x, g.y, g.z
        gargs = [_to_tiles(c, padded, rows) for c in rest]
        call_args = [tb, *s_args, albedo_tab, emission_tab,
                     *_flat_scn(scn), *gargs]
        in_specs = ([smem, *s_specs] + [smem] * (2 + _N_SCN)
                    + [ray_spec] * 3)
        acc_idx = (lambda i: (0, 0)) if n_chunks == 1 \
            else (lambda i, c: (0, 0))
        acc_a = pl.BlockSpec((n_alb, 3), acc_idx,
                             memory_space=pltpu.SMEM)
        acc_e = pl.BlockSpec((n_emit, 3), acc_idx,
                             memory_space=pltpu.SMEM)
        da, de = pl.pallas_call(
            kernel,
            grid=(grid,) if n_chunks == 1 else (grid, n_chunks),
            in_specs=in_specs,
            out_specs=[acc_a, acc_e],
            out_shape=[jax.ShapeDtypeStruct((n_alb, 3), dtype),
                       jax.ShapeDtypeStruct((n_emit, 3), dtype)],
            scratch_shapes=[pltpu.VMEM((D, tile_rows, LANES), dtype)] * 5
            + [pltpu.VMEM((D, tile_rows, LANES), jnp.int32)] * 2,
            interpret=interpret,
        )(*call_args)
        return da, de

    return adjoint
