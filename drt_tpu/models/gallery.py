"""Additional demo scenes exercising every shape and material family.

The reference ships exactly one hard-coded scene (src/render.cpp:26-65,
reproduced in drt_tpu/models/cbox.py). These scenes cover the parts of
the framework the cbox never touches — the specular (Blinn-Phong-like)
BRDF (reference: bxdf.hpp:85-124), the mirror BRDF (bxdf.hpp:126-144,
which the reference defines but never instantiates — and which would not
even compile there, SURVEY.md §2 row 8), and triangles (a framework
extension with no reference analogue).
"""

from __future__ import annotations

import jax.numpy as jnp

from drt_tpu.camera import Camera, look_at
from drt_tpu.scene import Params, Scene, SceneBuilder


def build_glossy(dtype=jnp.float32) -> tuple[Scene, Params, Camera]:
    """Cornell-style box with a glossy (specular) floor sphere and a
    mirror sphere — the two BRDFs the sample app leaves unused."""
    b = SceneBuilder()
    red = b.albedo_param([0.5, 0.1, 0.1])
    green = b.albedo_param([0.1, 0.5, 0.1])
    white = b.albedo_param([0.5, 0.5, 0.5])
    gloss = b.albedo_param([0.4, 0.4, 0.45])
    emission = b.emission_param([1.5, 1.5, 1.5])

    b.sphere([-1.2, -1.0, 3.5], 1.0, b.specular(gloss, 30.0))
    b.sphere([1.2, -1.0, 4.0], 1.0, b.mirror())
    b.plane([-1.0, 0.0, 0.0], -3.0, b.diffuse(red))
    b.plane([1.0, 0.0, 0.0], -3.0, b.diffuse(green))
    b.plane([0.0, 0.0, -1.0], -6.0, b.diffuse(white))
    b.plane([0.0, 0.0, 1.0], 0.0, b.diffuse(white))
    b.plane([0.0, 1.0, 0.0], -3.0, b.diffuse(white))
    b.plane([0.0, -1.0, 0.0], -3.0, b.diffuse(white))
    b.sphere([0.0, 3.0, 3.0], 1.0, None, emission)

    scene, params = b.build(dtype)
    cam = look_at([0.0, 0.0, 0.0], [0.0, 0.0, 1.0], dtype=dtype)
    return scene, params, cam


def build_mesh(level: int = 1, dtype=jnp.float32,
               ) -> tuple[Scene, Params, Camera]:
    """Triangle-MESH scene: a subdivided icosphere (20 * 4^level
    triangles: 80 at level 1, 320 at level 2) in a Cornell-style box
    under an area light — the north-star geometry class for the
    memory-resident (dyn) kernels, far past the baked kernels' unroll
    budget. All mesh faces share one diffuse material; the box walls
    give the usual red/green gradient signal."""
    import numpy as np

    # Icosahedron.
    p = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, p, 0], [1, p, 0], [-1, -p, 0], [1, -p, 0],
        [0, -1, p], [0, 1, p], [0, -1, -p], [0, 1, -p],
        [p, 0, -1], [p, 0, 1], [-p, 0, -1], [-p, 0, 1],
    ], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [
        (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
        (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
        (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
        (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
    ]
    vlist = [tuple(v) for v in verts]

    def midpoint(a, b):
        m = (np.asarray(a) + np.asarray(b)) / 2.0
        m /= np.linalg.norm(m)
        return tuple(m)

    for _ in range(level):
        new_faces = []
        for (a, b, c) in faces:
            va, vb, vc = vlist[a], vlist[b], vlist[c]
            ab, bc, ca = midpoint(va, vb), midpoint(vb, vc), \
                midpoint(vc, va)
            for v in (ab, bc, ca):
                vlist.append(v)
            i_ab, i_bc, i_ca = len(vlist) - 3, len(vlist) - 2, \
                len(vlist) - 1
            new_faces += [(a, i_ab, i_ca), (b, i_bc, i_ab),
                          (c, i_ca, i_bc), (i_ab, i_bc, i_ca)]
        faces = new_faces

    b = SceneBuilder()
    red = b.albedo_param([0.5, 0.1, 0.1])
    green = b.albedo_param([0.1, 0.5, 0.1])
    white = b.albedo_param([0.5, 0.5, 0.5])
    blue = b.albedo_param([0.25, 0.3, 0.55])
    emission = b.emission_param([2.0, 2.0, 2.0])
    mesh_mat = b.diffuse(blue)

    center = np.array([0.0, -0.6, 3.8])
    radius = 1.2
    for (i, j, k) in faces:
        v0 = center + radius * np.asarray(vlist[i])
        v1 = center + radius * np.asarray(vlist[j])
        v2 = center + radius * np.asarray(vlist[k])
        b.triangle(v0, v1, v2, mesh_mat)

    b.plane([-1.0, 0.0, 0.0], -3.0, b.diffuse(red))
    b.plane([1.0, 0.0, 0.0], -3.0, b.diffuse(green))
    b.plane([0.0, 0.0, -1.0], -6.5, b.diffuse(white))
    b.plane([0.0, 0.0, 1.0], 0.0, b.diffuse(white))
    b.plane([0.0, 1.0, 0.0], -3.0, b.diffuse(white))
    b.plane([0.0, -1.0, 0.0], -3.0, b.diffuse(white))
    b.sphere([0.0, 2.9, 3.8], 0.8, None, emission)

    scene, params = b.build(dtype)
    cam = look_at([0.0, 0.0, 0.0], [0.0, 0.0, 1.0], dtype=dtype)
    return scene, params, cam


def build_tri(dtype=jnp.float32) -> tuple[Scene, Params, Camera]:
    """Triangle-geometry scene: a tetrahedron over a ground plane under
    an area light (Moller-Trumbore intersection path)."""
    b = SceneBuilder()
    white = b.albedo_param([0.5, 0.5, 0.5])
    blue = b.albedo_param([0.2, 0.3, 0.6])
    emission = b.emission_param([2.0, 2.0, 2.0])
    diffuse_white = b.diffuse(white)
    diffuse_blue = b.diffuse(blue)

    v = [(-1.0, -1.0, 3.0), (1.0, -1.0, 3.0), (0.0, -1.0, 4.5),
         (0.0, 0.8, 3.5)]
    # Winding chosen so cross(v1-v0, v2-v0) points OUTWARD: the frame for
    # BxDF sampling is built about the raw geometric normal, so inward
    # normals would trap bounced rays inside the solid.
    for tri in ((0, 3, 1), (1, 3, 2), (2, 3, 0), (0, 1, 2)):
        b.triangle(v[tri[0]], v[tri[1]], v[tri[2]], diffuse_blue)
    b.plane([0.0, 1.0, 0.0], -1.0, diffuse_white)
    b.sphere([0.0, 3.5, 3.5], 1.0, None, emission)

    scene, params = b.build(dtype)
    cam = look_at([0.0, 0.5, 0.0], [0.0, 0.0, 1.0], dtype=dtype)
    return scene, params, cam
