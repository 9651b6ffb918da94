"""Hit-point attribute interpolation: barycentrics + smooth shading.

The reference shades with face normals only — its Hit struct carries
the triangle's plane normal (prog.cl:11-16) and tinyobj's parsed
per-vertex normals are never consumed (main.cpp:595-611 reads
attrib.vertices exclusively). This module closes that gap: OBJ `vn`
data (io/obj.py parses it) and computed smooth normals become shading
normals via barycentric interpolation.

TPU-first design: barycentric coordinates are NOT recomputed from the
three vertices at shading time (that would be 2 cross products + a
solve per hit). For a triangle the barycentric weight of each vertex
is an affine function of the hit point, so we precompute per-triangle
gradient rows (gu, gv) and offsets (u0, v0) once on the host:

    u(p) = dot(p, gu) + u0      (weight of r2)
    v(p) = dot(p, gv) + v0      (weight of r3)
    w(p) = 1 - u - v            (weight of r1)

At shading time the cost per hit is two gathers of 3 floats and two
dot products — the same gather-light shape as the material fetch
(core/materials.py take_select). Interpolation itself is 3 fused
multiply-adds per component.

Exactness contract: the (u, v) returned here agree with the
Möller–Trumbore barycentrics (ops.intersect.ray_tri_mt) up to float
rounding; tests/test_shading.py pins that equivalence.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from opencl_path_tracer_tpu.core.types import Hits, V3, vwhere


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields,
                                     meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class VertexAttribs:
    """Per-triangle corner attributes + barycentric gradients, SoA.

    n1, n2, n3: V3 of (T,) — unit shading normal at corners r1/r2/r3.
        An all-zero corner triple marks "no vertex normals": the
        interpolated vector is 0 and smooth_hit_normals falls back to
        the face normal for that triangle.
    gu, gv: V3 of (T,) — barycentric gradient rows (see module doc).
    u0, v0: (T,) — the affine offsets.
    """

    n1: V3
    n2: V3
    n3: V3
    gu: V3
    gv: V3
    u0: jnp.ndarray
    v0: jnp.ndarray
    # Per-corner texture coordinates, ((T,), (T,)) pairs — zeros when
    # the mesh carries no vt (OBJ texcoords: the reference parses them
    # via tinyobj and never consumes them, main.cpp:595-611).
    uv1: tuple
    uv2: tuple
    uv3: tuple
    # (T, 17) row-major pack of [gu(3), gv(3), u0, v0, n1(3), n2(3),
    # n3(3)] — the same column layout as the fused kernel's pack
    # (ops/pallas/shading_kernel.build_shading_pack). One (R, 17) row
    # gather replaces 17 independent (R,) column gathers: 37.3 vs
    # 173.4 ms on 1.33M rays x 100k tris on v5e, bitwise-equal output
    # (TPU job zs8; docs/BENCHMARKS.md "Smooth shading at scale").
    packed: jnp.ndarray

    @property
    def count(self) -> int:
        return int(self.u0.shape[0])


def build_vertex_attribs(r1, r2, r3, n1, n2, n3,
                         uv1=None, uv2=None, uv3=None) -> VertexAttribs:
    """Host-side build. r*/n*: (T, 3) float arrays; uv*: optional
    (T, 2) per-corner texture coordinates (zeros when absent).

    Gradients are computed in float64 (the denominator
    d00*d11 - d01^2 loses half its bits in f32 for thin triangles)
    then stored f32. Degenerate triangles get zero gradients — they
    are never hit (core/geometry.py encodes their face normal as the
    never-hit 0), so the value never reaches shading.
    """
    r1 = np.asarray(r1, np.float64).reshape(-1, 3)
    r2 = np.asarray(r2, np.float64).reshape(-1, 3)
    r3 = np.asarray(r3, np.float64).reshape(-1, 3)
    e1 = r2 - r1
    e2 = r3 - r1
    d00 = np.sum(e1 * e1, -1)
    d01 = np.sum(e1 * e2, -1)
    d11 = np.sum(e2 * e2, -1)
    denom = d00 * d11 - d01 * d01
    safe = np.where(denom > 0.0, denom, 1.0)
    gu = (d11[:, None] * e1 - d01[:, None] * e2) / safe[:, None]
    gv = (d00[:, None] * e2 - d01[:, None] * e1) / safe[:, None]
    dead = denom <= 0.0
    gu[dead] = 0.0
    gv[dead] = 0.0
    u0 = -np.sum(r1 * gu, -1)
    v0 = -np.sum(r1 * gv, -1)

    def v3cols(a):
        a = np.asarray(a, np.float32).reshape(-1, 3)
        return (jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
                jnp.asarray(a[:, 2]))

    t = r1.shape[0]

    def uvcols(a):
        if a is None:
            z = jnp.zeros((t,), jnp.float32)
            return (z, z)
        a = np.asarray(a, np.float32).reshape(-1, 2)
        return (jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]))

    n1c, n2c, n3c = v3cols(n1), v3cols(n2), v3cols(n3)
    guc = v3cols(gu.astype(np.float32))
    gvc = v3cols(gv.astype(np.float32))
    u0c = jnp.asarray(u0.astype(np.float32))
    v0c = jnp.asarray(v0.astype(np.float32))
    packed = jnp.stack(
        list(guc) + list(gvc) + [u0c, v0c]
        + list(n1c) + list(n2c) + list(n3c),
        axis=1,
    )
    return VertexAttribs(
        n1=n1c, n2=n2c, n3=n3c,
        gu=guc, gv=gvc, u0=u0c, v0=v0c,
        uv1=uvcols(uv1), uv2=uvcols(uv2), uv3=uvcols(uv3),
        packed=packed,
    )


def _bary_from_rows(p: V3, rows: jnp.ndarray):
    """(u, v) from pre-gathered pack rows (R, 17). Same multiply/add
    order as the former per-column form, so results are bitwise
    identical — only the gather shape changed."""
    u = p[0] * rows[:, 0] + p[1] * rows[:, 1] + p[2] * rows[:, 2] \
        + rows[:, 6]
    v = p[0] * rows[:, 3] + p[1] * rows[:, 4] + p[2] * rows[:, 5] \
        + rows[:, 7]
    return u, v


def barycentrics(p: V3, ids: jnp.ndarray, attribs: VertexAttribs):
    """(u, v) barycentric coordinates of hit points `p` on triangles
    `ids` (int32, already clamped to >= 0). u weights r2, v weights
    r3; the r1 weight is 1 - u - v (the ray_tri_mt convention)."""
    rows = jnp.take(attribs.packed, ids, axis=0)
    return _bary_from_rows(p, rows)


def smooth_hit_normals(hits: Hits, ids: jnp.ndarray,
                       attribs: VertexAttribs) -> Hits:
    """Replace face normals with interpolated vertex normals.

    ids: (R,) int32 triangle index per hit, -1 on miss (the
    first_intersect_ids contract). Triangles whose corner normals are
    all zero (no vn data) keep the face normal, as do misses. The
    interpolated vector is renormalized; sidedness is NOT forced here —
    models/megakernel.shade flips the normal toward the incoming ray
    (prog.cl:326-328), which handles silhouette-grazing smooth normals
    the same way it handles back-face hits.
    """
    ok = hits.valid & (ids >= 0)
    idx = jnp.maximum(ids, 0)
    rows = jnp.take(attribs.packed, idx, axis=0)
    u, v = _bary_from_rows(hits.p, rows)
    w = 1.0 - u - v
    ns = tuple(
        w * rows[:, 8 + k] + u * rows[:, 11 + k] + v * rows[:, 14 + k]
        for k in range(3)
    )
    nn2 = ns[0] * ns[0] + ns[1] * ns[1] + ns[2] * ns[2]
    use = ok & (nn2 > 1e-12)
    inv = jax.lax.rsqrt(jnp.where(nn2 > 1e-12, nn2, 1.0))
    n = vwhere(use, tuple(ns[k] * inv for k in range(3)), hits.n)
    return Hits(t=hits.t, p=hits.p, n=n, mati=hits.mati)


def interpolate_uvs(hits: Hits, ids: jnp.ndarray,
                    attribs: VertexAttribs):
    """Texture coordinates at hit points: (s, t) arrays, 0 on miss.

    The consumption path for OBJ `vt` data (tinyobj parses it, the
    reference never reads it). Feed (s, t) to any texture function —
    e.g. the procedural checker in examples/07_uv_checker.py."""
    ok = hits.valid & (ids >= 0)
    idx = jnp.maximum(ids, 0)
    rows = jnp.take(attribs.packed, idx, axis=0)
    u, v = _bary_from_rows(hits.p, rows)
    w = 1.0 - u - v

    def blend(comp):
        return (w * jnp.take(attribs.uv1[comp], idx)
                + u * jnp.take(attribs.uv2[comp], idx)
                + v * jnp.take(attribs.uv3[comp], idx))

    z = jnp.zeros_like(u)
    return (jnp.where(ok, blend(0), z), jnp.where(ok, blend(1), z))


def compute_vertex_normals(vertices: np.ndarray,
                           faces: np.ndarray) -> np.ndarray:
    """Area-weighted smooth vertex normals for an indexed mesh
    (host-side; the standard accumulation tinyobj leaves to the app).

    vertices: (V, 3) float; faces: (F, 3) int indices.
    Each face contributes its unnormalized cross product (2x area
    weighted) to its three vertices; rows with no area end up 0.
    """
    vertices = np.asarray(vertices, np.float64).reshape(-1, 3)
    faces = np.asarray(faces, np.int64).reshape(-1, 3)
    v0 = vertices[faces[:, 0]]
    fn = np.cross(vertices[faces[:, 1]] - v0, vertices[faces[:, 2]] - v0)
    acc = np.zeros_like(vertices)
    for k in range(3):
        np.add.at(acc, faces[:, k], fn)
    norm = np.linalg.norm(acc, axis=1, keepdims=True)
    out = np.where(norm > 0.0, acc / np.where(norm > 0.0, norm, 1.0), 0.0)
    return out.astype(np.float32)
