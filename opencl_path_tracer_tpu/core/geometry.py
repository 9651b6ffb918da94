"""Geometry: rotations, triangle SoA, bounding boxes.

Reference host geometry lives at main.cpp:47-70 (rotate_x/y/z, degree
input, 3.141593f), main.cpp:139-182 (Triangle with face normal computed
in the ctor, bbox, midpoint) and main.cpp:119-137 (BBox expand).

TPU-first deltas:
  * Triangles are SoA arrays (T, 3) instead of an AoS struct array.
  * We precompute, per triangle, the scalar-triple-product constants that
    turn the reference's three cross-product edge tests (prog.cl:104-106)
    into pure dot products: dot(cross(e, p - v), N) == dot(p - v, cross(N, e)).
    With m_k = cross(N, e_k) a per-triangle constant, a ray-vs-all-triangles
    test becomes two (R,3)x(3,4T) matmuls (origins and directions against
    [N|m1|m2|m3]) — MXU/VPU-friendly with zero gathers.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

# The reference uses 3.141593f, not M_PI, for host rotations (main.cpp:48).
REF_PI = np.float32(3.141593)


def _rot(v, alpha_deg, ix, iy):
    a = jnp.asarray(alpha_deg, jnp.float32) / 180.0 * REF_PI
    c, s = jnp.cos(a), jnp.sin(a)
    v = jnp.asarray(v, jnp.float32)
    out = list(jnp.moveaxis(v, -1, 0))
    x, y = out[ix], out[iy]
    out[ix] = x * c - y * s
    out[iy] = x * s + y * c
    return jnp.stack(out, axis=-1)


def rotate_z(v, alpha_deg):
    """main.cpp:47-54 — rotate about +z by degrees."""
    return _rot(v, alpha_deg, 0, 1)


def rotate_y(v, beta_deg):
    """main.cpp:55-62 — note the reference convention: x' = x c + z s,
    z' = -x s + z c (a rotation by -beta in the standard convention)."""
    a = jnp.asarray(beta_deg, jnp.float32) / 180.0 * REF_PI
    c, s = jnp.cos(a), jnp.sin(a)
    v = jnp.asarray(v, jnp.float32)
    x, y, z = jnp.moveaxis(v, -1, 0)
    return jnp.stack([x * c + z * s, y, -x * s + z * c], axis=-1)


def rotate_x(v, gamma_deg):
    """main.cpp:63-70 — rotate about +x by degrees."""
    return _rot(v, gamma_deg, 1, 2)


def triangle_normals(r1: jnp.ndarray, r2: jnp.ndarray, r3: jnp.ndarray):
    """Unit face normals, cross(r2-r1, r3-r1) normalized (main.cpp:144-166).

    Degenerate (zero-area) triangles get n = 0 instead of the
    reference's NaN: both make every intersection test reject (the
    reference's NaN comparisons are all false; n = 0 yields the
    all-zero constant row that the Pallas packs already use as the
    never-hit padding convention), but NaN constants poison the
    bit-exact bf16 3-split tables' build-time equality assert
    (NaN != NaN), so the never-hit encoding must be the finite one."""
    n = jnp.cross(r2 - r1, r3 - r1)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return jnp.where(norm > 0.0, n / norm, 0.0)


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class TrianglesSoA:
    """All scene triangles, SoA. Mirrors Triangle{r1,r2,r3,N,mati}
    (prog.cl:18-21) plus precomputed intersection constants.

    r1, r2, r3, n: (T, 3) float32.
    mati: (T,) int32 material index (reference uses ushort).
    m1, m2, m3: (T, 3) float32 = cross(n, edge_k) for the edge-sign tests.
    c0: (T,) = dot(r1, n)     (plane offset)
    d1, d2, d3: (T,) = dot(v_k, m_k)  (edge-test offsets, v_k = r1, r2, r3)
    """

    r1: jnp.ndarray
    r2: jnp.ndarray
    r3: jnp.ndarray
    n: jnp.ndarray
    mati: jnp.ndarray
    m1: jnp.ndarray
    m2: jnp.ndarray
    m3: jnp.ndarray
    c0: jnp.ndarray
    d1: jnp.ndarray
    d2: jnp.ndarray
    d3: jnp.ndarray

    @property
    def count(self) -> int:
        return self.r1.shape[0]

    @staticmethod
    def build(r1, r2, r3, mati, n=None) -> "TrianglesSoA":
        r1 = jnp.asarray(r1, jnp.float32)
        r2 = jnp.asarray(r2, jnp.float32)
        r3 = jnp.asarray(r3, jnp.float32)
        mati = jnp.asarray(mati, jnp.int32)
        if n is None:
            n = triangle_normals(r1, r2, r3)
        else:
            n = jnp.asarray(n, jnp.float32)
        m1 = jnp.cross(n, r2 - r1)
        m2 = jnp.cross(n, r3 - r2)
        m3 = jnp.cross(n, r1 - r3)
        return TrianglesSoA(
            r1=r1, r2=r2, r3=r3, n=n, mati=mati,
            m1=m1, m2=m2, m3=m3,
            c0=jnp.sum(r1 * n, -1),
            d1=jnp.sum(r1 * m1, -1),
            d2=jnp.sum(r2 * m2, -1),
            d3=jnp.sum(r3 * m3, -1),
        )

    def take(self, idx) -> "TrianglesSoA":
        return jax.tree.map(lambda a: jnp.take(a, idx, axis=0), self)

    def concat(self, other: "TrianglesSoA") -> "TrianglesSoA":
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), self, other
        )

    def bbox(self):
        """Per-triangle AABBs: (T,3) lo and (T,3) hi (main.cpp:167-174)."""
        lo = jnp.minimum(jnp.minimum(self.r1, self.r2), self.r3)
        hi = jnp.maximum(jnp.maximum(self.r1, self.r2), self.r3)
        return lo, hi

    def midpoint(self):
        """Per-triangle centroid (vertex mean, main.cpp:175-181)."""
        return (self.r1 + self.r2 + self.r3) / 3.0
