"""Ray-scene intersection (XLA reference implementation).

The reference intersects one ray against one triangle at a time with a
plane hit + three cross-product edge-sign tests (triangle_intersect,
prog.cl:94-112) and scans leaf ranges linearly (first_intersect,
prog.cl:113-122). Same math here, restructured for the TPU:

With per-triangle constants m_k = cross(N, e_k) (precomputed in
TrianglesSoA.build), each edge test dot(cross(e_k, p - v_k), N) >= 0
rewrites (scalar triple product rotation) to
    dot(p, m_k) >= dot(v_k, m_k),   p = P + t V
so a block of R rays vs T triangles is eight (R,3)x(3,T) contractions
plus elementwise compares and a min-reduction.

This is the correctness oracle and CPU path; the production kernels
live in ops/pallas/ (fused, VMEM-resident). The matmuls here force
Precision.HIGHEST — TPU matmuls default to bf16 inputs, which breaks
geometry (1e-2 t errors, false edge flips; found the hard way).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Hits, Rays, v3_stack

BIG = jnp.float32(3.0e38)


def ray_tri_t(p: jnp.ndarray, d: jnp.ndarray, tris: TrianglesSoA):
    """Hit distances and validity of R rays against T triangles.

    p, d: (R, 3). Returns (t, valid): (R, T) float32 / bool.
    Math identical to triangle_intersect (prog.cl:94-112): t from the
    plane equation, validity from t > 0 (the reference rejects t < 0 at
    prog.cl:100 and callers require hit.t > 0 at prog.cl:117) plus the
    three half-plane tests. IEEE semantics for parallel rays (t = inf/nan
    -> comparisons false -> miss) match OpenCL.
    """
    def mm(a, b):
        return jnp.dot(a, b.T, precision=jax.lax.Precision.HIGHEST)

    pn = mm(p, tris.n)          # (R, T) dot(P, N)
    vn = mm(d, tris.n)          # (R, T) dot(V, N)
    t = (tris.c0[None, :] - pn) / vn

    e1 = mm(p, tris.m1) + t * mm(d, tris.m1) - tris.d1[None, :]
    e2 = mm(p, tris.m2) + t * mm(d, tris.m2) - tris.d2[None, :]
    e3 = mm(p, tris.m3) + t * mm(d, tris.m3) - tris.d3[None, :]

    valid = (t > 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & (e3 >= 0.0)
    return t, valid


def first_intersect(rays: Rays, tris: TrianglesSoA) -> Hits:
    """Closest hit of each ray against all triangles (brute force).

    Equivalent to first_intersect over the full range (prog.cl:113-122):
    strict < keeps the first minimal-t triangle on ties, which argmin
    reproduces (first occurrence of the minimum).
    """
    p = v3_stack(rays.p)
    d = v3_stack(rays.d)
    t, valid = ray_tri_t(p, d, tris)
    t_masked = jnp.where(valid, t, BIG)
    best = jnp.argmin(t_masked, axis=1)
    best_t = jnp.take_along_axis(t_masked, best[:, None], 1)[:, 0]
    any_hit = best_t < BIG

    z = jnp.zeros_like(best_t)
    safe_t = jnp.where(any_hit, best_t, 0.0)
    n = tuple(
        jnp.where(any_hit, jnp.take(tris.n[:, k], best), z)
        for k in range(3)
    )
    hit_p = tuple(
        jnp.where(any_hit, rays.p[k] + rays.d[k] * safe_t, z)
        for k in range(3)
    )
    mati = jnp.take(tris.mati, best)
    return Hits(
        t=jnp.where(any_hit, best_t, -1.0),
        p=hit_p,
        n=n,
        mati=jnp.where(any_hit, mati, 0).astype(jnp.int32),
    )


def intersect_aabb(p: jnp.ndarray, d: jnp.ndarray, lo: jnp.ndarray,
                   hi: jnp.ndarray):
    """Slab test (BBox_intersection, prog.cl:123-143): division by the
    direction with no zero-guard (IEEE inf semantics), returns
    (hit, tmin, tmax) with hit = tmax >= tmin. Broadcasts rays (..., 3)
    against boxes (..., 3)."""
    t1 = (lo - p) / d
    t2 = (hi - p) / d
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return tmax >= tmin, tmin, tmax
