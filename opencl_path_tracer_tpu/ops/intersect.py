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


def first_intersect_ids(rays: Rays,
                        tris: TrianglesSoA) -> tuple[Hits, jnp.ndarray]:
    """`first_intersect` plus the winning triangle index.

    Returns (hits, ids) with ids (R,) int32 = index into `tris` of the
    nearest hit (-1 on miss). The ids feed attribute interpolation
    (smooth shading normals, UVs — ops/shading.py), which the
    reference cannot express: it keeps only the face normal in its Hit
    struct (prog.cl:11-16) and discards the triangle index after the
    leaf scan (prog.cl:113-122).
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
    hits = Hits(
        t=jnp.where(any_hit, best_t, -1.0),
        p=hit_p,
        n=n,
        mati=jnp.where(any_hit, mati, 0).astype(jnp.int32),
    )
    ids = jnp.where(any_hit, best.astype(jnp.int32), -1)
    return hits, ids


def first_intersect(rays: Rays, tris: TrianglesSoA) -> Hits:
    """Closest hit of each ray against all triangles (brute force).

    Equivalent to first_intersect over the full range (prog.cl:113-122):
    strict < keeps the first minimal-t triangle on ties, which argmin
    reproduces (first occurrence of the minimum).
    """
    return first_intersect_ids(rays, tris)[0]


def ray_tri_mt(p, d, r1, r2, r3, *, eps: float = 0.0):
    """Möller–Trumbore ray/triangle test, vectorized over matched
    batches (one ray vs one triangle per lane).

    p, d, r1, r2, r3: V3 tuples of (N,) arrays. Returns
    (t, u, v, valid); (u, v) are barycentric weights of r2 and r3
    (weight of r1 = 1 - u - v).

    Design note — why the brute-force (R, T) path does NOT use this
    form: M-T needs two cross products per (ray, triangle) PAIR
    (pvec = d x e2 depends on both), which cannot be phrased as
    (R,3)x(3,T) contractions, so an all-pairs M-T is elementwise work
    on (R, T, 3) intermediates — exactly the HBM-hostile layout
    core/types.py exists to avoid. The plane+edge-sign form
    (ray_tri_t, matching prog.cl:94-112) hoists everything per-triangle
    and runs on the MXU; barycentrics, when needed, come from
    precomputed per-triangle gradients (ops/shading.py) which are
    matmul-shaped too. This pairwise M-T is the capability surface
    (BASELINE.json north star names it) and the oracle the gradient
    form is tested against.
    """
    from opencl_path_tracer_tpu.core.types import vcross, vdot, vsub

    e1 = vsub(r2, r1)
    e2 = vsub(r3, r1)
    pvec = vcross(d, e2)
    det = vdot(e1, pvec)
    inv = 1.0 / det                     # IEEE: det==0 -> inf -> miss
    tvec = vsub(p, r1)
    u = vdot(tvec, pvec) * inv
    qvec = vcross(tvec, e1)
    v = vdot(d, qvec) * inv
    t = vdot(e2, qvec) * inv
    valid = ((u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps)
             & (t > 0.0))
    return t, u, v, valid


def sphere_intersect(rays: Rays, spheres) -> Hits:
    """Closest hit of each ray against all analytic spheres.

    No reference counterpart (the reference tessellates spheres into
    triangle meshes, main.cpp:1002,1009); the analytic primitive is a
    BASELINE.json north-star item. All (R, S) intermediates come from
    rank-1 outer products plus one (R,3)x(3,S) contraction — no
    (R, S, 3) arrays.

    Directions are assumed normalized (|d| = 1, true for every ray the
    framework generates: raygen normalizes, and every BSDF returns
    normalized directions), so the quadratic's leading coefficient is
    1. Normals point outward; inside-ness is carried path state
    (models/fused_step.py), matching tessellated-mesh behavior.

    Precision contract (measured, job zr_shading_check on v5e): t is
    within 2.3e-4 RELATIVE of the float64 oracle on 175k cornell-scale
    hits, with the worst error confined to grazing lanes — the
    discriminant b^2 - cc cancels catastrophically near tangency and
    no (R,S)-outer-product-shaped formulation avoids it (the stable
    |oc - (oc.d)d|^2 form needs per-pair vectors, i.e. the (R,S,3)
    HBM layout this kernel exists to avoid). Non-grazing hits are at
    f32 rounding (~1e-6 relative); hit/miss flips vs float64 occur
    only at the tangency boundary (1 lane in 2.07M measured).
    """
    px, py, pz = rays.p
    dx, dy, dz = rays.d
    cx, cy, cz = spheres.c
    rad = spheres.rad

    def mm(a3, b3):
        a = jnp.stack(a3, axis=-1)          # (R, 3)
        b = jnp.stack(b3, axis=0)           # (3, S)
        return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)

    # oc = p - c:  b_half = oc . d = (p.d) - (d.c);  cc = |oc|^2 - r^2.
    p_dot_d = px * dx + py * dy + pz * dz               # (R,)
    p_dot_p = px * px + py * py + pz * pz               # (R,)
    c_dot_c = cx * cx + cy * cy + cz * cz               # (S,)
    d_dot_c = mm((dx, dy, dz), (cx, cy, cz))            # (R, S)
    p_dot_c = mm((px, py, pz), (cx, cy, cz))            # (R, S)
    b_half = p_dot_d[:, None] - d_dot_c
    cc = p_dot_p[:, None] - 2.0 * p_dot_c \
        + (c_dot_c - rad * rad)[None, :]
    disc = b_half * b_half - cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = -b_half - sq
    t_far = -b_half + sq
    # Standing exactly on the surface (t == 0) is a miss, like the
    # reference's t > 0 hit test (prog.cl:100,117).
    t = jnp.where(t_near > 0.0, t_near, t_far)
    valid = (disc > 0.0) & (t > 0.0)

    t_masked = jnp.where(valid, t, BIG)
    best = jnp.argmin(t_masked, axis=1)
    best_t = jnp.take_along_axis(t_masked, best[:, None], 1)[:, 0]
    any_hit = best_t < BIG

    z = jnp.zeros_like(best_t)
    safe_t = jnp.where(any_hit, best_t, 0.0)
    hit_p = tuple(
        jnp.where(any_hit, rays.p[k] + rays.d[k] * safe_t, z)
        for k in range(3)
    )
    inv_r = 1.0 / jnp.take(rad, best)
    n = tuple(
        jnp.where(any_hit,
                  (hit_p[k] - jnp.take(spheres.c[k], best)) * inv_r, z)
        for k in range(3)
    )
    mati = jnp.take(spheres.mati, best)
    return Hits(
        t=jnp.where(any_hit, best_t, -1.0),
        p=hit_p,
        n=n,
        mati=jnp.where(any_hit, mati, 0).astype(jnp.int32),
    )


def merge_hits(a: Hits, b: Hits) -> Hits:
    """Nearer-valid-hit merge of two Hits batches (triangles vs
    spheres, or any two primitive streams). Ties keep `a`, so callers
    put the triangle stream first for a deterministic contract."""
    b_wins = b.valid & (~a.valid | (b.t < a.t))

    def sel(x, y):
        return jnp.where(b_wins, y, x)

    return Hits(
        t=sel(a.t, b.t),
        p=tuple(sel(x, y) for x, y in zip(a.p, b.p)),
        n=tuple(sel(x, y) for x, y in zip(a.n, b.n)),
        mati=sel(a.mati, b.mati),
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
