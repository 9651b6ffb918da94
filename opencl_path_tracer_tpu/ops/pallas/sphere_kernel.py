"""Analytic-sphere intersection kernel (TPU Pallas).

Why a kernel: the XLA form (ops.intersect.sphere_intersect) is built
from (R,S) outer products that XLA materializes through HBM — measured
37.5 ms for 2 spheres x 2.07M rays on v5e (job zr_shading_check),
i.e. as slow as minarg over cornell's full 804-triangle tessellation.
Inside one VMEM-resident kernel the same math is ~35 VPU ops per
(ray, sphere) with zero HBM traffic beyond the ray stream (on-device
cost record: job zr4 in docs/BENCHMARKS.md).

Sphere constants are baked into the kernel as compile-time literals
(a handful of floats per sphere — unlike triangle packs there is no
MLIR-size concern; utils/constlift exists for the packs, not for
this). The per-sphere loop is a Python loop, so the kernel is
specialized to the sphere count; guarded to small S.

Math follows ops.intersect.sphere_intersect (same root selection,
same disc > 0 / t > 0 miss rules, same outward normal n = (p + t d -
c) / r) and inherits its grazing-lane precision contract. Hit/miss
and t agree with the XLA form to f32 rounding; bitwise equality is
not guaranteed (the XLA form's MXU dot products round the 3-term sums
differently than the VPU mul-add chains here).

No reference counterpart: the reference tessellates spheres
(main.cpp:1002,1009).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_path_tracer_tpu.core.types import Hits, Rays
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    BIG, _round_up, assemble_hits, pack_rays,
)

MAX_BAKED_SPHERES = 64  # python-loop unroll bound (compile-time)


def _sphere_kernel(ray_ref, t_ref, nx_ref, ny_ref, nz_ref, m_ref, *,
                   consts):
    """consts: tuple of (cx, cy, cz, rad, inv_rad, ccdot, mati) python
    floats per sphere; ccdot = c.c - r^2 precomputed in f32."""
    rays = ray_ref[:]
    px, py, pz = rays[0, :], rays[1, :], rays[2, :]
    dx, dy, dz = rays[3, :], rays[4, :], rays[5, :]

    p_dot_d = px * dx + py * dy + pz * dz
    p_dot_p = px * px + py * py + pz * pz

    best_t = jnp.full(px.shape, BIG, jnp.float32)
    bnx = jnp.zeros_like(px)
    bny = jnp.zeros_like(px)
    bnz = jnp.zeros_like(px)
    bm = jnp.zeros_like(px)
    for (cx, cy, cz, rad, inv_rad, ccdot, mati) in consts:
        d_dot_c = dx * cx + dy * cy + dz * cz
        p_dot_c = px * cx + py * cy + pz * cz
        b_half = p_dot_d - d_dot_c
        cc = p_dot_p - 2.0 * p_dot_c + ccdot
        disc = b_half * b_half - cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = -b_half - sq
        t_far = -b_half + sq
        t = jnp.where(t_near > 0.0, t_near, t_far)
        valid = (disc > 0.0) & (t > 0.0)
        # Strict <: ties keep the earlier sphere, like the XLA argmin.
        better = valid & (t < best_t)
        hx = (px + dx * t - cx) * inv_rad
        hy = (py + dy * t - cy) * inv_rad
        hz = (pz + dz * t - cz) * inv_rad
        best_t = jnp.where(better, t, best_t)
        bnx = jnp.where(better, hx, bnx)
        bny = jnp.where(better, hy, bny)
        bnz = jnp.where(better, hz, bnz)
        bm = jnp.where(better, jnp.float32(mati), bm)

    hit = best_t < BIG
    t_ref[0, :] = jnp.where(hit, best_t, -1.0)
    nx_ref[0, :] = bnx
    ny_ref[0, :] = bny
    nz_ref[0, :] = bnz
    m_ref[0, :] = bm


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _run_spheres(rays8, consts, tr: int, interpret: bool):
    rpad = rays8.shape[1]
    outs = pl.pallas_call(
        functools.partial(_sphere_kernel, consts=consts),
        grid=(rpad // tr,),
        in_specs=[pl.BlockSpec((8, tr), lambda rt: (0, rt),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, tr), lambda rt: (0, rt),
                                memory_space=pltpu.VMEM)] * 5,
        out_shape=[jax.ShapeDtypeStruct((1, rpad), jnp.float32)] * 5,
        interpret=interpret,
    )(rays8)
    return outs


def make_sphere_intersect(spheres, *, tr: int = 1024,
                          interpret: bool = False):
    """Kernel twin of ops.intersect.sphere_intersect: intersect(rays)
    -> Hits with the same conventions (t = -1, p = 0, n = 0, mati = 0
    on miss). Counts above MAX_BAKED_SPHERES dispatch to the
    table-driven kernel (make_sphere_table_intersect) — same math
    order, same tie rule."""
    s = int(spheres.count)
    if s > MAX_BAKED_SPHERES:
        return make_sphere_table_intersect(spheres, tr=tr,
                                           interpret=interpret)
    cx, cy, cz = (np.asarray(spheres.c[k], np.float32) for k in range(3))
    rad = np.asarray(spheres.rad, np.float32)
    mati = np.asarray(spheres.mati, np.int32)
    ccdot = (cx * cx + cy * cy + cz * cz - rad * rad).astype(np.float32)
    consts = tuple(
        (float(cx[i]), float(cy[i]), float(cz[i]), float(rad[i]),
         float(np.float32(1.0) / rad[i]), float(ccdot[i]), int(mati[i]))
        for i in range(s)
    )

    def intersect(rays: Rays) -> Hits:
        r = rays.p[0].shape[0]
        rpad = _round_up(r, tr)
        rays8 = pack_rays(rays.p, rays.d, rpad)
        outs = _run_spheres(rays8, consts, tr, interpret)
        return assemble_hits(rays, r, *outs)

    return intersect


# --- table-driven variant (many spheres) -------------------------------

def _sphere_table_kernel(ray_ref, sph_ref, tab_ref, t_ref, nx_ref,
                         ny_ref, nz_ref, m_ref, *, chunk: int):
    """Chunked min+argmin over a VMEM sphere table + one one-hot
    3-split fetch of the winner's constants.

    sph_ref: (Spad, 8) f32 rows [cx, cy, cz, rad, inv_rad, ccdot,
    mati, live]; padding rows have live = 0 (never hit).
    tab_ref: (64, Spad) bf16 — hi/mid/lo 3-split of the first 7
    columns (the fetch must return the f32 constants EXACTLY; a plain
    f32->bf16 matmul would round them).

    Math per (ray, sphere) is the same ops in the same order as the
    baked-constant kernel (_sphere_kernel) — but NOT bitwise equal to
    it: the compiler contracts the scalar-constant chains into FMAs
    differently than the broadcast ones (~1-ulp t deltas measured).
    Ties keep the lower sphere index (argmin first occurrence within
    a chunk, strict < across chunks)."""
    spad = sph_ref.shape[0]
    rays = ray_ref[:]
    px, py, pz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    p_dot_d = px * dx + py * dy + pz * dz
    p_dot_p = px * px + py * py + pz * pz

    best_t = None
    best_g = None
    for c0 in range(0, spad, chunk):
        cc = min(chunk, spad - c0)
        sph = sph_ref[c0:c0 + cc, :]

        def col(k, sph=sph):
            return sph[:, k:k + 1]

        cx, cy, cz = col(0), col(1), col(2)
        d_dot_c = dx * cx + dy * cy + dz * cz
        p_dot_c = px * cx + py * cy + pz * cz
        b_half = p_dot_d - d_dot_c
        cc_q = p_dot_p - 2.0 * p_dot_c + col(5)
        disc = b_half * b_half - cc_q
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = -b_half - sq
        t_far = -b_half + sq
        t = jnp.where(t_near > 0.0, t_near, t_far)
        valid = (disc > 0.0) & (t > 0.0) & (col(7) > 0.0)
        tm = jnp.where(valid, t, BIG)
        m1 = jnp.min(tm, axis=0)
        a1 = jnp.argmin(tm, axis=0)
        g1 = (c0 + a1).astype(jnp.float32)
        if c0 == 0:
            best_t, best_g = m1, g1
        else:
            bet = m1 < best_t
            best_t = jnp.where(bet, m1, best_t)
            best_g = jnp.where(bet, g1, best_g)

    # Winner-constant fetch (exact 3-split one-hot, rides the MXU).
    tiota = jax.lax.broadcasted_iota(jnp.int32, (spad, 1), 0)
    gi = best_g[None, :].astype(jnp.int32)
    onehot = jnp.where(tiota == gi, 1.0, 0.0).astype(jnp.bfloat16)
    rows3 = jax.lax.dot_general(
        tab_ref[:], onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rows = rows3[0:7] + rows3[7:14] + rows3[14:21]

    hit = best_t < BIG
    safe_t = jnp.where(hit, best_t, 0.0)
    inv_r = rows[4, :]
    nx = (px[0, :] + dx[0, :] * safe_t - rows[0, :]) * inv_r
    ny = (py[0, :] + dy[0, :] * safe_t - rows[1, :]) * inv_r
    nz = (pz[0, :] + dz[0, :] * safe_t - rows[2, :]) * inv_r
    t_ref[0, :] = jnp.where(hit, best_t, -1.0)
    nx_ref[0, :] = jnp.where(hit, nx, 0.0)
    ny_ref[0, :] = jnp.where(hit, ny, 0.0)
    nz_ref[0, :] = jnp.where(hit, nz, 0.0)
    m_ref[0, :] = jnp.where(hit, rows[6, :], 0.0)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _run_sphere_table(rays8, sph, tab, tr: int, chunk: int,
                      interpret: bool):
    rpad = rays8.shape[1]
    spad = sph.shape[0]
    outs = pl.pallas_call(
        functools.partial(_sphere_table_kernel, chunk=chunk),
        grid=(rpad // tr,),
        in_specs=[
            pl.BlockSpec((8, tr), lambda rt: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spad, 8), lambda rt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, spad), lambda rt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tr), lambda rt: (0, rt),
                                memory_space=pltpu.VMEM)] * 5,
        out_shape=[jax.ShapeDtypeStruct((1, rpad), jnp.float32)] * 5,
        interpret=interpret,
    )(rays8, sph, tab)
    return outs


def make_sphere_table_intersect(spheres, *, tr: int = 1024,
                                chunk: int = 256,
                                interpret: bool = False):
    """Table-driven twin of make_sphere_intersect for LARGE sphere
    counts (the baked variant unrolls a python loop per sphere).
    Same Hits conventions; same math order; ties keep the lower
    sphere index."""
    from opencl_path_tracer_tpu.ops.pallas.shading_kernel import (
        _split3_table,
    )

    s = int(spheres.count)
    spad = _round_up(s, 8)
    cols = np.zeros((spad, 8), np.float32)
    for k in range(3):
        cols[:s, k] = np.asarray(spheres.c[k], np.float32)
    rad = np.asarray(spheres.rad, np.float32)
    cols[:s, 3] = rad
    cols[:s, 4] = np.float32(1.0) / rad
    cols[:s, 5] = (cols[:s, 0] ** 2 + cols[:s, 1] ** 2
                   + cols[:s, 2] ** 2 - rad * rad)
    cols[:s, 6] = np.asarray(spheres.mati, np.float32)
    cols[:s, 7] = 1.0
    sph = jnp.asarray(cols)
    tab = _split3_table(np.ascontiguousarray(cols[:, :7].T))

    def intersect(rays: Rays) -> Hits:
        r = rays.p[0].shape[0]
        rpad = _round_up(r, tr)
        rays8 = pack_rays(rays.p, rays.d, rpad)
        outs = _run_sphere_table(rays8, sph, tab, tr,
                                 min(chunk, spad), interpret)
        return assemble_hits(rays, r, *outs)

    return intersect
