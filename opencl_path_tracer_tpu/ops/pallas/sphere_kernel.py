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
    BIG, _round_up, pack_rays,
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
    on miss)."""
    s = int(spheres.count)
    if s > MAX_BAKED_SPHERES:
        raise ValueError(
            f"{s} spheres > MAX_BAKED_SPHERES={MAX_BAKED_SPHERES}: the "
            "baked-constant kernel unrolls a python loop per sphere; "
            "use ops.intersect.sphere_intersect for large counts"
        )
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
        t_, nx, ny, nz, m = _run_spheres(rays8, consts, tr, interpret)
        best_t = t_[0, :r]
        any_hit = best_t > 0.0
        z = jnp.zeros_like(best_t)
        safe_t = jnp.where(any_hit, best_t, 0.0)
        hit_p = tuple(
            jnp.where(any_hit, rays.p[k] + rays.d[k] * safe_t, z)
            for k in range(3)
        )
        return Hits(
            t=best_t,
            p=hit_p,
            n=(nx[0, :r], ny[0, :r], nz[0, :r]),
            mati=m[0, :r].astype(jnp.int32),
        )

    return intersect
