"""Fused ray-triangle intersection Pallas kernel.

The XLA formulation of brute-force intersection (ops/intersect.py)
materializes eight (R, T) matrices in HBM between the dot_generals and
the elementwise compare/reduce passes — measured ~0.3 TFLOP/s effective
on v5e (HBM-bound). This kernel fuses the whole test in VMEM:

  grid = (R / TR, T / TT); each instance holds a (8, TR) ray block
  (components on sublanes, rays on lanes) and a (TT, 16) triangle-
  constant block, forms the (TT, TR) hit-distance matrix with ~50 VPU
  ops via rank-1 broadcasts — never touching HBM with intermediates —
  and min-reduces over the triangle axis into a (1, TR) running best
  that accumulates across the inner tt grid dimension.

Math is identical to triangle_intersect (prog.cl:94-112) in the
m_k = cross(N, edge_k) form (see ops/intersect.py docstring).
Padding rows (triangles with n = 0, rays with d = 0) produce t = inf/nan
and never win the min.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Hits, Rays

BIG = 3.0e38  # python float: jnp scalars can't be captured by kernels


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_rays(p, d, pad_to: int) -> jnp.ndarray:
    """(8, Rpad): [px py pz dx dy dz 0 0] rows; rays on the lane axis.
    p, d: V3 tuples of (R,) component arrays."""
    r = p[0].shape[0]
    buf = jnp.zeros((8, pad_to), jnp.float32)
    for k in range(3):
        buf = buf.at[k, :r].set(p[k])
        buf = buf.at[3 + k, :r].set(d[k])
    return buf


def _kernel(ray_ref, tri_ref, t_ref, i_ref, nx_ref, ny_ref, nz_ref,
            m_ref, *, chunk: int):
    """One (8, TR) ray block vs one (TT, 24) triangle block.

    The triangle block is walked in STATIC sub-chunks of `chunk` rows
    inside the kernel. Measured on v5e: plain grid steps are well
    pipelined by Mosaic (an inner grid dimension costs little), but
    in-kernel chunks do NOT get their stack slots reused — every
    unrolled chunk's (chunk, TR) temporaries stay live, so tt/chunk
    must stay small (~4) or scoped VMEM blows up (32 chunks measured
    41 MB vs the 16 MB limit). tt=1024/chunk=256 measured a few
    percent faster than tt=chunk=128-per-grid-step."""
    tt_idx = pl.program_id(1)
    tt = tri_ref.shape[0]

    rays = ray_ref[:]             # (8, TR)
    px, py, pz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]

    for c0 in range(0, tt, chunk):
        cc = min(chunk, tt - c0)
        tri = tri_ref[c0:c0 + cc, :]   # (CC, 24)

        def col(k, tri=tri):
            return tri[:, k:k + 1]     # (CC, 1)

        def pd_dots(base):
            vx, vy, vz = col(base), col(base + 1), col(base + 2)
            pdot = vx * px + vy * py + vz * pz    # (CC, TR)
            vdot = vx * dx + vy * dy + vz * dz
            return pdot, vdot

        pn, vn = pd_dots(0)
        t = (col(3) - pn) / vn

        pm1, vm1 = pd_dots(4)
        pm2, vm2 = pd_dots(8)
        pm3, vm3 = pd_dots(12)
        valid = (
            (t > 0.0)
            & (pm1 + t * vm1 >= col(7))
            & (pm2 + t * vm2 >= col(11))
            & (pm3 + t * vm3 >= col(15))
        )
        tm = jnp.where(valid, t, BIG)

        local = jnp.argmin(tm, axis=0)                     # (TR,)
        tmin = jnp.min(tm, axis=0)                         # (TR,)
        gidx = (tt_idx * tt + c0 + local).astype(jnp.float32)

        # Winner attributes via sublane one-hot (no post-kernel gathers).
        sub = jax.lax.broadcasted_iota(jnp.int32, (cc, 1), 0)
        onehot = (sub == local[None, :]).astype(jnp.float32)  # (CC, TR)
        win_nx = jnp.sum(onehot * col(0), axis=0)
        win_ny = jnp.sum(onehot * col(1), axis=0)
        win_nz = jnp.sum(onehot * col(2), axis=0)
        win_m = jnp.sum(onehot * col(16), axis=0)

        if c0 == 0:
            @pl.when(tt_idx == 0)
            def _():
                t_ref[0, :] = tmin
                i_ref[0, :] = gidx
                nx_ref[0, :] = win_nx
                ny_ref[0, :] = win_ny
                nz_ref[0, :] = win_nz
                m_ref[0, :] = win_m

            @pl.when(tt_idx != 0)
            def _(tmin=tmin, gidx=gidx, win_nx=win_nx, win_ny=win_ny,
                  win_nz=win_nz, win_m=win_m):
                _min_update(t_ref, i_ref, nx_ref, ny_ref, nz_ref, m_ref,
                            tmin, gidx, win_nx, win_ny, win_nz, win_m)
        else:
            _min_update(t_ref, i_ref, nx_ref, ny_ref, nz_ref, m_ref,
                        tmin, gidx, win_nx, win_ny, win_nz, win_m)


def _min_update(t_ref, i_ref, nx_ref, ny_ref, nz_ref, m_ref,
                tmin, gidx, win_nx, win_ny, win_nz, win_m):
    better = tmin < t_ref[0, :]
    t_ref[0, :] = jnp.where(better, tmin, t_ref[0, :])
    i_ref[0, :] = jnp.where(better, gidx, i_ref[0, :])
    nx_ref[0, :] = jnp.where(better, win_nx, nx_ref[0, :])
    ny_ref[0, :] = jnp.where(better, win_ny, ny_ref[0, :])
    nz_ref[0, :] = jnp.where(better, win_nz, nz_ref[0, :])
    m_ref[0, :] = jnp.where(better, win_m, m_ref[0, :])


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _run(rays8: jnp.ndarray, tri_pack: jnp.ndarray, tr: int, tt: int,
         interpret: bool, chunk: int = 128):
    rpad = rays8.shape[1]
    tpad = tri_pack.shape[0]
    grid = (rpad // tr, tpad // tt)
    outs = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tr), lambda rt, ttg: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, 24), lambda rt, ttg: (ttg, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tr), lambda rt, ttg: (0, rt),
                         memory_space=pltpu.VMEM),
        ] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((1, rpad), jnp.float32),
        ] * 6,
        cost_estimate=pl.CostEstimate(
            flops=rpad * tpad * 55,
            bytes_accessed=rpad * 8 * 4 + tpad * 24 * 4 + rpad * 24,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rays8, tri_pack)
    return tuple(o[0] for o in outs)


def pallas_first_intersect(rays: Rays, tris: TrianglesSoA, *,
                           tri_pack: jnp.ndarray | None = None,
                           tr: int = 1024, tt: int = 1024,
                           chunk: int = 256,
                           interpret: bool = False) -> Hits:
    """Closest hit via the fused kernel. Matches
    ops.intersect.first_intersect results.

    tt is the per-grid-step triangle BLOCK (large — one VMEM-resident
    block per grid step); chunk is the in-kernel sub-chunk that bounds
    the (chunk, tr) temporaries."""
    r = rays.p[0].shape[0]
    t_count = tris.count

    if tri_pack is None:
        tri_pack = build_tri_pack(tris, tt)
    tpad = tri_pack.shape[0]
    tt = min(tt, tpad)

    rpad = _round_up(r, tr)
    rays8 = pack_rays(rays.p, rays.d, rpad)
    best_t, _bi, nx, ny, nz, m = _run(rays8, tri_pack, tr, tt, interpret,
                                      chunk)
    best_t = best_t[:r]

    any_hit = best_t < BIG
    z = jnp.zeros_like(best_t)
    safe_t = jnp.where(any_hit, best_t, 0.0)
    hit_p = tuple(
        jnp.where(any_hit, rays.p[k] + rays.d[k] * safe_t, z)
        for k in range(3)
    )
    return Hits(
        t=jnp.where(any_hit, best_t, -1.0),
        p=hit_p,
        n=(nx[:r], ny[:r], nz[:r]),
        mati=jnp.where(any_hit, m[:r], 0.0).astype(jnp.int32),
    )


def assemble_hits(rays, r: int, t_, nx, ny, nz, m):
    """Shared (1, rpad)-outputs -> Hits assembly for the kernel-maker
    wrappers (minarg, smooth-minarg, baked/table sphere kernels).

    Convention: kernels emit t = -1.0 on miss; the normal rows pass
    through as-is (miss-lane normals are unspecified latch junk, same
    as the reference's uninitialized Hit fields); mati is forced to 0
    on miss."""
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
        mati=jnp.where(any_hit, m[0, :r], 0.0).astype(jnp.int32),
    )


def build_tri_pack(tris: TrianglesSoA, tt: int = 512) -> jnp.ndarray:
    """(Tpad, 24) rows: 16 intersection constants + mati (col 16, float-
    exact) + pad; padding rows never hit (n = 0)."""
    pack = jnp.concatenate(
        [
            tris.n, tris.c0[:, None],
            tris.m1, tris.d1[:, None],
            tris.m2, tris.d2[:, None],
            tris.m3, tris.d3[:, None],
            tris.mati.astype(jnp.float32)[:, None],
            jnp.zeros((tris.count, 7), jnp.float32),
        ],
        axis=1,
    ).astype(jnp.float32)
    t_count = pack.shape[0]
    # The grid needs tpad % block == 0; small scenes use one (8-aligned)
    # block, larger ones round up to a whole number of tt-sized blocks.
    if t_count <= tt:
        tpad = _round_up(t_count, 8)
    else:
        tpad = _round_up(t_count, tt)
    if tpad != t_count:
        pack = jnp.concatenate(
            [pack, jnp.zeros((tpad - t_count, 24), jnp.float32)]
        )
    return pack


def make_pallas_intersect(tris: TrianglesSoA, *, tr: int = 1024,
                          tt: int = 1024, chunk: int = 256,
                          interpret: bool = False):
    """Precompute the padded pack once; returns intersect(rays) -> Hits."""
    tri_pack = build_tri_pack(tris, tt)
    tt_eff = min(tt, tri_pack.shape[0])

    def intersect(rays: Rays) -> Hits:
        return pallas_first_intersect(
            rays, tris, tri_pack=tri_pack, tr=tr, tt=tt_eff,
            chunk=chunk, interpret=interpret,
        )

    return intersect


# --------------------------------------------------------------------------
# MXU variant: the eight per-tile dot products as ONE (8*TT, 8) x (8, TR)
# matmul on the systolic array. Measured on v5e: with default (bf16)
# matmul precision it reaches ~84 Gtests/s but CORRUPTS the geometry
# (phantom hits, 10x t errors — bf16 inputs); with Precision.HIGHEST it
# is exact but the multi-pass f32 emulation drops it to ~18 Gtests/s.
# Kept correct-but-slow as the starting point for a future mixed-
# precision scheme (bf16 MXU conservative candidate pass + f32 VPU
# refine). The VPU kernel above is the production path.


def _mxu_kernel(ray_ref, trig_ref, tric_ref, t_ref, i_ref, nx_ref,
                ny_ref, nz_ref, m_ref):
    tt_idx = pl.program_id(1)
    tt = tric_ref.shape[0]

    dots = jax.lax.dot_general(
        trig_ref[:], ray_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # Full f32: the MXU truncates inputs to bf16 by default, which
        # corrupts the geometry (phantom hits) — HIGHEST forces the
        # multi-pass f32 emulation.
        precision=jax.lax.Precision.HIGHEST,
    )  # (8*TT, TR)
    pn = dots[0 * tt:1 * tt]
    vn = dots[1 * tt:2 * tt]
    pm1 = dots[2 * tt:3 * tt]
    vm1 = dots[3 * tt:4 * tt]
    pm2 = dots[4 * tt:5 * tt]
    vm2 = dots[5 * tt:6 * tt]
    pm3 = dots[6 * tt:7 * tt]
    vm3 = dots[7 * tt:8 * tt]

    def col(j):
        return tric_ref[:, j:j + 1]

    t = (col(0) - pn) / vn
    valid = (
        (t > 0.0)
        & (pm1 + t * vm1 >= col(1))
        & (pm2 + t * vm2 >= col(2))
        & (pm3 + t * vm3 >= col(3))
    )
    tm = jnp.where(valid, t, BIG)
    local = jnp.argmin(tm, axis=0)
    tmin = jnp.min(tm, axis=0)
    gidx = (tt_idx * tt + local).astype(jnp.float32)

    sub = jax.lax.broadcasted_iota(jnp.int32, (tt, 1), 0)
    onehot = (sub == local[None, :]).astype(jnp.float32)
    win_nx = jnp.sum(onehot * col(4), axis=0)
    win_ny = jnp.sum(onehot * col(5), axis=0)
    win_nz = jnp.sum(onehot * col(6), axis=0)
    win_m = jnp.sum(onehot * col(7), axis=0)

    @pl.when(tt_idx == 0)
    def _():
        t_ref[0, :] = tmin
        i_ref[0, :] = gidx
        nx_ref[0, :] = win_nx
        ny_ref[0, :] = win_ny
        nz_ref[0, :] = win_nz
        m_ref[0, :] = win_m

    @pl.when(tt_idx != 0)
    def _():
        better = tmin < t_ref[0, :]
        t_ref[0, :] = jnp.where(better, tmin, t_ref[0, :])
        i_ref[0, :] = jnp.where(better, gidx, i_ref[0, :])
        nx_ref[0, :] = jnp.where(better, win_nx, nx_ref[0, :])
        ny_ref[0, :] = jnp.where(better, win_ny, ny_ref[0, :])
        nz_ref[0, :] = jnp.where(better, win_nz, nz_ref[0, :])
        m_ref[0, :] = jnp.where(better, win_m, m_ref[0, :])


def build_mxu_pack(tris: TrianglesSoA, tt: int):
    """Returns (trig (Tpad*8, 8), tric (Tpad, 8)): trig holds, grouped
    per tt-tile, eight (TT, 8) row-blocks [pn; vn; pm1; vm1; pm2; vm2;
    pm3; vm3] mapping the packed ray rows [p(3) d(3) 0 0]; tric holds
    [c0 d1 d2 d3 nx ny nz mati]."""
    import numpy as np
    pack = np.asarray(build_tri_pack(tris, tt))  # (Tpad, 24)
    tpad = pack.shape[0]
    tt = min(tt, tpad)
    n_, m1, m2, m3 = pack[:, 0:3], pack[:, 4:7], pack[:, 8:11], pack[:, 12:15]
    z = np.zeros_like(n_)
    pad2 = np.zeros((tpad, 2), np.float32)
    rows_p = lambda v: np.concatenate([v, z, pad2], 1)
    rows_v = lambda v: np.concatenate([z, v, pad2], 1)
    blocks = [rows_p(n_), rows_v(n_), rows_p(m1), rows_v(m1),
              rows_p(m2), rows_v(m2), rows_p(m3), rows_v(m3)]
    ntiles = tpad // tt
    trig = np.zeros((tpad * 8, 8), np.float32)
    for kk in range(ntiles):
        for b in range(8):
            trig[(kk * 8 + b) * tt:(kk * 8 + b + 1) * tt] = (
                blocks[b][kk * tt:(kk + 1) * tt]
            )
    tric = np.stack(
        [pack[:, 3], pack[:, 7], pack[:, 11], pack[:, 15],
         pack[:, 0], pack[:, 1], pack[:, 2], pack[:, 16]], 1
    )
    return jnp.asarray(trig), jnp.asarray(tric), tt


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _run_mxu(rays8, trig, tric, tr: int, tt: int, interpret: bool):
    rpad = rays8.shape[1]
    tpad = tric.shape[0]
    outs = pl.pallas_call(
        _mxu_kernel,
        grid=(rpad // tr, tpad // tt),
        in_specs=[
            pl.BlockSpec((8, tr), lambda rt, tg: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * tt, 8), lambda rt, tg: (tg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, 8), lambda rt, tg: (tg, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tr), lambda rt, tg: (0, rt),
                         memory_space=pltpu.VMEM),
        ] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((1, rpad), jnp.float32),
        ] * 6,
        interpret=interpret,
    )(rays8, trig, tric)
    return tuple(o[0] for o in outs)


def make_mxu_intersect(tris: TrianglesSoA, *, tr: int = 1024,
                       tt: int = 128, interpret: bool = False):
    """MXU-dot variant of the fused brute-force intersector."""
    trig, tric, tt_eff = build_mxu_pack(tris, tt)

    def intersect(rays: Rays) -> Hits:
        r = rays.p[0].shape[0]
        rpad = _round_up(r, tr)
        rays8 = pack_rays(rays.p, rays.d, rpad)
        best_t, _bi, nx, ny, nz, m = _run_mxu(
            rays8, trig, tric, tr, tt_eff, interpret
        )
        best_t = best_t[:r]
        any_hit = best_t < BIG
        z = jnp.zeros_like(best_t)
        safe_t = jnp.where(any_hit, best_t, 0.0)
        hit_p = tuple(
            jnp.where(any_hit, rays.p[k] + rays.d[k] * safe_t, z)
            for k in range(3)
        )
        return Hits(
            t=jnp.where(any_hit, best_t, -1.0),
            p=hit_p,
            n=(nx[:r], ny[:r], nz[:r]),
            mati=jnp.where(any_hit, m[:r], 0.0).astype(jnp.int32),
        )

    return intersect


# --------------------------------------------------------------------------
# Min+argmin variant: the fused kernel WITHOUT per-chunk winner-attribute
# extraction. The one-hot attribute sums cost ~10 ops/test in the hot
# loop (measured: 54.7 -> 70.3 Gtests/s at the 808-tri cornell shape,
# round 3); deferring attribute recovery to a single per-LANE one-hot
# fetch (plucker_kernel.make_minarg_intersect) is ~5 ms/step cheaper at
# 2M rays. Math is IDENTICAL to _kernel — same t bits, same winner.


def _minarg_kernel(ray_ref, tri_ref, t_ref, i_ref, *, chunk: int):
    tt_idx = pl.program_id(1)
    tt = tri_ref.shape[0]
    rays = ray_ref[:]
    px, py, pz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    for c0 in range(0, tt, chunk):
        cc = min(chunk, tt - c0)
        tri = tri_ref[c0:c0 + cc, :]

        def col(k, tri=tri):
            return tri[:, k:k + 1]

        def pd_dots(base):
            vx, vy, vz = col(base), col(base + 1), col(base + 2)
            return (vx * px + vy * py + vz * pz,
                    vx * dx + vy * dy + vz * dz)

        pn, vn = pd_dots(0)
        t = (col(3) - pn) / vn
        pm1, vm1 = pd_dots(4)
        pm2, vm2 = pd_dots(8)
        pm3, vm3 = pd_dots(12)
        valid = (
            (t > 0.0)
            & (pm1 + t * vm1 >= col(7))
            & (pm2 + t * vm2 >= col(11))
            & (pm3 + t * vm3 >= col(15))
        )
        tm = jnp.where(valid, t, BIG)
        m1 = jnp.min(tm, axis=0)
        a1 = jnp.argmin(tm, axis=0)
        g1 = (tt_idx * tt + c0 + a1).astype(jnp.float32)
        if c0 == 0:
            @pl.when(tt_idx == 0)
            def _():
                t_ref[0, :] = m1
                i_ref[0, :] = g1

            @pl.when(tt_idx != 0)
            def _(m1=m1, g1=g1):
                bet = m1 < t_ref[0, :]
                t_ref[0, :] = jnp.where(bet, m1, t_ref[0, :])
                i_ref[0, :] = jnp.where(bet, g1, i_ref[0, :])
        else:
            bet = m1 < t_ref[0, :]
            t_ref[0, :] = jnp.where(bet, m1, t_ref[0, :])
            i_ref[0, :] = jnp.where(bet, g1, i_ref[0, :])


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _run_minarg(rays8, tri_pack, tr: int, tt: int, interpret: bool,
                chunk: int = 256):
    rpad = rays8.shape[1]
    tpad = tri_pack.shape[0]
    outs = pl.pallas_call(
        functools.partial(_minarg_kernel, chunk=chunk),
        grid=(rpad // tr, tpad // tt),
        in_specs=[
            pl.BlockSpec((8, tr), lambda rt, ttg: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, 24), lambda rt, ttg: (ttg, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tr), lambda rt, ttg: (0, rt),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, rpad), jnp.float32)] * 2,
        interpret=interpret,
    )(rays8, tri_pack)
    return outs
