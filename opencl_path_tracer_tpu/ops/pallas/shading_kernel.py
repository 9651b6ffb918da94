"""Fused minarg + smooth-shading attribute fetch (TPU kernel).

The XLA form of smooth shading (ops.shading.smooth_hit_normals) costs
~17 gathers over per-triangle tables at the full ray count — measured
257 ms extra on 2.07M cornell rays on v5e (flat minarg step: 32.5 ms;
XLA smooth step: 289 ms; job zr_shading_check, docs/BENCHMARKS.md).
TPU gathers stream one element per cycle; the MXU moves the same data
as a one-hot matmul at tensor rate.

This kernel replaces the refine pass of make_minarg_intersect
(plucker_kernel._refine1_kernel) with one that fetches TWO tables with
the SAME one-hot matrix — the standard intersection-attribute table
(face normal + mati) and a 17-column shading table (barycentric
gradients gu/gv, offsets u0/v0, corner normals n1/n2/n3, see
ops/shading.py) — then interpolates and normalizes in-kernel:

    u = hit_p . gu + u0,  v = hit_p . gv + v0,  w = 1 - u - v
    n = normalize(w n1 + u n2 + v n3),  face-normal fallback

Both tables ride the bit-exact 3-split bf16 one-hot trick (hi+mid+lo
bf16 sum to the f32 value exactly; build-time assert), so the fetched
values equal the XLA gather bit-for-bit and the interpolation math is
the same f32 ops in the same order as smooth_hit_normals.

No reference counterpart: the reference shades with the face normal
only (Hit struct, prog.cl:11-16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Hits, Rays
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    BIG, _round_up, _run_minarg, assemble_hits, build_tri_pack,
    pack_rays,
)


def _split3_table(cols: np.ndarray) -> jnp.ndarray:
    """(C, tpad) f32 -> (64, tpad) bf16 with rows [0:C] hi, [C:2C] mid,
    [2C:3C] lo summing exactly to f32 (build-time assert; host-side
    numpy so BFloat16Propagation can't touch it)."""
    c, tpad = cols.shape
    assert 3 * c <= 64, c
    hi = np.asarray(jnp.asarray(cols).astype(jnp.bfloat16))
    mid = np.asarray(jnp.asarray(
        cols - hi.astype(np.float32)).astype(jnp.bfloat16))
    lo = np.asarray(jnp.asarray(
        cols - hi.astype(np.float32) - mid.astype(np.float32)
    ).astype(jnp.bfloat16))
    assert (hi.astype(np.float64) + mid.astype(np.float64)
            + lo.astype(np.float64) == cols.astype(np.float64)).all()
    tab = jnp.zeros((64, tpad), jnp.bfloat16)
    tab = tab.at[0:c].set(jnp.asarray(hi))
    tab = tab.at[c:2 * c].set(jnp.asarray(mid))
    tab = tab.at[2 * c:3 * c].set(jnp.asarray(lo))
    return tab


def build_shading_pack(attribs, tpad: int) -> jnp.ndarray:
    """(64, tpad) bf16 3-split of the 17 shading columns:
    0-2 gu, 3-5 gv, 6 u0, 7 v0, 8-10 n1, 11-13 n2, 14-16 n3."""
    t = attribs.count
    cols = np.zeros((17, tpad), np.float32)

    def put(row, comp):
        cols[row, :t] = np.asarray(comp)

    for k in range(3):
        put(0 + k, attribs.gu[k])
        put(3 + k, attribs.gv[k])
        put(8 + k, attribs.n1[k])
        put(11 + k, attribs.n2[k])
        put(14 + k, attribs.n3[k])
    put(6, attribs.u0)
    put(7, attribs.v0)
    return _split3_table(cols)


def _smooth_refine_kernel(ray_ref, t1_ref, g1_ref, tabt_ref, stab_ref,
                          t_ref, nx_ref, ny_ref, nz_ref, m_ref):
    """One one-hot matrix, two table fetches, in-kernel interpolation.

    Math contract: identical f32 ops in the same order as
    ops.shading.smooth_hit_normals composed with the minarg Hits
    (hit_p = p + d * where(hit, t, 0); u = px*gu0 + py*gu1 + pz*gu2
    + u0; rsqrt normalization; fallback to the fetched face normal on
    miss or zero corner normals)."""
    rays = ray_ref[:]
    tpad = tabt_ref.shape[1]
    tiota = jax.lax.broadcasted_iota(jnp.int32, (tpad, 1), 0)
    gi = g1_ref[0:1, :].astype(jnp.int32)
    onehot = jnp.where(tiota == gi, 1.0, 0.0).astype(jnp.bfloat16)

    def fetch(tab_ref, c):
        rows3 = jax.lax.dot_general(
            tab_ref[:], onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return rows3[0:c] + rows3[c:2 * c] + rows3[2 * c:3 * c]

    rows = fetch(tabt_ref, 17)    # face normal 0-2, mati 16
    srow = fetch(stab_ref, 17)    # gu gv u0 v0 n1 n2 n3

    t1 = t1_ref[0, :]
    hit = t1 < BIG
    safe_t = jnp.where(hit, t1, 0.0)
    px = rays[0, :] + rays[3, :] * safe_t
    py = rays[1, :] + rays[4, :] * safe_t
    pz = rays[2, :] + rays[5, :] * safe_t

    u = px * srow[0] + py * srow[1] + pz * srow[2] + srow[6]
    v = px * srow[3] + py * srow[4] + pz * srow[5] + srow[7]
    w = 1.0 - u - v
    nsx = w * srow[8] + u * srow[11] + v * srow[14]
    nsy = w * srow[9] + u * srow[12] + v * srow[15]
    nsz = w * srow[10] + u * srow[13] + v * srow[16]
    nn2 = nsx * nsx + nsy * nsy + nsz * nsz
    use = hit & (nn2 > 1e-12)
    inv = jax.lax.rsqrt(jnp.where(nn2 > 1e-12, nn2, 1.0))

    t_ref[0, :] = jnp.where(hit, t1, -1.0)
    nx_ref[0, :] = jnp.where(use, nsx * inv, rows[0, :])
    ny_ref[0, :] = jnp.where(use, nsy * inv, rows[1, :])
    nz_ref[0, :] = jnp.where(use, nsz * inv, rows[2, :])
    m_ref[0, :] = rows[16, :]


@functools.partial(jax.jit, static_argnums=(5, 6))
def _run_smooth_refine(rays8, t1, g1, tabt, stab, tr: int,
                       interpret: bool):
    rpad = rays8.shape[1]
    tpad = tabt.shape[1]
    outs = pl.pallas_call(
        _smooth_refine_kernel,
        grid=(rpad // tr,),
        in_specs=[
            pl.BlockSpec((8, tr), lambda rt: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda rt: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda rt: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, tpad), lambda rt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, tpad), lambda rt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tr), lambda rt: (0, rt),
                                memory_space=pltpu.VMEM)] * 5,
        out_shape=[jax.ShapeDtypeStruct((1, rpad), jnp.float32)] * 5,
        interpret=interpret,
    )(rays8, t1, g1, tabt, stab)
    return outs


def make_smooth_minarg_intersect(tris: TrianglesSoA, attribs, *,
                                 tr: int = 1024, tt: int = 1024,
                                 chunk: int = 512,
                                 interpret: bool = False):
    """minarg intersect with smooth shading normals, at ~flat cost.

    Drop-in intersect(rays) -> Hits whose n is the interpolated vertex
    normal (face-normal fallback on miss / vn-less triangles). The
    minarg pass is byte-identical to make_minarg_intersect's; only the
    refine pass differs (second table + interpolation, see
    _smooth_refine_kernel)."""
    tri_pack = build_tri_pack(tris, tt)
    tpad = tri_pack.shape[0]
    tt_eff = min(tt, tpad)

    tab = np.asarray(tri_pack)
    tabt = _split3_table(np.ascontiguousarray(tab[:, :17].T))
    if attribs.count != tris.count:
        raise ValueError(
            f"attribs cover {attribs.count} triangles, scene has "
            f"{tris.count}"
        )
    stab = build_shading_pack(attribs, tpad)

    def intersect(rays: Rays) -> Hits:
        r = rays.p[0].shape[0]
        rpad = _round_up(r, tr)
        rays8 = pack_rays(rays.p, rays.d, rpad)
        t1, g1 = _run_minarg(rays8, tri_pack, tr, tt_eff, interpret,
                             chunk)
        outs = _run_smooth_refine(rays8, t1, g1, tabt, stab, tr,
                                  interpret)
        return assemble_hits(rays, r, *outs)

    return intersect
