"""Lazy exact traversal: the per-step kernel for temporally-amortized
nearest-hit certification (models/lazy.py).

Round 3's floor analysis (docs/BENCHMARKS.md, "The SIMD traversal
floor") showed exact PER-STEP traversal of the 100k-tri stress
workload is bounded at ~5-8 Mrays/s on v5e: block-shaped schedules
pay a 6-10x SIMD union waste over the per-lane certificate optimum,
and lane-shaped schedules pay 7-15 ms per 2M-row regroup. What the
floor argument does NOT bound is work amortized ACROSS progressive
accumulation steps: a path tracer only needs each folded sample to
use the exact nearest hit, not to find it within the step that
launched the ray.

So: every step, each TR-lane block visits its K nearest still-needed
clusters (nearest-first by block slab entry — cheap and coherent),
merging candidates into a per-lane best that is CARRIED IN THE
WAVEFRONT STATE, along with a per-lane visited-cluster bitmask. A
lane whose certificate closes (no unvisited cluster's inflated-AABB
entry is below its current best t) shades and bounces; an unfinished
lane stalls — drawing no RNG (parity order preserved) and folding no
sample (estimator unchanged) — and continues marching next step from
its own frontier. Shallow lanes (p50 certificate = 2 clusters)
complete in one step; the deep p99 tail spreads its cost over
several steps instead of forcing a dense escalation now.

Kernel = march_kernel's visit math (Plucker-MXU candidates + in-visit
exact top-2 refine) plus: best-row initialization from carried state,
and a visited-bitmask update (bit set for every lane whose visit
resolved exactly; pend lanes — both top-2 spurious — leave the bit
clear and are resolved by the caller's dense net, since re-visiting
would pend deterministically again).

Reference anchor: /root/reference/prog.cl:144-184 (kd_intersect) —
the capability matched is interactive large-scene traversal; the
mechanism is TPU-shaped (bounded coherent SIMD work per frame).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import BIG


def _lazy_kernel(clist_ref, rays_ref, feat_ref, t0_ref, nx0_ref,
                 ny0_ref, nz0_ref, m0_ref, g0_ref, vis_ref, trig_ref,
                 tric_ref, tab3_ref, t_ref, nx_ref, ny_ref, nz_ref,
                 m_ref, g_ref, p_ref, viso_ref, acc_ref, vacc_ref,
                 *, cs: int, K: int, tr: int, cw: int):
    """One (block b, visit u) grid step; best + visited accumulate in
    scratch, initialized from the carried state at u == 0 and flushed
    at u == K-1."""
    u = pl.program_id(1)
    b = pl.program_id(0)
    cid = clist_ref[b * K + u]

    @pl.when(u == 0)
    def _():
        acc_ref[0, :] = t0_ref[0, :]
        acc_ref[1, :] = nx0_ref[0, :]
        acc_ref[2, :] = ny0_ref[0, :]
        acc_ref[3, :] = nz0_ref[0, :]
        acc_ref[4, :] = m0_ref[0, :]
        acc_ref[5, :] = g0_ref[0, :]
        acc_ref[6, :] = jnp.zeros((tr,), jnp.float32)
        vacc_ref[...] = vis_ref[...]

    live = cid >= 0
    rays = rays_ref[:]
    px, py, pz = rays[0:1], rays[1:2], rays[2:3]
    dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
    feat = feat_ref[:]
    trig = trig_ref[:]                      # (3cs, 32) bf16
    tric = tric_ref[:]                      # (cs, 24) f32
    tab3 = tab3_ref[:]                      # (64, cs) bf16

    def col(k):
        return tric[:, k:k + 1]

    dots = jax.lax.dot_general(
        trig, feat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    e1d = dots[0:cs]
    e2d = dots[cs:2 * cs]
    e3d = dots[2 * cs:3 * cs]
    vn = col(0) * dx + col(1) * dy + col(2) * dz
    tnum = col(3) - (col(0) * px + col(1) * py + col(2) * pz)
    t = tnum / vn
    pos = vn > 0.0
    cxa = jnp.abs(py * dz - pz * dy)
    cya = jnp.abs(pz * dx - px * dz)
    cza = jnp.abs(px * dy - py * dx)
    ml = jnp.maximum(jnp.maximum(cxa, cya), cza)    # (1, TR)
    ep1 = col(17) * ml + col(20)
    ep2 = col(18) * ml + col(21)
    ep3 = col(19) * ml + col(22)
    va = (e1d >= -ep1) & (e2d >= -ep2) & (e3d >= -ep3)
    vb = (e1d <= ep1) & (e2d <= ep2) & (e3d <= ep3)
    valid = ((pos & va) | (~pos & vb)) & (t > 0.0)
    tm = jnp.where(valid, t, BIG)

    m1 = jnp.min(tm, axis=0)
    a1 = jnp.argmin(tm, axis=0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (cs, 1), 0)
    tm2 = jnp.where(sub == a1[None, :], BIG, tm)
    m2 = jnp.min(tm2, axis=0)
    a2 = jnp.argmin(tm2, axis=0)

    def exact_rows(a):
        onehot = jnp.where(
            sub == a[None, :], 1.0, 0.0
        ).astype(jnp.bfloat16)              # (cs, TR)
        rows3 = jax.lax.dot_general(
            tab3, onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rows = rows3[0:17] + rows3[17:34] + rows3[34:51]

        def c(k):
            return rows[k:k + 1, :]

        pn_ = c(0) * px + c(1) * py + c(2) * pz
        vn_ = c(0) * dx + c(1) * dy + c(2) * dz
        t_ = (c(3) - pn_) / vn_
        pm1 = c(4) * px + c(5) * py + c(6) * pz
        vm1 = c(4) * dx + c(5) * dy + c(6) * dz
        pm2 = c(8) * px + c(9) * py + c(10) * pz
        vm2 = c(8) * dx + c(9) * dy + c(10) * dz
        pm3 = c(12) * px + c(13) * py + c(14) * pz
        vm3 = c(12) * dx + c(13) * dy + c(14) * dz
        ok = (
            (t_ > 0.0)
            & (pm1 + t_ * vm1 >= c(7))
            & (pm2 + t_ * vm2 >= c(11))
            & (pm3 + t_ * vm3 >= c(15))
        )
        return ok[0, :], rows

    v1, rows1 = exact_rows(a1)
    v2, rows2 = exact_rows(a2)
    has1 = m1 < BIG
    has2 = m2 < BIG
    v1 = v1 & has1
    v2 = v2 & has2
    use2 = (~v1) & v2
    found = (v1 | use2) & live
    pend = (~v1) & (~v2) & has2 & live

    ct = jnp.where(use2, m2, m1)
    ca = jnp.where(use2, a2, a1)

    def pick(k):
        return jnp.where(use2, rows2[k, :], rows1[k, :])

    cnx, cny, cnz, cm = pick(0), pick(1), pick(2), pick(16)
    cg = (cid * cs + ca).astype(jnp.float32)

    ot = acc_ref[0, :]
    og = acc_ref[5, :]
    bet = found & ((ct < ot) | ((ct == ot) & (cg < og)))
    acc_ref[0, :] = jnp.where(bet, ct, ot)
    acc_ref[1, :] = jnp.where(bet, cnx, acc_ref[1, :])
    acc_ref[2, :] = jnp.where(bet, cny, acc_ref[2, :])
    acc_ref[3, :] = jnp.where(bet, cnz, acc_ref[3, :])
    acc_ref[4, :] = jnp.where(bet, cm, acc_ref[4, :])
    acc_ref[5, :] = jnp.where(bet, cg, og)
    acc_ref[6, :] = jnp.maximum(acc_ref[6, :],
                                pend.astype(jnp.float32))

    # Visited-bit update: cluster cid's bit, set for every lane whose
    # visit resolved exactly (live visit, no pend). The row/bit are
    # SCALARS derived from the prefetched cid; pend gates per lane.
    word = jax.lax.div(jnp.maximum(cid, 0), 32)
    bit = jnp.left_shift(
        jnp.uint32(1),
        jax.lax.rem(jnp.maximum(cid, 0), 32).astype(jnp.uint32),
    )
    rowmask = (jax.lax.broadcasted_iota(jnp.int32, (cw, 1), 0)
               == word)
    lane_ok = (live & ~pend).astype(jnp.uint32)[None, :]   # (1, tr)
    add = jnp.where(rowmask, bit, jnp.uint32(0)) * lane_ok
    vacc_ref[...] = vacc_ref[...] | add

    @pl.when(u == K - 1)
    def _():
        t_ref[0, :] = acc_ref[0, :]
        nx_ref[0, :] = acc_ref[1, :]
        ny_ref[0, :] = acc_ref[2, :]
        nz_ref[0, :] = acc_ref[3, :]
        m_ref[0, :] = acc_ref[4, :]
        g_ref[0, :] = acc_ref[5, :]
        p_ref[0, :] = acc_ref[6, :]
        viso_ref[...] = vacc_ref[...]


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9))
def run_lazy_march(clist, rays8, feat, best_rows, vis, scene,
                   cs: int, K: int, tr: int, interpret: bool):
    """clist: (B*K,) i32 (-1 dummies); rays8 (8, N) f32 packed;
    feat (32, N) bf16; best_rows: 6 carried rows each (1, N) f32
    (t, nx, ny, nz, mati, g); vis: (CW, N) uint32 visited bitmask.
    Returns 7 rows (best6 + pend) and the updated vis."""
    n = rays8.shape[1]
    B = n // tr
    cw = vis.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, K),
        in_specs=[
            pl.BlockSpec((8, tr), lambda b, u, s: (0, b)),
            pl.BlockSpec((32, tr), lambda b, u, s: (0, b)),
        ] + [
            pl.BlockSpec((1, tr), lambda b, u, s: (0, b))
        ] * 6 + [
            pl.BlockSpec((cw, tr), lambda b, u, s: (0, b)),
            pl.BlockSpec(
                (3 * cs, 32),
                lambda b, u, s: (jnp.maximum(s[b * K + u], 0), 0),
            ),
            pl.BlockSpec(
                (cs, 24),
                lambda b, u, s: (jnp.maximum(s[b * K + u], 0), 0),
            ),
            pl.BlockSpec(
                (64, cs),
                lambda b, u, s: (0, jnp.maximum(s[b * K + u], 0)),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, tr), lambda b, u, s: (0, b)),
        ] * 7 + [
            pl.BlockSpec((cw, tr), lambda b, u, s: (0, b)),
        ],
        scratch_shapes=[
            pltpu.VMEM((7, tr), jnp.float32),
            pltpu.VMEM((cw, tr), jnp.uint32),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_lazy_kernel, cs=cs, K=K, tr=tr, cw=cw),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, n), jnp.float32)] * 7
        + [jax.ShapeDtypeStruct((cw, n), jnp.uint32)],
        interpret=interpret,
    )(clist, rays8, feat, *best_rows, vis, scene.trig, scene.tric,
      scene.tab3)
    return outs[:7], outs[7]


def unvisited_mask(vis: jnp.ndarray, C: int) -> jnp.ndarray:
    """(CW, N) uint32 bitmask -> (C, N) bool 'cluster c NOT visited'."""
    c_iota = jnp.arange(C, dtype=jnp.uint32)
    w_of = (c_iota // 32).astype(jnp.int32)
    b_of = (c_iota % 32).astype(jnp.uint32)
    sel = jnp.take(vis, w_of, axis=0)            # (C, N)
    bits = jnp.right_shift(sel, b_of[:, None]) & jnp.uint32(1)
    return bits == 0
