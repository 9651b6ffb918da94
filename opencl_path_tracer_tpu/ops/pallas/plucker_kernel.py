"""MXU Plucker-candidates intersector: bf16 edge tests on the systolic
array, exact f32 refine, provably bit-identical to the fused VPU kernel.

Why. The fused brute kernel (intersect_kernel.py) is VPU-bound: 55 f32
ops/test at ~60-75% of the v5e VPU ceiling (47-75 Gtests/s measured)
cannot reach the 125 Mrays/s/chip bar on the 804-tri Cornell workload,
and v5e has no faster elementwise mode (bf16/int16 VPU measured SLOWER
than f32 — docs/BENCHMARKS.md round 3). The only faster engine on the
chip is the MXU, but ray-triangle math is rank-8, capping the direct
dot-product form at ~6% MXU utilization (84 Gtests/s, round 2).

The trick: the reference's three edge-sign tests
(`pm_k + t*vm_k >= d_k`, prog.cl:94-112 in the m_k form) multiply
through by vn into PLUCKER inner products,

    E_k = (m_k x n) . (P x D) + (c0*m_k - d_k*n) . D
    accept_k  <=>  E_k * sign(vn) >= 0,

i.e. a K=6 dot of a per-triangle constant with per-ray line
coordinates [P x D, D]. Three edges -> a (3*TT, K) x (K, TR) matmul,
which the MXU runs in bf16 far faster than the VPU can evaluate the
original 9-op chain. What stays on the VPU is exact f32: vn, tnum,
t = tnum/vn (the SAME expression, op for op, as the fused kernel, so
every t this module emits is bit-identical to the f32 kernel's t).

Exactness is by construction, not by tolerance:
 * The bf16 E-tests are CONSERVATIVE: each is loosened by a
   per-triangle bound eps_k on the total bf16-vs-f32 error (hi/lo
   split operands, dropped lo*lo term, f32 accumulation, and the f32
   evaluation noise of the production expression itself — see
   build_plucker_packs). So the accepted set is a SUPERSET of the
   production kernel's accepted set; min-t over a superset with
   bit-identical t values can only err by including a spurious
   (truly-rejected) candidate.
 * The refine kernel re-tests the top-2 candidates with the exact
   production f32 expression (constants fetched bit-exactly via a
   0/1 one-hot matmul — Precision.HIGHEST makes the f32 selection
   product exact). If the top-1 passes, it IS the production winner;
   else if the top-2 passes, that is (nothing accepted lies between
   them); else the lane is flagged PENDING.
 * Pending lanes (both candidates spurious — measured rare; grazing
   silhouette rays) are resolved by the caller's unconditional net:
   models/wavefront.py stalls the lane until the rotating exact
   slice (a static dynamic-slice of lanes run through the fused f32
   kernel every step) covers it. Degraded cost, never correctness —
   the same design rule as sorted_intersect.py's dense tail.

Scope: whole-scene table must fit VMEM for the refine one-hot
(T <= ~16k tris); this is the small-scene (Cornell-class) path. The
pair pipeline owns large scenes.

Reference parity: same math as triangle_intersect/first_intersect
(/root/reference/prog.cl:94-122); winner-on-tie = lowest triangle
index, like the fused kernel's strict-< accumulation.
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
    BIG, _round_up, build_tri_pack, pack_rays,
)

# Conservative accept loosening, relative to the per-triangle magnitude
# bound (see build_plucker_packs): 2^-16 covers the hi/lo representation
# residual + dropped lo*lo + f32 accumulation; 2^-19-scale covers the
# production expression's own f32 evaluation noise; 2^-15 with the 2x
# Pmax margin leaves ~3-4x headroom over the sum. Larger eps widens the
# spurious-accept band (measured: silhouette-graze lanes whose top-2
# are both spurious go PENDING — eps sets the stall rate), never
# breaks exactness.
EPS_SCALE = 2.0 ** -15


def _split_bf16_exact(x: jnp.ndarray):
    """f32 -> (hi, lo) bf16 pair with hi = RNE_bf16(x) and
    lo = RNE_bf16(x - f32(hi)), computed entirely in INTEGER bit
    arithmetic.

    Why not `x.astype(bf16)`: XLA:TPU's BFloat16Propagation pass sees
    an f32 op whose users are all bf16 converts and demotes the
    PRODUCER math to bf16 — which silently replaces x itself with a
    bf16-rounded value. For a hi/lo split that is catastrophic: the
    residual `x - hi` is computed from a corrupted x, and the "exact"
    superset-accept eps bounds no longer hold. Measured round 3 on
    v5e: lo-row errors up to ~2.0 (bf16-ulp scale of the operands) on
    the stress workload, producing deterministic wrong-hit rates of
    0.5-4% that varied with fusion context — the entire composed-jit
    "heisenbug" of NOTES_NEXT_ROUND.md. Returning the features as jit
    outputs fixed it because materialization forced f32 evaluation.

    This form has no f32->bf16 convert at all: rounding is explicit
    uint32 arithmetic (add 0x7fff + kept-lsb, mask), and the bf16
    tensors are produced by BITCASTS from uint16, which the pass does
    not treat as precision-relaxation sites. The f32 subtraction
    x - hi is exact (Sterbenz: hi is within 2^-8 of x), and its only
    consumer is an integer bitcast, so no bf16 use reaches any f32 op.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    lsb = (u >> 16) & jnp.uint32(1)
    hi_u = (u + jnp.uint32(0x7FFF) + lsb) & jnp.uint32(0xFFFF0000)
    hi_f = jax.lax.bitcast_convert_type(hi_u, jnp.float32)
    lo_f = x - hi_f
    v = jax.lax.bitcast_convert_type(lo_f, jnp.uint32)
    lsb2 = (v >> 16) & jnp.uint32(1)
    lo_u = (v + jnp.uint32(0x7FFF) + lsb2) & jnp.uint32(0xFFFF0000)
    hi_b = jax.lax.bitcast_convert_type(
        (hi_u >> 16).astype(jnp.uint16), jnp.bfloat16)
    lo_b = jax.lax.bitcast_convert_type(
        (lo_u >> 16).astype(jnp.uint16), jnp.bfloat16)
    return hi_b, lo_b


def plucker_feat(rays8: jnp.ndarray) -> jnp.ndarray:
    """(8, R) f32 packed rays -> (32, R) bf16 MXU features.

    Rows: [phi_hi(6), phi_lo(6), phi_hi(6), zeros(14)] where
    phi = [P x D, D]. The triple layout pairs with the triangle rows
    [w_hi, w_hi, w_lo] so one K=32 contraction accumulates
    w_hi*phi_hi + w_hi*phi_lo + w_lo*phi_hi (the lo*lo term is in the
    eps bound). Built OUTSIDE the kernel: Mosaic (current version)
    rejects in-kernel f32->bf16 truncation of these shapes. The hi/lo
    split uses integer bit arithmetic (_split_bf16_exact) — a plain
    astype chain is silently corrupted by XLA:TPU bf16 demotion."""
    px, py, pz = rays8[0:1], rays8[1:2], rays8[2:3]
    dx, dy, dz = rays8[3:4], rays8[4:5], rays8[5:6]
    cx = py * dz - pz * dy
    cy = pz * dx - px * dz
    cz = px * dy - py * dx
    phi = jnp.concatenate([cx, cy, cz, dx, dy, dz], axis=0)
    hi, lo = _split_bf16_exact(phi)
    zeros = jnp.zeros((14,) + phi.shape[1:], jnp.bfloat16)
    return jnp.concatenate([hi, lo, hi, zeros], axis=0)


def build_plucker_packs(tris: TrianglesSoA, *, chunk: int = 256,
                        tt: int = 1024, eps_scale: float = EPS_SCALE):
    """Host-side constant packs.

    Returns (trig bf16 (3*Tpad, 32), tric f32 (Tpad, 8), tpad):
      trig — chunk-major rows [w1(cc); w2(cc); w3(cc)] per chunk, cols
             [w_hi(6), w_hi(6), w_lo(6), 0...] matching plucker_feat.
      tric — [n(3), c0, eps1, eps2, eps3, 0].

    eps_k = eps_scale * |w_k| . Phi, with Phi the per-feature magnitude
    bound over every legal ray: |D| <= 1 and |P x D| <= Pmax, where ray
    origins P lie in the scene AABB or at the camera eye (wavefront
    rays originate on surfaces or at the eye). Pmax uses a 2x margin
    over the AABB corner norm so any reasonable eye position is
    covered. Padding triangles have w = 0, n = 0: E = 0 passes the
    loosened sign test but t = 0/0 = NaN fails t > 0, so they are
    never accepted (same guard as the fused kernel)."""
    g = np.asarray(build_tri_pack(tris, tt))[:, :17]  # (Tpad0, 17)
    # build_tri_pack pads to >= tt multiples already; re-pad to chunk
    # AND tt multiples for the chunk-major trig layout.
    tpad = _round_up(max(g.shape[0], chunk), chunk)
    tpad = _round_up(tpad, min(tt, tpad) if tpad >= tt else tpad)
    if tpad != g.shape[0]:
        g = np.concatenate(
            [g, np.zeros((tpad - g.shape[0], 17), np.float32)]
        )
    n = g[:, 0:3].astype(np.float64)
    c0 = g[:, 3].astype(np.float64)

    # Ray-feature magnitude bounds.
    pts = np.concatenate([np.asarray(tris.r1), np.asarray(tris.r2),
                          np.asarray(tris.r3)], axis=0)
    pmax = 2.0 * float(np.linalg.norm(pts, axis=1).max()) + 1.0
    phi_bound = np.array([pmax] * 3 + [1.01] * 3)

    trig = np.zeros((3 * tpad, 32), np.float32)
    tric = np.zeros((tpad, 8), np.float32)
    tric[:, 0:3] = n.astype(np.float32)
    tric[:, 3] = c0.astype(np.float32)
    w_all = []
    for k in range(3):
        m = g[:, 4 + 4 * k:7 + 4 * k].astype(np.float64)
        d = g[:, 7 + 4 * k].astype(np.float64)
        w = np.concatenate(
            [np.cross(m, n), c0[:, None] * m - d[:, None] * n], 1
        ).astype(np.float32)                              # (Tpad, 6)
        w_all.append(w)
        eps = eps_scale * (np.abs(w).astype(np.float64) @ phi_bound)
        live = (np.abs(n).sum(1) > 0)
        tric[:, 4 + k] = np.where(live, eps, 1e-30).astype(np.float32)
    for c0i in range(0, tpad, chunk):
        cc = min(chunk, tpad - c0i)
        for k in range(3):
            trig[3 * c0i + k * cc:3 * c0i + (k + 1) * cc, 0:6] = (
                w_all[k][c0i:c0i + cc]
            )
    hi32 = np.asarray(
        jnp.asarray(trig[:, 0:6]).astype(jnp.bfloat16), np.float32
    )
    merged = np.zeros((3 * tpad, 32), np.float32)
    merged[:, 0:6] = hi32
    merged[:, 6:12] = hi32
    merged[:, 12:18] = trig[:, 0:6] - hi32
    return (jnp.asarray(merged).astype(jnp.bfloat16),
            jnp.asarray(tric), tpad)


def _cand_kernel(ray_ref, feat_ref, trig_ref, tric_ref,
                 t1_ref, g1_ref, t2_ref, g2_ref, *, chunk: int):
    """Top-2 accepted candidates per ray. t is the production f32
    expression (bit-identical); acceptance is the eps-loosened bf16
    Plucker sign test (superset of production's accepts)."""
    tt_idx = pl.program_id(1)
    tt = tric_ref.shape[0]
    rays = ray_ref[:]
    px, py, pz = rays[0:1], rays[1:2], rays[2:3]
    dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
    feat = feat_ref[:]

    for c0 in range(0, tt, chunk):
        cc = min(chunk, tt - c0)
        trig = trig_ref[3 * c0:3 * (c0 + cc), :]
        tric = tric_ref[c0:c0 + cc, :]
        dots = jax.lax.dot_general(
            trig, feat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        e1d, e2d, e3d = dots[0:cc], dots[cc:2 * cc], dots[2 * cc:3 * cc]

        def col(k, tric=tric):
            return tric[:, k:k + 1]

        # Exact f32 tail — same expression as the fused kernel.
        vn = col(0) * dx + col(1) * dy + col(2) * dz
        tnum = col(3) - (col(0) * px + col(1) * py + col(2) * pz)
        t = tnum / vn
        pos = vn > 0.0
        va = (e1d >= -col(4)) & (e2d >= -col(5)) & (e3d >= -col(6))
        vb = (e1d <= col(4)) & (e2d <= col(5)) & (e3d <= col(6))
        valid = ((pos & va) | (~pos & vb)) & (t > 0.0)
        tm = jnp.where(valid, t, BIG)

        m1 = jnp.min(tm, axis=0)
        a1 = jnp.argmin(tm, axis=0)
        gg1 = (tt_idx * tt + c0 + a1).astype(jnp.float32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (cc, 1), 0)
        tm2 = jnp.where(sub == a1[None, :], BIG, tm)
        m2 = jnp.min(tm2, axis=0)
        a2 = jnp.argmin(tm2, axis=0)
        gg2 = (tt_idx * tt + c0 + a2).astype(jnp.float32)

        if c0 == 0:
            @pl.when(tt_idx == 0)
            def _():
                t1_ref[0, :] = m1
                g1_ref[0, :] = gg1
                t2_ref[0, :] = m2
                g2_ref[0, :] = gg2

            @pl.when(tt_idx != 0)
            def _(m1=m1, gg1=gg1, m2=m2, gg2=gg2):
                _merge_top2(t1_ref, g1_ref, t2_ref, g2_ref,
                            m1, gg1, m2, gg2)
        else:
            _merge_top2(t1_ref, g1_ref, t2_ref, g2_ref,
                        m1, gg1, m2, gg2)


def _merge_top2(t1_ref, g1_ref, t2_ref, g2_ref, m1, gg1, m2, gg2):
    """Merge running top-2 with a chunk's top-2; ties broken toward the
    LOWER triangle index (the production winner-on-tie rule)."""
    o1, og1 = t1_ref[0, :], g1_ref[0, :]
    o2, og2 = t2_ref[0, :], g2_ref[0, :]
    bet = (m1 < o1) | ((m1 == o1) & (gg1 < og1))
    n1 = jnp.where(bet, m1, o1)
    ng1 = jnp.where(bet, gg1, og1)
    r = jnp.where(bet, o1, m1)
    rg = jnp.where(bet, og1, gg1)
    s = jnp.where(bet, m2, o2)
    sg = jnp.where(bet, gg2, og2)
    bet2 = (s < r) | ((s == r) & (sg < rg))
    t1_ref[0, :] = n1
    g1_ref[0, :] = ng1
    t2_ref[0, :] = jnp.where(bet2, s, r)
    g2_ref[0, :] = jnp.where(bet2, sg, rg)


def _refine_kernel(ray_ref, t1_ref, g1_ref, t2_ref, g2_ref,
                   tabt_ref, t_ref, nx_ref, ny_ref, nz_ref, m_ref,
                   p_ref):
    """Exact f32 re-test of the top-2 candidates per lane.

    tabt: (64, Tpad) bf16 — the 17 tri_pack constants split THREE ways
    (hi/mid/lo, 8 mantissa bits each: hi+mid+lo == the f32 constant
    EXACTLY, asserted at build time) at rows [k], [17+k], [34+k].
    Constants are fetched bit-exactly with ONE bf16 matmul per
    candidate: the one-hot weights are exact 0/1 in bf16, each product
    is a plain selection, and the f32 accumulation of three
    disjoint-exponent-range components is exact. A single-pass bf16
    matmul here is ~6x the 6-pass Precision.HIGHEST f32 form that cost
    ~12 ms/step at 2M lanes."""
    rays = ray_ref[:]
    px, py, pz = rays[0:1], rays[1:2], rays[2:3]
    dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
    tpad = tabt_ref.shape[1]
    # Mosaic iota must be integer-typed; candidates' g rows are f32
    # (exact small ints), so compare in i32.
    tiota = jax.lax.broadcasted_iota(jnp.int32, (tpad, 1), 0)

    def exact_valid(g, t_cand):
        gi = g[0:1, :].astype(jnp.int32)
        # f32 select then cast: an i1-masked bf16 select trips a Mosaic
        # relayout bug ((8,128) mask vs (16,128) bf16 tiling); 0/1 are
        # exact in both dtypes so the cast is free of rounding.
        onehot = jnp.where(tiota == gi, 1.0, 0.0).astype(jnp.bfloat16)
        rows3 = jax.lax.dot_general(
            tabt_ref[:], onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # (64, TR) f32
        rows = rows3[0:17] + rows3[17:34] + rows3[34:51]

        def c(k):
            return rows[k:k + 1, :]

        pn = c(0) * px + c(1) * py + c(2) * pz
        vn = c(0) * dx + c(1) * dy + c(2) * dz
        t = (c(3) - pn) / vn
        pm1 = c(4) * px + c(5) * py + c(6) * pz
        vm1 = c(4) * dx + c(5) * dy + c(6) * dz
        pm2 = c(8) * px + c(9) * py + c(10) * pz
        vm2 = c(8) * dx + c(9) * dy + c(10) * dz
        pm3 = c(12) * px + c(13) * py + c(14) * pz
        vm3 = c(12) * dx + c(13) * dy + c(14) * dz
        valid = (
            (t > 0.0)
            & (pm1 + t * vm1 >= c(7))
            & (pm2 + t * vm2 >= c(11))
            & (pm3 + t * vm3 >= c(15))
        )
        return valid[0, :], rows

    t1 = t1_ref[0, :]
    t2 = t2_ref[0, :]
    has1 = t1 < BIG
    has2 = t2 < BIG
    v1, rows1 = exact_valid(g1_ref[:], t1)
    v2, rows2 = exact_valid(g2_ref[:], t2)
    v1 = v1 & has1
    v2 = v2 & has2

    use2 = (~v1) & v2
    # Empty superset, or a single spurious candidate and nothing else
    # accepted, is a CONFIRMED production miss (accepted superset
    # contains every production-accepted triangle).
    miss = (~has1) | ((~v1) & ~has2)
    pend = (~v1) & (~v2) & has2  # a 3rd accepted candidate may exist

    def pick(k):
        return jnp.where(use2, rows2[k, :], rows1[k, :])

    # Miss/pending emit t = -1 (the Hits convention downstream; every
    # real hit has t > 0 because acceptance required it).
    t_ref[0, :] = jnp.where(miss | pend, -1.0,
                            jnp.where(use2, t2, t1))
    nx_ref[0, :] = pick(0)
    ny_ref[0, :] = pick(1)
    nz_ref[0, :] = pick(2)
    m_ref[0, :] = pick(16)
    p_ref[0, :] = pend.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _run_candidates(rays8, trig, tric, feat, tr: int, tt: int,
                    chunk: int, interpret: bool):
    rpad = rays8.shape[1]
    tpad = tric.shape[0]
    grid = (rpad // tr, tpad // tt)
    outs = pl.pallas_call(
        functools.partial(_cand_kernel, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tr), lambda rt, tg: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, tr), lambda rt, tg: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * tt, 32), lambda rt, tg: (tg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, 8), lambda rt, tg: (tg, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tr), lambda rt, tg: (0, rt),
                                memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((1, rpad), jnp.float32)] * 4,
        cost_estimate=pl.CostEstimate(
            flops=rpad * tpad * 180,
            bytes_accessed=rpad * 40 * 4 + tpad * 32 * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rays8, feat, trig, tric)
    return outs


@functools.partial(jax.jit, static_argnums=(6, 7))
def _run_refine(rays8, t1, g1, t2, g2, tabt, tr: int, interpret: bool):
    rpad = rays8.shape[1]
    tpad = tabt.shape[1]
    outs = pl.pallas_call(
        _refine_kernel,
        grid=(rpad // tr,),
        in_specs=[
            pl.BlockSpec((8, tr), lambda rt: (0, rt),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, tr), lambda rt: (0, rt),
                         memory_space=pltpu.VMEM),
        ] * 4 + [
            pl.BlockSpec((64, tpad), lambda rt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tr), lambda rt: (0, rt),
                                memory_space=pltpu.VMEM)] * 6,
        out_shape=[jax.ShapeDtypeStruct((1, rpad), jnp.float32)] * 6,
        interpret=interpret,
    )(rays8, t1, g1, t2, g2, tabt)
    return outs


def make_plucker_intersect(tris: TrianglesSoA, *, tr: int = 1024,
                           tt: int = 1024, chunk: int = 256,
                           interpret: bool = False):
    """Returns intersect(rays) -> (Hits, pending bool array).

    Hits are bit-identical to pallas_first_intersect wherever
    pending is False (the overwhelming majority — pending means both
    top-2 bf16 candidates were spurious accepts). The CALLER owns the
    pending net; models/wavefront.py stalls pending lanes until the
    rotating exact slice covers them."""
    trig, tric, tpad = build_plucker_packs(tris, chunk=chunk, tt=tt)
    tt_eff = min(tt, tpad)
    tab = np.asarray(build_tri_pack(tris, tt))
    if tab.shape[0] < tpad:
        tab = np.concatenate(
            [tab, np.zeros((tpad - tab.shape[0], 24), np.float32)]
        )
    # Exact 3-way bf16 bit-split of the 17 used constants (see
    # _refine_kernel): hi+mid+lo reconstructs the f32 table bit-exactly.
    t17 = tab[:, :17].T                               # (17, Tpad) f32
    hi = np.asarray(jnp.asarray(t17).astype(jnp.bfloat16))
    r1_ = t17 - hi.astype(np.float32)
    mid = np.asarray(jnp.asarray(r1_).astype(jnp.bfloat16))
    r2_ = r1_ - mid.astype(np.float32)
    lo = np.asarray(jnp.asarray(r2_).astype(jnp.bfloat16))
    assert (hi.astype(np.float64) + mid.astype(np.float64)
            + lo.astype(np.float64) == t17.astype(np.float64)).all(), (
        "bf16 3-way split failed to reconstruct the f32 table exactly"
    )
    tabt = jnp.zeros((64, tpad), jnp.bfloat16)
    tabt = tabt.at[0:17].set(jnp.asarray(hi))
    tabt = tabt.at[17:34].set(jnp.asarray(mid))
    tabt = tabt.at[34:51].set(jnp.asarray(lo))

    def intersect_rows(rays8: jnp.ndarray):
        """(8, Rpad) packed rays -> six (1, Rpad) rows
        [t(-1=miss/pending), nx, ny, nz, mati, pending] — the fused
        pipeline's H-pack rows, no Hits unpacking."""
        feat = plucker_feat(rays8)
        t1, g1, t2, g2 = _run_candidates(
            rays8, trig, tric, feat, tr, tt_eff, chunk, interpret
        )
        return _run_refine(
            rays8, t1, g1, t2, g2, tabt, tr, interpret
        )

    intersect_rows.tr = tr

    def intersect(rays: Rays):
        r = rays.p[0].shape[0]
        rpad = _round_up(r, tr)
        rays8 = pack_rays(rays.p, rays.d, rpad)
        t_, nx, ny, nz, m, pend = intersect_rows(rays8)
        best_t = t_[0, :r]
        pending = pend[0, :r] > 0.0
        any_hit = best_t > 0.0
        z = jnp.zeros_like(best_t)
        safe_t = jnp.where(any_hit, best_t, 0.0)
        hit_p = tuple(
            jnp.where(any_hit, rays.p[k] + rays.d[k] * safe_t, z)
            for k in range(3)
        )
        hits = Hits(
            t=best_t,
            p=hit_p,
            n=(nx[0, :r], ny[0, :r], nz[0, :r]),
            mati=jnp.where(any_hit, m[0, :r], 0.0).astype(jnp.int32),
        )
        return hits, pending

    intersect.rows = intersect_rows
    return intersect


def make_minarg_intersect(tris: TrianglesSoA, *, tr: int = 1024,
                          tt: int = 1024, chunk: int = 512,
                          fuse_fetch: bool = False,
                          with_ids: bool = False,
                          interpret: bool = False):
    """Exact-f32 min+argmin kernel + one-hot attribute fetch: the
    fastest EXACT small-scene intersector (measured round 3: 23.8 ms
    vs 30.6 for the attribute-extracting fused kernel at cornell's
    808 tris x 2M rays).

    The hot kernel (intersect_kernel._run_minarg) computes only
    (t, winner index) with math bit-identical to the fused kernel; the
    winner's normal/material come from the refine kernel's bit-exact
    3-split one-hot fetch. Because the winner passed the EXACT f32
    test inside the kernel, the refine's re-validation always
    succeeds: no pending, a plain drop-in intersect_fn. Returns
    intersect(rays) -> Hits, or -> (Hits, ids) with with_ids=True:
    ids (R,) int32 winner triangle index, -1 on miss (the
    ops.intersect.first_intersect_ids contract, free here — the
    minarg kernel already materializes g1 for the one-hot fetch).
    with_ids requires the two-kernel form (fuse_fetch=False)."""
    if with_ids and fuse_fetch:
        raise ValueError("with_ids needs fuse_fetch=False (the fused "
                         "kernel never materializes the winner index)")
    from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
        _run_minarg,
    )

    tri_pack = build_tri_pack(tris, tt)
    tpad = tri_pack.shape[0]
    tt_eff = min(tt, tpad)

    tab = np.asarray(tri_pack)
    t17 = tab[:, :17].T
    hi = np.asarray(jnp.asarray(t17).astype(jnp.bfloat16))
    mid = np.asarray(jnp.asarray(
        t17 - hi.astype(np.float32)).astype(jnp.bfloat16))
    lo = np.asarray(jnp.asarray(
        t17 - hi.astype(np.float32) - mid.astype(np.float32)
    ).astype(jnp.bfloat16))
    assert (hi.astype(np.float64) + mid.astype(np.float64)
            + lo.astype(np.float64) == t17.astype(np.float64)).all()
    tabt = jnp.zeros((64, tpad), jnp.bfloat16)
    tabt = tabt.at[0:17].set(jnp.asarray(hi))
    tabt = tabt.at[17:34].set(jnp.asarray(mid))
    tabt = tabt.at[34:51].set(jnp.asarray(lo))

    # fuse_fetch folds the attribute fetch into the minarg kernel
    # (valid when the table is one tt block). Measured on v5e cornell
    # 1080p: 69.6 vs 70.7 Mrays/s for the two-kernel form — the
    # separate refine overlaps better with the minarg grid, so the
    # fusion is OPT-IN, kept for callers that want one launch.
    fused = fuse_fetch and tpad == tt_eff

    def intersect(rays: Rays) -> Hits:
        r = rays.p[0].shape[0]
        rpad = _round_up(r, tr)
        rays8 = pack_rays(rays.p, rays.d, rpad)
        if fused:
            t_, nx, ny, nz, m = _run_minarg_fused(
                rays8, tri_pack, tabt, tr, chunk, interpret,
            )
        else:
            t1, g1 = _run_minarg(rays8, tri_pack, tr, tt_eff,
                                 interpret, chunk)
            t_, nx, ny, nz, m = _run_refine1(
                rays8, t1, g1, tabt, tr, interpret,
            )
        best_t = t_[0, :r]
        any_hit = best_t > 0.0
        z = jnp.zeros_like(best_t)
        safe_t = jnp.where(any_hit, best_t, 0.0)
        hit_p = tuple(
            jnp.where(any_hit, rays.p[k] + rays.d[k] * safe_t, z)
            for k in range(3)
        )
        hits = Hits(
            t=best_t,
            p=hit_p,
            n=(nx[0, :r], ny[0, :r], nz[0, :r]),
            mati=jnp.where(any_hit, m[0, :r], 0.0).astype(jnp.int32),
        )
        if not with_ids:
            return hits
        ids = jnp.where(any_hit, g1[0, :r], -1.0).astype(jnp.int32)
        return hits, ids

    # Note: sphere/smooth kernel makers share intersect_kernel.
    # assemble_hits for this block; this copy stays inline because the
    # with_ids branch reuses any_hit/g1 locals.
    return intersect


def _minarg_fused_kernel(ray_ref, tri_ref, tabt_ref, t_ref, nx_ref,
                         ny_ref, nz_ref, m_ref, *, chunk: int):
    """Single-pass minarg + in-kernel attribute fetch.

    Valid when the whole triangle table is one tt block (tpad == tt,
    the Cornell-class case): the winner index is final at the end of
    the chunk loop, so the one-hot 3-split fetch runs in the same
    kernel and the separate refine pass (its launch + rays/t1/g1 HBM
    round-trip, ~1-1.5 ms of the 3.5 ms refine cost at 2M lanes) is
    saved. Math is bit-identical to _run_minarg + _run_refine1."""
    tt = tri_ref.shape[0]
    rays = ray_ref[:]
    px, py, pz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    best_t = None
    best_g = None
    for c0 in range(0, tt, chunk):
        cc = min(chunk, tt - c0)
        tri = tri_ref[c0:c0 + cc, :]

        def col(k, tri=tri):
            return tri[:, k:k + 1]

        def pd_dots(base, tri=tri):
            def c(k):
                return tri[:, k:k + 1]
            vx, vy, vz = c(base), c(base + 1), c(base + 2)
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
        g1 = (c0 + a1).astype(jnp.float32)
        if c0 == 0:
            best_t, best_g = m1, g1
        else:
            bet = m1 < best_t
            best_t = jnp.where(bet, m1, best_t)
            best_g = jnp.where(bet, g1, best_g)

    tpad = tabt_ref.shape[1]
    tiota = jax.lax.broadcasted_iota(jnp.int32, (tpad, 1), 0)
    gi = best_g[None, :].astype(jnp.int32)
    onehot = jnp.where(tiota == gi, 1.0, 0.0).astype(jnp.bfloat16)
    rows3 = jax.lax.dot_general(
        tabt_ref[:], onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rows = rows3[0:17] + rows3[17:34] + rows3[34:51]
    miss = ~(best_t < BIG)
    t_ref[0, :] = jnp.where(miss, -1.0, best_t)
    nx_ref[0, :] = rows[0, :]
    ny_ref[0, :] = rows[1, :]
    nz_ref[0, :] = rows[2, :]
    m_ref[0, :] = rows[16, :]


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _run_minarg_fused(rays8, tri_pack, tabt, tr: int, chunk: int,
                      interpret: bool):
    rpad = rays8.shape[1]
    tpad = tri_pack.shape[0]
    outs = pl.pallas_call(
        functools.partial(_minarg_fused_kernel, chunk=chunk),
        grid=(rpad // tr,),
        in_specs=[
            pl.BlockSpec((8, tr), lambda rt: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpad, 24), lambda rt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, tpad), lambda rt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tr), lambda rt: (0, rt),
                                memory_space=pltpu.VMEM)] * 5,
        out_shape=[jax.ShapeDtypeStruct((1, rpad), jnp.float32)] * 5,
        interpret=interpret,
    )(rays8, tri_pack, tabt)
    return outs


def _refine1_kernel(ray_ref, t1_ref, g1_ref, tabt_ref,
                    t_ref, nx_ref, ny_ref, nz_ref, m_ref):
    """Single-candidate attribute fetch for make_minarg_intersect: the
    winner already passed the EXACT in-kernel test, so no validity
    re-check and no second candidate — one one-hot matmul."""
    rays = ray_ref[:]
    tpad = tabt_ref.shape[1]
    tiota = jax.lax.broadcasted_iota(jnp.int32, (tpad, 1), 0)
    gi = g1_ref[0:1, :].astype(jnp.int32)
    onehot = jnp.where(tiota == gi, 1.0, 0.0).astype(jnp.bfloat16)
    rows3 = jax.lax.dot_general(
        tabt_ref[:], onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rows = rows3[0:17] + rows3[17:34] + rows3[34:51]
    t1 = t1_ref[0, :]
    miss = ~(t1 < BIG)
    t_ref[0, :] = jnp.where(miss, -1.0, t1)
    nx_ref[0, :] = rows[0, :]
    ny_ref[0, :] = rows[1, :]
    nz_ref[0, :] = rows[2, :]
    m_ref[0, :] = rows[16, :]


@functools.partial(jax.jit, static_argnums=(4, 5))
def _run_refine1(rays8, t1, g1, tabt, tr: int, interpret: bool):
    rpad = rays8.shape[1]
    tpad = tabt.shape[1]
    outs = pl.pallas_call(
        _refine1_kernel,
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
        ],
        out_specs=[pl.BlockSpec((1, tr), lambda rt: (0, rt),
                                memory_space=pltpu.VMEM)] * 5,
        out_shape=[jax.ShapeDtypeStruct((1, rpad), jnp.float32)] * 5,
        interpret=interpret,
    )(rays8, t1, g1, tabt)
    return outs
