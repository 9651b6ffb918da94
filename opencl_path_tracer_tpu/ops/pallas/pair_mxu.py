"""MXU pairs round for the pair-expansion intersector (pair v5).

Round-3 forensics (docs/BENCHMARKS.md "Why the stress workload costs
what it costs"): pair v4 spends ~190 ms/step in `_pair_kernel`, a pure
VPU kernel running the m_k triangle test at ~47 Gtests/s — while the
march/flat kernels run the SAME test as a bf16 Plucker matmul on the
MXU with an exact-f32 t tail at ~78 Gtests/s. This module swaps the
pairs-round compute onto that proven path:

  * pairs are cluster-sorted exactly as in v4 (`sorted_intersect.
    _pairs_round`), but the kernel is a VISIT-LIST grid instead of a
    while-loop-with-DMA: visit v tests tile vb[v] against cluster
    vc[v], with the cluster's Plucker/refine blocks fetched by
    scalar-prefetch BlockSpecs (Pallas double-buffers them; v4's
    in-kernel DMA waits serialized ~100 KB per run).
  * the visit list is runs ∪ tile-starts. Because every test result is
    min-merged per pair and later per ray, a tile that spans a run
    boundary simply tests ALL its pairs against BOTH clusters — extra
    coverage only lowers best_t with real hits, so no in-run masking
    is needed and the certificate logic of v4 is untouched.
  * per-visit math is `flat_march._flat_kernel`'s body: conservative
    bf16 edge tests (per-lane adaptive eps from build_march_scene),
    bit-exact f32 t, top-2 + in-kernel exact refine via the 3-split
    one-hot fetch. Lanes whose top-2 are both spurious accepts raise
    a sticky per-ray `pend` flag; the caller keeps such rays
    unresolved until the unconditional dense tail certifies them — the
    same net that already guards capacity overflow, so exactness stays
    unconditional.

Scope: consumed by `sorted_intersect.make_pair_intersect(mxu=True)`.
Reference anchor: /root/reference/prog.cl:94-122 (triangle test) and
:144-184 (kd traversal — the capability this path reimplements as
sorted pair expansion on a SIMD machine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import BIG
from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
    _split_bf16_exact, plucker_feat,
)


DOP_SIGNS = ((1.0, 1.0, 1.0), (1.0, -1.0, 1.0),
             (1.0, 1.0, -1.0), (1.0, -1.0, -1.0))


def build_dops(rt, cs: int, c: int) -> jnp.ndarray:
    """Per-cluster support intervals along the 4 diagonal axes of a
    14-DOP, over the CLUSTER-ORDERED triangles rt (build_march_scene's
    reordered output). Returns (C, 8) f32 [lo0..lo3 | hi0..hi3],
    inflated with the same conservative delta policy as the march
    AABBs (containment of every vertex => the DOP slab entry is a
    valid certificate lower bound). Offline sizing: the 14-DOP cuts
    per-lane certificate need ~20% vs AABBs on the stress wavefront
    (docs/BENCHMARKS.md, scripts/dop_bound_eval.py)."""
    import numpy as np

    r1 = np.asarray(rt.r1)
    r2 = np.asarray(rt.r2)
    r3 = np.asarray(rt.r3)
    total = c * cs
    pad = total - r1.shape[0]
    out = np.zeros((c, 8), np.float32)
    for j, s in enumerate(DOP_SIGNS):
        u = np.asarray(s, np.float64)
        pv = np.stack([r1 @ u, r2 @ u, r3 @ u])          # (3, T)
        plo, phi = pv.min(0), pv.max(0)
        if pad:
            plo = np.concatenate([plo, np.full(pad, np.inf)])
            phi = np.concatenate([phi, np.full(pad, -np.inf)])
        slo = plo.reshape(c, cs).min(1)
        shi = phi.reshape(c, cs).max(1)
        w = np.where(np.isfinite(shi - slo), shi - slo, 0.0)
        delta = 1e-4 * w + 1e-3
        out[:, j] = np.where(np.isfinite(slo), slo - delta, slo)
        out[:, 4 + j] = np.where(np.isfinite(shi), shi + delta, shi)
    return jnp.asarray(out)


def build_visits(keys_s: jnp.ndarray, trp: int, c: int):
    """Cluster-sorted pair keys -> (vb, vc) visit lists.

    keys_s: (Ppad,) i32 ascending, values in [0, c] (c = dummy).
    Returns vb (V,) i32 non-decreasing tile ids and vc (V,) i32
    cluster ids (-1 = skip visit), V = Ppad//trp + c + 1 static.

    Construction: one event per RUN START (cluster c's first pair) and
    one per TILE START (the run covering position b*trp), merged by
    position. Every tile gets >= 1 visit (its covering run's tile
    event), so every output block is initialized and flushed. Empty
    runs and the dummy run emit vc = -1. Built entirely from
    searchsorted on the (c+2)-entry run-start table — no O(P) gathers.
    """
    ppad = keys_s.shape[0]
    b = ppad // trp
    cids = jnp.arange(c + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(keys_s, cids).astype(jnp.int32)  # (c+1,)
    starts_ext = jnp.concatenate(
        [starts, jnp.array([ppad], jnp.int32)]
    )
    cnt = starts_ext[1:] - starts_ext[:-1]                     # (c+1,)
    pe_run = jnp.minimum(starts, ppad - 1)
    ce_run = jnp.where((cnt > 0) & (cids < c), cids, -1)
    tp = jnp.arange(b, dtype=jnp.int32) * trp
    cov = (
        jnp.searchsorted(starts, tp, side="right").astype(jnp.int32)
        - 1
    )
    ce_tile = jnp.where(cov < c, cov, -1)
    pe = jnp.concatenate([pe_run, tp])
    ce = jnp.concatenate([ce_run, ce_tile])
    pe_s, ce_s = jax.lax.sort([pe, ce], num_keys=2)
    return pe_s // trp, ce_s


def _infeat_rows(rays):
    """plucker_feat's (32, T) bf16 rows from (8, T) f32 rays, inline.
    Same integer-bitcast split (no f32->bf16 convert ops — the
    BFloat16Propagation hazard does not apply); the f32 cross product
    may contract to FMA differently than the outside-feat path
    (~2^-24 relative), which the conservative eps band absorbs."""
    px, py, pz = rays[0:1], rays[1:2], rays[2:3]
    dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
    cx = py * dz - pz * dy
    cy = pz * dx - px * dz
    cz = px * dy - py * dx
    phi = jnp.concatenate([cx, cy, cz, dx, dy, dz], axis=0)
    hi, lo = _split_bf16_exact(phi)
    zeros = jnp.zeros((14,) + phi.shape[1:], jnp.bfloat16)
    return jnp.concatenate([hi, lo, hi, zeros], axis=0)


def _pair_visit_core(vb_ref, vc_ref, ray_ref, feat_ref, trig_ref,
                     tric_ref, tab3_ref, out_refs, acc_ref, *, cs: int,
                     V: int, thin: bool):
    """Visit v: test every pair in tile vb[v] against cluster vc[v]
    and min-merge into the tile's running best (VMEM scratch, init =
    miss at the tile's first visit, flushed at its last).

    Body mirrors flat_march._flat_kernel (MXU bf16 Plucker edge tests
    with per-lane adaptive eps, exact f32 t, top-2 + 3-split one-hot
    exact refine, pend on double-spurious) — duplicated rather than
    shared because the two kernels evolve independently and the flat
    kernel initializes from round-0 rows instead of miss rows.

    thin=False flushes 5 streams (t, nx, ny, nz, m*2+pend);
    thin=True flushes 2 (t, g*2+pend with g the cluster-ordered
    global triangle id) — the attributes are recovered once per ray
    at the very end by the same tab3 one-hot fetch this kernel's
    refine uses (fetch_attrs), so values are bit-identical while the
    pair-row back sorts shrink from 6 to 3 operands."""
    v = pl.program_id(0)
    b = vb_ref[v]
    cid = vc_ref[v]
    prev_b = vb_ref[jnp.maximum(v - 1, 0)]
    first = (v == 0) | (prev_b != b)
    nxt_b = vb_ref[jnp.minimum(v + 1, V - 1)]
    last = (v == V - 1) | (nxt_b != b)

    @pl.when(first)
    def _():
        trp = acc_ref.shape[1]
        row = jax.lax.broadcasted_iota(jnp.int32, (8, trp), 0)
        acc_ref[:] = jnp.where(row == 0, BIG, 0.0).astype(jnp.float32)

    @pl.when(cid >= 0)
    def _():
        rays = ray_ref[:]
        px, py, pz = rays[0:1], rays[1:2], rays[2:3]
        dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
        feat = (_infeat_rows(rays) if feat_ref is None
                else feat_ref[:])
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
        ml = jnp.maximum(jnp.maximum(cxa, cya), cza)    # (1, TRP)
        ep1 = col(17) * ml + col(20)
        ep2 = col(18) * ml + col(21)
        ep3 = col(19) * ml + col(22)
        va = (e1d >= -ep1) & (e2d >= -ep2) & (e3d >= -ep3)
        vb_ = (e1d <= ep1) & (e2d <= ep2) & (e3d <= ep3)
        valid = ((pos & va) | (~pos & vb_)) & (t > 0.0)
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
            ).astype(jnp.bfloat16)              # (cs, TRP)
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
        found = v1 | use2
        pend = (~v1) & (~v2) & has2

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

    @pl.when(last)
    def _():
        if thin:
            t_ref, gp_ref = out_refs
            t_ref[0, :] = acc_ref[0, :]
            # g*2 + pend, exact in f32 for g < 2^23 (g < C*cs ~ 2^17).
            gp_ref[0, :] = acc_ref[5, :] * 2.0 + acc_ref[6, :]
        else:
            t_ref, nx_ref, ny_ref, nz_ref, mp_ref = out_refs
            t_ref[0, :] = acc_ref[0, :]
            nx_ref[0, :] = acc_ref[1, :]
            ny_ref[0, :] = acc_ref[2, :]
            nz_ref[0, :] = acc_ref[3, :]
            # pend folded into the material payload (m*2 + pend, exact
            # in f32 for m < 2^22): one fewer back-sort operand at Ppad
            # rows (~1.6 ms per operand per 2M rows) and one fewer
            # output stream.
            mp_ref[0, :] = acc_ref[4, :] * 2.0 + acc_ref[6, :]


def _mk_pair_visit_kernel(cs: int, V: int, thin: bool, infeat: bool):
    """Positional-signature wrapper: Pallas passes refs positionally,
    and the (thin, infeat) combinations differ in input/output arity."""
    n_out = 2 if thin else 5

    def kern(vb_ref, vc_ref, *refs):
        if infeat:
            ray_ref, feat_ref, i = refs[0], None, 1
        else:
            ray_ref, feat_ref, i = refs[0], refs[1], 2
        trig_ref, tric_ref, tab3_ref = refs[i:i + 3]
        out_refs = refs[i + 3:i + 3 + n_out]
        acc_ref = refs[i + 3 + n_out]
        _pair_visit_core(vb_ref, vc_ref, ray_ref, feat_ref, trig_ref,
                         tric_ref, tab3_ref, out_refs, acc_ref, cs=cs,
                         V=V, thin=thin)

    return kern


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _run_pair_visits(vb, vc, rays8p, featp, scene, cs: int, trp: int,
                     interpret: bool, infeat: bool = False,
                     thin: bool = False):
    """rays8p: (8, Ppad) sorted pairs; featp: (32, Ppad) bf16 Plucker
    features of the pair rays (None with infeat=True — the kernel
    computes them per visit from rays8p, trading ~40 VPU ops/pair for
    the whole featp HBM stream). Returns (1, Ppad) rows:
    thin=False — 5: t (BIG = miss), nx, ny, nz, m*2+pend;
    thin=True  — 2: t, g*2+pend (g = cluster-ordered global tri id)."""
    ppad = rays8p.shape[1]
    V = vb.shape[0]
    n_out = 2 if thin else 5
    feat_specs = [] if infeat else [
        pl.BlockSpec((32, trp), lambda v, vb, vc: (0, vb[v])),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(V,),
        in_specs=[
            pl.BlockSpec((8, trp), lambda v, vb, vc: (0, vb[v])),
            *feat_specs,
            pl.BlockSpec(
                (3 * cs, 32),
                lambda v, vb, vc: (jnp.maximum(vc[v], 0), 0),
            ),
            pl.BlockSpec(
                (cs, 24),
                lambda v, vb, vc: (jnp.maximum(vc[v], 0), 0),
            ),
            pl.BlockSpec(
                (64, cs),
                lambda v, vb, vc: (0, jnp.maximum(vc[v], 0)),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, trp), lambda v, vb, vc: (0, vb[v])),
        ] * n_out,
        scratch_shapes=[pltpu.VMEM((8, trp), jnp.float32)],
    )
    kern = _mk_pair_visit_kernel(cs, V, thin, infeat)
    operands = ([vb, vc, rays8p] if infeat
                else [vb, vc, rays8p, featp])
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, ppad), jnp.float32)]
                  * n_out,
        interpret=interpret,
    )(*operands, scene.trig, scene.tric, scene.tab3)
    return outs


def _attr_fetch_kernel(vb_ref, vc_ref, key_ref, loc_ref, tab3_ref,
                       nx_ref, ny_ref, nz_ref, m_ref, acc_ref, *,
                       cs: int, V: int):
    """Visit v: rows of tile vb[v] whose cluster key equals vc[v] get
    their triangle's (nx, ny, nz, m) via the SAME tab3 3-split one-hot
    MXU fetch the pair kernel's exact refine uses — the recovered
    values are bit-identical to what the non-thin kernel streams out.
    Rows of other runs in the tile are masked out of the one-hot (a
    row is served exactly by the visit of its own cluster)."""
    v = pl.program_id(0)
    b = vb_ref[v]
    cid = vc_ref[v]
    prev_b = vb_ref[jnp.maximum(v - 1, 0)]
    first = (v == 0) | (prev_b != b)
    nxt_b = vb_ref[jnp.minimum(v + 1, V - 1)]
    last = (v == V - 1) | (nxt_b != b)

    @pl.when(first)
    def _():
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    @pl.when(cid >= 0)
    def _():
        keys = key_ref[:]                       # (1, TRF) i32
        loc = loc_ref[:]                        # (1, TRF) i32
        mask = keys == cid                      # (1, TRF)
        sub = jax.lax.broadcasted_iota(jnp.int32, (cs, 1), 0)
        onehot = jnp.where(
            (sub == loc) & mask, 1.0, 0.0
        ).astype(jnp.bfloat16)                  # (cs, TRF)
        rows3 = jax.lax.dot_general(
            tab3_ref[:], onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rows = rows3[0:17] + rows3[17:34] + rows3[34:51]
        mk = mask[0, :]
        acc_ref[0, :] = jnp.where(mk, rows[0, :], acc_ref[0, :])
        acc_ref[1, :] = jnp.where(mk, rows[1, :], acc_ref[1, :])
        acc_ref[2, :] = jnp.where(mk, rows[2, :], acc_ref[2, :])
        acc_ref[3, :] = jnp.where(mk, rows[16, :], acc_ref[3, :])

    @pl.when(last)
    def _():
        nx_ref[0, :] = acc_ref[0, :]
        ny_ref[0, :] = acc_ref[1, :]
        nz_ref[0, :] = acc_ref[2, :]
        m_ref[0, :] = acc_ref[3, :]


def fetch_attrs(g, scene, cs: int, c: int, trf: int, interpret: bool):
    """Recover (nx, ny, nz, m) for per-ray winning triangle ids.

    g: (R,) f32/i32 cluster-ordered global tri ids; negative = no
    fetch (row returns zeros). One 3-operand sort groups rays by
    cluster, one visit-list Pallas pass one-hot-fetches from tab3,
    one 5-operand sort returns to ray order — ~3 sorts of bounded
    width replacing the 3 attribute operands that otherwise ride
    EVERY pair-row and escalation back sort (pair v6 'thin' mode)."""
    r = g.shape[0]
    gi = g.astype(jnp.int32)
    rpad = -(-r // trf) * trf
    slot = jnp.arange(rpad, dtype=jnp.int32)
    if rpad != r:
        gi = jnp.concatenate(
            [gi, jnp.full((rpad - r,), -1, jnp.int32)]
        )
    valid = gi >= 0
    cid = jnp.where(valid, gi // cs, c)
    loc = jnp.where(valid, gi - (gi // cs) * cs, 0)
    key_s, slot_s, loc_s = jax.lax.sort([cid, slot, loc], num_keys=1)
    vb, vc = build_visits(key_s, trf, c)
    V = vb.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(V,),
        in_specs=[
            pl.BlockSpec((1, trf), lambda v, vb, vc: (0, vb[v])),
            pl.BlockSpec((1, trf), lambda v, vb, vc: (0, vb[v])),
            pl.BlockSpec(
                (64, cs),
                lambda v, vb, vc: (0, jnp.maximum(vc[v], 0)),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, trf), lambda v, vb, vc: (0, vb[v])),
        ] * 4,
        scratch_shapes=[pltpu.VMEM((4, trf), jnp.float32)],
    )
    outs = pl.pallas_call(
        functools.partial(_attr_fetch_kernel, cs=cs, V=V),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, rpad), jnp.float32)] * 4,
        interpret=interpret,
    )(vb, vc, key_s.reshape(1, -1), loc_s.reshape(1, -1), scene.tab3)
    back = jax.lax.sort(
        [slot_s, outs[0][0], outs[1][0], outs[2][0], outs[3][0]],
        num_keys=1,
    )
    return back[1][:r], back[2][:r], back[3][:r], back[4][:r]


def pairs_round_mxu(comps, ids, scene, c: int, cs: int, trp: int,
                    interpret: bool, infeat: bool = False,
                    thin: bool = False):
    """MXU twin of sorted_intersect._pairs_round. comps: 6 (R,) ray
    component arrays; ids: (L, R) rank-major candidate cluster ids
    (c = none); cs = cluster size of the scene packs. Returns
    ((t, nx, ny, nz, m) per-ray best, pend (R,) bool — some tested
    cluster of the ray ended pend, so its result may be incomplete
    and the ray must stay unresolved). thin=True returns
    ((t, g), pend) instead, g = winning cluster-ordered global tri
    id as f32 (junk on miss rows — the caller's strict-< min-merge
    never consumes it)."""
    l, r = ids.shape
    p = r * l
    keys = ids.reshape(-1)
    expand = [jnp.tile(x, l) for x in comps]
    pslot = jnp.arange(p, dtype=jnp.int32)
    ppad = -(-p // trp) * trp
    if ppad != p:
        keys = jnp.concatenate(
            [keys, jnp.full((ppad - p,), c, keys.dtype)]
        )
        expand = [
            jnp.concatenate([x, jnp.zeros((ppad - p,), x.dtype)])
            for x in expand
        ]
        pslot = jnp.concatenate(
            [pslot, jnp.arange(p, ppad, dtype=jnp.int32)]
        )
    srt = jax.lax.sort([keys, *expand, pslot], num_keys=1)
    keys_s, comps_s, pslot_s = srt[0], srt[1:7], srt[7]
    zeros = jnp.zeros(keys_s.shape, jnp.float32)
    rays8p = jnp.stack([*comps_s, zeros, zeros], axis=0)
    featp = None if infeat else plucker_feat(rays8p)
    vb, vc = build_visits(keys_s, trp, c)
    outs = _run_pair_visits(
        vb, vc, rays8p, featp, scene, cs, trp, interpret, infeat,
        thin,
    )
    if thin:
        t, gp = (o[0] for o in outs)
        back = jax.lax.sort([pslot_s, t, gp], num_keys=1)
        back = [a[:p] for a in back]
        t_lr = back[1].reshape(l, r)
        best = jnp.min(t_lr, axis=0)
        which = jnp.argmin(t_lr, axis=0)
        onehot = (jnp.arange(l, dtype=jnp.int32)[:, None]
                  == which[None, :]).astype(jnp.float32)
        gp_lr = back[2].reshape(l, r)
        pend_lr = gp_lr - 2.0 * jnp.floor(gp_lr / 2.0)
        pend = jnp.max(pend_lr, axis=0) > 0.0
        g_win = jnp.floor(jnp.sum(gp_lr * onehot, axis=0) / 2.0)
        return (best, g_win), pend
    t, nx, ny, nz, mp = (o[0] for o in outs)
    back = jax.lax.sort([pslot_s, t, nx, ny, nz, mp], num_keys=1)
    back = [a[:p] for a in back]
    t_lr = back[1].reshape(l, r)
    best = jnp.min(t_lr, axis=0)
    which = jnp.argmin(t_lr, axis=0)
    onehot = (jnp.arange(l, dtype=jnp.int32)[:, None]
              == which[None, :]).astype(jnp.float32)

    def pick(a):
        return jnp.sum(a.reshape(l, r) * onehot, axis=0)

    # Decode the m*2+pend fold: pend is per-PAIR (any tested cluster
    # of the ray pending), the material comes from the winning pair.
    mp_lr = back[5].reshape(l, r)
    pend_lr = mp_lr - 2.0 * jnp.floor(mp_lr / 2.0)
    pend = jnp.max(pend_lr, axis=0) > 0.0
    m_win = jnp.floor(jnp.sum(mp_lr * onehot, axis=0) / 2.0)
    return (best, pick(back[2]), pick(back[3]), pick(back[4]),
            m_win), pend
