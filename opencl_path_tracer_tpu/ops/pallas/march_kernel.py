"""Block-march intersector for large scenes: sorted ray blocks walk
per-block nearest-first cluster lists with MXU Plucker tests.

Round-2's pair-v4 pipeline is exact but spends ~50% of its step in
per-escalation infrastructure (prefix sorts, gathers, scatter-merges
that cost ~100 ms per call at 1M scale and do not fuse) and its
per-ray certificate march still tests mean 8.7 clusters x 512 tris
per ray (docs/BENCHMARKS.md forensics) on the 47-60 Gt/s VPU kernel.
This module replaces the per-RAY march with a per-BLOCK march:

 1. Lanes are sorted once per step by (direction octant, origin
    morton) — measured on the real steady-state wavefront this makes
    block-level cluster unions ~4x the per-lane optimum instead of
    ~35x (tile-major order mixes bounce depths; see
    docs/BENCHMARKS.md round-3 forensics).
 2. A slab pass ranks, per TR-lane block, the clusters any lane still
    needs (entry < the lane's current-best t), nearest block-entry
    first.
 3. The march kernel runs a flat (B, K) work-list grid: visit u of
    block b DMAs cluster clist[b,K+u]'s constant packs (via
    scalar-prefetch-driven BlockSpec index maps — the block-sparse
    matmul pattern) and tests all TR lanes against its cs triangles
    with the Plucker-MXU form (bf16 hi/lo edge tests + exact f32 t,
    plucker_kernel.py). Winner candidates are exact-validated
    IN-VISIT via a cluster-local one-hot constant fetch; if any lane's
    top-2 are both spurious, a pl.when fallback re-runs the whole
    (cluster x block) with the fused kernel's EXACT f32 expression —
    so every visit's merged result is bit-identical to what the dense
    kernel would produce for those triangles. Degraded cost on
    silhouette-band visits, never degraded correctness.
 4. Lanes whose needed clusters were not all visited (the capped
    round-1 misses deep/mixed blocks) are compacted and re-marched
    (round 2); any residue falls to an exhaustive dense tail loop —
    the same unconditional-progress net as pair v4.

Exactness reference: the fused f32 kernel over the CLUSTER-ORDERED
triangle array (this module's canonical order; a permutation of the
scene changes only tie-breaking among bitwise-equal hits).
Reference anchor: prog.cl:144-184 — the kd-traversal exists to make
big scenes interactive; this is its TPU-shaped equivalent.

STATUS: the composed single-jit program is BIT-EXACT vs the dense
kernel on the full 2M-ray steady-state stress workload (0 t/mati/
normal flips, measured post-fix on v5e). Round 3's deterministic
~4% wrong-hit "heisenbug" was XLA:TPU's BFloat16Propagation pass
demoting the f32 Plucker feature math to bf16 whenever plucker_feat
was fused into the surrounding program (see
plucker_kernel._split_bf16_exact) — which silently voided the
conservative-accept eps bounds (false REJECTS of true winners whose
near-duplicate neighbors then resolved as "confirmed miss" without a
pend flag). The fix computes the hi/lo split in integer bit
arithmetic so no f32 op has a bf16-convert consumer; every
composition-level workaround that guessed at other causes
(identity-copy materialization of kernel operands, scene/input
optimization barriers) has been removed again. Stable sorts and the
clist-derived visited set are kept: they are required for
determinism wherever downstream logic reasons about a tie-heavy
permutation.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Hits, Rays
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    BIG, _round_up, build_tri_pack, make_pallas_intersect, pack_rays,
)
from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
    EPS_SCALE, plucker_feat,
)


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields,
                                     meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class MarchScene:
    """Cluster-ordered scene constants for the march kernel."""

    trig: jnp.ndarray      # (3*T', 32) bf16 plucker rows, cluster-major
    tric: jnp.ndarray      # (T', 24) f32 tri_pack + eps in cols 17..19
    tab3: jnp.ndarray      # (64, T') bf16 3-split constants (refine)
    boxes_lo: jnp.ndarray  # (C, 3) f32
    boxes_hi: jnp.ndarray  # (C, 3) f32
    scene_lo: jnp.ndarray  # (3,) f32 scene AABB for morton keys
    scene_inv: jnp.ndarray  # (3,) f32 1/extent


def build_march_scene(tris: TrianglesSoA, cs: int = 512,
                      with_order: bool = False):
    """Morton-cluster the triangles (large ones quarantined into the
    leading clusters, cluster_kernel.build_clusters policy) and build
    every constant pack in CLUSTER-MAJOR triangle order.

    Returns (scene, reordered_tris, C). reordered_tris is the
    canonical order for exactness comparisons. with_order=True appends
    the (t_count,) int32 permutation: cluster-ordered row j holds
    input triangle order[j] (the id map for with_ids reporting)."""
    t_count = int(tris.count)
    C = max(1, -(-t_count // cs))
    total = C * cs

    r1 = np.asarray(tris.r1)
    r2 = np.asarray(tris.r2)
    r3 = np.asarray(tris.r3)
    lo = np.minimum(np.minimum(r1, r2), r3)
    hi = np.maximum(np.maximum(r1, r2), r3)
    mid = (r1 + r2 + r3) / 3.0
    scene_lo = lo.min(0)
    extent = np.maximum(hi.max(0) - scene_lo, 1e-9)

    from opencl_path_tracer_tpu.accel.lbvh import morton3
    codes = np.asarray(morton3(jnp.asarray(
        (mid - scene_lo) / extent, jnp.float32)))
    diag = np.linalg.norm(hi - lo, axis=1)
    scene_diag = float(np.linalg.norm(hi.max(0) - lo.min(0)))
    codes = np.where(diag > 0.25 * scene_diag,
                     np.uint32(0), codes | np.uint32(1 << 30))
    order = np.argsort(codes, kind="stable").astype(np.int32)

    # Padding triangles: repeat index 0 but mark degenerate later via
    # n = 0 rows in the packs (build_tri_pack pads with zeros itself).
    rt = TrianglesSoA.build(
        r1[order], r2[order], r3[order],
        np.asarray(tris.mati)[order],
        n=np.asarray(tris.n)[order],
    )

    # Plucker packs, chunk = cs so cluster c's rows are contiguous.
    from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
        build_plucker_packs,
    )
    trig, tric8, tpad = build_plucker_packs(rt, chunk=cs, tt=cs)
    assert tpad == total or tpad >= total, (tpad, total)

    # Full production constants (+ eps cols) in the same order.
    tab = np.asarray(build_tri_pack(rt, cs))
    if tab.shape[0] < tpad:
        tab = np.concatenate(
            [tab, np.zeros((tpad - tab.shape[0], 24), np.float32)]
        )
    tric = tab.copy()
    # Two-part conservative eps per edge: accept iff
    #   E_k >= -(epsA_k * m_lane + epsB_k),
    # m_lane = max |(P x D)_i| of the lane (computed in-kernel).
    # A global Pmax bound is inflated ~10x by far scene corners (the
    # stress floor spans +-10000 while real ray origins stay in the
    # sealed box), which widened the spurious band enough to trigger
    # the exact fallback on a third of visits; the per-lane bound
    # tracks each ray's true feature magnitude instead.
    n64 = tab[:, 0:3].astype(np.float64)
    c064 = tab[:, 3].astype(np.float64)
    for k in range(3):
        m64 = tab[:, 4 + 4 * k:7 + 4 * k].astype(np.float64)
        d64 = tab[:, 7 + 4 * k].astype(np.float64)
        wc = np.cross(m64, n64)
        wd = c064[:, None] * m64 - d64[:, None] * n64
        live = np.abs(n64).sum(1) > 0
        epsA = EPS_SCALE * np.abs(wc).sum(1) * 1.01
        epsB = EPS_SCALE * np.abs(wd).sum(1) * 1.01
        tric[:, 17 + k] = np.where(live, epsA, 1e-30)
        tric[:, 20 + k] = np.where(live, epsB, 1e-30)
    # 3-split refine table (17 constants).
    t17 = tab[:, :17].T
    hi_ = np.asarray(jnp.asarray(t17).astype(jnp.bfloat16))
    m_ = np.asarray(
        jnp.asarray(t17 - hi_.astype(np.float32)).astype(jnp.bfloat16)
    )
    lo_ = np.asarray(jnp.asarray(
        t17 - hi_.astype(np.float32) - m_.astype(np.float32)
    ).astype(jnp.bfloat16))
    assert (hi_.astype(np.float64) + m_.astype(np.float64)
            + lo_.astype(np.float64) == t17.astype(np.float64)).all()
    tab3 = np.zeros((64, tpad), np.float32)
    tab3[0:17] = hi_.astype(np.float32)
    tab3[17:34] = m_.astype(np.float32)
    tab3[34:51] = lo_.astype(np.float32)

    # Cluster AABBs over the reordered triangles (pad rows huge-empty).
    r1o, r2o, r3o = r1[order], r2[order], r3[order]
    tlo = np.minimum(np.minimum(r1o, r2o), r3o)
    thi = np.maximum(np.maximum(r1o, r2o), r3o)
    pad = total - t_count
    if pad:
        tlo = np.concatenate([tlo, np.full((pad, 3), np.inf)])
        thi = np.concatenate([thi, np.full((pad, 3), -np.inf)])
    blo = tlo.reshape(C, cs, 3).min(1)
    bhi = thi.reshape(C, cs, 3).max(1)
    # INFLATE the boxes: they are exact hulls, so hits on the
    # hull-defining triangles lie exactly ON the box surface, where
    # the slab test's result is at the mercy of float noise —
    # including FMA-contraction differences between compilations (the
    # round-3 composed-vs-staged divergence: a slab false-negative on
    # the TRUE cluster silently certifies a wrong miss/far-hit).
    # Conservative inflation only ever adds candidate visits.
    diag = np.linalg.norm(
        np.where(np.isfinite(bhi - blo), bhi - blo, 0.0), axis=1,
        keepdims=True,
    )
    delta = 1e-4 * diag + 1e-3
    blo = np.where(np.isfinite(blo), blo - delta, blo)
    bhi = np.where(np.isfinite(bhi), bhi + delta, bhi)

    scene = MarchScene(
        trig=jnp.asarray(trig),
        tric=jnp.asarray(tric),
        tab3=jnp.asarray(tab3).astype(jnp.bfloat16),
        boxes_lo=jnp.asarray(blo, jnp.float32),
        boxes_hi=jnp.asarray(bhi, jnp.float32),
        scene_lo=jnp.asarray(scene_lo, jnp.float32),
        scene_inv=jnp.asarray(1.0 / extent, jnp.float32),
    )
    if with_order:
        return scene, rt, C, order
    return scene, rt, C


def _march_kernel(clist_ref, rays_ref, feat_ref, trig_ref, tric_ref,
                  tab3_ref, t_ref, nx_ref, ny_ref, nz_ref, m_ref,
                  g_ref, p_ref, acc_ref, *, cs: int, K: int, tr: int):
    """One (block b, visit u) grid step; outputs accumulate over u.

    Branch-free except the first-visit init: round-3 on-TPU debugging
    showed wrong hits whenever merge writes sat under nested pl.when
    (interpret mode was exact; Mosaic's conditional-write lowering was
    not trustworthy here), so dummy visits (cid < 0) simply merge with
    found=False and the both-spurious case sets a PENDING flag row that
    the orchestrator routes to the dense tail instead of an in-kernel
    exact fallback."""
    u = pl.program_id(1)
    b = pl.program_id(0)
    cid = clist_ref[b * K + u]

    # Running best lives in VMEM SCRATCH and is written to the outputs
    # once, at the last visit: the output-block revisit pattern
    # (index_map ignoring u) plus a scalar-prefetch grid proved
    # unreliable at scale in round 3 and scratch accumulation is the
    # canonical Mosaic idiom anyway.
    @pl.when(u == 0)
    def _():
        acc_ref[0, :] = jnp.full((tr,), BIG, jnp.float32)
        acc_ref[1, :] = jnp.zeros((tr,), jnp.float32)
        acc_ref[2, :] = jnp.zeros((tr,), jnp.float32)
        acc_ref[3, :] = jnp.zeros((tr,), jnp.float32)
        acc_ref[4, :] = jnp.zeros((tr,), jnp.float32)
        acc_ref[5, :] = jnp.zeros((tr,), jnp.float32)
        acc_ref[6, :] = jnp.zeros((tr,), jnp.float32)

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
    # Per-lane adaptive eps: m = max |(P x D)_i| for this lane.
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

    @pl.when(u == K - 1)
    def _():
        t_ref[0, :] = acc_ref[0, :]
        nx_ref[0, :] = acc_ref[1, :]
        ny_ref[0, :] = acc_ref[2, :]
        nz_ref[0, :] = acc_ref[3, :]
        m_ref[0, :] = acc_ref[4, :]
        g_ref[0, :] = acc_ref[5, :]
        p_ref[0, :] = acc_ref[6, :]


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _run_march(clist, rays8s, feat, scene: MarchScene, cs: int,
               K: int, tr: int, interpret: bool):
    """clist: (B*K,) i32 (-1 = dummy); rays8s/feat sorted, (8|32, N)."""
    n = rays8s.shape[1]
    B = n // tr
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, K),
        in_specs=[
            pl.BlockSpec((8, tr), lambda b, u, s: (0, b)),
            pl.BlockSpec((32, tr), lambda b, u, s: (0, b)),
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
        ] * 7,
        scratch_shapes=[pltpu.VMEM((7, tr), jnp.float32)],
    )
    outs = pl.pallas_call(
        functools.partial(_march_kernel, cs=cs, K=K, tr=tr),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, n), jnp.float32)] * 7,
        interpret=interpret,
    )(clist, rays8s, feat, scene.trig, scene.tric, scene.tab3)
    return outs


def _slab_entries(rays8s, scene: MarchScene, best_t):
    """(C, N) entry distances (BIG when the slab test fails) and the
    per-lane NEED mask (passes and could still beat best_t).

    GUARDED slab: a culling test must be conservative, and the naive
    division form yields 0/0 = NaN when a ray's direction component is
    exactly zero and its origin sits on the box plane — the NaN reads
    as "miss", silently dropping clusters the ray genuinely hits
    (round-2 rule, sorted_intersect._perray_slab). Axis handled by
    containment when d == 0."""
    lo = scene.boxes_lo
    hi = scene.boxes_hi
    C = lo.shape[0]
    nn = rays8s.shape[1]
    tn = jnp.full((C, nn), -BIG, jnp.float32)
    tm = jnp.full((C, nn), BIG, jnp.float32)
    for axi in range(3):
        p = rays8s[axi][None, :]            # (1, N)
        d = rays8s[3 + axi][None, :]
        bl = lo[:, axi][:, None]            # (C, 1)
        bh = hi[:, axi][:, None]
        d0 = d == 0.0
        inv = 1.0 / jnp.where(d0, 1.0, d)
        t1 = (bl - p) * inv
        t2 = (bh - p) * inv
        lo_ax = jnp.minimum(t1, t2)
        hi_ax = jnp.maximum(t1, t2)
        inside = (p >= bl) & (p <= bh)
        lo_ax = jnp.where(d0, jnp.where(inside, -BIG, BIG), lo_ax)
        hi_ax = jnp.where(d0, jnp.where(inside, BIG, -BIG), hi_ax)
        tn = jnp.maximum(tn, lo_ax)
        tm = jnp.minimum(tm, hi_ax)
    ok = (tm >= tn) & (tm >= 0)
    ent = jnp.where(ok, jnp.maximum(tn, 0.0), BIG)
    need = ok & (ent < best_t[None, :])
    return ent, need


def _block_lists(ent, need, tr: int, K: int):
    """Per-TR-block nearest-first cluster list, capped at K.

    Returns clist (B*K,) i32 with -1 dummies. The VISITED set used
    for certification must be derived from this exact tensor (see
    _visited_from): the block-entry argsort has heavy ties (many
    clusters at entry 0), and under a single surrounding jit XLA can
    rematerialize the sort with a different tie order for a second
    consumer — a visited matrix computed from a separate sort
    evaluation then disagrees with the list the kernel actually
    visited, which certified lanes whose nearest cluster was never
    tested (round-3 forensics: exact when staged, 2-4% wrong hits
    when composed, varying per compile)."""
    C, n = ent.shape
    B = n // tr
    entb = ent.reshape(C, B, tr)
    needb = need.reshape(C, B, tr)
    block_any = needb.any(axis=2)
    block_ent = jnp.where(block_any, entb.min(axis=2), BIG)
    order = jnp.argsort(block_ent, axis=0)          # (C, B)
    k = min(K, C)
    topk = order[:k]                                 # (k, B)
    ranked_any = jnp.take_along_axis(block_any, topk, axis=0)
    clist = jnp.where(ranked_any, topk, -1).astype(jnp.int32)
    if k < K:
        clist = jnp.concatenate(
            [clist, jnp.full((K - k, B), -1, jnp.int32)], axis=0
        )
    return clist.T.reshape(-1)


def make_march_intersect(tris: TrianglesSoA, *, cs: int = 512,
                         tr: int = 512, K1: int = 24, K2: int = 64,
                         tail: int = 16384, interpret: bool = False,
                         debug: bool = False):
    """Returns (intersect(rays) -> Hits, reordered_tris).

    Hits equal `pallas_first_intersect` over reordered_tris bit for
    bit (tie-break order follows the cluster-major triangle order).
    Rounds: capped block march (K1) -> compacted re-march (K2) ->
    exhaustive dense tail (unconditional-progress net)."""
    scene, rt, C = build_march_scene(tris, cs)
    tail_isect = make_pallas_intersect(rt, interpret=interpret)

    def intersect(rays: Rays) -> Hits:
        scene_b = scene
        r = rays.p[0].shape[0]
        rpad = _round_up(r, tr)
        rays8 = pack_rays(rays.p, rays.d, rpad)

        # ---- sort lanes by (octant, origin morton) ----
        from opencl_path_tracer_tpu.models.wavefront import (
            morton3_components,
        )
        q = tuple(
            jnp.clip((rays8[k] - scene_b.scene_lo[k])
                     * scene_b.scene_inv[k], 0.0, 1.0)
            for k in range(3)
        )
        cell = morton3_components(q)
        octant = (
            (rays8[3] >= 0).astype(jnp.uint32) * 4
            + (rays8[4] >= 0).astype(jnp.uint32) * 2
            + (rays8[5] >= 0).astype(jnp.uint32)
        )
        skey = (octant << jnp.uint32(27)) | (cell >> jnp.uint32(3))
        iota = jnp.arange(rpad, dtype=jnp.int32)
        # DETERMINISTIC permutation required: skey has heavy ties
        # (coarse morton cells), and a tie-arbitrary sort
        # rematerialized by XLA for a second consumer can produce a
        # DIFFERENT tie order — the certification then reasons about
        # a different lane permutation than the kernel marched
        # (round-3 forensics). The (skey, iota) compound key is a
        # TOTAL order, so this num_keys=2 unstable sort computes
        # exactly the stable-by-skey permutation — while dodging the
        # stable-sort compile-time cliff (docs/BENCHMARKS.md).
        srt = jax.lax.sort([skey, iota] + [rays8[k] for k in range(6)],
                           num_keys=2, is_stable=False)
        order_l = srt[1]
        rays8s = jnp.stack(
            list(srt[2:]) + [jnp.zeros((rpad,), jnp.float32)] * 2
        )
        order_l, rays8s = jax.lax.optimization_barrier(
            (order_l, rays8s))
        feat = plucker_feat(rays8s)

        best = (
            jnp.full((rpad,), BIG, jnp.float32),    # t
            jnp.zeros((rpad,), jnp.float32),        # nx
            jnp.zeros((rpad,), jnp.float32),        # ny
            jnp.zeros((rpad,), jnp.float32),        # nz
            jnp.zeros((rpad,), jnp.float32),        # mati
            jnp.zeros((rpad,), jnp.float32),        # g (tie-break)
        )

        def merge(best, outs):
            t, nx, ny, nz, m, g = (o[0] for o in outs)
            ot, og = best[0], best[5]
            bet = (t < ot) | ((t == ot) & (g < og))
            return tuple(
                jnp.where(bet, new, old)
                for new, old in zip((t, nx, ny, nz, m, g), best)
            )

        # ---- round 1: capped block march ----
        ent, need = _slab_entries(rays8s, scene_b, best[0])
        clist = _block_lists(ent, need, tr, K1)
        # Under a single surrounding jit the composed program produced
        # wrong hits on ~2-4% of lanes while the SAME stages run as
        # separate jits were bit-exact (round-3 TPU forensics,
        # deterministic per compile, varying per compile) — an XLA
        # fusion/layout interaction with the scalar-prefetch
        # pallas_call operands. The barrier forces plain
        # materialization of the kernel inputs.
        cl2d, rays8s_b, feat_b = _pallas_materialize(
            clist, rays8s, feat, tr, interpret)
        clist = cl2d[0]
        visited = _visited_from(clist, C, K1)
        outs = _run_march(clist, rays8s_b, feat_b, scene_b, cs, K1, tr,
                          interpret)
        best = merge(best, outs[:6])
        pend1 = outs[6][0] > 0.0

        # ---- certification: a lane is resolved iff every cluster
        # that could still beat its best t was in its block's visited
        # set. (need alone is NOT enough: visited clusters with
        # entry < best_t are fine — they were tested.)
        B = rpad // tr
        _, need = _slab_entries(rays8s, scene_b, best[0])
        unc1 = (need.reshape(C, B, tr)
                & ~visited.reshape(C, B, 1)).any(axis=0).reshape(-1)
        # Pending lanes (both top-2 spurious in some visit) may have
        # missed that visit's true winner entirely: unresolved.
        res = ~(unc1 | pend1)
        res1_dbg = res

        # ---- round 2: compacted re-march of the uncertified ----
        u2 = min(max(tr, _round_up(rpad // 4, tr)), rpad)
        srt2 = jax.lax.sort([res.astype(jnp.int32), iota],
                            num_keys=2, is_stable=False)
        idx2 = jax.lax.optimization_barrier(srt2[1][:u2])
        rays2 = jnp.stack([rays8s[k][idx2] for k in range(6)]
                          + [jnp.zeros((u2,), jnp.float32)] * 2)
        feat2 = plucker_feat(rays2)
        ent2, need2 = _slab_entries(rays2, scene_b, best[0][idx2])
        clist2 = _block_lists(ent2, need2, tr, K2)
        cl2d2, rays2_b, feat2_b = _pallas_materialize(
            clist2, rays2, feat2, tr, interpret)
        clist2 = cl2d2[0]
        visited2 = _visited_from(clist2, C, K2)
        outs2 = _run_march(clist2, rays2_b, feat2_b, scene_b, cs, K2, tr,
                           interpret)
        sub = tuple(o[0] for o in outs2[:6])
        pend2 = outs2[6][0] > 0.0
        old = tuple(b[idx2] for b in best)
        bet = (sub[0] < old[0]) | ((sub[0] == old[0])
                                   & (sub[5] < old[5]))
        merged = tuple(jnp.where(bet, s, o) for s, o in zip(sub, old))
        best = tuple(b.at[idx2].set(m) for b, m in zip(best, merged))

        # Coverage for round-2 lanes = round-2 visits UNION their
        # round-1 block's visits (without the union, clusters already
        # tested in round 1 but absent from round 2's list read as
        # "unvisited" and ~16% of lanes leaked into the dense tail —
        # ~20 extra tail iterations per step).
        B2 = u2 // tr
        b1_of = idx2 // tr                               # (u2,)
        vis1 = jnp.take(visited, b1_of, axis=1)          # (C, u2)
        vis2 = jnp.repeat(visited2, tr, axis=1)[:, :u2]  # (C, u2)
        unc2 = (need2 & ~vis1 & ~vis2).any(axis=0)
        res = res.at[idx2].set(res[idx2] | ~(unc2 | pend2))

        # ---- unconditional dense tail (exhaustive, loops to empty:
        # capacity overflow and K2-overflow lanes land here) ----
        u4 = min(tail, rpad)

        def cond(carry):
            _, resolved = carry
            return jnp.any(~resolved)

        def body2(carry):
            best, resolved = carry
            srt3 = jax.lax.sort(
                [resolved.astype(jnp.int32), iota], num_keys=2,
                is_stable=False,
            )
            idx = srt3[1][:u4]
            sr = Rays(
                p=tuple(rays8s[k][idx] for k in range(3)),
                d=tuple(rays8s[k][idx] for k in range(3, 6)),
            )
            ht = tail_isect(sr)
            newt = jnp.where(ht.valid, ht.t, BIG)
            news = (newt, ht.n[0], ht.n[1], ht.n[2],
                    ht.mati.astype(jnp.float32),
                    jnp.zeros_like(newt))
            # The dense result over ALL triangles is canonical for
            # these lanes (march hits are a subset: dense.t <= march.t
            # always, and on ties dense picks the canonical winner) —
            # assign, don't merge. Prefix-padding lanes just get their
            # canonical answer recomputed.
            best = tuple(
                b.at[idx].set(m) for b, m in zip(best, news)
            )
            return best, resolved.at[idx].set(True)

        res_pre_tail = res
        best_pre_tail_t = best[0]
        best, res = jax.lax.while_loop(cond, body2, (best, res))

        # ---- unsort ----
        inv = jnp.zeros((rpad,), jnp.int32).at[order_l].set(iota)
        rows = tuple(b[inv][:r] for b in best)
        bt, nx, ny, nz, m, _g = rows
        any_hit = bt < BIG
        z = jnp.zeros_like(bt)
        safe_t = jnp.where(any_hit, bt, 0.0)
        hit_p = tuple(
            jnp.where(any_hit, rays.p[k] + rays.d[k] * safe_t, z)
            for k in range(3)
        )
        hits = Hits(
            t=jnp.where(any_hit, bt, -1.0),
            p=hit_p,
            n=(nx, ny, nz),
            mati=jnp.where(any_hit, m, 0.0).astype(jnp.int32),
        )
        if debug:
            return hits, dict(
                res_pre_tail=res_pre_tail, order_l=order_l,
                best_pre_tail_t=best_pre_tail_t,
                best_sorted_t=best[0], res1=res1_dbg,
                idx2=idx2, unc2=unc2, pend2=pend2, pend1=pend1,
            )
        return hits

    return intersect, rt


def _pallas_materialize(clist, rays8s, feat, tr: int,
                        interpret: bool):
    """Identity copy through a trivial pallas_call.

    jax.lax.optimization_barrier did NOT stop the composed-program
    corruption of the march kernel's operands, but returning them as
    jit outputs did (NOTES_NEXT_ROUND.md diagnosis). A pallas custom
    call is opaque to XLA, so its operands and results must be
    materialized with standard layouts — the same effect, in-graph."""
    n = rays8s.shape[1]
    L = clist.shape[0]

    def copy3(c_ref, r_ref, f_ref, co_ref, ro_ref, fo_ref):
        co_ref[:] = c_ref[:]
        ro_ref[:] = r_ref[:]
        fo_ref[:] = f_ref[:]

    return pl.pallas_call(
        copy3,
        grid=(n // tr,),
        in_specs=[
            pl.BlockSpec((1, L), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tr), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, tr), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tr), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, tr), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, L), clist.dtype),
            jax.ShapeDtypeStruct((8, n), rays8s.dtype),
            jax.ShapeDtypeStruct((32, n), feat.dtype),
        ],
        interpret=interpret,
    )(clist[None, :], rays8s, feat)


def _visited_from(clist: jnp.ndarray, C: int, K: int) -> jnp.ndarray:
    """(C, B) visited mask derived from the SAME clist tensor the
    kernel consumes — the only construction that cannot disagree with
    the actual visits (see _block_lists docstring)."""
    B = clist.shape[0] // K
    cl2 = clist.reshape(B, K)
    return (cl2[None, :, :] == jnp.arange(C)[:, None, None]
            ).any(axis=2)
