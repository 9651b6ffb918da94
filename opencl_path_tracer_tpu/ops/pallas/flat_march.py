"""Flat work-list march intersector (march v2): exact large-scene
nearest-hit at per-block-need cost instead of fixed-K cost.

Round 3's block-march (march_kernel.py) pays N*K1*cs tests regardless
of need: every block runs exactly K1 visits (dummy visits still test a
full cluster), and deep blocks overflow K1 into an escalation round
plus a ~330k-lane dense tail (measured t1 diag, 2026-08-17). Measured
on the real steady-state stress wavefront, per-lane need is mean 8.7
clusters at cs=512 while the fixed schedule visits 24-88 — a 3-10x
structural waste.

This module replaces the fixed (B, K) grid with a FLAT VISIT LIST:

  round 0  fixed tiny K0 nearest-first block march (march_kernel's
           kernel) — cheap t upper bounds for the ~p50 of lanes whose
           hit lies in their block's first clusters;
  round 1  one (V,) grid Pallas call over the concatenated per-block
           lists of clusters still needed under the r0 bounds
           (slab entry < lane best_t, not already visited in r0).
           Each block pays exactly what its lanes still need.
  tail     the unconditional dense net for pend lanes (in-visit
           both-top2-spurious) and list-capacity overflow.

Exactness (same bar as march_kernel: bit-identical to the dense
kernel over the cluster-ordered triangle array):
  after round 1, every cluster whose inflated-AABB entry is below the
  lane's final t has been tested — unvisited clusters had
  entry >= best_t(r0) >= best_t(final), and cluster boxes are
  conservatively inflated (build_march_scene), so no closer hit can
  hide in them. No certification loop is needed; only pend/overflow
  lanes fall to the tail.

The kernel visits clusters via scalar-prefetch-driven BlockSpecs (the
block-sparse matmul pattern); dummy visits (cid < 0) skip all compute
under a scalar pl.when and are packed at the list tail with constant
index maps so Pallas re-uses the resident blocks instead of re-DMAing.

Designed for the persistent-sorted wavefront: pass presorted=True and
keep lanes in (direction octant, origin Morton) order across steps
with models.wavefront.sort_state (sort_every knob) — the measured
block-union-vs-need waste depends on that order, and sorting inside
every intersect call costs a 2M-lane 8-payload lax.sort (~13 ms).

Reference anchor: /root/reference/prog.cl:144-184 (kd_intersect) —
the traversal exists to make big scenes interactive; this is the
TPU-shaped equivalent (SIMD block culling instead of a per-ray stack).

STATUS (round-3 TPU battery, 2026-08-18): bit-exact in CPU interpret
on every suite workload including capacity starvation, but the
on-device exactness job DIES AT COMPILE on the full 1080p stress
workload — Mosaic prefetches the flat visit list into SMEM and the
2,076,672-byte u8 operand exceeds v5e's 1 MiB SMEM ("Allocation
(size=2076672) would exceed memory (size=1048576), space=smem,
prefetched SMEM operand 0", job e2a). Running the full wavefront
needs the list chunked to <= ~1M entries per call (several grid
programs) or the list demoted to HBM with explicit DMA. Kept as the
measured probe of the flat-list design point (its schedule economics
lost to pair v5 regardless — docs/BENCHMARKS.md, the SIMD traversal
floor); NOT a production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Hits, Rays
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    BIG, _round_up, make_pallas_intersect, pack_rays,
)
from opencl_path_tracer_tpu.ops.pallas.march_kernel import (
    MarchScene, _pallas_materialize, _run_march, _slab_entries,
    _visited_from, build_march_scene,
)
from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import plucker_feat


def _flat_kernel(vb_ref, vc_ref, rays_ref, feat_ref, t0_ref, nx0_ref,
                 ny0_ref, nz0_ref, m0_ref, g0_ref, p0_ref, trig_ref,
                 tric_ref, tab3_ref, t_ref, nx_ref, ny_ref, nz_ref,
                 m_ref, g_ref, p_ref, acc_ref, *, cs: int, tr: int,
                 V: int):
    """One flat visit: block vb[v] tests cluster vc[v] and merges into
    the running best carried in VMEM scratch.

    The scratch accumulator is initialized from the round-0 best rows
    at each block's FIRST visit and flushed to the outputs at its LAST
    visit (vb is non-decreasing, so Pallas flushes each output block
    exactly once). Dummy visits (vc < 0) skip all compute."""
    v = pl.program_id(0)
    b = vb_ref[v]
    cid = vc_ref[v]
    prev_b = vb_ref[jnp.maximum(v - 1, 0)]
    first = (v == 0) | (prev_b != b)
    nxt_b = vb_ref[jnp.minimum(v + 1, V - 1)]
    last = (v == V - 1) | (nxt_b != b)

    @pl.when(first)
    def _():
        acc_ref[0, :] = t0_ref[0, :]
        acc_ref[1, :] = nx0_ref[0, :]
        acc_ref[2, :] = ny0_ref[0, :]
        acc_ref[3, :] = nz0_ref[0, :]
        acc_ref[4, :] = m0_ref[0, :]
        acc_ref[5, :] = g0_ref[0, :]
        acc_ref[6, :] = p0_ref[0, :]

    @pl.when(cid >= 0)
    def _():
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
        t_ref[0, :] = acc_ref[0, :]
        nx_ref[0, :] = acc_ref[1, :]
        ny_ref[0, :] = acc_ref[2, :]
        nz_ref[0, :] = acc_ref[3, :]
        m_ref[0, :] = acc_ref[4, :]
        g_ref[0, :] = acc_ref[5, :]
        p_ref[0, :] = acc_ref[6, :]


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _run_flat(vb, vc, rays8s, feat, best_rows, cs: int, tr: int,
              interpret: bool, scene: MarchScene = None):
    """vb/vc: (V,) i32 visit list (vb non-decreasing, covering every
    block at least once; vc = -1 for dummy visits). best_rows: tuple of
    7 (1, N) f32 rows (t, nx, ny, nz, mati, g, pend) to merge into."""
    n = rays8s.shape[1]
    V = vb.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(V,),
        in_specs=[
            pl.BlockSpec((8, tr), lambda v, vb, vc: (0, vb[v])),
            pl.BlockSpec((32, tr), lambda v, vb, vc: (0, vb[v])),
        ] + [
            pl.BlockSpec((1, tr), lambda v, vb, vc: (0, vb[v]))
        ] * 7 + [
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
            pl.BlockSpec((1, tr), lambda v, vb, vc: (0, vb[v])),
        ] * 7,
        scratch_shapes=[pltpu.VMEM((7, tr), jnp.float32)],
    )
    outs = pl.pallas_call(
        functools.partial(_flat_kernel, cs=cs, tr=tr, V=V),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, n), jnp.float32)] * 7,
        interpret=interpret,
    )(vb, vc, rays8s, feat, *best_rows, scene.trig, scene.tric,
      scene.tab3)
    return outs


def _build_visit_list(bu: jnp.ndarray, Vcap: int):
    """(C, B) bool block-needs -> (vb, vc, vis1, overflow_block).

    vb is non-decreasing and every block gets at least one visit (its
    trailing dummy). Real visits beyond Vcap are dropped; vis1 marks
    which (c, b) actually made the list so the caller can certify.
    Deterministic integer arithmetic only (no sorts, no ties)."""
    C, B = bu.shape
    kb = bu.sum(axis=0).astype(jnp.int32)            # (B,)
    kb1 = kb + 1                                     # +1 dummy/block
    offs = jnp.cumsum(kb1) - kb1                     # (B,)
    rank = (jnp.cumsum(bu.astype(jnp.int32), axis=0)
            - bu.astype(jnp.int32))                  # (C, B)
    pos = offs[None, :] + rank                       # (C, B)
    in_cap = pos < Vcap
    put = bu & in_cap
    flat_pos = jnp.where(put, pos, Vcap)
    cid = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None],
                           (C, B))
    bid = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[None, :],
                           (C, B))
    # Dummy visit per block at offs[b] + kb[b] (may exceed Vcap for
    # late blocks under overflow — those lanes go to the tail anyway).
    dpos = jnp.minimum(offs + kb, Vcap)
    vc = jnp.full((Vcap + 1,), -1, jnp.int32)
    vb = jnp.zeros((Vcap + 1,), jnp.int32)
    vb = vb.at[dpos].set(jnp.arange(B, dtype=jnp.int32))
    vc = vc.at[flat_pos.reshape(-1)].set(cid.reshape(-1))
    vb = vb.at[flat_pos.reshape(-1)].set(bid.reshape(-1))
    vb, vc = vb[:Vcap], vc[:Vcap]
    # Positions past the last used slot: keep vb non-decreasing and
    # constant (= B-1) so Pallas re-uses resident blocks; vc stays -1.
    used = jnp.minimum(offs[B - 1] + kb1[B - 1], Vcap)
    tail_mask = jnp.arange(Vcap) >= used
    vb = jnp.where(tail_mask, B - 1, vb)
    vc = jnp.where(tail_mask, -1, vc)
    vis1 = put
    # A block overflows if its dummy slot didn't fit (=> some of its
    # real visits may have been dropped too late to matter — lanes are
    # certified via vis1 directly, this flag is just diagnostics).
    overflow = (offs + kb) >= Vcap
    return vb, vc, vis1, overflow


def make_flat_march_intersect(tris: TrianglesSoA, *, cs: int = 256,
                              tr: int = 256, K0: int = 4,
                              vcap_frac: float = 0.25,
                              tail: int = 16384,
                              presorted: bool = False,
                              interpret: bool = False,
                              debug: bool = False):
    """Returns (intersect(rays) -> Hits, reordered_tris).

    Hits equal `pallas_first_intersect` over reordered_tris bit for bit.
    presorted=True skips the internal (octant, morton) lane sort and
    unsort — for wavefronts kept in sorted order across steps with
    models.wavefront.sort_state."""
    scene, rt, C = build_march_scene(tris, cs)
    tail_isect = make_pallas_intersect(rt, interpret=interpret)

    def intersect(rays: Rays) -> Hits:
        r = rays.p[0].shape[0]
        rpad = _round_up(r, tr)
        rays8 = pack_rays(rays.p, rays.d, rpad)
        iota = jnp.arange(rpad, dtype=jnp.int32)

        if presorted:
            rays8s = rays8
            order_l = None
        else:
            from opencl_path_tracer_tpu.models.wavefront import (
                morton3_components,
            )
            q = tuple(
                jnp.clip((rays8[k] - scene.scene_lo[k])
                         * scene.scene_inv[k], 0.0, 1.0)
                for k in range(3)
            )
            cell = morton3_components(q)
            octant = (
                (rays8[3] >= 0).astype(jnp.uint32) * 4
                + (rays8[4] >= 0).astype(jnp.uint32) * 2
                + (rays8[5] >= 0).astype(jnp.uint32)
            )
            skey = (octant << jnp.uint32(27)) | (cell >> jnp.uint32(3))
            srt = jax.lax.sort(
                [skey, iota] + [rays8[k] for k in range(6)],
                num_keys=2, is_stable=False,
            )
            order_l = srt[1]
            rays8s = jnp.stack(
                list(srt[2:]) + [jnp.zeros((rpad,), jnp.float32)] * 2
            )
        feat = plucker_feat(rays8s)
        B = rpad // tr

        # ---- round 0: fixed tiny-K nearest-first block march ----
        ent, need = _slab_entries(
            rays8s, scene, jnp.full((rpad,), BIG, jnp.float32)
        )
        clist0 = _nearest_lists(ent, need, tr, K0)
        cl2d, rays8s_b, feat_b = _pallas_materialize(
            clist0, rays8s, feat, tr, interpret)
        clist0 = cl2d[0]
        vis0 = _visited_from(clist0, C, K0)               # (C, B)
        outs0 = _run_march(clist0, rays8s_b, feat_b, scene, cs, K0, tr,
                           interpret)
        best_rows = outs0                                  # 7x (1, N)

        # ---- round 1: flat list of still-needed clusters ----
        _, need1 = _slab_entries(rays8s, scene, outs0[0][0])
        bu = (need1.reshape(C, B, tr).any(axis=2)) & ~vis0
        Vcap = int(_round_up(max(int(rpad * vcap_frac), 4096), 256))
        vb, vc, vis1, ovf = _build_visit_list(bu, Vcap)
        outs1 = _run_flat(vb, vc, rays8s_b, feat_b, best_rows, cs, tr,
                          interpret, scene=scene)
        best = tuple(o[0] for o in outs1[:6])
        pend = outs1[6][0] > 0.0

        # ---- certification: unresolved = pend, or a needed cluster
        # that made neither round's visit set (list overflow), or a
        # whole block whose visits (incl. its flush dummy) fell past
        # Vcap — its output rows were never written. need1 was computed
        # against the r0 bound >= the final t, so visited coverage of
        # need1 certifies the final answer.
        unc = (need1.reshape(C, B, tr)
               & (~vis0 & ~vis1).reshape(C, B, 1)
               ).any(axis=0).reshape(-1)
        unflushed = jnp.repeat(ovf, tr)                   # (rpad,)
        res = ~(unc | pend | unflushed)

        # ---- unconditional dense tail ----
        u4 = min(tail, rpad)

        def cond(carry):
            _, resolved = carry
            return jnp.any(~resolved)

        def body(carry):
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
            best = tuple(
                b.at[idx].set(m) for b, m in zip(best, news)
            )
            return best, resolved.at[idx].set(True)

        best, res = jax.lax.while_loop(cond, body, (best, res))

        # ---- unsort (skipped when presorted) ----
        if order_l is None:
            rows = tuple(b[:r] for b in best)
        else:
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
        return Hits(
            t=jnp.where(any_hit, bt, -1.0),
            p=hit_p,
            n=(nx, ny, nz),
            mati=jnp.where(any_hit, m, 0.0).astype(jnp.int32),
        )

    return intersect, rt


def _nearest_lists(ent, need, tr: int, K: int):
    """Per-TR-block nearest-first cluster list capped at K (march
    round 0). Same construction as march_kernel._block_lists."""
    from opencl_path_tracer_tpu.ops.pallas.march_kernel import (
        _block_lists,
    )
    return _block_lists(ent, need, tr, K)
