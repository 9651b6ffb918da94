"""Sorted-tile group-culling intersectors: the mid-scene lever between
the dense minarg kernel and the pair pipeline.

Why. The dense minarg kernel tests EVERY ray against EVERY triangle at
70.3 Gtests/s — 93% of the measured VPU compare-chain bound — so the
804-tri Cornell workload is boxed at ~72 Mrays/s e2e no matter how the
per-test math is tuned (docs/BENCHMARKS.md round 3: bf16 VPU is slower
than f32, the MXU+f32-tail form serializes to ~80 Gt/s). The remaining
lever is ALGORITHMIC: test fewer pairs. Cornell's geometry offers a lot
— 792 of its 804 triangles tessellate two spheres that most rays miss.

Design (TPU-shaped hierarchy, two levels, zero divergence cost):
 * Host build: order triangles by centroid Morton code, cut the order
   into contiguous groups of `gs` rows, compute one padded AABB per
   group (build_groups). The table stays whole-scene VMEM-resident
   like minarg's.
 * Kernel: per 1024-ray tile, each group's slab test runs per-LANE
   (~25 VPU ops vs gs*20 for testing the group's rows), the tile
   reduces the mask to ONE scalar, and `pl.when` skips the group's
   row tests unless some lane needs them. Lockstep vectors mean a
   per-lane skip saves nothing — the unit of savings is the whole
   tile, which is why this kernel wants SORTED rays
   (models/wavefront.sort_state: (direction octant, origin Morton)
   keys, measured 4.4 ms per 2M-lane state): coherent tiles agree,
   and agreement is what `pl.when` turns into skipped work.
 * Exactness: a group's AABB contains its triangles, inflated by a
   relative epsilon against slab-arithmetic rounding, so culling
   never drops a true winner; the row tests are op-for-op the minarg
   kernel's f32 math (same t bits). The winner's attributes come from
   the same bit-exact one-hot refine fetch
   (plucker_kernel._run_refine1).

The any-hit variant (make_anyhit_occluded) answers NEE's visibility
question — "is there ANY occluder with t < rmax?" (ops/nee.py
`visible = ~valid | t >= dist*(1-1e-3)`, i.e. exactly this predicate
negated; reference anchor: visibility needs strictly less than
first_intersect computes, prog.cl:113-122) — with three extra savings
over a nearest-hit intersect: segment culling (a group behind the
light never runs: tn <= rmax joins the slab test), already-occluded
lanes drop out of the tile's need-mask (a fully-occluded tile skips
every remaining group), and there is no argmin bookkeeping and no
attribute fetch at all.

Scope: T <= gs * MAX_GROUPS (the kernel unrolls the group loop; 64
groups at gs=128 = 8k triangles). Larger scenes belong to the pair
pipeline (sorted_intersect.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Hits, Rays
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    BIG, _round_up, build_tri_pack, pack_rays,
)

MAX_GROUPS = 64


def build_groups(tris: TrianglesSoA, gs: int = 128, origin=None):
    """Morton-order the triangles and cut into contiguous groups of
    `gs`, one padded AABB each.

    Returns (tris_reordered, perm, boxes, spans): perm[i] = original
    index of reordered row i (int32 np array, for with_ids callers);
    boxes = list of ((lox, loy, loz), (hix, hiy, hiz)) python floats —
    baked into the kernel as constants; spans = list of (base, end)
    row ranges, one per box, likewise baked.

    origin (optional 3-vector): additionally order the GROUPS
    front-to-back by AABB-center distance from this point (the camera
    eye). Group scan order feeds the kernel's `tn < best_t` need
    test: with near groups first, a tile whose lanes all found a near
    hit skips every farther group outright — free early-out for the
    primary-heavy ray mix. Winner bits are unchanged (min over all
    groups; scan order matters only on exact-t ties, see the
    make_tilecull_intersect caveat)."""
    r1 = np.asarray(tris.r1, np.float64)
    r2 = np.asarray(tris.r2, np.float64)
    r3 = np.asarray(tris.r3, np.float64)
    t_count = r1.shape[0]
    if t_count == 0:
        raise ValueError(
            "build_groups needs at least one triangle (sphere-only "
            "scenes take the analytic path; see make_scene_occluded)"
        )
    cen = (r1 + r2 + r3) / 3.0
    lo = np.minimum(np.minimum(r1.min(0), r2.min(0)), r3.min(0))
    hi = np.maximum(np.maximum(r1.max(0), r2.max(0)), r3.max(0))
    extent = np.maximum(hi - lo, 1e-12)
    q = np.clip((cen - lo) / extent, 0.0, 1.0)
    # 10-bit 3-axis Morton interleave (host-side numpy twin of
    # accel.lbvh.morton3).
    cells = np.minimum((q * 1024.0).astype(np.uint64), 1023)

    def _spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    code = (_spread(cells[:, 0]) << np.uint64(2)) \
        | (_spread(cells[:, 1]) << np.uint64(1)) | _spread(cells[:, 2])
    perm = np.argsort(code, kind="stable").astype(np.int32)

    pad = 1e-4 * float(extent.max()) + 1e-7
    group_rows = [perm[g0:min(g0 + gs, t_count)]
                  for g0 in range(0, t_count, gs)]
    if origin is not None:
        o = np.asarray(origin, np.float64)

        def gdist(rows):
            c = 0.5 * (
                np.minimum(np.minimum(r1[rows].min(0),
                                      r2[rows].min(0)),
                           r3[rows].min(0))
                + np.maximum(np.maximum(r1[rows].max(0),
                                        r2[rows].max(0)),
                             r3[rows].max(0)))
            return float(np.linalg.norm(c - o))

        group_rows.sort(key=gdist)
        perm = np.concatenate(group_rows).astype(np.int32)
    tris2 = tris.take(jnp.asarray(perm))

    boxes = []
    spans = []
    base = 0
    for rows in group_rows:
        blo = np.minimum(np.minimum(r1[rows].min(0), r2[rows].min(0)),
                         r3[rows].min(0)) - pad
        bhi = np.maximum(np.maximum(r1[rows].max(0), r2[rows].max(0)),
                         r3[rows].max(0)) + pad
        boxes.append((tuple(float(v) for v in blo),
                      tuple(float(v) for v in bhi)))
        spans.append((base, base + len(rows)))
        base += len(rows)
    return tris2, perm, boxes, spans


def _safe_inv(d):
    tiny = 1e-30
    mag = jnp.abs(d)
    s = jnp.where(d < 0.0, -tiny, tiny)
    return 1.0 / jnp.where(mag < tiny, s, d)


def _slab(px, py, pz, idx, idy, idz, lo, hi):
    """Per-lane ray-vs-AABB entry/exit (t_near, t_far); the caller
    tests tf >= tn & tf >= 0 (+ tn <= rmax for segments). Zero dir
    components ride the clamped reciprocal (_safe_inv): origin inside
    the slab spans (-big, +big) — conservatively hit — and outside
    lands both bounds on one side — a miss, matching IEEE intent
    without inf*0 NaNs."""
    t1x = (lo[0] - px) * idx
    t2x = (hi[0] - px) * idx
    t1y = (lo[1] - py) * idy
    t2y = (hi[1] - py) * idy
    t1z = (lo[2] - pz) * idz
    t2z = (hi[2] - pz) * idz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                 jnp.minimum(t1y, t2y)),
                     jnp.minimum(t1z, t2z))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                 jnp.maximum(t1y, t2y)),
                     jnp.maximum(t1z, t2z))
    return tn, tf


def _tilecull_kernel(ray_ref, tri_ref, t_ref, i_ref, *, boxes, spans,
                     chunk: int):
    rays = ray_ref[:]
    px, py, pz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    idx, idy, idz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    tr = px.shape[1]
    t_ref[0, :] = jnp.full((tr,), BIG, jnp.float32)
    i_ref[0, :] = jnp.zeros((tr,), jnp.float32)
    for (lo, hi), (base, end) in zip(boxes, spans):
        tn, tf = _slab(px, py, pz, idx, idy, idz, lo, hi)
        need = (tf >= tn) & (tf >= 0.0) & (tn < t_ref[0:1, :])
        any_need = jnp.max(jnp.where(need, 1.0, 0.0))

        @pl.when(any_need > 0.0)
        def _(base=base, end=end):
            for c0 in range(base, end, chunk):
                cc = min(chunk, end - c0)
                tri = tri_ref[c0:c0 + cc, :]

                def col(k, tri=tri):
                    return tri[:, k:k + 1]

                def pd_dots(b, tri=tri):
                    vx, vy, vz = (tri[:, b:b + 1], tri[:, b + 1:b + 2],
                                  tri[:, b + 2:b + 3])
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
                bet = m1 < t_ref[0, :]
                t_ref[0, :] = jnp.where(bet, m1, t_ref[0, :])
                i_ref[0, :] = jnp.where(bet, g1, i_ref[0, :])


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _run_tilecull(rays8, tri_pack, boxes, spans, chunk: int,
                  tr: int, interpret: bool):
    rpad = rays8.shape[1]
    tpad = tri_pack.shape[0]
    tr = min(tr, rpad)
    outs = pl.pallas_call(
        functools.partial(_tilecull_kernel, boxes=boxes, spans=spans,
                          chunk=chunk),
        grid=(rpad // tr,),
        in_specs=[
            pl.BlockSpec((8, tr), lambda rt: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpad, 24), lambda rt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tr), lambda rt: (0, rt),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, rpad), jnp.float32)] * 2,
        interpret=interpret,
    )(rays8, tri_pack)
    return outs


def _build_tabt(tri_pack):
    """Exact 3-way bf16 bit-split of the 17 used constants for the
    one-hot refine fetch (same build as plucker_kernel's; asserted
    bit-exact)."""
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
    tabt = jnp.zeros((64, tab.shape[0]), jnp.bfloat16)
    tabt = tabt.at[0:17].set(jnp.asarray(hi))
    tabt = tabt.at[17:34].set(jnp.asarray(mid))
    tabt = tabt.at[34:51].set(jnp.asarray(lo))
    return tabt


def _presort_perm(rays: Rays, r: int, rpad: int, mode: str,
                  scene_lo, scene_inv):
    """Lane permutation (rpad,) grouping coherent rays into
    contiguous tiles, pad lanes last. The wavefront's full-state
    sort_state costs ~42 ms/step at 2M lanes (13 payload chunks x
    2-key sorts) — far more than tile culling saves on enclosed
    scenes (docs/BENCHMARKS.md round 4). This computes the SAME
    (direction octant, origin Morton) order over a THIN key instead:
    one (key, iota) sort + per-row gathers, so the state never moves.

    mode='octant': direction octant only (3-bit key) via a
    counting sort (one (rpad, 9) cumsum — no lax.sort at all).
    mode='morton': octant<<27 | origin-Morton>>3, one 2-array
    lax.sort (~12 ms at 2M lanes, measured as the (flag, slot)
    compaction sort in sorted_intersect.py)."""
    iota = jnp.arange(rpad, dtype=jnp.int32)
    if mode == "octant":
        octr = ((rays.d[0] >= 0).astype(jnp.int32) * 4
                + (rays.d[1] >= 0).astype(jnp.int32) * 2
                + (rays.d[2] >= 0).astype(jnp.int32))
        oct_p = jnp.full((rpad,), 8, jnp.int32)
        oct_p = jax.lax.dynamic_update_slice(oct_p, octr, (0,))
        onehot = (oct_p[:, None]
                  == jnp.arange(9, dtype=jnp.int32)[None, :])
        ranks = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
        counts = ranks[-1]
        base = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
        )
        within = jnp.take_along_axis(
            ranks, oct_p[:, None], axis=1)[:, 0] - 1
        pos = base[oct_p] + within
        return jnp.zeros((rpad,), jnp.int32).at[pos].set(iota)
    # morton: thin twin of models.wavefront.sort_state's key.
    from opencl_path_tracer_tpu.models.wavefront import (
        morton3_components,
    )
    q = tuple(
        jnp.clip((rays.p[k] - scene_lo[k]) * scene_inv[k], 0.0, 1.0)
        for k in range(3)
    )
    cell = morton3_components(q)
    octant = (
        (rays.d[0] >= 0).astype(jnp.uint32) * jnp.uint32(4)
        + (rays.d[1] >= 0).astype(jnp.uint32) * jnp.uint32(2)
        + (rays.d[2] >= 0).astype(jnp.uint32)
    )
    key = (octant << jnp.uint32(27)) | (cell >> jnp.uint32(3))
    key_p = jnp.full((rpad,), jnp.uint32(0xFFFFFFFF))
    key_p = jax.lax.dynamic_update_slice(key_p, key, (0,))
    _, perm = jax.lax.sort([key_p, iota], num_keys=1)
    return perm


def make_tilecull_intersect(tris: TrianglesSoA, *, gs: int = 128,
                            tr: int = 1024, chunk: int = 64,
                            with_ids: bool = False,
                            presort: str = "none",
                            origin=None,
                            interpret: bool = False):
    """Exact grouped minarg intersect: Morton groups + per-tile AABB
    culling + bit-exact one-hot attribute fetch. Drop-in for
    make_minarg_intersect on scenes up to gs*MAX_GROUPS triangles;
    pays when rays are tile-coherent (primary rays, or a wavefront
    with sort_every=1).

    with_ids=True additionally returns ORIGINAL-order triangle ids
    (the first_intersect_ids contract — the Morton permutation is
    folded back via one gather).

    Tie caveat: on EXACTLY-equal best t (coplanar / duplicate
    triangles) both this kernel and minarg keep the first winner in
    their scan order, but this kernel scans in Morton order while
    minarg scans original order — so the returned mati/normal/id may
    differ between the two on degenerate geometry even though t is
    identical. No library scene has such ties; callers that need
    strict winner parity on degenerate input should use minarg.

    presort ('none' | 'octant' | 'morton'): internally permute the
    rays into coherent tiles before the kernel and unpermute the
    results after (_presort_perm) — the caller-invisible alternative
    to wavefront sort_every for incoherent bounce-ray populations.
    Results are bit-identical for any presort (per-lane math is
    order-independent; winner selection happens per lane). Measured
    round 5: ~10x WORSE than presort='none' at 2M lanes (1-D random
    gathers serialize on TPU) — kept as a documented-negative option.

    chunk=64 default (round-5 sweep): ref-workload 58.5 -> 60.7,
    cornell preview 134 -> 137 vs the round-4 chunk=128.
    origin=camera eye adds front-to-back group ordering — free
    early-out on coherent near hits (+2.5% on the preview, neutral
    on spread scenes)."""
    from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
        _run_refine1,
    )

    if presort not in ("none", "octant", "morton"):
        raise ValueError(f"unknown presort {presort!r}")
    tris2, perm, boxes, spans = build_groups(tris, gs, origin=origin)
    if len(boxes) > MAX_GROUPS:
        raise ValueError(
            f"{tris.count} tris -> {len(boxes)} groups exceeds "
            f"MAX_GROUPS={MAX_GROUPS} at gs={gs}; use the pair "
            f"pipeline for scenes this large"
        )
    tri_pack = build_tri_pack(tris2, tt=1 << 30)
    tabt = _build_tabt(tri_pack)
    boxes_t = tuple(boxes)
    spans_t = tuple(spans)
    perm_j = jnp.asarray(perm)
    if presort == "morton":
        blo = np.min(np.asarray(boxes, np.float64)[:, 0, :], axis=0)
        bhi = np.max(np.asarray(boxes, np.float64)[:, 1, :], axis=0)
        scene_lo = tuple(float(v) for v in blo)
        scene_inv = tuple(
            float(v) for v in 1.0 / np.maximum(bhi - blo, 1e-12))
    else:
        scene_lo = scene_inv = (0.0, 0.0, 0.0)

    def intersect(rays: Rays):
        r = rays.p[0].shape[0]
        rpad = _round_up(r, tr)
        if presort != "none":
            lane_perm = _presort_perm(rays, r, rpad, presort,
                                      scene_lo, scene_inv)
            comps = [
                jax.lax.dynamic_update_slice(
                    jnp.zeros((rpad,), jnp.float32), c, (0,)
                )[lane_perm]
                for c in (*rays.p, *rays.d)
            ]
            rays8 = pack_rays(tuple(comps[:3]), tuple(comps[3:]),
                              rpad)
        else:
            rays8 = pack_rays(rays.p, rays.d, rpad)
        t1, g1 = _run_tilecull(rays8, tri_pack, boxes_t, spans_t,
                               chunk, tr, interpret)
        t_, nx, ny, nz, m = _run_refine1(rays8, t1, g1, tabt, tr,
                                         interpret)
        if presort != "none":
            # Unpermute via one inverse gather per output row.
            inv = jnp.zeros((rpad,), jnp.int32).at[lane_perm].set(
                jnp.arange(rpad, dtype=jnp.int32))
            t_, nx, ny, nz, m, g1 = (
                x[:, inv] for x in (t_, nx, ny, nz, m, g1))
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
        local = jnp.clip(g1[0, :r].astype(jnp.int32), 0,
                         perm_j.shape[0] - 1)
        ids = jnp.where(any_hit, jnp.take(perm_j, local, axis=0), -1)
        return hits, ids

    intersect.boxes = boxes_t
    return intersect


# ---------------------------------------------------------------------
# Any-hit visibility: "does ANY triangle occlude the segment
# (origin, origin + rmax*d)?" — no argmin, no attribute fetch, segment
# culling, and fully-occluded tiles skip every remaining group.


def _anyhit_kernel(ray_ref, rmax_ref, tri_ref, occ_ref, *, boxes,
                   spans, chunk: int):
    rays = ray_ref[:]
    px, py, pz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    rmax = rmax_ref[0:1, :]
    idx, idy, idz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    tr = px.shape[1]
    occ_ref[0, :] = jnp.zeros((tr,), jnp.float32)
    for (lo, hi), (base, end) in zip(boxes, spans):
        tn, tf = _slab(px, py, pz, idx, idy, idz, lo, hi)
        need = ((tf >= tn) & (tf >= 0.0) & (tn <= rmax)
                & (occ_ref[0:1, :] == 0.0))
        any_need = jnp.max(jnp.where(need, 1.0, 0.0))

        @pl.when(any_need > 0.0)
        def _(base=base, end=end):
            hit_any = jnp.zeros((1, tr), jnp.float32)
            for c0 in range(base, end, chunk):
                cc = min(chunk, end - c0)
                tri = tri_ref[c0:c0 + cc, :]

                def col(k, tri=tri):
                    return tri[:, k:k + 1]

                def pd_dots(b, tri=tri):
                    vx, vy, vz = (tri[:, b:b + 1], tri[:, b + 1:b + 2],
                                  tri[:, b + 2:b + 3])
                    return (vx * px + vy * py + vz * pz,
                            vx * dx + vy * dy + vz * dz)

                pn, vn = pd_dots(0)
                t = (col(3) - pn) / vn
                pm1, vm1 = pd_dots(4)
                pm2, vm2 = pd_dots(8)
                pm3, vm3 = pd_dots(12)
                occl = (
                    (t > 0.0) & (t < rmax)
                    & (pm1 + t * vm1 >= col(7))
                    & (pm2 + t * vm2 >= col(11))
                    & (pm3 + t * vm3 >= col(15))
                )
                hit_any = jnp.maximum(
                    hit_any,
                    jnp.max(jnp.where(occl, 1.0, 0.0), axis=0,
                            keepdims=True),
                )
            occ_ref[0, :] = jnp.maximum(occ_ref[0, :], hit_any[0, :])


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def _run_anyhit(rays8, rmax_row, tri_pack, boxes, spans, tr: int,
                interpret: bool, chunk: int = 128):
    rpad = rays8.shape[1]
    tpad = tri_pack.shape[0]
    tr = min(tr, rpad)
    out = pl.pallas_call(
        functools.partial(_anyhit_kernel, boxes=boxes, spans=spans,
                          chunk=chunk),
        grid=(rpad // tr,),
        in_specs=[
            pl.BlockSpec((8, tr), lambda rt: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda rt: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpad, 24), lambda rt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, tr), lambda rt: (0, rt),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((1, rpad), jnp.float32)],
        interpret=interpret,
    )(rays8, rmax_row, tri_pack)
    return out[0]


def make_anyhit_occluded(tris: TrianglesSoA, *, gs: int = 128,
                         tr: int = 1024, chunk: int = 64,
                         interpret: bool = False):
    """Returns occluded(rays, rmax) -> bool (R,): True iff some
    triangle's EXACT f32 hit (the production test, op for op) lands in
    (0, rmax). `visible = ~occluded(Rays(origin, d), dist*(1-1e-3))`
    reproduces ops.nee.direct_light's nearest-hit visibility decision
    bit-identically — min(t) < rmax iff any t < rmax."""
    tris2, _perm, boxes, spans = build_groups(tris, gs)
    if len(boxes) > MAX_GROUPS:
        raise ValueError(
            f"{tris.count} tris -> {len(boxes)} groups exceeds "
            f"MAX_GROUPS={MAX_GROUPS} at gs={gs}"
        )
    tri_pack = build_tri_pack(tris2, tt=1 << 30)
    boxes_t = tuple(boxes)
    spans_t = tuple(spans)

    def occluded(rays: Rays, rmax) -> jnp.ndarray:
        r = rays.p[0].shape[0]
        rpad = _round_up(r, tr)
        rays8 = pack_rays(rays.p, rays.d, rpad)
        row = jnp.zeros((1, rpad), jnp.float32)
        row = jax.lax.dynamic_update_slice(
            row, jnp.reshape(rmax.astype(jnp.float32), (1, r)), (0, 0)
        )
        occ = _run_anyhit(rays8, row, tri_pack, boxes_t, spans_t, tr,
                          interpret, chunk)
        return occ[0, :r] > 0.0

    occluded.boxes = boxes_t
    return occluded


def make_scene_occluded(scene, *, gs: int = 128, tr: int = 1024,
                        chunk: int = 64, interpret: bool = False):
    """Whole-scene occlusion test for NEE/env shadow rays: the
    triangle any-hit kernel, plus the analytic-sphere nearest hit
    where the scene carries quadrics (cornell-analytic /
    reference-analytic) — a sphere hit with t < rmax occludes exactly
    like the merged nearest-hit intersect would decide. Returns
    occluded(rays, rmax) -> bool (R,), or None when the scene is too
    large for the grouped kernel (caller keeps the nearest-hit
    fallback)."""
    if scene.tris.count > gs * MAX_GROUPS:
        return None
    spheres = getattr(scene, "spheres", None)
    if scene.tris.count == 0:
        # Sphere-only scene (builder scenes with quadrics and no
        # mesh): there is no triangle table to cull — answer with the
        # analytic nearest hit alone, or defer to the caller's
        # nearest-hit fallback when there are no spheres either.
        if spheres is None:
            return None
        from opencl_path_tracer_tpu.ops.pallas.sphere_kernel import (
            make_sphere_intersect,
        )
        sph_only = make_sphere_intersect(spheres, interpret=interpret)

        def occluded_spheres(rays: Rays, rmax) -> jnp.ndarray:
            h = sph_only(rays)
            return h.valid & (h.t < rmax)

        return occluded_spheres
    tri_occ = make_anyhit_occluded(scene.tris, gs=gs, tr=tr,
                                   chunk=chunk, interpret=interpret)
    if spheres is None:
        return tri_occ
    from opencl_path_tracer_tpu.ops.pallas.sphere_kernel import (
        make_sphere_intersect,
    )
    sph = make_sphere_intersect(spheres, interpret=interpret)

    def occluded(rays: Rays, rmax) -> jnp.ndarray:
        h = sph(rays)
        return tri_occ(rays, rmax) | (h.valid & (h.t < rmax))

    return occluded


# ---------------------------------------------------------------------
# Host-side predictor for the auto accel policy: simulate the kernel's
# per-tile skip rate on a small sample of the ACTUAL workload.


def _np_brute(tris: TrianglesSoA, P: np.ndarray, D: np.ndarray):
    """Nearest-hit (t, tri index) by the production test math in
    numpy; t = inf on miss. Small batches only (predictor use)."""
    nrm = np.asarray(tris.n, np.float64)
    c0 = np.asarray(tris.c0, np.float64)
    m = [np.asarray(getattr(tris, f"m{k}"), np.float64)
         for k in (1, 2, 3)]
    dk = [np.asarray(getattr(tris, f"d{k}"), np.float64)
          for k in (1, 2, 3)]
    best_t = np.full(P.shape[0], np.inf)
    best_i = np.full(P.shape[0], -1, np.int64)
    for i0 in range(0, P.shape[0], 256):
        p, d = P[i0:i0 + 256], D[i0:i0 + 256]
        vn = d @ nrm.T
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (c0[None, :] - p @ nrm.T) / vn
        ok = (t > 1e-9) & np.isfinite(t)
        for mk, dkk in zip(m, dk):
            ok &= (p @ mk.T) + t * (d @ mk.T) >= dkk[None, :]
        tm = np.where(ok, t, np.inf)
        best_t[i0:i0 + 256] = tm.min(axis=1)
        best_i[i0:i0 + 256] = tm.argmin(axis=1)
    best_i[~np.isfinite(best_t)] = -1
    return best_t, best_i


def estimate_tile_need_fraction(tris: TrianglesSoA, cam, *,
                                gs: int = 128, iterations: int = 5,
                                n_tiles: int = 32, seed: int = 0):
    """Predicted fraction of triangle-row tests the tile-cull kernel
    runs vs the dense kernel, on a sample of the actual workload:
    random 32x32-pixel blocks of PRIMARY camera rays plus one
    cosine-sampled bounce from their hit points, per-tile group-need
    UNIONS measured exactly as the kernel's slab mask computes them.

    Static metrics failed here (measured round 4): group-AABB volume
    coverage rates the reference scene WORSE than cornell, and
    surface-sampled openness is blinded by cornell's +/-10k ground
    plane — the ray DISTRIBUTION is camera-dependent, so the
    predictor samples it. Costs ~1-2 s host-side at scene build.

    iterations==1 weighs primaries only (the preview workload);
    otherwise primary:bounce = 0.3:0.7 (~steady wavefront mix)."""
    rs = np.random.default_rng(seed)
    _t2, _perm, boxes, _spans = build_groups(tris, gs)
    eye = np.asarray(cam.eye, np.float64)
    lookat = np.asarray(cam.lookat, np.float64)
    upv = np.asarray(cam.up, np.float64)
    rightv = np.asarray(cam.right, np.float64)
    W, H = float(cam.xm), float(cam.ym)

    def tile_need(P, D, k):
        """Mean over tiles of (needed groups / all groups), each tile
        the union over its k lanes (the kernel's pl.when scalar)."""
        tiny = 1e-30
        Ds = np.where(np.abs(D) < tiny, tiny, D)
        inv = 1.0 / Ds
        need = 0.0
        n_t = P.shape[0] // k
        for g, (lo, hi) in enumerate(boxes):
            t1 = (np.asarray(lo)[None, :] - P) * inv
            t2 = (np.asarray(hi)[None, :] - P) * inv
            tn = np.minimum(t1, t2).max(axis=1)
            tf = np.maximum(t1, t2).min(axis=1)
            hit = (tf >= tn) & (tf >= 0.0)
            need += hit.reshape(n_t, k).any(axis=1).mean()
        return need / len(boxes)

    k = 1024
    bs = 32  # 32x32-pixel block = one 1024-lane tile
    xs = rs.integers(0, max(int(W) - bs, 1), size=n_tiles)
    ys = rs.integers(0, max(int(H) - bs, 1), size=n_tiles)
    px = (xs[:, None, None] + np.arange(bs)[None, :, None]
          + rs.random((n_tiles, bs, bs))).reshape(-1)
    py = (ys[:, None, None] + np.arange(bs)[None, None, :]
          + rs.random((n_tiles, bs, bs))).reshape(-1)
    pl_ = (lookat[None, :]
           + rightv[None, :] * (2.0 * px / W - 1.0)[:, None]
           + upv[None, :] * (2.0 * py / H - 1.0)[:, None])
    D0 = pl_ - eye[None, :]
    D0 /= np.maximum(np.linalg.norm(D0, axis=1, keepdims=True), 1e-12)
    P0 = np.broadcast_to(eye[None, :], D0.shape).copy()
    frac_p = tile_need(P0, D0, k)
    if iterations <= 1:
        return float(frac_p)

    t_hit, i_hit = _np_brute(tris, P0, D0)
    hit = i_hit >= 0
    if not hit.any():
        return float(frac_p)
    Ph = P0 + np.where(hit, t_hit, 0.0)[:, None] * D0
    Nv = np.asarray(tris.n, np.float64)[np.maximum(i_hit, 0)]
    # flip toward the incoming ray like the renderer (prog.cl:326-328)
    Nv = np.where((Nv * D0).sum(1, keepdims=True) > 0, -Nv, Nv)
    a = np.cross(Nv, np.where(np.abs(Nv[:, :1]) < 0.9,
                              [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]))
    a /= np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    b = np.cross(Nv, a)
    n = Ph.shape[0]
    r_ = np.sqrt(rs.random((n, 1)))
    th = 2.0 * np.pi * rs.random((n, 1))
    D1 = (r_ * np.cos(th) * a + r_ * np.sin(th) * b
          + np.sqrt(np.maximum(1.0 - r_ ** 2, 0.0)) * Nv)
    P1 = Ph + 1e-3 * D1
    # miss lanes regenerate as primaries in the wavefront: reuse them
    P1 = np.where(hit[:, None], P1, P0)
    D1 = np.where(hit[:, None], D1, D0)
    frac_b = tile_need(P1, D1, k)
    return float(0.3 * frac_p + 0.7 * frac_b)


def auto_small_accel(tris: TrianglesSoA, cam, *, iterations: int = 5,
                     gs: int = 128, threshold: float = 0.55,
                     fallback: str = "minarg") -> str:
    """'tilecull' or `fallback` for a scene up to gs*MAX_GROUPS tris,
    by the measured-anchored predictor.

    Measured i5 anchors (Mrays/s, v5e; round 4 + round 5):

        scene            frac   minarg  tilecull  pairwin  winner
        cornell 804      0.80    70.3     61.5      —      minarg
        dense-cornell 5k 0.69    12.5     10.5     8.2     minarg
        open field 5.9k  0.38    10.5     12.4     6.7     tilecull
        ref-workload     0.30    ~31      60.5      —      tilecull
        cornell i1       0.35    ~70     133        —      tilecull

    threshold=0.55 separates them; round 4's 0.7 misclassified the
    enclosed 4k-8k region (the dense-cornell anchor, round 5 — its
    deep-bounce rays are isotropic enough that the one-bounce
    estimate 0.69 already under-counts the real union). The fallback
    is minarg across the whole range: it beats pairwin at every
    measured anchor up to 8192 tris (pairwin's escalations only pay
    beyond the VMEM-resident table sizes)."""
    if tris.count <= gs or tris.count > gs * MAX_GROUPS:
        return fallback
    frac = estimate_tile_need_fraction(tris, cam, gs=gs,
                                       iterations=iterations)
    return "tilecull" if frac < threshold else fallback
