"""Sort-grouped intersectors: per-RAY culling on a lockstep machine.

Round-1 finding (docs/BENCHMARKS.md): per-TILE conservative culling
collapses on incoherent bounce rays — a tile of random directions spans
the scene, so its interval frustum passes every cluster. Tile
granularity is dead; only per-RAY candidate sets cull.

Round-2 measurements that shape this design (v5e, corrected timer —
docs/BENCHMARKS.md primitive table):
  * lax.sort is comparatively CHEAP: 2M keys + 7 payloads ~ 13 ms;
  * gathers/scatters are SLOW and do not fuse: ~14 ms per 1M rows,
    (2M, 8) row scatter 93 ms.

CI coverage note: Pallas interpret mode has no DMA emulation, so every
CPU test of these kernels runs the VMEM-resident branch
(resident=True); the HBM-DMA branch (`_pair_kernel`'s scratch path) is
exercised only on real TPU via scripts/tpu_pair_exactness.py — results
recorded in docs/BENCHMARKS.md ("Pair-path TPU exactness record").

So: compute each ray's exact passing-cluster set, then GROUP rays by
that set with a sort (carrying the ray through as sort payloads — never
gather), run the branchless cluster kernel on now-homogeneous tiles,
and sort results back by a carried slot index. The wavefront renderer
is permutation-tolerant (lanes carry their pixel id), so the two sorts
bracket only the intersector.

`make_group_intersect` — small scenes (C <= 30 clusters): the per-ray
set is a bitmask key; a tile's cluster list is the UNION of its
(near-identical) masks — exact per-ray culling, no candidate cap, no
rounds. Matches ops.intersect.first_intersect bit-for-bit on hits.

Triangle math: identical to the cluster kernel (prog.cl:94-112 in m_k
form); slab: prog.cl:123-143 with a d==0 guard (the reference's
IEEE-no-guard slab turns 0 * inf into NaN -> silently culls rays lying
exactly on a cluster face; for CULLING we must be conservative, so the
d==0 axis tests containment instead).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Hits, Rays
from opencl_path_tracer_tpu.ops.pallas.cluster_kernel import (
    BIG, build_clusters,
)
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import pack_rays


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _perray_slab(comps, boxes, need_entry: bool = False):
    """Exact per-ray slab test against every cluster box.

    comps: 6 (R,) arrays px py pz dx dy dz. boxes: (C, 8) [lo3 hi3 _ _].
    Returns (R, C) bool pass mask (and entry distance if need_entry).
    Axis-chunked (R, C) intermediates — never (R, C, 3).
    """
    px, py, pz, dx, dy, dz = comps
    r = px.shape[0]
    c = boxes.shape[0]
    tmin = jnp.full((r, c), -BIG, jnp.float32)
    tmax = jnp.full((r, c), BIG, jnp.float32)
    for p, d, ax in ((px, dx, 0), (py, dy, 1), (pz, dz, 2)):
        bl = boxes[None, :, ax]          # (1, C)
        bh = boxes[None, :, ax + 3]
        p1 = p[:, None]                  # (R, 1)
        d0 = d[:, None] == 0.0
        # Safe reciprocal: d==0 handled by containment below, so the
        # value fed to the products never produces 0 * inf = NaN.
        inv = 1.0 / jnp.where(d0, 1.0, d[:, None])
        t1 = (bl - p1) * inv             # (R, C)
        t2 = (bh - p1) * inv
        lo_ax = jnp.minimum(t1, t2)
        hi_ax = jnp.maximum(t1, t2)
        inside = (p1 >= bl) & (p1 <= bh)
        lo_ax = jnp.where(d0, jnp.where(inside, -BIG, BIG), lo_ax)
        hi_ax = jnp.where(d0, jnp.where(inside, BIG, -BIG), hi_ax)
        tmin = jnp.maximum(tmin, lo_ax)
        tmax = jnp.minimum(tmax, hi_ax)
    hit = (tmax >= tmin) & (tmax >= 0.0)
    if need_entry:
        return hit, jnp.maximum(tmin, 0.0)
    return hit


def _hits_from_raw(rays: Rays, best_t, n3, m, r: int) -> Hits:
    best_t = best_t[:r]
    any_hit = best_t < BIG
    z = jnp.zeros_like(best_t)
    safe_t = jnp.where(any_hit, best_t, 0.0)
    hit_p = tuple(
        jnp.where(any_hit, rays.p[k] + rays.d[k] * safe_t, z)
        for k in range(3)
    )
    # Miss-lane normals are pinned to 0 (not left as kernel latch
    # junk): consumers never read them for dead lanes, but unspecified
    # values make bitwise contracts compile-sensitive — constant
    # lifting of the sharded pair step reordered the junk and broke
    # the sharded-vs-single bit-equality test. Three fused selects,
    # measurement-noise cost.
    return Hits(
        t=jnp.where(any_hit, best_t, -1.0),
        p=hit_p,
        n=tuple(jnp.where(any_hit, a[:r], z) for a in n3),
        mati=jnp.where(any_hit, m[:r], 0.0).astype(jnp.int32),
    )


def _group_kernel(union_ref, ray_ref, tri_ref, out_ref, *, c: int):
    """One tile of mask-sorted rays. The cluster walk is STATICALLY
    unrolled over all C clusters, each gated by one pl.when on the
    tile's mask-union bit: measured per-ITERATION overhead of a dynamic
    fori/while in Mosaic is ~5-7 us, which dominated the tile-list
    variant; a static branch costs ~1-2 us and taken branches do a full
    (BLK, K) test. union_ref: (1, 1, 1) SMEM u32."""
    blk = ray_ref.shape[0]
    k = tri_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    col8 = jax.lax.broadcasted_iota(jnp.int32, (blk, 8), 1)
    out_ref[:] = jnp.where(col8 == 0, BIG, 0.0).astype(jnp.float32)

    rays = ray_ref[:]
    px, py, pz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    in_run = jnp.ones((blk, 1), bool)
    u = union_ref[0, 0, 0]

    for ci in range(c):
        @pl.when(((u >> np.uint32(ci)) & np.uint32(1)) == 1)
        def _(ci=ci):
            blk_tri = tri_ref[ci]

            def row(j, blk_tri=blk_tri):
                return blk_tri[j:j + 1, :]

            _test_cluster_block(row, px, py, pz, dx, dy, dz, in_run,
                                out_ref, lane, blk)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _run_group(union, rays8, tri_pack, blk: int, c: int,
               interpret: bool):
    rpad = rays8.shape[0]
    g = rpad // blk
    cc, rows, k = tri_pack.shape
    kern = functools.partial(_group_kernel, c=c)
    outs = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cc, rows, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((blk, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((rpad, 8), jnp.float32)],
        interpret=interpret,
    )(union.reshape(g, 1, 1), rays8, tri_pack)
    return tuple(outs[0][:, j] for j in range(5))


def make_group_intersect(tris: TrianglesSoA, *, cluster_size: int = 128,
                         block: int = 2048, tr: int = None,
                         subtiles: int = None,
                         interpret: bool = False):
    """Mask-sorted intersector for scenes with <= 30 clusters.

    Per ray: exact passing-cluster bitmask (u32). Rays sorted by mask
    (payloads: 6 ray components + original slot). Per ray-tile the
    cluster walk tests exactly the bits of the tile's mask UNION —
    tiles are mask-homogeneous after the sort, so the union IS (almost)
    each lane's own set. Results sorted back by slot. No candidate cap:
    every passing cluster is tested, so hits match brute force exactly.

    STATUS: measured SLOWER than the fused brute kernel on v5e for the
    scenes it targets (Cornell bounce rays: 96 ms vs 39 ms at 2M rays)
    — the two grouping sorts (~25 ms) eat the 2.5x culling win, and
    some block sizes wedged the device session. Kept as the exact
    per-ray-culling reference implementation; `accel='auto'` never
    selects it (docs/BENCHMARKS.md).

    tr/subtiles: accepted for compatibility; block = tr * subtiles.
    """
    if tr is not None:
        block = tr * (subtiles or 1)
    scene, c, k = build_clusters(tris, cluster_size, split_large=True)
    if c > 30:
        raise ValueError(
            f"{c} clusters exceed the u32 mask (use the pair intersector)"
        )
    boxes = scene.boxes
    cbits = np.arange(c, dtype=np.uint32)

    def intersect(rays: Rays) -> Hits:
        r = rays.p[0].shape[0]
        rpad = -(-r // block) * block

        def pad(x):
            if rpad == r:
                return x
            return jnp.concatenate(
                [x, jnp.zeros((rpad - r,), x.dtype)]
            )

        comps = [pad(rays.p[i]) for i in range(3)] + [
            pad(rays.d[i]) for i in range(3)
        ]
        passes = _perray_slab(comps, boxes)            # (Rpad, C)
        key = jnp.sum(
            jnp.where(passes, jnp.uint32(1) << cbits[None, :],
                      jnp.uint32(0)),
            axis=1, dtype=jnp.uint32,
        )
        slot = jnp.arange(rpad, dtype=jnp.int32)
        srt = jax.lax.sort([key, *comps, slot], num_keys=1)
        key_s, comps_s, slot_s = srt[0], srt[1:7], srt[7]

        g = rpad // block
        union = jax.lax.reduce(
            key_s.reshape(g, block), jnp.uint32(0),
            jax.lax.bitwise_or, (1,),
        )                                              # (G,)

        zeros = jnp.zeros((rpad,), jnp.float32)
        rays8 = jnp.stack([*comps_s, zeros, zeros], axis=1)  # (Rpad, 8)
        best_t, nx, ny, nz, m = _run_group(
            union, rays8, scene.tri_pack, block, c, interpret
        )
        back = jax.lax.sort(
            [slot_s, best_t, nx, ny, nz, m], num_keys=1
        )
        return _hits_from_raw(rays, back[1], back[2:5], back[5], r)

    return intersect


# ---------------------------------------------------------------------------
# Large-C path: (ray, cluster) pair expansion.
#
# For hundreds of clusters a bitmask key no longer exists and testing
# every passing cluster per ray is too much; instead each ray gets its
# L NEAREST passing clusters (by conservative slab entry distance), the
# (ray, cluster) pairs are grouped by cluster with one sort, a Pallas
# kernel walks the homogeneous runs, and results return via a second
# sort. A certificate makes it exact: a ray is RESOLVED iff its best
# hit is no farther than the entry of its first untested candidate
# (or its candidate list is exhausted). Unresolved rays — a few percent
# — are compacted by another sort and re-run with wider rank windows;
# the last round's window extends to every cluster, so the result
# equals brute force whenever the (generous, tested) prefix capacities
# hold. This is the reference's nearest-first kd pruning
# (prog.cl:162-163) re-expressed as data-parallel sorts.


def _test_cluster_block(row, px, py, pz, dx, dy, dz, in_run, out_ref,
                        lane, trp):
    """Test all TRP pair rays against one (24, K) cluster block (the
    prog.cl:94-112 math in m_k form) and min-update out_ref for the
    pairs inside the current run."""

    def pd(base):
        vx, vy, vz = row(base), row(base + 1), row(base + 2)
        return (px * vx + py * vy + pz * vz,
                dx * vx + dy * vy + dz * vz)

    pn, vn = pd(0)
    t = (row(3) - pn) / vn
    pm1, vm1 = pd(4)
    pm2, vm2 = pd(8)
    pm3, vm3 = pd(12)
    valid = (
        (t > 0.0)
        & (pm1 + t * vm1 >= row(7))
        & (pm2 + t * vm2 >= row(11))
        & (pm3 + t * vm3 >= row(15))
    )
    tm = jnp.where(valid, t, BIG)
    tmin_k = jnp.min(tm, axis=1, keepdims=True)
    local = jnp.argmin(tm, axis=1).reshape(trp, 1)
    onehot = (lane == local).astype(jnp.float32)
    win_nx = jnp.sum(onehot * row(0), axis=1, keepdims=True)
    win_ny = jnp.sum(onehot * row(1), axis=1, keepdims=True)
    win_nz = jnp.sum(onehot * row(2), axis=1, keepdims=True)
    win_m = jnp.sum(onehot * row(16), axis=1, keepdims=True)

    better = in_run & (tmin_k < out_ref[:, 0:1])
    out_ref[:, 0:1] = jnp.where(better, tmin_k, out_ref[:, 0:1])
    out_ref[:, 1:2] = jnp.where(better, win_nx, out_ref[:, 1:2])
    out_ref[:, 2:3] = jnp.where(better, win_ny, out_ref[:, 2:3])
    out_ref[:, 3:4] = jnp.where(better, win_nz, out_ref[:, 3:4])
    out_ref[:, 4:5] = jnp.where(better, win_m, out_ref[:, 4:5])


def _pair_kernel(key_ref, ray_ref, tri_ref, out_ref, acc_ref, *scratch):
    """One tile of TRP cluster-sorted pairs; while-loop over key runs.
    ray_ref: (8, TRP) rows [px py pz dx dy dz key 0] — pairs on LANES:
    a (TRP, 8) HBM layout tiles as T(8,128) and pads the minor dim
    16x (measured 7.4 GB of padding at a 16M-pair list — HBM OOM).
    The kernel transposes the block once and accumulates into a
    (TRP, 8) VMEM scratch, writing out_ref (8, TRP) transposed at the
    end. out rows: [t nx ny nz m 0 0 0].

    With scratch (tri_scr VMEM (24, K) + a DMA semaphore), tri_ref
    lives in HBM and each run's cluster block is DMA'd on demand
    (~100 KB per run): keeping the whole scene VMEM-resident makes
    Mosaic re-stage ~10 MB per grid step for big scenes — measured to
    dominate the pair kernel."""
    trp = ray_ref.shape[1]
    k = tri_ref.shape[2]
    n_clusters = tri_ref.shape[0] - 1   # last block is the dummy
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    col8 = jax.lax.broadcasted_iota(jnp.int32, (trp, 8), 1)
    acc_ref[:] = jnp.where(col8 == 0, BIG, 0.0).astype(jnp.float32)

    rays = jnp.transpose(ray_ref[:])                    # (TRP, 8)
    px, py, pz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    kf = rays[:, 6:7]                                   # (TRP, 1) f32

    def body(pos):
        ci = key_ref[0, 0, pos]                         # scalar i32
        in_run = kf == ci.astype(jnp.float32)           # (TRP, 1)

        @pl.when(ci < n_clusters)
        def _():
            if scratch:
                tri_scr, sem = scratch
                dma = pltpu.make_async_copy(
                    tri_ref.at[ci], tri_scr, sem
                )
                dma.start()
                dma.wait()

                def row(j):
                    return tri_scr[j:j + 1, :]
            else:
                blk = tri_ref[ci]                       # (24, K)

                def row(j):
                    return blk[j:j + 1, :]

            # NOTE: no in-kernel column chunking — Mosaic does not
            # reuse stack slots across statically unrolled chunks, so
            # chunking multiplies live (TRP, chunk) temporaries instead
            # of bounding them (measured scoped-VMEM OOM). TRP x K is
            # bounded by the trp default instead.
            _test_cluster_block(row, px, py, pz, dx, dy, dz, in_run,
                                acc_ref, lane, trp)

        run_len = jnp.sum(in_run.astype(jnp.int32))
        return pos + run_len

    jax.lax.while_loop(lambda pos: pos < trp, body, jnp.int32(0))
    out_ref[:] = jnp.transpose(acc_ref[:])


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _run_pairs(keys, rays8p, tri_pack, trp: int, interpret: bool,
               resident: bool = False):
    """keys: (P,) i32 sorted cluster ids (C = dummy); rays8p: (8, P).
    resident=True keeps tri_pack VMEM-resident (small scenes, and the
    interpret path, which has no DMA emulation); otherwise it stays in
    HBM and the kernel DMAs per-run cluster blocks."""
    p = keys.shape[0]
    g = p // trp
    keys3 = keys.reshape(g, 1, trp)
    c1, rows, k = tri_pack.shape
    if resident:
        tri_spec = pl.BlockSpec((c1, rows, k), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
        scratch_shapes = [pltpu.VMEM((trp, 8), jnp.float32)]
    else:
        tri_spec = pl.BlockSpec(memory_space=pltpu.HBM)
        scratch_shapes = [
            pltpu.VMEM((trp, 8), jnp.float32),
            pltpu.VMEM((rows, k), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ]
    outs = pl.pallas_call(
        _pair_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, trp), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, trp), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            tri_spec,
        ],
        out_specs=[
            pl.BlockSpec((8, trp), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((8, p), jnp.float32)],
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(keys3, rays8p, tri_pack)
    return tuple(outs[0][j] for j in range(5))


def _cand_kernel(ray_ref, box_ref, ids_ref, ent_ref, *, l: int, c: int,
                 dop: bool = False):
    """Fused slab + L-nearest selection for one ray tile.

    ray_ref: (8, TRB) rows [px py pz dx dy dz 0 0] — RAYS ON LANES,
    clusters on sublanes, matching the brute kernel's orientation (the
    rays-on-sublanes layout measured ~5x below VPU streaming rate).
    box_ref: (CP, 8) rows [lox loy loz hix hiy hiz 0 0]; with
    dop=True, (CP, 16) with cols 8..16 the 4 diagonal support
    intervals [dlo0..3 | dhi0..3] (pair_mxu.build_dops) — a 14-DOP
    slab whose entry is tighter but still a valid certificate bound
    (measured -20% per-lane need on the stress wavefront).
    Outputs: ids_ref (LW, TRB) f32 — row j = each ray's rank-j nearest
    passing cluster id (missing -> c); ent_ref (LW, TRB) — the entry
    distances, with the CERTIFICATE bound (entry of rank l, the first
    untested candidate) in row l (LW = output height >= l + 1).

    Replaces the XLA slab + top_k pipeline (measured 85 ms at 2M x 195
    on v5e; top_k alone ~22 ms) with one VMEM-resident pass.
    """
    trb = ray_ref.shape[1]
    lw = ids_ref.shape[0]
    cp = box_ref.shape[0]
    rays = ray_ref[:]
    subc = jax.lax.broadcasted_iota(jnp.int32, (cp, trb), 0)

    tmin = jnp.full((cp, trb), -BIG, jnp.float32)
    tmax = jnp.full((cp, trb), BIG, jnp.float32)

    def slab_axis(tmin, tmax, bl, bh, p, d):
        d0 = d == 0.0
        inv = 1.0 / jnp.where(d0, 1.0, d)
        t1 = (bl - p) * inv                  # (CP, TRB)
        t2 = (bh - p) * inv
        lo_ax = jnp.minimum(t1, t2)
        hi_ax = jnp.maximum(t1, t2)
        inside = (p >= bl) & (p <= bh)
        lo_ax = jnp.where(d0, jnp.where(inside, -BIG, BIG), lo_ax)
        hi_ax = jnp.where(d0, jnp.where(inside, BIG, -BIG), hi_ax)
        return jnp.maximum(tmin, lo_ax), jnp.minimum(tmax, hi_ax)

    for ax in range(3):
        tmin, tmax = slab_axis(
            tmin, tmax, box_ref[:, ax:ax + 1],
            box_ref[:, ax + 3:ax + 4],
            rays[ax:ax + 1, :], rays[3 + ax:4 + ax, :],
        )
    if dop:
        from opencl_path_tracer_tpu.ops.pallas.pair_mxu import DOP_SIGNS
        px, py, pz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
        dx, dy, dz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
        for j, (sx, sy, sz) in enumerate(DOP_SIGNS):
            pu = px + sy * py + sz * pz      # sx == 1 always
            du = dx + sy * dy + sz * dz
            tmin, tmax = slab_axis(
                tmin, tmax, box_ref[:, 8 + j:9 + j],
                box_ref[:, 12 + j:13 + j], pu, du,
            )
    ok = (tmax >= tmin) & (tmax >= 0.0) & (subc < c)
    entry = jnp.where(ok, jnp.maximum(tmin, 0.0), BIG)

    ids_ref[:] = jnp.full((lw, trb), float(c), jnp.float32)
    ent_ref[:] = jnp.full((lw, trb), BIG, jnp.float32)
    for j in range(l + 1):
        m = jnp.min(entry, axis=0)                       # (TRB,)
        idx = jnp.argmin(entry, axis=0)
        if j < l:
            ids_ref[j, :] = jnp.where(
                m < BIG, idx.astype(jnp.float32), float(c)
            )
            ent_ref[j, :] = m
        else:
            ent_ref[l, :] = m      # certificate bound
        entry = jnp.where(subc == idx[None, :], BIG, entry)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _run_candidates(rays8t, boxes_r, l: int, c: int, trb: int,
                    interpret: bool):
    """rays8t: (8, Rpad) packed rays; boxes_r: (Cp, 8), or (Cp, 16)
    with DOP support columns (the kernel switches on the width).
    Returns RANK-MAJOR (ids (l, Rpad) i32, entries (l, Rpad),
    entry_next (Rpad,)) — ray-major (Rpad, l) arrays tile T(8,128)
    with a 16x-padded minor dim."""
    rpad = rays8t.shape[1]
    cp, boxw = boxes_r.shape
    lw = max(16, _round_up(l + 1, 8))
    kern = functools.partial(_cand_kernel, l=l, c=c, dop=boxw == 16)
    ids_f, ent = pl.pallas_call(
        kern,
        grid=(rpad // trb,),
        in_specs=[
            pl.BlockSpec((8, trb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, boxw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((lw, trb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] * 2,
        out_shape=[jax.ShapeDtypeStruct((lw, rpad), jnp.float32)] * 2,
        interpret=interpret,
    )(rays8t, boxes_r)
    return ids_f[:l].astype(jnp.int32), ent[:l], ent[l]


def _auto_cluster_size(n_tris: int, cluster_size: int) -> int:
    """Scoped-VMEM budget, cluster axis: the candidates kernel's
    (CP, TRB) temporaries cannot shrink below TRB=128 (Pallas minor-
    dim floor), so CP itself must fit the 16 MB scoped limit —
    measured OOM at cp=3968 x trb=128 (18.39 M requested; 1M-tri
    scene at cs=256). Doubling the cluster size halves CP; bigger
    clusters for bigger scenes is the right scaling direction anyway
    (selection work per candidate rank grows, but candidate-set and
    sort volumes stay bounded)."""
    while _round_up(-(-n_tris // cluster_size), 128) * 128 > 480_000:
        cluster_size *= 2
    return cluster_size


def split_by_size(tris: TrianglesSoA, frac: float = 0.25,
                  median_mult: float = 50.0, max_big: int = 64,
                  with_indices: bool = False):
    """Partition triangles into (big, rest) by bbox diagonal. Large
    triangles (walls, ground planes, room shells) poison cluster boxes
    AND the nearest-first certificate (their boxes contain every ray
    origin, pinning entry bounds at 0); they are few, so testing them
    brute-force is ~free, the remaining cluster boxes stay tight, and —
    critically — an ENCLOSURE in the big set seeds every ray's best_t
    with a real hit, which is what lets the certificate terminate the
    nearest-first march at the corridor exit.

    Threshold: diag > min(frac x scene_diag, median_mult x median
    diag). The second term matters when one giant outlier (a +/-10000
    ground plane) inflates the scene diagonal so room-sized walls no
    longer qualify — measured on the stress scene this left the shell
    in the Morton clusters and collapsed round-1 certification to 1%.
    At most max_big triangles are split (largest first); beyond that
    the brute seed pass stops being free. Returns
    (big | None, rest | None)."""
    r1 = np.asarray(tris.r1)
    r2 = np.asarray(tris.r2)
    r3 = np.asarray(tris.r3)
    mati = np.asarray(tris.mati)
    lo = np.minimum(np.minimum(r1, r2), r3)
    hi = np.maximum(np.maximum(r1, r2), r3)
    diag = np.linalg.norm(hi - lo, axis=1)
    scene_diag = np.linalg.norm(hi.max(0) - lo.min(0))
    thresh = min(frac * scene_diag,
                 median_mult * float(np.median(diag)))
    big = diag > thresh
    if int(big.sum()) > max_big:
        cutoff = np.sort(diag)[-max_big - 1]
        big = diag > cutoff

    def build(mask):
        if not mask.any():
            return None
        return TrianglesSoA.build(r1[mask], r2[mask], r3[mask],
                                  mati[mask])

    if with_indices:
        # Original-scene indices of each partition's rows (the id maps
        # for with_ids=True winner reporting).
        idx = np.arange(len(diag), dtype=np.int32)
        return build(big), build(~big), idx[big], idx[~big]
    return build(big), build(~big)


def _pairs_round(comps, ids, tri_pack, trp: int, interpret: bool,
                 resident: bool = False):
    """Expand (L, R) candidate ids (RANK-MAJOR: row j = every ray's
    rank-j candidate) to cluster-sorted pairs, run the kernel, return
    per-ray (t, nx, ny, nz, m) via the slot sort-back and an L-way min.

    Rank-major layout throughout: pair p = j*R + r, so per-rank views
    are (R,)-contiguous and the L-way min runs on an (L, R) array —
    an (R, L) layout tiles T(8,128) with the minor dim padded 16x and
    the pick stage alone materialized ~10 such arrays (~200 ms at
    2M x 8 on v5e)."""
    l, r = ids.shape
    p = r * l
    keys = ids.reshape(-1)
    expand = [jnp.tile(x, l) for x in comps]
    pslot = jnp.arange(p, dtype=jnp.int32)
    # Pad the pair list to a whole number of kernel tiles with
    # dummy-cluster pairs (they sort last and do no work).
    ppad = -(-p // trp) * trp
    if ppad != p:
        dummy = tri_pack.shape[0] - 1
        keys = jnp.concatenate(
            [keys, jnp.full((ppad - p,), dummy, keys.dtype)]
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
    rays8p = jnp.stack(
        [*comps_s, keys_s.astype(jnp.float32), zeros], axis=0
    )  # (8, Ppad): pairs on the minor axis — see _pair_kernel
    t, nx, ny, nz, m = _run_pairs(keys_s, rays8p, tri_pack, trp,
                                  interpret, resident)
    back = jax.lax.sort([pslot_s, t, nx, ny, nz, m], num_keys=1)
    back = [a[:p] for a in back]    # drop tile padding
    t_lr = back[1].reshape(l, r)
    best = jnp.min(t_lr, axis=0)
    which = jnp.argmin(t_lr, axis=0)
    onehot = (jnp.arange(l, dtype=jnp.int32)[:, None]
              == which[None, :]).astype(jnp.float32)

    def pick(a):
        return jnp.sum(a.reshape(l, r) * onehot, axis=0)

    return best, pick(back[2]), pick(back[3]), pick(back[4]), \
        pick(back[5])


def _merge_best(cur, new):
    """Elementwise min-merge of two (t, nx, ny, nz, m) tuples."""
    better = new[0] < cur[0]
    return tuple(jnp.where(better, n, c) for n, c in zip(new, cur))


# Production config for large scenes on TPU, from the round-3 on-device
# sweeps (scripts/tpu_pair_schedule_sweep.py, tpu_thin_sweep{,2}.py;
# v5e, 2026-08-18, sha eac5d8f): 391.3 ms / 5.30 Mrays/s on the
# 2.07M-ray steady-state 1080p workload (v5 sort winner: 487 ms /
# 4.26; v4 default: ~640). The thin (t, tri-id) payload cuts every
# sort's operand count, and l2=6 is a SHARP optimum (l2=4 -> 3.11,
# l2=5 -> 3.90, l2=8 -> 4.60, l2=10 -> 3.96 Mrays/s): the round-2
# pair width w = l2 - l1 = 4 halves the dominant 6M-row round-2
# expansion of l2=8 while staying lane-aligned. Exactness: 0
# t/mati/hit-normal flips vs the dense kernel on the full real
# wavefront under this exact config. `bench.py` and
# `runtime/engine.py` auto-select pass these kwargs verbatim.
PAIR_TPU_WINNER = dict(mxu=True, dop=True, cluster_size=256, trp=1024,
                       l1=2, l2=6, thin=True, move="sort")


def make_pair_intersect(tris: TrianglesSoA, *, cluster_size: int = 512,
                        l1: int = 8, l2: int = 8, l3: int = 48,
                        trp: int = 1024, trb: int = 512,
                        u2_frac: int = 2, u3_frac: int = 32,
                        tail: int = 8192, mxu: bool = False,
                        dop: bool = False, move: str = "gather",
                        infeat: bool = False, thin: bool = False,
                        with_ids: bool = False, approx: bool = False,
                        interpret: bool = False):
    """Pair-expansion intersector for large scenes (hundreds of
    clusters, incoherent rays).

    Scene-spanning triangles are split out and brute-forced first
    (split_by_size): they're few, and their hits seed best_t so the
    nearest-first certificate has a real upper bound from the start.
    The rest forms tight Morton clusters.

    Rounds (all candidate selection via the fused Pallas kernel — the
    XLA top_k formulation both measured 85 ms at 2M rays AND produced a
    program the TPU compiler dies on once the exhaustive round is
    inlined):
      1. every ray x its l1 nearest passing clusters, certified by the
         entry of rank l1 (the first untested candidate);
      2. one catch-all escalation: unresolved rays (compacted to a
         rpad/(4*u2_frac) prefix) x ALL remaining ranks up to l3, with
         per-ray progress tracking (`done`);
      3. a small-capacity while loop repeating (2) for capacity
         overflow;
      4. a dense brute-force tail loop that runs to completion —
         unconditional progress, so the result is EXACT for every
         workload (the tail absorbs rays needing rank > l3 and any
         capacity overflow; its iteration count, not correctness,
         depends on the workload).
    `mxu=True` swaps the pairs-round compute onto the MXU Plucker
    kernel (ops/pallas/pair_mxu.py, march-scene packs, visit-list
    grid, in-kernel exact refine + sticky per-ray pend) — same
    schedule, same certificates, same unconditional tail; the pend
    flag only ever forces MORE rays through the tail, never fewer
    tests, so exactness is unchanged.

    `with_ids=True` (requires thin, move != 'chain'): intersect
    returns (Hits, ids) with ids (R,) int32 = ORIGINAL scene triangle
    index of each winner, -1 on miss — the first_intersect_ids
    contract for large scenes (feeds ops/shading.py). Pair-round
    winners map through the march permutation; seed/tail winners come
    from the minarg kernel (bit-identical math to the fused brute,
    plus the index), recorded in an ids overlay. The tail always runs
    the gather body in this mode.

    `move="sort"` swaps each escalation's data movement from u-row
    gathers/scatters onto two fixed-cost wide sorts: the compaction
    sort carries the 6 ray components and `done` in (9 operands,
    (flag, slot) 2-key — +~2 ms over the bare (flag, slot) sort at
    2M rows), and one slot-keyed back sort carries the results,
    certificate bounds, and progress out, merged full-width with
    `where`s. Rationale (docs/BENCHMARKS.md primitive table): a
    gather or scatter costs ~13-15 ms per 1M rows and does NOT fuse,
    and the gather escalation moves ~13 gathered + ~8 scattered
    u-row arrays per call (~60 ms at u=256k, ~300 ms at u=1M), while
    a 2M-row sort costs ~1.6 ms per operand. The escalated ray SET
    can differ from move="gather" under capacity overflow (the
    2-key prefix is slot-ordered, the 1-key one is unspecified), but
    hits are exact either way — overflow rays are absorbed by later
    iterations or the unconditional dense tail.

    `thin=True` (requires mxu) shrinks every data-movement payload to
    (t, g) with g the winning cluster-ordered global triangle id: the
    visit kernel streams 2 rows instead of 5, pair-row back sorts
    carry 3 operands instead of 6, escalation back sorts 5 instead of
    9. The attributes are recovered ONCE per ray at the end
    (pair_mxu.fetch_attrs — the same tab3 one-hot dot the kernel's
    refine uses, so recovered values are bit-identical); seed and
    dense-tail results, which arrive in attribute form, live in a
    full-width overlay selected wherever the winning source was not a
    pair round (g = -1). Merge rules (strict <, monotone done, sticky
    pend, unconditional tail) are unchanged, so exactness is too.

    Hit results equal the dense kernel's for all inputs; capacities
    and schedule only trade time. Defaults (v5e-measured, 100k-tri
    stress scene): l1=8 certifies 86% of real wavefront rays in round
    1 (cert ranks: p50=2, p90=11, misses ~ their npass <= 45); the
    escalation infrastructure (compaction sort, prefix gather/scatter,
    selection) costs ~100+ ms per call at 1M-prefix scale, so ONE wide
    catch-all beats any multi-round march schedule. End-to-end on the
    steady-state stress wavefront: ~720 ms for 2M rays (~2.9 Mrays/s)
    with 0 hit flips vs the dense kernel — the honest cost of
    guaranteed-exact incoherent-ray traversal on this architecture
    (round-1's per-tile culling was 5+ s AND the earlier capacity-
    trusting variant produced half-wrong hits on this workload).
    """
    from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
        make_pallas_intersect,
    )

    if dop and not mxu:
        raise ValueError(
            "dop=True requires mxu=True (DOP supports are built from "
            "the march scene's cluster-ordered triangles)"
        )
    if move not in ("gather", "sort", "chain"):
        raise ValueError(f"unknown move mode {move!r}")
    if infeat and not mxu:
        raise ValueError("infeat=True requires mxu=True")
    if thin and not mxu:
        raise ValueError("thin=True requires mxu=True (triangle ids "
                         "come from the cluster-ordered march packs)")
    if move == "chain":
        if not thin:
            raise ValueError(
                "move='chain' requires thin=True (the chain carries "
                "the (t, tri-id) payload; attribute payloads would "
                "void its sort-volume economics)")
        if l3 >= 64:
            raise ValueError("move='chain' folds march progress into "
                             "a *128 sort key; l3 must be < 64")
    if approx and with_ids:
        raise ValueError("approx=True returns (Hits, resolved) and "
                         "skips the escalations the ids overlay rides "
                         "on; use it without with_ids")
    if with_ids and not thin:
        raise ValueError("with_ids=True requires thin=True (only the "
                         "thin payload carries winner triangle ids)")
    if with_ids and move == "chain":
        raise ValueError("with_ids=True does not support move='chain' "
                         "(the chain tail reports cluster-ordered ids "
                         "through a different id space; use "
                         "move='sort'/'gather')")
    big, rest, big_idx, rest_idx = split_by_size(tris,
                                                 with_indices=True)
    if rest is None:   # degenerate: everything is scene-spanning
        if with_ids:
            from opencl_path_tracer_tpu.ops.pallas.plucker_kernel \
                import make_minarg_intersect
            return make_minarg_intersect(tris, with_ids=True,
                                         interpret=interpret)
        return make_pallas_intersect(tris, interpret=interpret)
    cluster_size = _auto_cluster_size(rest.count, cluster_size)
    if with_ids:
        # Seed/tail run the minarg kernel instead of the fused brute:
        # same math bit-for-bit (its docstring contract), plus the
        # winner index the fused kernel never materializes.
        from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
            make_minarg_intersect,
        )
        big_isect = (make_minarg_intersect(big, with_ids=True,
                                           interpret=interpret)
                     if big is not None else None)
        big_map = (jnp.asarray(big_idx, jnp.int32)
                   if big is not None else None)
    else:
        big_isect = (make_pallas_intersect(big, interpret=interpret)
                     if big is not None else None)

    if mxu:
        # MXU pairs round (pair v5): march-scene Plucker packs +
        # visit-list kernel; the schedule below is shared with v4 and
        # additionally threads the per-ray pend flag (see pair_mxu).
        from opencl_path_tracer_tpu.ops.pallas.march_kernel import (
            build_march_scene,
        )
        from opencl_path_tracer_tpu.ops.pallas.pair_mxu import (
            build_dops, pairs_round_mxu,
        )
        if with_ids:
            mscene, _rt, c, march_order = build_march_scene(
                rest, cluster_size, with_order=True)
            # Cluster-ordered global id g -> ORIGINAL scene triangle
            # index: row j of the march order is rest[march_order[j]],
            # which is original rest_idx[march_order[j]]; padding rows
            # (never winners) map to -1.
            gmap = np.full((c * cluster_size,), -1, np.int32)
            gmap[:len(march_order)] = np.asarray(rest_idx)[march_order]
            g_to_orig = jnp.asarray(gmap)
        else:
            mscene, _rt, c = build_march_scene(rest, cluster_size)
        boxes = jnp.concatenate(
            [mscene.boxes_lo, mscene.boxes_hi,
             jnp.zeros((c, 2), jnp.float32)], axis=1,
        )
        if dop:
            # 14-DOP candidate culling/certificates: tighter entry
            # bounds (measured -20% per-lane need), same exactness
            # argument (support intervals contain every vertex).
            boxes = jnp.concatenate(
                [boxes, build_dops(_rt, cluster_size, c)], axis=1,
            )

        def run_pairs_fn(comps_in, ids):
            return pairs_round_mxu(comps_in, ids, mscene, c,
                                   cluster_size, trp, interpret,
                                   infeat, thin)

        if thin:
            from opencl_path_tracer_tpu.ops.pallas.pair_mxu import (
                fetch_attrs,
            )

            def fetch_fn(g):
                return fetch_attrs(g, mscene, cluster_size, c, trp,
                                   interpret)
        else:
            fetch_fn = None

        if move == "chain":
            # Chain-mode dense tail: min+argmin over the MARCH-ordered
            # triangles (`_rt` is the cluster-major reorder, so the
            # argmin row index IS the cluster-ordered global id that
            # `fetch_attrs` decodes — cluster k occupies rows
            # [k*cs, (k+1)*cs), only the last cluster is partial, and
            # `build_tri_pack` pad rows never hit). Scene-spanning
            # triangles are excluded on purpose: their exact result
            # already seeded `best0` via `big_isect`, so min-merging
            # the rest-only tail keeps the union exhaustive.
            from opencl_path_tracer_tpu.ops.pallas.intersect_kernel \
                import _run_minarg, build_tri_pack
            tail_pack = build_tri_pack(_rt, 1024)
            tt_tail = min(1024, tail_pack.shape[0])

            def tail_minarg_fn(rays8, u):
                tr = math.gcd(u, 1024)   # divides u, <= 1024
                return _run_minarg(rays8, tail_pack, tr, tt_tail,
                                   interpret)
        else:
            tail_minarg_fn = None
    else:
        scene, c, _k = build_clusters(rest, cluster_size,
                                      split_large=False)
        boxes = scene.boxes
        # Dummy cluster C: all-zero (never-hit) triangles for invalid
        # pairs.
        tri_pack = jnp.concatenate(
            [scene.tri_pack,
             jnp.zeros((1,) + scene.tri_pack.shape[1:], jnp.float32)]
        )
        resident = interpret  # no DMA emulation on the interpret path

        def run_pairs_fn(comps_in, ids):
            return _pairs_round(comps_in, ids, tri_pack, trp,
                                interpret, resident), None

    cp = -(-c // 128) * 128
    # Scoped-VMEM budget of the candidates kernel: its live
    # temporaries are (CP, TRB) f32 tiles (~6.5 of them), against
    # Mosaic's 16 MB scoped limit — measured OOM at cp=1280 x trb=512
    # (17.04 M requested; 300k-tri scene). Halve the ray tile until
    # the footprint fits with headroom, so the same winner config
    # scales from 100k to 1M+ triangles without manual retuning.
    while cp * trb > 480_000 and trb > 128:
        # floor 128: Pallas requires the block's minor dim % 128 == 0
        trb //= 2
    boxes_r = jnp.zeros(
        (cp, boxes.shape[1]), jnp.float32
    ).at[:c, :].set(boxes)
    l1 = min(l1, c)
    l2 = min(l2, c)
    l3 = min(l3, c)
    # Unconditional: also the safety net for rays that overflow the
    # escalation prefix capacities (without it they'd silently keep
    # their round-1 best — a latent wrong-hit, not just a slow path).
    if with_ids:
        # Scalable ids tail: the minarg PASS grids over tt blocks (any
        # scene size), but make_minarg_intersect's refine holds a
        # (64, tpad) table + a (tpad, tr) one-hot in VMEM — 205 MB at
        # 100k tris (measured scoped-vmem OOM, job zs6). The tail
        # processes <= `tail` rays per iteration, so winner attributes
        # come from tiny XLA gathers over the ORIGINAL arrays instead:
        # same values as the pack fetch (the pack is built from
        # tris.n/mati verbatim), t bit-identical to the fused kernel
        # (the minarg contract).
        from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
            _run_minarg, build_tri_pack,
        )
        tail_tt = 1024
        tail_pack = build_tri_pack(tris, tail_tt)
        tail_tt_eff = min(tail_tt, tail_pack.shape[0])
        n_cols = tuple(jnp.asarray(np.asarray(tris.n)[:, k])
                       for k in range(3))
        mati_col = jnp.asarray(np.asarray(tris.mati), jnp.float32)

        def tail_isect_ids(subrays):
            rr = subrays.p[0].shape[0]
            rrpad = _round_up(rr, 128)
            rays8s = pack_rays(subrays.p, subrays.d, rrpad)
            t1, g1 = _run_minarg(rays8s, tail_pack, min(128, rrpad),
                                 tail_tt_eff, interpret)
            t = t1[0, :rr]
            g = g1[0, :rr].astype(jnp.int32)
            hit = t < BIG
            safe = jnp.clip(g, 0, int(tris.count) - 1)
            zz = jnp.zeros_like(t)
            safe_t = jnp.where(hit, t, 0.0)
            hp = tuple(
                jnp.where(hit, subrays.p[k] + subrays.d[k] * safe_t,
                          zz)
                for k in range(3)
            )
            hits = Hits(
                t=jnp.where(hit, t, -1.0),
                p=hp,
                n=tuple(jnp.take(n_cols[k], safe) for k in range(3)),
                mati=jnp.where(hit, jnp.take(mati_col, safe),
                               0.0).astype(jnp.int32),
            )
            return hits, jnp.where(hit, g, -1)

        def tail_isect(subrays):
            return tail_isect_ids(subrays)[0]
    else:
        tail_isect_ids = None
        tail_isect = make_pallas_intersect(tris, interpret=interpret)

    def intersect(rays: Rays) -> Hits:
        r = rays.p[0].shape[0]
        rpad = -(-r // max(trp, trb)) * max(trp, trb)

        def pad(x):
            if rpad == r:
                return x
            return jnp.concatenate([x, jnp.zeros((rpad - r,), x.dtype)])

        comps = [pad(rays.p[i]) for i in range(3)] + [
            pad(rays.d[i]) for i in range(3)
        ]

        # Seed best with the scene-spanning triangles (brute, ~free).
        # thin mode keeps only (t, g) hot; attribute-domain sources
        # (this seed, the dense tail) live in the `overlay` arrays and
        # mark themselves with g = -1.
        zeros = jnp.zeros((rpad,), jnp.float32)
        seed_ids = jnp.full((rpad,), -1, jnp.int32) if with_ids else None
        if big_isect is not None:
            hb = big_isect(Rays(p=tuple(comps[:3]), d=tuple(comps[3:])))
            if with_ids:
                hb, bi = hb
                # bi indexes the `big` SUBSET; map to original ids.
                seed_ids = jnp.where(
                    hb.valid,
                    jnp.take(big_map, jnp.maximum(bi, 0)),
                    -1,
                )
            seed_t = jnp.where(hb.valid, hb.t, BIG)
            seed_attrs = (hb.n[0], hb.n[1], hb.n[2],
                          hb.mati.astype(jnp.float32))
        else:
            seed_t = jnp.full((rpad,), BIG, jnp.float32)
            seed_attrs = (zeros, zeros, zeros, zeros)
        if thin:
            best0 = (seed_t, jnp.full((rpad,), -1.0, jnp.float32))
            overlay = seed_attrs
        else:
            best0 = (seed_t,) + seed_attrs
            overlay = None

        # Round 1: l1 nearest candidates for every ray (fused kernel).
        rays8t = pack_rays(tuple(comps[:3]), tuple(comps[3:]), rpad)
        ids1, _ent1, nxt1 = _run_candidates(
            rays8t, boxes_r, l1, c, trb, interpret
        )
        new1, pend_ray = run_pairs_fn(comps, ids1)
        best = _merge_best(best0, new1)
        resolved = ((best[0] <= nxt1) | (nxt1 >= BIG))
        if pend_ray is not None:
            # A pend pair (both top-2 bf16 candidates spurious) means
            # that cluster's test may be incomplete: the ray must not
            # certify until the dense tail re-tests it exhaustively.
            resolved = resolved & ~pend_ray

        if approx:
            # Round-1-only mode (the VERDICT r4 #4 "approximate-first"
            # phase, built to MEASURE the two-phase stress design):
            # return best-so-far plus the per-ray certificate —
            # resolved lanes are PROVEN nearest (same certificate as
            # the exact path), unresolved lanes may carry any
            # passing hit or a spurious miss. Not a drop-in
            # intersect_fn: callers own the debiasing/stall policy.
            if thin:
                fnx, fny, fnz, fm = fetch_fn(best[1])
                use = best[1] >= 0.0
                n3 = tuple(
                    jnp.where(use, f, o)
                    for f, o in zip((fnx, fny, fnz), overlay[:3])
                )
                m = jnp.where(use, fm, overlay[3])
                return (_hits_from_raw(rays, best[0], n3, m, r),
                        resolved[:r])
            return (_hits_from_raw(rays, best[0], best[1:4], best[4],
                                   r), resolved[:r])

        # Escalations never permute the per-ray arrays: unresolved rays
        # are COMPACTED via a 2-array (flag, iota) sort + u-row gathers,
        # results merge back with u-row scatters. (v1 co-sorted all 13
        # arrays per round — ~27 ms per compaction at 2M rays, paid
        # even when <2% of rays were unresolved — plus a 6-array final
        # un-permute sort. Gather/scatter costs scale with u instead.)
        slot = jnp.arange(rpad, dtype=jnp.int32)

        def unresolved_prefix(resolved, u):
            # (flag, slot) sort: 12.2 ms at 2M — measured CHEAPER than
            # the jnp.nonzero(size=u) compaction (23.2 ms).
            srt = jax.lax.sort(
                [resolved.astype(jnp.int32), slot], num_keys=1
            )
            return srt[1][:u]

        # Per-ray march progress: done[i] = candidate ranks of ray i
        # already tested. Escalations test each ray's NEXT W untested
        # ranks (take_along_axis windows into the rank-ordered
        # candidate matrix) instead of a fixed global 0..hi window:
        # measured on the stress wavefront, cert ranks are p50=2 /
        # p90=11 / miss rays ~npass<=45, so global windows re-test up
        # to 10x the useful pairs and the step collapsed to ~1.2 s.
        done = jnp.full((rpad,), l1, jnp.int32)
        maxrank = min(l3, c)

        def escalation(best, resolved, done, pend, u, w, sel):
            """Gather the first u unresolved rays; test each one's next
            w untested candidate ranks; scatter-merge. `sel` is the
            static candidate-selection depth for this call — every ray
            in the call satisfies done + w <= sel, so early passes run
            a shallow (cheap) selection instead of the full maxrank one
            (the selection loop is serial: 49 passes measured 30 ms at
            1M rays where 9 would do). A ray whose march passes sel
            stays unresolved (later, deeper passes or the tail handle
            it); rays beyond the u-capacity stay unresolved so the next
            iteration sees them."""
            idx = unresolved_prefix(resolved, u)
            sub = [x[idx] for x in comps]
            sub8t = pack_rays(tuple(sub[:3]), tuple(sub[3:]), u)
            ids_all, ents_all, nxt = _run_candidates(
                sub8t, boxes_r, sel, c, trb, interpret
            )                       # rank-major: (sel, u), (sel, u)
            d0 = done[idx]                                   # (u,)
            rows = (d0[None, :]
                    + jnp.arange(w, dtype=jnp.int32)[:, None])  # (w, u)
            in_rank = rows < sel
            ids = jnp.where(
                in_rank,
                jnp.take_along_axis(
                    ids_all, jnp.clip(rows, 0, sel - 1), axis=0
                ),
                c,                                           # dummy
            )
            new_sub, pend_sub = run_pairs_fn(sub, ids)
            merged = _merge_best(tuple(b[idx] for b in best), new_sub)
            best2 = tuple(
                b.at[idx].set(m) for b, m in zip(best, merged)
            )
            d1 = jnp.minimum(d0 + w, sel)
            # Certificate bound = entry of the first still-untested
            # rank (nxt covers d1 == sel).
            bound = jnp.where(
                d1 < sel,
                jnp.take_along_axis(
                    ents_all, jnp.clip(d1, 0, sel - 1)[None, :],
                    axis=0,
                )[0],
                nxt,
            )
            res_sub = (merged[0] <= bound) | (bound >= BIG)
            if pend is not None:
                # Sticky pend: once any of a ray's tested clusters
                # ended pend, only the dense tail may resolve it.
                pend = pend.at[idx].set(pend[idx] | pend_sub)
                res_sub = res_sub & ~pend[idx]
            # Guard already-resolved rays in the (padded) prefix: keep
            # their True flag.
            res2 = resolved.at[idx].set(resolved[idx] | res_sub)
            # Monotone march progress: already-resolved rays gathered as
            # prefix padding may be handed a shallower sel than ranks
            # they already tested — never lower their done.
            return (best2, res2, done.at[idx].set(jnp.maximum(d0, d1)),
                    pend)

        def escalation_sort(best, resolved, done, pend, u, w, sel):
            """`escalation` with sort-carried movement (see the
            factory docstring): comps+done ride the compaction sort
            in; results, certificate bounds, and progress ride one
            slot-keyed sort out and merge full-width. Semantics match
            `escalation` exactly per ray (min-merge, monotone done,
            sticky pend, OR-resolved); only the overflow ray SET can
            differ, which exactness does not depend on."""
            fold_done = thin and maxrank < 64 and rpad < (1 << 25)
            if fold_done:
                # done rides the slot key (slot*64+done — same order,
                # done is per-slot unique): one fewer 2M-row operand.
                srt = jax.lax.sort(
                    [resolved.astype(jnp.int32), slot * 64 + done,
                     *comps],
                    num_keys=2,
                )
                slot_s = srt[1] // 64
                d0 = (srt[1] - slot_s * 64)[:u]
                sub = [x[:u] for x in srt[2:8]]
            else:
                srt = jax.lax.sort(
                    [resolved.astype(jnp.int32), slot, *comps, done],
                    num_keys=2,
                )
                slot_s = srt[1]
                sub = [x[:u] for x in srt[2:8]]
                d0 = srt[8][:u]
            sub8t = pack_rays(tuple(sub[:3]), tuple(sub[3:]), u)
            ids_all, ents_all, nxt = _run_candidates(
                sub8t, boxes_r, sel, c, trb, interpret
            )
            rows = (d0[None, :]
                    + jnp.arange(w, dtype=jnp.int32)[:, None])
            in_rank = rows < sel
            ids = jnp.where(
                in_rank,
                jnp.take_along_axis(
                    ids_all, jnp.clip(rows, 0, sel - 1), axis=0
                ),
                c,
            )
            new_sub, pend_sub = run_pairs_fn(sub, ids)
            d1 = jnp.minimum(d0 + w, sel)
            bound = jnp.where(
                d1 < sel,
                jnp.take_along_axis(
                    ents_all, jnp.clip(d1, 0, sel - 1)[None, :],
                    axis=0,
                )[0],
                nxt,
            )
            pad = rpad - u

            def ext(x, fill):
                if not pad:
                    return x
                return jnp.concatenate(
                    [x, jnp.full((pad,), fill, x.dtype)]
                )

            if thin:
                # 5-operand back sort: (t, g*2+pend) replace the 5
                # attribute payloads (g junk on miss rows — strict-<
                # merge never consumes it; pend guarded by `touched`
                # so the -1 fill can't raise it).
                g2p = (new_sub[1] * 2.0
                       + pend_sub.astype(jnp.float32))
                back = jax.lax.sort(
                    [slot_s, ext(new_sub[0], BIG), ext(g2p, -1.0),
                     ext(bound, -1.0),
                     ext(jnp.maximum(d0, d1), jnp.int32(-1))],
                    num_keys=1,
                )
                t_b, g2p_b, bound_b, done_b = back[1:]
                touched = done_b >= 0
                g_b = jnp.floor(g2p_b / 2.0)
                best = _merge_best(best, (t_b, g_b))
                done2 = jnp.where(touched,
                                  jnp.maximum(done, done_b), done)
                pend = pend | (touched & (g2p_b - 2.0 * g_b > 0.0))
                res_new = (touched
                           & ((best[0] <= bound_b) | (bound_b >= BIG))
                           & ~pend)
                return best, resolved | res_new, done2, pend
            pend_i = (pend_sub.astype(jnp.int32) if pend_sub is not None
                      else jnp.zeros((u,), jnp.int32))
            back = jax.lax.sort(
                [slot_s,
                 ext(new_sub[0], BIG), ext(new_sub[1], 0.0),
                 ext(new_sub[2], 0.0), ext(new_sub[3], 0.0),
                 ext(new_sub[4], 0.0), ext(bound, -1.0),
                 ext(jnp.maximum(d0, d1), jnp.int32(-1)),
                 ext(pend_i, jnp.int32(0))],
                num_keys=1,
            )
            t_b, nx_b, ny_b, nz_b, m_b, bound_b, done_b, pend_b = \
                back[1:]
            touched = done_b >= 0
            best = _merge_best(best, (t_b, nx_b, ny_b, nz_b, m_b))
            done2 = jnp.where(touched, jnp.maximum(done, done_b), done)
            if pend is not None:
                pend = pend | (touched & (pend_b > 0))
            res_new = touched & ((best[0] <= bound_b)
                                 | (bound_b >= BIG))
            if pend is not None:
                res_new = res_new & ~pend
            return best, resolved | res_new, done2, pend

        if move == "sort":
            escalation = escalation_sort

        # Round 2: one wide pass over a large unresolved prefix.
        unit = max(trp, trb)
        u2 = max(unit, (rpad // u2_frac // unit) * unit)

        if move == "chain":
            # -- Sort-resident escalation chain (pair v7) ----------
            # ONE full-width compaction sort moves the wavefront into
            # chain space (unresolved-first; march progress and pend
            # fold into the slot key; the running (t, g) best rides as
            # payload). Each escalation updates its prefix IN PLACE
            # (concatenate — no per-call back sort), and between tiers
            # only the shrinking live region is re-sorted. The dense
            # tail is also chain-resident: after one region compaction
            # it dense-tests fixed-size chunks with the march-ordered
            # min+argmin kernel (argmin row ids are exactly
            # fetch_attrs' id space), replacing the two full-width
            # sorts every tail iteration pays in move="sort". ONE
            # slot-keyed back sort restores ray order. The shared
            # full-width tail below remains compiled-in as the
            # unconditional safety net for rays that overflow every
            # region capacity (normally zero iterations). Escalation
            # semantics per ray (strict-< merge, monotone done, sticky
            # pend, OR-resolved, certificate bounds) are identical to
            # escalation_sort; only the overflow ray SET can differ,
            # which exactness does not depend on.
            assert rpad < (1 << 24), "chain slot-key fold needs r<16M"
            pendf = pend_ray.astype(jnp.int32)

            def _foldkey(slot_a, done_a, pend_a):
                return slot_a * 128 + done_a * 2 + pend_a

            def _unfold(key2):
                slot_a = key2 // 128
                rem = key2 - slot_a * 128
                return slot_a, rem // 2, rem - (rem // 2) * 2

            srt = jax.lax.sort(
                [resolved.astype(jnp.int32),
                 _foldkey(slot, done, pendf), *comps,
                 best[0], best[1]],
                num_keys=2,
            )
            slot_s, done_s, pend_s = _unfold(srt[1])
            state = (srt[0], done_s, pend_s, slot_s, list(srt[2:8]),
                     srt[8], srt[9])

            def chain_escalate(state, u, w, sel):
                """escalation_sort per-ray semantics on the chain-space
                prefix [:u]; write-back by concatenation."""
                res_s, done_s, pend_s, slot_s, comps_s, t_s, g_s = \
                    state
                sub = [x[:u] for x in comps_s]
                d0 = done_s[:u]
                sub8t = pack_rays(tuple(sub[:3]), tuple(sub[3:]), u)
                ids_all, ents_all, nxt = _run_candidates(
                    sub8t, boxes_r, sel, c, trb, interpret
                )
                rows = (d0[None, :]
                        + jnp.arange(w, dtype=jnp.int32)[:, None])
                in_rank = rows < sel
                ids = jnp.where(
                    in_rank,
                    jnp.take_along_axis(
                        ids_all, jnp.clip(rows, 0, sel - 1), axis=0
                    ),
                    c,
                )
                (t_new, g_new), pend_sub = run_pairs_fn(sub, ids)
                t0 = t_s[:u]
                better = t_new < t0
                t1 = jnp.where(better, t_new, t0)
                g1 = jnp.where(better, g_new, g_s[:u])
                d1 = jnp.minimum(d0 + w, sel)
                bound = jnp.where(
                    d1 < sel,
                    jnp.take_along_axis(
                        ents_all, jnp.clip(d1, 0, sel - 1)[None, :],
                        axis=0,
                    )[0],
                    nxt,
                )
                p1 = pend_s[:u] | pend_sub.astype(jnp.int32)
                r1_ = res_s[:u] | (
                    ((t1 <= bound) | (bound >= BIG)) & (p1 == 0)
                ).astype(jnp.int32)

                def cat(a, b):
                    return jnp.concatenate([a, b])

                return (cat(r1_, res_s[u:]),
                        cat(jnp.maximum(d0, d1), done_s[u:]),
                        cat(p1, pend_s[u:]), slot_s, comps_s,
                        cat(t1, t_s[u:]), cat(g1, g_s[u:]))

            def region_sort(state, R):
                res_s, done_s, pend_s, slot_s, comps_s, t_s, g_s = \
                    state
                srt = jax.lax.sort(
                    [res_s[:R],
                     _foldkey(slot_s[:R], done_s[:R], pend_s[:R]),
                     *[x[:R] for x in comps_s], t_s[:R], g_s[:R]],
                    num_keys=2,
                )
                sl2, dn2, pn2 = _unfold(srt[1])

                def cat(a, b):
                    return jnp.concatenate([a, b])

                return (cat(srt[0], res_s[R:]), cat(dn2, done_s[R:]),
                        cat(pn2, pend_s[R:]), cat(sl2, slot_s[R:]),
                        [cat(srt[2 + i], comps_s[i][R:])
                         for i in range(6)],
                        cat(srt[8], t_s[R:]), cat(srt[9], g_s[R:]))

            if l2 > l1:
                state = chain_escalate(state, u2, l2 - l1,
                                       min(maxrank, l2))
            if maxrank > l2:
                u3a_c = max(unit,
                            (rpad // u2_frac // 4 // unit) * unit)
                u3b_c = max(unit,
                            (rpad // u2_frac // 16 // unit) * unit)
                state = region_sort(state, u2)
                state = chain_escalate(state, u3a_c, 8,
                                       min(maxrank, l2 + 8))
                state = region_sort(state, u3a_c)
                state = chain_escalate(state, u3b_c, maxrank - l2,
                                       maxrank)
            # Chain-resident dense tail over the [0:u2] region: every
            # ray the fwd sort placed within escalation range lives
            # there; anything deeper (fwd-sort overflow) falls to the
            # full-width safety net below.
            state = region_sort(state, u2)
            res_s, done_s, pend_s, slot_s, comps_s, t_s, g_s = state
            unres = jnp.sum(1 - res_s[:u2])
            u4c = min(tail, u2)

            def tail_body(carry):
                t_s, g_s, res_s, k = carry
                off = k * u4c
                sub = [jax.lax.dynamic_slice(x, (off,), (u4c,))
                       for x in comps_s]
                rays8 = pack_rays(tuple(sub[:3]), tuple(sub[3:]),
                                  u4c)
                tt_, gg_ = tail_minarg_fn(rays8, u4c)
                t0 = jax.lax.dynamic_slice(t_s, (off,), (u4c,))
                g0 = jax.lax.dynamic_slice(g_s, (off,), (u4c,))
                better = tt_[0] < t0
                t_s = jax.lax.dynamic_update_slice(
                    t_s, jnp.where(better, tt_[0], t0), (off,))
                g_s = jax.lax.dynamic_update_slice(
                    g_s, jnp.where(better, gg_[0], g0), (off,))
                res_s = jax.lax.dynamic_update_slice(
                    res_s, jnp.ones((u4c,), jnp.int32), (off,))
                return (t_s, g_s, res_s, k + 1)

            t_s, g_s, res_s, _ = jax.lax.while_loop(
                lambda ca: ca[3] * u4c < unres, tail_body,
                (t_s, g_s, res_s, jnp.int32(0)),
            )
            back = jax.lax.sort(
                [slot_s, t_s, g_s, res_s], num_keys=1,
            )
            best = (back[1], back[2])
            resolved = back[3] > 0

        if move != "chain" and l2 > l1:
            best, resolved, done, pend_ray = escalation(
                best, resolved, done, pend_ray, u2, l2 - l1,
                min(maxrank, l2)
            )
        # Round 3: ONE catch-all escalation testing every remaining
        # rank (window = maxrank - l2), then a small-capacity while
        # loop for capacity overflow. Measured: every escalation call
        # carries ~200 ms of infrastructure at 1M-prefix scale (the
        # prefix gathers and scatter-merges do NOT fuse inside the real
        # graph the way isolated microbenchmarks suggested), so one
        # wide call beats any multi-round march schedule even though
        # its pair list is dummy-heavy.
        if move != "chain" and maxrank > l2:
            w3 = maxrank - l2
            # Tier A: most uncertified rays need only a few more ranks
            # (cert p90 = 11 on the stress wavefront) — wide capacity,
            # narrow window. Tier B: the deep tail (corridors, misses)
            # — small capacity, window to maxrank. Splitting the
            # catch-all this way halves its dummy-pair sort volume.
            u3a = max(unit, (rpad // u2_frac // 4 // unit) * unit)
            best, resolved, done, pend_ray = escalation(
                best, resolved, done, pend_ray, u3a, 8,
                min(maxrank, l2 + 8)
            )
            u3b = max(unit, (rpad // u2_frac // 16 // unit) * unit)
            best, resolved, done, pend_ray = escalation(
                best, resolved, done, pend_ray, u3b, w3, maxrank
            )
            u3 = max(unit, (rpad // u3_frac // unit) * unit)

            def body3(carry):
                best, resolved, done, pend, it = carry
                best, resolved, done, pend = escalation(
                    best, resolved, done, pend, u3, w3, maxrank
                )
                return (best, resolved, done, pend, it + 1)

            # Exit once no unresolved ray can still make rank progress
            # (done == maxrank rays are dense-tail work, not escalation
            # work — extra passes would test only dummy pairs).
            best, resolved, done, pend_ray, _ = jax.lax.while_loop(
                lambda ca: (ca[4] < 4) & jnp.any(~ca[1]
                                                 & (ca[2] < maxrank)),
                body3, (best, resolved, done, pend_ray, jnp.int32(0)),
            )

        # Tail: exhaustive dense test, looped to completion. Unlike the
        # windowed rounds this resolves every processed ray
        # unconditionally, so progress (u4 rays/iteration) and
        # termination are guaranteed — it is both the certifier of
        # last resort and the capacity-overflow safety net.
        u4 = min(tail, rpad)

        def body4(carry):
            best, resolved = carry
            idx = unresolved_prefix(resolved, u4)
            subrays = Rays(p=tuple(x[idx] for x in comps[:3]),
                           d=tuple(x[idx] for x in comps[3:]))
            ht = tail_isect(subrays)
            new_sub = (jnp.where(ht.valid, ht.t, BIG),
                       ht.n[0], ht.n[1], ht.n[2],
                       ht.mati.astype(jnp.float32))
            merged = _merge_best(tuple(b[idx] for b in best), new_sub)
            best = tuple(
                b.at[idx].set(m) for b, m in zip(best, merged)
            )
            return (best, resolved.at[idx].set(True))

        def body4_sort(carry):
            # Sort-carried tail iteration (move="sort"): gathers and
            # scatters have a ~6-8 ms FIXED cost each on TPU even at
            # 8k rows, so the 11 of them in body4 dominate a tail
            # iteration; two wide sorts replace them all.
            best, resolved = carry
            srt = jax.lax.sort(
                [resolved.astype(jnp.int32), slot, *comps],
                num_keys=2,
            )
            slot_s = srt[1]
            sub = [x[:u4] for x in srt[2:8]]
            ht = tail_isect(Rays(p=tuple(sub[:3]), d=tuple(sub[3:])))
            pad = rpad - u4

            def ext(x, fill):
                if not pad:
                    return x
                return jnp.concatenate(
                    [x, jnp.full((pad,), fill, x.dtype)]
                )

            back = jax.lax.sort(
                [slot_s,
                 ext(jnp.where(ht.valid, ht.t, BIG), BIG),
                 ext(ht.n[0], 0.0), ext(ht.n[1], 0.0),
                 ext(ht.n[2], 0.0),
                 ext(ht.mati.astype(jnp.float32), 0.0),
                 ext(jnp.ones((u4,), jnp.int32), jnp.int32(0))],
                num_keys=1,
            )
            best = _merge_best(best, tuple(back[1:6]))
            return (best, resolved | (back[6] > 0))

        def body4_thin(carry):
            best, ov, resolved = carry
            idx = unresolved_prefix(resolved, u4)
            subrays = Rays(p=tuple(x[idx] for x in comps[:3]),
                           d=tuple(x[idx] for x in comps[3:]))
            ht = tail_isect(subrays)
            new_t = jnp.where(ht.valid, ht.t, BIG)
            t_cur = best[0][idx]
            better = new_t < t_cur
            best = (
                best[0].at[idx].set(jnp.where(better, new_t, t_cur)),
                best[1].at[idx].set(
                    jnp.where(better, -1.0, best[1][idx])
                ),
            )
            attrs = (ht.n[0], ht.n[1], ht.n[2],
                     ht.mati.astype(jnp.float32))
            ov = tuple(
                o.at[idx].set(jnp.where(better, a, o[idx]))
                for o, a in zip(ov, attrs)
            )
            return (best, ov, resolved.at[idx].set(True))

        def body4_sort_thin(carry):
            best, ov, resolved = carry
            srt = jax.lax.sort(
                [resolved.astype(jnp.int32), slot, *comps],
                num_keys=2,
            )
            slot_s = srt[1]
            sub = [x[:u4] for x in srt[2:8]]
            ht = tail_isect(Rays(p=tuple(sub[:3]), d=tuple(sub[3:])))
            pad = rpad - u4

            def ext(x, fill):
                if not pad:
                    return x
                return jnp.concatenate(
                    [x, jnp.full((pad,), fill, x.dtype)]
                )

            back = jax.lax.sort(
                [slot_s,
                 ext(jnp.where(ht.valid, ht.t, BIG), BIG),
                 ext(ht.n[0], 0.0), ext(ht.n[1], 0.0),
                 ext(ht.n[2], 0.0),
                 ext(ht.mati.astype(jnp.float32), 0.0),
                 ext(jnp.ones((u4,), jnp.int32), jnp.int32(0))],
                num_keys=1,
            )
            t_b = back[1]
            better = t_b < best[0]
            best = (jnp.where(better, t_b, best[0]),
                    jnp.where(better, -1.0, best[1]))
            ov = tuple(
                jnp.where(better, a, o) for o, a in zip(ov, back[2:6])
            )
            return (best, ov, resolved | (back[6] > 0))

        def body4_thin_ids(carry):
            # Gather-style tail that ALSO records the winner's
            # ORIGINAL triangle id (tail_isect_ids = minarg over the
            # original-order scene, so ids need no mapping). with_ids
            # always uses this body: threading ids through the
            # sort-carried tail would add a sort operand for a
            # capability mode that is not the perf headline.
            best, ov, ids_ov, resolved = carry
            idx = unresolved_prefix(resolved, u4)
            subrays = Rays(p=tuple(x[idx] for x in comps[:3]),
                           d=tuple(x[idx] for x in comps[3:]))
            ht, hi = tail_isect_ids(subrays)
            new_t = jnp.where(ht.valid, ht.t, BIG)
            t_cur = best[0][idx]
            better = new_t < t_cur
            best = (
                best[0].at[idx].set(jnp.where(better, new_t, t_cur)),
                best[1].at[idx].set(
                    jnp.where(better, -1.0, best[1][idx])
                ),
            )
            attrs = (ht.n[0], ht.n[1], ht.n[2],
                     ht.mati.astype(jnp.float32))
            ov = tuple(
                o.at[idx].set(jnp.where(better, a, o[idx]))
                for o, a in zip(ov, attrs)
            )
            ids_ov = ids_ov.at[idx].set(
                jnp.where(better, hi, ids_ov[idx])
            )
            return (best, ov, ids_ov, resolved.at[idx].set(True))

        if thin and with_ids:
            best, overlay, seed_ids, resolved = jax.lax.while_loop(
                lambda ca: jnp.any(~ca[3]),
                body4_thin_ids,
                (best, overlay, seed_ids, resolved),
            )
            fnx, fny, fnz, fm = fetch_fn(best[1])
            use = best[1] >= 0.0
            n3 = tuple(
                jnp.where(use, f, o)
                for f, o in zip((fnx, fny, fnz), overlay[:3])
            )
            m = jnp.where(use, fm, overlay[3])
            g_int = jnp.clip(best[1].astype(jnp.int32), 0,
                             g_to_orig.shape[0] - 1)
            ids = jnp.where(use, jnp.take(g_to_orig, g_int), seed_ids)
            ids = jnp.where(best[0] < BIG, ids, -1)
            return _hits_from_raw(rays, best[0], n3, m, r), ids[:r]

        if thin:
            best, overlay, resolved = jax.lax.while_loop(
                lambda ca: jnp.any(~ca[2]),
                body4_sort_thin if move in ("sort", "chain")
                else body4_thin,
                (best, overlay, resolved),
            )
            fnx, fny, fnz, fm = fetch_fn(best[1])
            use = best[1] >= 0.0
            n3 = tuple(
                jnp.where(use, f, o)
                for f, o in zip((fnx, fny, fnz), overlay[:3])
            )
            m = jnp.where(use, fm, overlay[3])
            return _hits_from_raw(rays, best[0], n3, m, r)

        best, resolved = jax.lax.while_loop(
            lambda ca: jnp.any(~ca[1]),
            body4_sort if move == "sort" else body4,
            (best, resolved),
        )

        return _hits_from_raw(rays, best[0], best[1:4], best[4], r)

    return intersect
