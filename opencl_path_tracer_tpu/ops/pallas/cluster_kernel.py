"""Two-level cluster intersector (the TPU-native acceleration structure).

Pointer-chasing BVH traversal is hostile to a lockstep vector machine
(per-lane stacks, dependent gathers), and per-cluster `pl.when` gating
costs ~1-2us of scalar-branch overhead per cluster per tile — measured
to dominate everything. This design is BRANCHLESS in the hot kernel:

  Phase A (XLA, cheap): for every ray TILE, a conservative interval-
  arithmetic slab test of the tile's ray bounds (origin box + direction
  box) against every cluster AABB — (G, C) booleans, ~60 flops each —
  compacted per tile into a cluster-id list + count. Conservative:
  never culls a cluster any lane could hit (interval division by a
  direction range spanning 0 yields (-inf, inf) -> pass).

  Phase B (Pallas): grid over ray tiles; the whole Morton-clustered
  triangle pack is VMEM-resident as (C, 16, K=128) — per-cluster blocks
  on the UNTILED leading dim (dynamic indexing there is a plain address
  offset; dynamic slicing on tiled dims silently corrupts), fields on
  sublanes, triangles on lanes. Each tile runs ONE dynamic-bound
  fori_loop over its compacted list: read cluster id from SMEM, test
  the (TR, K) triangle block, min-update the (TR, 1) running best.
  No branches, no gathers, no transposes.

Coherent tiles (primary rays, locality-preserving bounces) touch a few
clusters; fully incoherent tiles degrade to testing every cluster
(= brute force, still correct). Triangle math identical to
ops/intersect.py (prog.cl:94-112 in m_k form); slab math from
prog.cl:123-143.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_path_tracer_tpu.accel.lbvh import morton3
from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Hits, Rays

BIG = 3.0e38


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields,
                                     meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class ClusterScene:
    boxes: jnp.ndarray     # (C, 8) f32 [lo3 hi3 0 0]; pad: lo=+BIG,hi=-BIG
    # (C, 24, K) field-rows x tri-lanes per cluster: rows 0-15 are the
    # intersection constants, row 16 is the material id (float-exact),
    # rows 17-23 pad the sublane dim to a tile multiple. The kernel
    # returns the winner's normal (rows 0-2) and material directly, so
    # hit assembly needs NO gathers (TPU gathers cost ~10ms/2M rays).
    tri_pack: jnp.ndarray


def build_clusters(tris: TrianglesSoA, cluster_size: int = 128,
                   split_large: bool = False,
                   ) -> tuple[ClusterScene, int, int]:
    """Morton-sort triangles into fixed-size clusters.
    Returns (scene, num_clusters, cluster_size).

    split_large: route triangles whose bbox diagonal exceeds 25% of the
    scene diagonal (walls, ground planes) into dedicated LEADING
    clusters instead of Morton cells. One wall triangle makes its Morton
    cluster's box span the scene, defeating culling for every ray;
    quarantined, the large-tri clusters pass every slab test (correct,
    they're few) while the remaining cluster boxes stay tight."""
    t_count = int(tris.count)
    k = cluster_size
    c = max(1, -(-t_count // k))
    total = c * k

    lo = jnp.minimum(jnp.minimum(tris.r1, tris.r2), tris.r3)
    hi = jnp.maximum(jnp.maximum(tris.r1, tris.r2), tris.r3)
    mid = (tris.r1 + tris.r2 + tris.r3) / 3.0
    scene_lo = lo.min(0)
    extent = jnp.maximum(hi.max(0) - scene_lo, 1e-9)
    codes = morton3((mid - scene_lo) / extent)
    if split_large:
        diag = jnp.linalg.norm(hi - lo, axis=1)
        scene_diag = jnp.linalg.norm(hi.max(0) - lo.min(0))
        # Large tris sort before every Morton code (codes are < 2^30).
        codes = jnp.where(diag > 0.25 * scene_diag,
                          jnp.uint32(0), codes | jnp.uint32(1 << 30))

    pad = total - t_count
    codes = jnp.concatenate(
        [codes, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)]
    )
    idx = jnp.arange(total, dtype=jnp.int32)
    _, order = jax.lax.sort_key_val(codes, idx)
    pad_mask = order >= t_count
    safe = jnp.where(pad_mask, 0, order)

    pack = jnp.concatenate(
        [
            tris.n, tris.c0[:, None],
            tris.m1, tris.d1[:, None],
            tris.m2, tris.d2[:, None],
            tris.m3, tris.d3[:, None],
        ],
        axis=1,
    ).astype(jnp.float32)[safe]
    pack = jnp.where(pad_mask[:, None], 0.0, pack)
    mati_f = jnp.where(
        pad_mask, 0.0, tris.mati[safe].astype(jnp.float32)
    )
    pack = jnp.concatenate(
        [pack, mati_f[:, None],
         jnp.zeros((total, 7), jnp.float32)], axis=1
    )  # (C*K, 24)
    # -> (C, K, 24) -> (C, 24, K): fields on sublanes, triangles on
    # lanes (dense VMEM tiles).
    pack3 = pack.reshape(c, k, 24).transpose(0, 2, 1)

    lo_r = jnp.where(pad_mask[:, None], BIG, lo[safe])
    hi_r = jnp.where(pad_mask[:, None], -BIG, hi[safe])
    c_lo = lo_r.reshape(c, k, 3).min(1)
    c_hi = hi_r.reshape(c, k, 3).max(1)
    boxes = jnp.concatenate(
        [c_lo, c_hi, jnp.zeros((c, 2), jnp.float32)], axis=1
    )

    return ClusterScene(boxes=boxes, tri_pack=pack3), c, k


# --------------------------------------------------------------------------
# Phase A: conservative per-tile cluster culling (XLA).


def _interval_slab(p_lo, p_hi, d_lo, d_hi, box_lo, box_hi):
    """Conservative slab test of a ray-bundle interval box against
    cluster boxes. p/d bounds: (G, 3); boxes: (C, 3).
    Returns (G, C) bool: True if ANY ray in the bundle COULD hit.

    Works axis-by-axis with (G, C) intermediates — NEVER (G, C, 3):
    a minor dim of 3 is lane-padded 128-wide on TPU, multiplying memory
    traffic ~40x.
    """
    g = p_lo.shape[0]
    c = box_lo.shape[0]
    tmin = jnp.full((g, c), -BIG, jnp.float32)
    tmax = jnp.full((g, c), BIG, jnp.float32)
    for ax in range(3):
        bl = box_lo[None, :, ax]                 # (1, C)
        bh = box_hi[None, :, ax]
        plo = p_lo[:, ax:ax + 1]                 # (G, 1)
        phi = p_hi[:, ax:ax + 1]
        dlo = d_lo[:, ax:ax + 1]
        dhi = d_hi[:, ax:ax + 1]

        # Interval reciprocal of D; a range spanning 0 leaves the axis
        # unconstrained (conservative).
        spans_zero = (dlo <= 0.0) & (dhi >= 0.0)
        r_lo = jnp.where(spans_zero, -BIG, 1.0 / dhi)   # (G, 1)
        r_hi = jnp.where(spans_zero, BIG, 1.0 / dlo)

        a_lo, a_hi = bl - phi, bl - plo          # (G, C)
        b_lo, b_hi = bh - phi, bh - plo

        def imul(x_lo, x_hi):
            c1, c2 = x_lo * r_lo, x_lo * r_hi
            c3, c4 = x_hi * r_lo, x_hi * r_hi
            return (
                jnp.minimum(jnp.minimum(c1, c2), jnp.minimum(c3, c4)),
                jnp.maximum(jnp.maximum(c1, c2), jnp.maximum(c3, c4)),
            )

        t1_lo, t1_hi = imul(a_lo, a_hi)
        t2_lo, t2_hi = imul(b_lo, b_hi)
        tmin = jnp.maximum(tmin, jnp.minimum(t1_lo, t2_lo))
        tmax = jnp.minimum(tmax, jnp.maximum(t1_hi, t2_hi))
    hit = (tmax >= tmin) & (tmax >= 0.0)
    # Entry lower bound (conservative): no ray in the bundle can reach
    # this cluster closer than max(tmin, 0).
    return hit, jnp.maximum(tmin, 0.0)


@functools.partial(jax.jit, static_argnums=(2,))
def _tile_cluster_lists(rays8: jnp.ndarray, boxes: jnp.ndarray,
                        tr: int):
    """Per ray-tile compacted cluster lists.
    rays8: (Rpad, 8) rows [p d 0 0]. Returns ids (G, C) int32 (passing
    clusters first, original Morton order), cnt (G, 1) int32."""
    rpad = rays8.shape[0]
    g = rpad // tr
    c = boxes.shape[0]
    tiles = rays8.reshape(g, tr, 8)
    # Padding rays are all-zero rows; their p=d=0 only loosens the
    # direction intervals to include 0 -> conservative pass, still
    # correct.
    p_lo = tiles[:, :, 0:3].min(1)    # (G, 3)
    p_hi = tiles[:, :, 0:3].max(1)
    d_lo = tiles[:, :, 3:6].min(1)
    d_hi = tiles[:, :, 3:6].max(1)

    hit, entry = _interval_slab(p_lo, p_hi, d_lo, d_hi,
                                boxes[:, 0:3], boxes[:, 3:6])

    # The slab entry bound collapses to 0 whenever the tile's direction
    # interval spans zero on every axis (always true for incoherent
    # bundles) — which silently disables nearest-first pruning. Ray
    # directions are unit length, so the Euclidean distance from the
    # tile's origin box to the cluster box is ALSO a lower bound on t;
    # take the max of both bounds.
    dist_sq = jnp.zeros_like(entry)
    for ax in range(3):
        gap = jnp.maximum(
            boxes[None, :, ax] - p_hi[:, ax:ax + 1],
            p_lo[:, ax:ax + 1] - boxes[None, :, ax + 3],
        )
        gap = jnp.maximum(gap, 0.0)
        dist_sq = dist_sq + gap * gap
    entry = jnp.maximum(entry, jnp.sqrt(dist_sq))

    # Compact, NEAREST-FIRST: sort each tile's clusters by conservative
    # entry distance (missed clusters key to BIG and sort last). The
    # kernel walks the list in this order and stops as soon as the next
    # entry bound exceeds every lane's current best hit. Shaped
    # (G, 1, C) / (G, 1, 1): tile index on the leading dim so SMEM
    # blocks satisfy the last-two-dims-match-array rule.
    key = jnp.where(hit, entry, BIG)
    order = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
    entry_sorted = jnp.take_along_axis(key, order, axis=1)
    cnt = jnp.sum(hit, axis=1, dtype=jnp.int32)
    return order, cnt[:, None], entry_sorted


# --------------------------------------------------------------------------
# Phase B: branchless per-tile triangle tests (Pallas).


def _kernel(ray_ref, cnt_ref, ids_ref, entry_ref, tri_ref, out_ref, *,
            subtiles: int, early_exit: bool):
    """out_ref: ONE (S*TR, 8) block, columns [t i nx ny nz m 0 0].
    Separate (N, 1) outputs are each lane-padded to 128 in VMEM (6 MB
    per 2048-ray block, double-buffered) — packing them into one row-8
    array is 6x smaller and is what lets blocks grow past 1k rays
    without blowing the 16 MB scoped-VMEM limit."""
    k = tri_ref.shape[2]
    str_ = ray_ref.shape[0]          # S * TR rays per instance
    tr = str_ // subtiles
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    col8 = jax.lax.broadcasted_iota(jnp.int32, (str_, 8), 1)
    out_ref[:] = jnp.where(col8 == 0, BIG, 0.0).astype(jnp.float32)

    # Several ray subtiles share one grid instance (and one copy of the
    # VMEM-resident scene): per-grid-step fixed costs (block DMAs, loop
    # setup, unpipelined sequencing around dynamic control flow) were
    # measured at ~4us/tile — the dominant cost for small scenes.
    for sub in range(subtiles):
        lo = sub * tr
        rays = ray_ref[lo:lo + tr, :]                       # (TR, 8)
        px, py, pz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
        dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]

        def body(slot, _, lo=lo, px=px, py=py, pz=pz, dx=dx, dy=dy,
                 dz=dz):
            ci = ids_ref[0, 0, sub, slot]
            blk = tri_ref[ci]                   # (24, K)

            def row(j):
                return blk[j:j + 1, :]          # (1, K)

            def pd(base):
                vx, vy, vz = row(base), row(base + 1), row(base + 2)
                pdot = px * vx + py * vy + pz * vz    # (TR, K)
                vdot = dx * vx + dy * vy + dz * vz
                return pdot, vdot

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
            tmin_k = jnp.min(tm, axis=1, keepdims=True)      # (TR, 1)
            local = jnp.argmin(tm, axis=1).reshape(tr, 1)
            gidx = (ci * k + local).astype(jnp.float32)

            # Winner attributes via lane one-hot (no gathers).
            onehot = (lane == local).astype(jnp.float32)     # (TR, K)
            win_nx = jnp.sum(onehot * row(0), axis=1, keepdims=True)
            win_ny = jnp.sum(onehot * row(1), axis=1, keepdims=True)
            win_nz = jnp.sum(onehot * row(2), axis=1, keepdims=True)
            win_m = jnp.sum(onehot * row(16), axis=1, keepdims=True)

            cur = out_ref[lo:lo + tr, 0:1]
            better = tmin_k < cur
            out_ref[lo:lo + tr, 0:1] = jnp.where(better, tmin_k, cur)
            out_ref[lo:lo + tr, 1:2] = jnp.where(
                better, gidx, out_ref[lo:lo + tr, 1:2]
            )
            out_ref[lo:lo + tr, 2:3] = jnp.where(
                better, win_nx, out_ref[lo:lo + tr, 2:3]
            )
            out_ref[lo:lo + tr, 3:4] = jnp.where(
                better, win_ny, out_ref[lo:lo + tr, 3:4]
            )
            out_ref[lo:lo + tr, 4:5] = jnp.where(
                better, win_nz, out_ref[lo:lo + tr, 4:5]
            )
            out_ref[lo:lo + tr, 5:6] = jnp.where(
                better, win_m, out_ref[lo:lo + tr, 5:6]
            )
            return slot + 1, jnp.max(out_ref[lo:lo + tr, 0:1])

        cnt = cnt_ref[0, 0, sub, 0]
        if early_exit:
            # Nearest-first early exit (list sorted by conservative
            # entry bound): once the next entry exceeds every lane's
            # best hit, no remaining cluster can improve any lane.
            # Costs ~2x per-iteration overhead vs the plain fori (while
            # loops pipeline worse in Mosaic) — worth it only when
            # incoherent tiles would otherwise walk most clusters.
            def cond(carry, sub=sub, cnt=cnt):
                slot, max_best = carry
                return ((slot < cnt)
                        & (entry_ref[0, 0, sub, slot] < max_best))

            jax.lax.while_loop(cond, lambda c: body(c[0], None),
                               (jnp.int32(0), jnp.float32(BIG)))
        else:
            jax.lax.fori_loop(
                0, cnt, lambda sl, _: (body(sl, None), 0)[1], 0
            )


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8))
def _run(rays8, cnt, ids, entry, tri_pack, tr: int, subtiles: int,
         early_exit: bool, interpret: bool):
    rpad = rays8.shape[0]
    c = tri_pack.shape[0]
    k = tri_pack.shape[2]
    g = rpad // tr
    s = subtiles
    # Metadata reshaped so each grid instance gets its S subtiles' rows:
    # (G, C) -> (G/S, 1, S, C) blocks via a (1, S, C) BlockSpec.
    ids3 = ids.reshape(g // s, s, c)[:, None]      # (G/S, 1, S, C)
    entry3 = entry.reshape(g // s, s, c)[:, None]
    cnt3 = cnt.reshape(g // s, s, 1)[:, None]
    kern = functools.partial(_kernel, subtiles=s,
                             early_exit=early_exit)
    outs = pl.pallas_call(
        kern,
        grid=(g // s,),
        in_specs=[
            pl.BlockSpec((tr * s, 8), lambda rt: (rt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, 1), lambda rt: (rt, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, s, c), lambda rt: (rt, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, s, c), lambda rt: (rt, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((c, 24, k), lambda rt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr * s, 8), lambda rt: (rt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rpad, 8), jnp.float32),
        ],
        interpret=interpret,
    )(rays8, cnt3, ids3, entry3, tri_pack)
    out = outs[0]
    return tuple(out[:, j] for j in range(6))


def pack_rays_rows(p, d, pad_to: int) -> jnp.ndarray:
    """(Rpad, 8): rows [px py pz dx dy dz 0 0] (rays on sublanes).
    p, d: V3 tuples of (R,) component arrays."""
    r = p[0].shape[0]
    buf = jnp.zeros((pad_to, 8), jnp.float32)
    for k in range(3):
        buf = buf.at[:r, k].set(p[k])
        buf = buf.at[:r, 3 + k].set(d[k])
    return buf


def make_cluster_intersect(tris: TrianglesSoA, *,
                           cluster_size: int = 128, tr: int = 256,
                           subtiles: int = 1, early_exit: bool = False,
                           interpret: bool = False):
    """Build clusters once; returns intersect(rays) -> Hits."""
    scene, c, k = build_clusters(tris, cluster_size)

    def intersect(rays: Rays) -> Hits:
        r = rays.p[0].shape[0]
        rpad = -(-r // (tr * subtiles)) * (tr * subtiles)
        rays8 = pack_rays_rows(rays.p, rays.d, rpad)
        ids, cnt, entry = _tile_cluster_lists(rays8, scene.boxes, tr)
        best_t, _best_i, nx, ny, nz, m = _run(
            rays8, cnt, ids, entry, scene.tri_pack, tr, subtiles,
            early_exit, interpret
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
            mati=jnp.where(
                any_hit, m[:r], 0.0
            ).astype(jnp.int32),
        )

    return intersect
