"""Two-level cluster intersector (the TPU-native acceleration structure).

Pointer-chasing BVH traversal is hostile to a lockstep vector machine
(per-lane stacks, dependent row gathers — measured ~1.6ms per gather
round on v5e). This kernel replaces the tree with a TWO-LEVEL scheme
designed around VMEM residency and tile coherence:

  * triangles are Morton-sorted and chunked into clusters of K = 128
    (one full lane tile);
  * the packed scene lives in VMEM for the duration of a ray tile as a
    (C, 16, K) array — per-cluster blocks on the UNTILED leading dim
    (dynamic indexing there is a plain address offset; dynamic slicing
    on tiled dims silently corrupts), fields on sublanes, triangles on
    lanes — fully dense storage, ~6.4 MB per 100k triangles;
  * cluster AABBs sit in SMEM (scalar reads with dynamic indices);
  * per ray tile: a fori over clusters slab-tests each cluster against
    all lanes (prog.cl:123-143 math) and runs the K-triangle test ONLY
    when the tile-level scalar `any(lane can improve)` is true
    (`pl.when`), with best-t pruning sharpening as hits accumulate —
    the same prune rule as the reference traversal (prog.cl:162-163).

Orientation: rays on SUBLANES (TR per tile), triangles on LANES (K),
so every per-cluster matrix is a dense (TR, K) VPU tile and the running
best is a (TR, 1) column — no transposes or gathers anywhere.

Worst case (every lane improves in every cluster) equals brute force;
coherent tiles touch a handful of clusters. Same triangle math as
ops/intersect.py (prog.cl:94-112 in m_k form).
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
    tri_pack: jnp.ndarray  # (C, 16, K) field-rows x tri-lanes per cluster
    tri_n: jnp.ndarray     # (C*K, 3) Morton order (hit records)
    tri_mati: jnp.ndarray  # (C*K,) int32


def build_clusters(tris: TrianglesSoA, cluster_size: int = 128
                   ) -> tuple[ClusterScene, int, int]:
    """Morton-sort triangles into fixed-size clusters.
    Returns (scene, num_clusters, cluster_size)."""
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
    # (C*K, 16) -> (C, K, 16) -> (C, 16, K): fields on sublanes,
    # triangles on lanes.
    pack3 = pack.reshape(c, k, 16).transpose(0, 2, 1)

    lo_r = jnp.where(pad_mask[:, None], BIG, lo[safe])
    hi_r = jnp.where(pad_mask[:, None], -BIG, hi[safe])
    c_lo = lo_r.reshape(c, k, 3).min(1)
    c_hi = hi_r.reshape(c, k, 3).max(1)
    boxes = jnp.concatenate(
        [c_lo, c_hi, jnp.zeros((c, 2), jnp.float32)], axis=1
    )

    tri_n = jnp.where(pad_mask[:, None], 0.0, tris.n[safe])
    tri_mati = jnp.where(pad_mask, 0, tris.mati[safe]).astype(jnp.int32)
    return (
        ClusterScene(boxes=boxes, tri_pack=pack3, tri_n=tri_n,
                     tri_mati=tri_mati),
        c, k,
    )


def _kernel(ray_ref, box_ref, tri_ref, t_ref, i_ref):
    c = tri_ref.shape[0]
    k = tri_ref.shape[2]
    tr = ray_ref.shape[0]

    rays = ray_ref[:]                       # (TR, 8)
    px, py, pz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]   # (TR, 1)
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    inv_x, inv_y, inv_z = 1.0 / dx, 1.0 / dy, 1.0 / dz

    t_ref[:] = jnp.full((tr, 1), BIG, jnp.float32)
    i_ref[:] = jnp.zeros((tr, 1), jnp.float32)

    def body(ci, _):
        # Slab test vs every lane (prog.cl:123-143); box bounds are SMEM
        # scalars so dynamic ci indexing is legal and cheap.
        def axis_minmax(j, p_col, inv_col):
            t1 = (box_ref[ci, j] - p_col) * inv_col      # (TR, 1)
            t2 = (box_ref[ci, j + 3] - p_col) * inv_col
            return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

        n1, x1 = axis_minmax(0, px, inv_x)
        n2, x2 = axis_minmax(1, py, inv_y)
        n3, x3 = axis_minmax(2, pz, inv_z)
        tmin = jnp.maximum(jnp.maximum(n1, n2), n3)
        tmax = jnp.minimum(jnp.minimum(x1, x2), x3)
        active = (
            (tmax >= tmin) & (tmax >= 0.0) & (tmin < t_ref[:])
        )

        @pl.when(jnp.any(active))
        def _():
            blk = tri_ref[ci]                # (16, K)

            def row(j):
                return blk[j:j + 1, :]       # (1, K)

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
            better = tmin_k < t_ref[:]
            t_ref[:] = jnp.where(better, tmin_k, t_ref[:])
            i_ref[:] = jnp.where(better, gidx, i_ref[:])

        return 0

    jax.lax.fori_loop(0, c, body, 0)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _run(rays8, boxes, tri_pack, tr: int, interpret: bool):
    rpad = rays8.shape[0]
    c = tri_pack.shape[0]
    k = tri_pack.shape[2]
    t_out, i_out = pl.pallas_call(
        _kernel,
        grid=(rpad // tr,),
        in_specs=[
            pl.BlockSpec((tr, 8), lambda rt: (rt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 8), lambda rt: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((c, 16, k), lambda rt: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tr, 1), lambda rt: (rt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 1), lambda rt: (rt, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rpad, 1), jnp.float32),
            jax.ShapeDtypeStruct((rpad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(rays8, boxes, tri_pack)
    return t_out[:, 0], i_out[:, 0]


def pack_rays_rows(p: jnp.ndarray, d: jnp.ndarray,
                   pad_to: int) -> jnp.ndarray:
    """(Rpad, 8): rows [px py pz dx dy dz 0 0] (rays on sublanes)."""
    r = p.shape[0]
    buf = jnp.zeros((pad_to, 8), jnp.float32)
    buf = buf.at[:r, 0:3].set(p)
    buf = buf.at[:r, 3:6].set(d)
    return buf


def make_cluster_intersect(tris: TrianglesSoA, *,
                           cluster_size: int = 128, tr: int = 512,
                           interpret: bool = False):
    """Build clusters once; returns intersect(rays) -> Hits."""
    scene, c, k = build_clusters(tris, cluster_size)

    def intersect(rays: Rays) -> Hits:
        r = rays.p.shape[0]
        rpad = -(-r // tr) * tr
        rays8 = pack_rays_rows(rays.p, rays.d, rpad)
        best_t, best_i = _run(
            rays8, scene.boxes, scene.tri_pack, tr, interpret
        )
        best_t = best_t[:r]
        best_i = jnp.clip(
            best_i[:r].astype(jnp.int32), 0, scene.tri_n.shape[0] - 1
        )
        any_hit = best_t < BIG
        n = jnp.take(scene.tri_n, best_i, axis=0)
        mati = jnp.take(scene.tri_mati, best_i, axis=0)
        hit_p = rays.p + rays.d * best_t[:, None]
        return Hits(
            t=jnp.where(any_hit, best_t, -1.0),
            p=jnp.where(any_hit[:, None], hit_p, 0.0),
            n=jnp.where(any_hit[:, None], n, 0.0),
            mati=jnp.where(any_hit, mati, 0).astype(jnp.int32),
        )

    return intersect
