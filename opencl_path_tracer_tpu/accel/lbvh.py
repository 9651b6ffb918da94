"""LBVH: fully jittable, device-side BVH construction.

The reference builds its tree on the host CPU with recursive std::vector
partitioning at scene-load time (NodeOnHost::build, main.cpp:210-262).
On TPU the build itself becomes a compiled program: Morton codes from
triangle centroids (30-bit, 10 per axis), a `jax.lax.sort_key_val` over
the codes, and a perfect implicit binary tree over the sorted order with
AABBs reduced bottom-up level by level — no recursion, no pointers, no
host round-trip, O(T log T) total, and rebuilt per frame if the scene
animates. Emits the same flat node format as accel/median_tree.py
(heap layout: children of slot s at 2s+1, 2s+2 — which satisfies the
format's right = left + 1 invariant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.accel.types import BVH
from opencl_path_tracer_tpu.core.geometry import TrianglesSoA

BIG = jnp.float32(3.0e38)


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so they occupy every 3rd bit."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3(q: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton codes from normalized coords q in [0, 1), (N, 3)."""
    scaled = jnp.clip(q * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (
        (_expand_bits(scaled[:, 0]) << jnp.uint32(2))
        | (_expand_bits(scaled[:, 1]) << jnp.uint32(1))
        | _expand_bits(scaled[:, 2])
    )


def _ceil_log2(x: int) -> int:
    return max(0, (x - 1).bit_length())


@functools.partial(jax.jit, static_argnums=(4, 5))
def _lbvh_arrays(r1, r2, r3, extra, num_leaves: int, leaf_size: int):
    """Jitted core: sort by Morton code, build implicit tree.

    extra: (T, E) per-triangle payload rows to reorder alongside
    (packed intersection constants + normal + mati-as-float).
    Returns (nodes (2*num_leaves-1, 8), extra_reordered (P, E),
    pad_mask (P,)).
    """
    t_count = r1.shape[0]
    p_total = num_leaves * leaf_size

    lo = jnp.minimum(jnp.minimum(r1, r2), r3)
    hi = jnp.maximum(jnp.maximum(r1, r2), r3)
    mid = (r1 + r2 + r3) / 3.0

    scene_lo = lo.min(0)
    scene_hi = hi.max(0)
    extent = jnp.maximum(scene_hi - scene_lo, 1e-9)
    codes = morton3((mid - scene_lo) / extent)

    # Pad the key/index arrays to P; padding sorts to the end.
    pad = p_total - t_count
    codes = jnp.concatenate(
        [codes, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)]
    )
    idx = jnp.arange(p_total, dtype=jnp.int32)
    codes, order = jax.lax.sort_key_val(codes, idx)
    pad_mask = order >= t_count
    safe_order = jnp.where(pad_mask, 0, order)

    lo_r = jnp.where(pad_mask[:, None], BIG, lo[safe_order])
    hi_r = jnp.where(pad_mask[:, None], -BIG, hi[safe_order])
    extra_r = jnp.where(pad_mask[:, None], 0.0, extra[safe_order])

    # Leaf AABBs over chunks of leaf_size.
    leaf_lo = lo_r.reshape(num_leaves, leaf_size, 3).min(1)
    leaf_hi = hi_r.reshape(num_leaves, leaf_size, 3).max(1)

    # Bottom-up level reduction (static python loop over ~log2 levels).
    levels_lo = [leaf_lo]
    levels_hi = [leaf_hi]
    while levels_lo[0].shape[0] > 1:
        cur_lo, cur_hi = levels_lo[0], levels_hi[0]
        levels_lo.insert(0, jnp.minimum(cur_lo[0::2], cur_lo[1::2]))
        levels_hi.insert(0, jnp.maximum(cur_hi[0::2], cur_hi[1::2]))

    # Assemble heap-ordered nodes: level l occupies slots
    # [2^l - 1, 2^(l+1) - 1).
    rows = []
    for l, (llo, lhi) in enumerate(zip(levels_lo, levels_hi)):
        n_l = llo.shape[0]
        slots = (1 << l) - 1 + jnp.arange(n_l, dtype=jnp.int32)
        if l == len(levels_lo) - 1:  # leaves
            a = (jnp.arange(n_l, dtype=jnp.float32) * leaf_size)
            b = a + leaf_size
        else:
            a = -(2.0 * slots.astype(jnp.float32) + 1.0)
            b = jnp.zeros((n_l,), jnp.float32)
        rows.append(
            jnp.concatenate([llo, lhi, a[:, None], b[:, None]], axis=1)
        )
    nodes = jnp.concatenate(rows, axis=0)
    return nodes, extra_r, pad_mask


def build_lbvh(tris: TrianglesSoA, *, leaf_size: int = 4) -> BVH:
    """Build a device-side LBVH over the scene triangles."""
    t_count = int(tris.count)
    depth = _ceil_log2(-(-t_count // leaf_size))
    num_leaves = 1 << depth

    # Payload: packed intersection constants (16) + normal (3) + mati (1).
    extra = jnp.concatenate(
        [
            tris.n, tris.c0[:, None],
            tris.m1, tris.d1[:, None],
            tris.m2, tris.d2[:, None],
            tris.m3, tris.d3[:, None],
            tris.n,
            tris.mati.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )
    nodes, extra_r, pad_mask = _lbvh_arrays(
        tris.r1, tris.r2, tris.r3, extra, num_leaves, leaf_size
    )
    return BVH(
        nodes=nodes,
        tri_pack=extra_r[:, :16],
        tri_n=extra_r[:, 16:19],
        tri_mati=extra_r[:, 19].astype(jnp.int32),
        depth=depth,
        leaf_size=leaf_size,
    )
