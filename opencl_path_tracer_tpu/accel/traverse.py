"""Vectorized BVH traversal.

The reference traverses its per-object heap trees with an explicit
int[300] stack per work-item and data-dependent branching
(kd_intersect + stack_push/pop/check, prog.cl:144-184, 271-290). A TPU
is a lockstep vector machine: this module runs ALL rays through one
`lax.while_loop` in which every lane owns a small stack *vector*
(stack ops are one-hot selects on a (R, D) array — no scatters), and
each iteration does both possible kinds of work (two-child box test and
leaf triangle test) with `where`-selects instead of branches:

  * internal step: gather both children's packed node rows (one (R,2,8)
    row-gather), slab-test both (prog.cl:123-143 math), descend into the
    NEARER hit child and push the farther (an improvement over the
    reference's fixed left-first order), pruned against the current best
    hit exactly like prog.cl:162-163 (skip when box entry > best t).
  * leaf step: one contiguous (R,L,16) gather of packed triangle
    constants + the plane/edge-sign test of ops/intersect.py. Padding
    rows have n=0 so they produce t=nan and never pass.

The loop runs until every lane's stack is empty; finished lanes idle on
clipped index-0 gathers. Worst-case iterations ~ nodes visited by the
deepest ray, which the balanced median/LBVH builders keep near
2*log2(T) + leaf visits.

STATUS: CPU oracle, not a TPU backend. Measured on v5e (65k rays,
Cornell): 0.05 Mrays/s — the per-iteration row gathers are ~1000x off
the fused brute kernel's pace, and the 100k-tri scene faulted the
device session (docs/BENCHMARKS.md). `RenderEngine(accel='auto')`
selects it only on CPU hosts, where its O(log T) visits beat the
vectorized brute scan; on TPU use the fused/pair kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.accel.types import BVH
from opencl_path_tracer_tpu.core.types import Hits, Rays

BIG = jnp.float32(3.0e38)


def _slab(krows, p, inv_d):
    """Slab test on packed child node rows. krows: (R, 2, 8) with
    [lo3 hi3 a b]; p/inv_d: V3 of (R,). Returns (hit, tmin): (R, 2).
    IEEE inf/nan semantics as prog.cl:123-143."""
    tmin = jnp.full(krows.shape[:2], -BIG)
    tmax = jnp.full(krows.shape[:2], BIG)
    for ax in range(3):
        t1 = (krows[:, :, ax] - p[ax][:, None]) * inv_d[ax][:, None]
        t2 = (krows[:, :, ax + 3] - p[ax][:, None]) * inv_d[ax][:, None]
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
    return (tmax >= tmin) & (tmax >= 0.0), tmin


def _leaf_test(tri_pack, base, p, d, leaf_size):
    """Closest valid hit among the L triangles starting at `base`.
    p, d: V3 of (R,). Returns (t, local_index) with t = BIG on miss."""
    idx = base[:, None] + jnp.arange(leaf_size, dtype=jnp.int32)[None, :]
    rows = jnp.take(tri_pack, idx, axis=0, mode="clip")  # (R, L, 16)

    def dots(b):
        pdot = sum(p[k][:, None] * rows[..., b + k] for k in range(3))
        vdot = sum(d[k][:, None] * rows[..., b + k] for k in range(3))
        return pdot, vdot

    pn, vn = dots(0)
    c0 = rows[..., 3]
    t = (c0 - pn) / vn

    def edge(k):
        pm, vm = dots(4 * k)
        dk = rows[..., 4 * k + 3]
        return pm + t * vm - dk

    valid = (
        (t > 0.0) & (edge(1) >= 0.0) & (edge(2) >= 0.0) & (edge(3) >= 0.0)
    )
    t = jnp.where(valid, t, BIG)
    local = jnp.argmin(t, axis=1)
    tbest = jnp.take_along_axis(t, local[:, None], 1)[:, 0]
    return tbest, idx[jnp.arange(idx.shape[0]), local]


def make_bvh_intersect(bvh: BVH, max_stack: int | None = None):
    """Returns intersect(rays) -> Hits over the given BVH."""
    depth = int(bvh.depth) + 2 if max_stack is None else max_stack
    leaf = int(bvh.leaf_size)
    lanes = jnp.arange(depth, dtype=jnp.int32)

    def intersect(rays: Rays) -> Hits:
        p, d = rays.p, rays.d
        r = p[0].shape[0]
        inv_d = tuple(1.0 / c for c in d)

        def cond(state):
            return ~jnp.all(state[0])

        def body(state):
            done, node, stack, sp, best_t, best_i = state

            row = jnp.take(bvh.nodes, node, axis=0, mode="clip")  # (R, 8)
            a = row[:, 6]
            is_leaf = a >= 0.0

            # --- leaf work (only meaningful where is_leaf) ---
            base = row[:, 6].astype(jnp.int32)
            lt, li = _leaf_test(bvh.tri_pack, base, p, d, leaf)
            take_hit = is_leaf & ~done & (lt < best_t)
            best_t = jnp.where(take_hit, lt, best_t)
            best_i = jnp.where(take_hit, li, best_i)

            # --- internal work: test both children ---
            left = (-a).astype(jnp.int32)
            kids = jnp.stack([left, left + 1], axis=1)  # (R, 2)
            krows = jnp.take(bvh.nodes, kids, axis=0, mode="clip")
            khit, ktmin = _slab(krows, p, inv_d)  # (R, 2)
            # Prune against current best (prog.cl:162-163).
            khit = khit & (ktmin < best_t[:, None]) & ~is_leaf[:, None]

            near = jnp.where(ktmin[:, 0] <= ktmin[:, 1], 0, 1)
            far = 1 - near
            near_hit = jnp.take_along_axis(khit, near[:, None], 1)[:, 0]
            far_hit = jnp.take_along_axis(khit, far[:, None], 1)[:, 0]
            near_node = jnp.take_along_axis(kids, near[:, None], 1)[:, 0]
            far_node = jnp.take_along_axis(kids, far[:, None], 1)[:, 0]

            # Push the far child when both children hit.
            do_push = near_hit & far_hit & ~done
            onehot = lanes[None, :] == sp[:, None]
            stack = jnp.where(
                (do_push[:, None] & onehot), far_node[:, None], stack
            )
            sp = jnp.where(do_push, sp + 1, sp)

            # Next node: nearer hit child, else farther hit child,
            # else pop.
            descend = (near_hit | far_hit) & ~is_leaf & ~done
            next_node = jnp.where(near_hit, near_node, far_node)

            need_pop = ~descend & ~done
            can_pop = sp > 0
            sp_pop = jnp.maximum(sp - 1, 0)
            popped = jnp.take_along_axis(stack, sp_pop[:, None], 1)[:, 0]
            node = jnp.where(
                descend, next_node, jnp.where(can_pop, popped, node)
            )
            sp = jnp.where(need_pop & can_pop, sp_pop, sp)
            done = done | (need_pop & ~can_pop)
            return done, node, stack, sp, best_t, best_i

        state = (
            jnp.zeros((r,), bool),
            jnp.zeros((r,), jnp.int32),        # start at root slot 0
            jnp.zeros((r, depth), jnp.int32),
            jnp.zeros((r,), jnp.int32),
            jnp.full((r,), BIG),
            jnp.zeros((r,), jnp.int32),
        )
        done, node, stack, sp, best_t, best_i = jax.lax.while_loop(
            cond, body, state
        )

        any_hit = best_t < BIG
        z = jnp.zeros_like(best_t)
        safe_t = jnp.where(any_hit, best_t, 0.0)
        n = tuple(
            jnp.where(
                any_hit,
                jnp.take(bvh.tri_n[:, k], best_i, mode="clip"), z,
            )
            for k in range(3)
        )
        hit_p = tuple(
            jnp.where(any_hit, p[k] + d[k] * safe_t, z) for k in range(3)
        )
        mati = jnp.take(bvh.tri_mati, best_i, axis=0, mode="clip")
        return Hits(
            t=jnp.where(any_hit, best_t, -1.0),
            p=hit_p,
            n=n,
            mati=jnp.where(any_hit, mati, 0).astype(jnp.int32),
        )

    return intersect
