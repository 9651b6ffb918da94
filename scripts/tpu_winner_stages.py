"""TPU job: stage decomposition of the WINNER pair config.

e3 profiled the l1-list (l1=8, gather) form; the production winner is
l1=2 + move='sort' whose cost lives in different places (two wide
sorts per escalation + per-round candidate selections + four pairs
rounds of very different shapes). Times each stage standalone at the
winner's exact shapes on the saved 1080p wavefront so the escalation-
chain rewrite targets the measured dominant term. Standalone jits
overestimate slightly vs the fused full graph (no cross-stage fusion)
— compare against the composed FULL time also printed.

Run through the worker: cp scripts/tpu_winner_stages.py \
    /tmp/tpu_jobs/z2_winner_stages.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import pack_rays
from opencl_path_tracer_tpu.ops.pallas import pair_mxu, sorted_intersect
from opencl_path_tracer_tpu.ops.pallas.march_kernel import (
    build_march_scene,
)
from opencl_path_tracer_tpu.scene import library

RAYS_NPZ = "/tmp/stress_rays5.npz"


def _t(fn, *args, reps=4, label=""):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(json.dumps({"stage": label, "ms": round(ms, 2)}), flush=True)
    return out


def main() -> int:
    cfg = dict(sorted_intersect.PAIR_TPU_WINNER)
    cs, trp = cfg["cluster_size"], cfg["trp"]
    trb = 512
    z = np.load(RAYS_NPZ)
    rays = Rays(
        p=tuple(jnp.asarray(z[f"s0_p{a}"]) for a in "xyz"),
        d=tuple(jnp.asarray(z[f"s0_d{a}"]) for a in "xyz"),
    )
    n = int(rays.p[0].shape[0])
    scene = library.stress_scene(100_000)
    big, rest = sorted_intersect.split_by_size(scene.tris)
    mscene, _rt, c = build_march_scene(rest, cs)
    boxes = jnp.concatenate(
        [mscene.boxes_lo, mscene.boxes_hi,
         jnp.zeros((c, 2), jnp.float32)], axis=1)
    boxes = jnp.concatenate(
        [boxes, pair_mxu.build_dops(_rt, cs, c)], axis=1)
    cp = -(-c // 128) * 128
    boxes_r = jnp.zeros(
        (cp, boxes.shape[1]), jnp.float32).at[:c, :].set(boxes)
    print(json.dumps({"job": "winner_stages", "rays": n, "c": int(c)}),
          flush=True)

    rpad = -(-n // max(trp, trb)) * max(trp, trb)

    def padc(x):
        return (jnp.concatenate([x, jnp.zeros((rpad - n,), x.dtype)])
                if rpad != n else x)

    comps = [padc(rays.p[i]) for i in range(3)] + [
        padc(rays.d[i]) for i in range(3)]
    done = jnp.full((rpad,), 2, jnp.int32)
    res = jnp.zeros((rpad,), jnp.int32)
    slot = jnp.arange(rpad, dtype=jnp.int32)

    # Round 1 shapes: selection l=2 + pairs w=2 at full width.
    sel1 = jax.jit(lambda r8: sorted_intersect._run_candidates(
        r8, boxes_r, 2, c, trb, False))
    rays8t = pack_rays(tuple(comps[:3]), tuple(comps[3:]), rpad)
    ids1, _e1, _n1 = _t(sel1, rays8t, label="r1 selection l=2 @2M")
    pr = jax.jit(lambda cc, ids: pair_mxu.pairs_round_mxu(
        cc, ids, mscene, c, cs, trp, False))
    _t(pr, tuple(comps), ids1, label="r1 pairs w=2 @2M")

    # Escalation shapes (u, w, sel) per the winner schedule
    # (u2_frac=2): r2 (1M, 6, 8), r3a (256k, 8, 16), r3b (64k, 40, 48),
    # loop (64k, 40, 48).
    fwd = jax.jit(lambda r, s, cc, d: jax.lax.sort(
        [r, s, *cc, d], num_keys=2))
    srt = _t(fwd, res, slot, comps, done,
             label="esc fwd sort 9op 2key @2M")
    for (u, w, sel, tag) in ((rpad // 2, 6, 8, "r2"),
                             (rpad // 8, 8, 16, "r3a"),
                             (rpad // 32, 40, 48, "r3b")):
        sub = [x[:u] for x in srt[2:8]]
        sub8t = pack_rays(tuple(sub[:3]), tuple(sub[3:]), u)
        selx = jax.jit(lambda r8, sel=sel: sorted_intersect
                       ._run_candidates(r8, boxes_r, sel, c, trb,
                                        False))
        ids_all, _ea, _nx = _t(selx, sub8t,
                               label=f"{tag} selection sel={sel} "
                                     f"@{u//1024}k")
        ids_w = ids_all[:w] if w <= sel else jnp.concatenate(
            [ids_all, jnp.full((w - sel, u), c, jnp.int32)])
        _t(pr, tuple(sub), ids_w,
           label=f"{tag} pairs w={w} @{u//1024}k")
    back9 = jax.jit(lambda s, ps: jax.lax.sort([s, *ps], num_keys=1))
    pays = [comps[0]] * 8
    _t(back9, slot, pays, label="esc back sort 9op @2M")

    # Tail iteration: compaction sort + dense 8k test.
    tail_sort = jax.jit(lambda r, s: jax.lax.sort([r, s], num_keys=1))
    _t(tail_sort, res, slot, label="tail compaction 2op @2M")
    from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
        make_pallas_intersect,
    )
    dense = make_pallas_intersect(scene.tris)
    sub_rays = Rays(p=tuple(x[:8192] for x in comps[:3]),
                    d=tuple(x[:8192] for x in comps[3:]))
    _t(jax.jit(dense), sub_rays, label="tail dense 8k x 100k tris")

    # Composed winner for reference.
    f = jax.jit(sorted_intersect.make_pair_intersect(
        scene.tris, **sorted_intersect.PAIR_TPU_WINNER))
    _t(f, rays, label="winner FULL")
    return 0


if __name__ == "__main__" or __name__ == "__job__":
    main()
