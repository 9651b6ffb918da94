"""TPU job: stage-by-stage timing of the pair intersector (v4/v5).

Times each pipeline stage as its own jit on the REAL steady-state
stress wavefront so the next optimization targets the measured
bottleneck, not a guess: candidate selection, pair sort volume, the
pairs kernel itself (v4 VPU run-loop vs v5 MXU visit grid), and the
escalation infrastructure (everything else in the composed step).

Run through the worker: cp scripts/tpu_pair_stage_profile.py /tmp/tpu_jobs/
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.models import wavefront
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    make_pallas_intersect, pack_rays,
)
from opencl_path_tracer_tpu.ops.pallas import pair_mxu, sorted_intersect
from opencl_path_tracer_tpu.scene import library


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
    w, h = 1536, 864
    n = w * h
    scene = library.stress_scene(100_000)
    cam = library.cornell_camera(w, h)
    key = jax.random.key(3)

    dense = make_pallas_intersect(scene.tris)
    state = wavefront.init_wavefront(cam, n, mode="fast", key=key)
    step = jax.jit(lambda st: wavefront.wavefront_step(
        cam, scene.mats, st, intersect_fn=dense, iterations=5,
        mode="fast", key=key,
    ))
    for _ in range(12):
        state = step(state)
    jax.block_until_ready(state.ray_p[0])
    rays = Rays(p=state.ray_p, d=state.ray_d)

    cs, trp, trb, l1 = 512, 512, 512, 8
    from opencl_path_tracer_tpu.ops.pallas.march_kernel import (
        build_march_scene,
    )
    big, rest = sorted_intersect.split_by_size(scene.tris)
    mscene, _rt, c = build_march_scene(rest, cs)
    boxes = jnp.concatenate(
        [mscene.boxes_lo, mscene.boxes_hi,
         jnp.zeros((c, 2), jnp.float32)], axis=1)
    cp = -(-c // 128) * 128
    boxes_r = jnp.zeros((cp, 8), jnp.float32).at[:c, :].set(boxes)

    rpad = -(-n // max(trp, trb)) * max(trp, trb)

    def padc(x):
        return jnp.concatenate(
            [x, jnp.zeros((rpad - n,), x.dtype)]) if rpad != n else x

    comps = [padc(rays.p[i]) for i in range(3)] + [
        padc(rays.d[i]) for i in range(3)]
    rays8t = pack_rays(tuple(comps[:3]), tuple(comps[3:]), rpad)

    # stage: candidate selection (l1 ranks)
    sel = jax.jit(lambda r8: sorted_intersect._run_candidates(
        r8, boxes_r, l1, c, trb, False))
    ids1, ents1, nxt1 = _t(sel, rays8t, label=f"selection l={l1}")

    # stage: full pairs round v5 (sorts + feat + visits + kernel + back)
    pr5 = jax.jit(lambda csx, ids: pair_mxu.pairs_round_mxu(
        csx, ids, mscene, c, cs, trp, False))
    _t(pr5, tuple(comps), ids1, label="pairs_round v5 (l1 list)")

    # sub-stages of the v5 round, isolated:
    l, r = ids1.shape
    p = r * l
    keys = ids1.reshape(-1)
    expand = [jnp.tile(x, l) for x in comps]
    pslot = jnp.arange(p, dtype=jnp.int32)
    fwd = jax.jit(lambda k2, ex, ps: jax.lax.sort(
        [k2, *ex, ps], num_keys=1))
    srt = _t(fwd, keys, expand, pslot, label="fwd sort 8ops")
    keys_s, comps_s, pslot_s = srt[0], srt[1:7], srt[7]
    z = jnp.zeros(keys_s.shape, jnp.float32)
    mk8 = jax.jit(lambda cc: jnp.stack([*cc, z, z], axis=0))
    rays8p = _t(mk8, comps_s, label="stack rays8p")
    feat = _t(jax.jit(pair_mxu.plucker_feat), rays8p, label="feat")
    bv = jax.jit(lambda k2: pair_mxu.build_visits(k2, trp, c))
    vb, vc = _t(bv, keys_s, label="build_visits")
    runk = jax.jit(lambda vb, vc, r8, ft: pair_mxu._run_pair_visits(
        vb, vc, r8, ft, mscene, cs, trp, False))
    outs = _t(runk, vb, vc, rays8p, feat, label="visit kernel")
    back = jax.jit(lambda ps, o: jax.lax.sort(
        [ps, o[0][0], o[1][0], o[2][0], o[3][0], o[4][0]],
        num_keys=1))
    _t(back, pslot_s, outs, label="back sort 6ops")

    # stage: the whole composed v5 intersect (= official path)
    v5 = jax.jit(sorted_intersect.make_pair_intersect(
        scene.tris, cluster_size=cs, trp=trp, mxu=True))
    _t(v5, rays, label="v5 intersect FULL")

    # stage: v4 full for reference
    v4 = jax.jit(sorted_intersect.make_pair_intersect(scene.tris))
    _t(v4, rays, label="v4 intersect FULL")
    return 0


if __name__ == "__main__" or __name__ == "__job__":
    main()
