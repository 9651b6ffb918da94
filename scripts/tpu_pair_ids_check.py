"""TPU job: pair with_ids at production scale (retry of zs6 — the
tail now avoids the 100k-wide refine table; scalable gather tail).

1. (t, mati) bitwise vs the base PAIR_TPU_WINNER on 1.3M steady-state
   stress rays,
2. ids verified per-lane by oracle re-test on a sample + global
   consistency (valid ids on hits, -1 on misses),
3. e2e step cost: base vs with_ids vs with_ids+smooth.

Latest result (job zs7, 2026-08-18, sha 54349e4, "TPU v5 lite"):
0 t/mati flips on 1,327,104 rays; ids 0 neg-on-hit / 0 nonneg-on-miss;
oracle re-test 4096/4096; step 241.8 ms base / 249.2 with_ids / 435.3
with_ids+smooth (docs/BENCHMARKS.md "Large-scene smooth").
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np


def main():
    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.core.types import Rays
    from opencl_path_tracer_tpu.ops import intersect
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        PAIR_TPU_WINNER, make_pair_intersect,
    )
    from opencl_path_tracer_tpu.ops.shading import smooth_hit_normals
    from opencl_path_tracer_tpu.scene import library

    on_cpu = jax.default_backend() == "cpu"
    w, h = (128, 128) if on_cpu else (1536, 864)
    n = w * h
    scene = library.stress_scene(100_000, smooth=True)
    cam = library.cornell_camera(w, h)
    key = jax.random.key(3)
    out = {"job": "pair_ids_check", "tris": scene.num_triangles}

    base = make_pair_intersect(scene.tris, interpret=on_cpu,
                               **PAIR_TPU_WINNER)
    wids = make_pair_intersect(scene.tris, with_ids=True,
                               interpret=on_cpu, **PAIR_TPU_WINNER)

    state = wavefront.init_wavefront(cam, n, mode="fast", key=key)
    step = jax.jit(lambda st: wavefront.wavefront_step(
        cam, scene.mats, st, intersect_fn=base, iterations=5,
        mode="fast", key=key))
    for _ in range(4 if on_cpu else 12):
        state = step(state)
    jax.block_until_ready(state.ray_p[0])
    rays = Rays(p=state.ray_p, d=state.ray_d)

    h0 = jax.block_until_ready(jax.jit(base)(rays))
    h1, i1 = jax.block_until_ready(jax.jit(wids)(rays))
    out["vs_base"] = {
        "t_flips": int((np.asarray(h0.t) != np.asarray(h1.t)).sum()),
        "mati_flips": int((np.asarray(h0.mati)
                           != np.asarray(h1.mati)).sum()),
        "rays": n,
    }

    ids = np.asarray(i1)
    valid = np.asarray(h1.valid)
    out["ids"] = {
        "hits": int(valid.sum()),
        "neg_on_hits": int((ids[valid] < 0).sum()),
        "nonneg_on_miss": int((ids[~valid] >= 0).sum()),
        "max_id": int(ids.max()),
    }
    # Oracle re-test: the reported winner triangle reproduces t.
    rng = np.random.default_rng(0)
    p3 = np.stack([np.asarray(rays.p[k]) for k in range(3)], -1)
    d3 = np.stack([np.asarray(rays.d[k]) for k in range(3)], -1)
    t1 = np.asarray(h1.t)
    bad = 0
    sample = rng.choice(np.nonzero(valid)[0], 4096, replace=False)
    for i in sample:
        sub = scene.tris.take(jnp.asarray([int(ids[i])]))
        t2, v2 = intersect.ray_tri_t(
            jnp.asarray(p3[i:i + 1]), jnp.asarray(d3[i:i + 1]), sub)
        if not bool(v2[0, 0]) or abs(float(t2[0, 0]) - t1[i]) > 1e-3 * (
                1.0 + abs(t1[i])):
            bad += 1
    out["ids"]["oracle_retest_bad"] = bad
    out["ids"]["oracle_retest_n"] = len(sample)

    def timeit(fn, reps=3):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        jax.block_until_ready(r)
        return round((time.perf_counter() - t0) / reps * 1e3, 1)

    base_j = jax.jit(lambda r: base(r).t)
    wids_j = jax.jit(lambda r: wids(r)[0].t)
    smooth_j = jax.jit(lambda r: smooth_hit_normals(
        *wids(r), scene.attribs).n)
    out["step_ms"] = {
        "base": timeit(lambda: base_j(rays)),
        "with_ids": timeit(lambda: wids_j(rays)),
        "with_ids_smooth": timeit(lambda: smooth_j(rays)),
    }
    out["device"] = jax.devices()[0].device_kind
    out["ok"] = bool(out["vs_base"]["t_flips"] == 0
                     and out["vs_base"]["mati_flips"] == 0
                     and out["ids"]["neg_on_hits"] == 0
                     and out["ids"]["nonneg_on_miss"] == 0
                     and bad == 0)
    print(json.dumps(out))


if __name__ in ("__main__", "__job__"):
    main()
