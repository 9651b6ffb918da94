"""TPU job: official-workload stress bench with the e4 winner config.

Runs the exact bench.py stress workload (wavefront, 1920x1080,
iters=5, steps=64, chunk=8) with make_pair_intersect configured from
/tmp/tpu_jobs/pair_winner.json (written by e4); falls back to the
pairmx defaults if the file is absent. Prints the Mrays/s line to
record in docs/BENCHMARKS.md and to justify the bench.py default flip.

Run through the worker: cp into /tmp/tpu_jobs/ as e5_*.py.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.models import wavefront
from opencl_path_tracer_tpu.ops import raygen
from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
    make_pair_intersect,
)
from opencl_path_tracer_tpu.scene import library


def main() -> int:
    try:
        with open("/tmp/tpu_jobs/pair_winner.json") as fh:
            kw = json.load(fh)
    except OSError:
        kw = {"cluster_size": 512, "trp": 512, "mxu": True}
    print(json.dumps({"config": kw}), flush=True)

    w, h = 1920, 1080
    iters, steps, chunk = 5, 64, 8
    scene = library.stress_scene(100_000)
    cam = library.cornell_camera(w, h)
    isect = make_pair_intersect(scene.tris, **kw)
    key = jax.random.key(1)
    base_ids = raygen.tile_major_ids(w, h, 16, 8)

    for lanes in (1, 2):
        n = w * h * lanes
        ids = (jnp.tile(base_ids, lanes) if lanes > 1 else base_ids)
        state = wavefront.init_wavefront(cam, n, mode="fast", key=key,
                                         ids=ids)

        @jax.jit
        def run(state, k, ids=ids):
            def body(_, st):
                return wavefront.wavefront_step(
                    cam, scene.mats, st, intersect_fn=isect,
                    iterations=iters, mode="fast", key=key, ids=ids,
                )
            st = jax.lax.fori_loop(0, k, body, state)
            return st, jnp.sum(st.colors[0][:8])

        try:
            t0 = time.time()
            state, _ = run(state, 2)
            float(jnp.sum(state.samples[:8]))
            warm = time.time() - t0
            t0 = time.time()
            done = 0
            while done < steps:
                k = min(chunk, steps - done)
                state, chk = run(state, k)
                done += k
            float(chk)
            dt = time.time() - t0
            mrays = float(n) * steps / dt / 1e6
            print(json.dumps({
                "job": "stress_e2e", "lanes": lanes,
                "mrays_s": round(mrays, 2),
                "dt_s": round(dt, 2), "steps": steps,
                "warmup_s": round(warm, 1),
                "spp": round(
                    float(jnp.mean(state.samples)) * lanes, 2),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"job": "stress_e2e", "lanes": lanes,
                              "error": repr(e)[:300]}), flush=True)
    return 0


if __name__ == "__main__" or __name__ == "__job__":
    main()
