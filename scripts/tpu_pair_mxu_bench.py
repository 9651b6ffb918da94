"""TPU job: pair-v5 (MXU pairs round) exactness + timing vs pair v4.

Builds the 100k-tri stress scene, advances a real wavefront to steady
state with the dense kernel (independent of the code under test), then:
  1. asserts pair-v5 hits match the dense kernel on the full live ray
     population (same bar as scripts/tpu_pair_exactness.py);
  2. times pair v4 and pair v5 at several (cluster_size, trp) configs.

Run through the worker: cp scripts/tpu_pair_mxu_bench.py /tmp/tpu_jobs/
Output: one JSON line per section — paste the exactness line and the
timing table into docs/BENCHMARKS.md.
"""

import datetime
import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.models import wavefront
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    make_pallas_intersect,
)
from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
    make_pair_intersect,
)
from opencl_path_tracer_tpu.scene import library


def _flips(hd, hx):
    out = {}
    hit = np.asarray(hd.t) >= 0.0
    for name in ("t", "mati"):
        a = np.asarray(getattr(hd, name))
        b = np.asarray(getattr(hx, name))
        out[name] = int((a != b).sum())
    for k in range(3):
        a = np.asarray(hd.n[k])[hit]
        b = np.asarray(hx.n[k])[hit]
        out[f"n{k}_on_hits"] = int((a != b).sum())
    out["hits"] = int(hit.sum())
    return out


def _time(fn, rays, reps=4):
    h = fn(rays)
    jax.block_until_ready(h.t)          # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        h = fn(rays)
        jax.block_until_ready(h.t)
    return (time.perf_counter() - t0) / reps


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
    hd = jax.jit(dense)(rays)
    jax.block_until_ready(hd.t)
    sha = "unknown"
    try:
        sha = subprocess.check_output(
            ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
            text=True).strip()
    except Exception:
        pass
    date = datetime.date.today().isoformat()

    # --- exactness: pair v5 default config vs dense (fall back to a
    # smaller tile if the default trips Mosaic scoped-VMEM limits) ---
    jm = None
    for cs0, trp0 in ((512, 512), (512, 256), (256, 512)):
        try:
            mxu0 = make_pair_intersect(scene.tris, cluster_size=cs0,
                                       trp=trp0, mxu=True)
            jm = jax.jit(mxu0)
            t0 = time.perf_counter()
            hm = jm(rays)
            jax.block_until_ready(hm.t)
            compile_s = time.perf_counter() - t0
            break
        except Exception as e:
            print(json.dumps({"cfg": f"v5 cs={cs0} trp={trp0}",
                              "error": repr(e)[:200]}), flush=True)
            jm = None
    if jm is None:
        return 1
    print(json.dumps({
        "job": "pair_mxu_exactness", "rays": n,
        "cfg": f"cs={cs0} trp={trp0}",
        "fields": _flips(hd, hm), "sha": sha, "date": date,
        "warmup_s": round(compile_s, 1),
    }), flush=True)

    # --- timing table ---
    t_v5 = _time(jm, rays)
    print(json.dumps({"cfg": f"v5 cs={cs0} trp={trp0}",
                      "ms": round(t_v5 * 1e3, 1),
                      "mrays_s": round(n / t_v5 / 1e6, 2)}), flush=True)

    v4 = make_pair_intersect(scene.tris)
    t_v4 = _time(jax.jit(v4), rays)
    print(json.dumps({"cfg": "v4 cs=512 trp=1024",
                      "ms": round(t_v4 * 1e3, 1),
                      "mrays_s": round(n / t_v4 / 1e6, 2)}), flush=True)

    for cs, trp, dop in ((512, 512, True), (512, 256, False),
                         (256, 512, False), (256, 1024, False),
                         (512, 1024, False), (256, 512, True),
                         (512, 2048, False)):
        try:
            f = make_pair_intersect(scene.tris, cluster_size=cs,
                                    trp=trp, mxu=True, dop=dop)
            tt = _time(jax.jit(f), rays)
            print(json.dumps(
                {"cfg": f"v5 cs={cs} trp={trp} dop={int(dop)}",
                 "ms": round(tt * 1e3, 1),
                 "mrays_s": round(n / tt / 1e6, 2)}), flush=True)
        except Exception as e:  # Mosaic VMEM OOM etc.
            print(json.dumps(
                {"cfg": f"v5 cs={cs} trp={trp} dop={int(dop)}",
                 "error": repr(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__" or __name__ == "__job__":
    main()
