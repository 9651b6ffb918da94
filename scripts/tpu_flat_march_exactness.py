"""TPU-side exactness job: flat-march (march v2) vs the dense kernel
on a REAL steady-state stress wavefront (2M rays, 1080p).

Companion to scripts/tpu_pair_exactness.py: CPU CI runs the flat
march in interpret mode only; this job exercises the real Mosaic
lowering (scalar-prefetch visit list, scratch accumulator, capacity
overflow path) on hardware. Drop into the tpu_worker queue; result is
one JSON line for docs/BENCHMARKS.md.

Reference anchor: prog.cl:144-184 (kd_intersect exact closest hit).
"""

import datetime
import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.models import wavefront
from opencl_path_tracer_tpu.ops.pallas.flat_march import (
    make_flat_march_intersect,
)
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    make_pallas_intersect,
)
from opencl_path_tracer_tpu.scene import library


def main() -> int:
    w, h = 1920, 1080
    n = w * h
    scene = library.stress_scene(100_000)
    cam = library.cornell_camera(w, h)
    key = jax.random.key(3)

    dense0 = make_pallas_intersect(scene.tris)
    state = wavefront.init_wavefront(cam, n, mode="fast", key=key)
    step = jax.jit(lambda st: wavefront.wavefront_step(
        cam, scene.mats, st, intersect_fn=dense0, iterations=5,
        mode="fast", key=key,
    ))
    for _ in range(12):
        state = step(state)
    jax.block_until_ready(state.ray_p[0])
    rays = Rays(p=state.ray_p, d=state.ray_d)

    fm, rt = make_flat_march_intersect(scene.tris, cs=256, tr=256,
                                       K0=4)
    dense = make_pallas_intersect(rt)
    hd = jax.jit(dense)(rays)
    hf = jax.jit(fm)(rays)
    jax.block_until_ready((hd.t, hf.t))

    hit = np.asarray(hd.t) >= 0.0
    flips = {}
    for name in ("t", "mati"):
        a, b = np.asarray(getattr(hd, name)), np.asarray(
            getattr(hf, name))
        flips[name] = int((a != b).sum())
    for k in range(3):
        a = np.asarray(hd.n[k])[hit]
        b = np.asarray(hf.n[k])[hit]
        flips[f"n{k}"] = int((a != b).sum())
    sha = subprocess.run(["git", "-C", "/root/repo", "rev-parse",
                          "--short", "HEAD"], capture_output=True,
                         text=True).stdout.strip()
    print(json.dumps({
        "job": "flat_march_exactness", "rays": n,
        "flips": flips, "sha": sha,
        "date": datetime.date.today().isoformat(),
    }), flush=True)
    return 0 if sum(flips.values()) == 0 else 1


if __name__ == "__main__" or __name__ == "__job__":
    main()
