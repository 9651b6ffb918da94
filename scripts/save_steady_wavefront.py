"""Save consecutive steady-state stress-wavefront steps (rays + the
dense kernel's final nearest-hit t) to an npz for offline analysis.

This regenerates the round-3 measurement inputs (block-union /
per-lane-need tables in docs/BENCHMARKS.md, computed by
scripts/march_design_sweep.py and the TPU union-stats jobs) — /tmp is
not durable, so re-run this through scripts/tpu_worker.py before any
round-4 bound-design work (NOTES_NEXT_ROUND.md direction b).

Usage: cp scripts/save_steady_wavefront.py /tmp/tpu_jobs/
Output: /tmp/stress_rays5.npz (5 steps x 7 arrays x 2,073,600 lanes).
"""
import sys

sys.path.insert(0, "/root/repo")
import jax
import numpy as np

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.models import wavefront
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    make_pallas_intersect,
)
from opencl_path_tracer_tpu.scene import library


def main(steps_to_save: int = 5, warm: int = 12,
         out: str = "/tmp/stress_rays5.npz") -> None:
    w, h = 1920, 1080
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
    for _ in range(warm):
        state = step(state)
    jax.block_until_ready(state.ray_p[0])

    jd = jax.jit(dense)
    outd = {}
    for s in range(steps_to_save):
        rays = Rays(p=state.ray_p, d=state.ray_d)
        hd = jd(rays)
        jax.block_until_ready(hd.t)
        for k, a in (("px", rays.p[0]), ("py", rays.p[1]),
                     ("pz", rays.p[2]), ("dx", rays.d[0]),
                     ("dy", rays.d[1]), ("dz", rays.d[2]),
                     ("t", hd.t)):
            outd[f"s{s}_{k}"] = np.asarray(a)
        if s + 1 < steps_to_save:
            state = step(state)
            jax.block_until_ready(state.ray_p[0])

    np.savez(out, **outd)
    print(f"saved {steps_to_save} steps x {n} rays -> {out}")


if __name__ == "__main__" or __name__ == "__job__":
    main()
