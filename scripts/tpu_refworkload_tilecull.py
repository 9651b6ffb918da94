"""TPU: tilecull vs minarg on the reference's own workload (spread
geometry — compact objects over a ground plane, 1838 tris), plus the
coherent preview case (iterations=1, pure camera rays) on cornell.

Cornell's main path measured tilecull-negative (two scene-filling
spheres: nothing to cull, docs/BENCHMARKS.md round 4); the spread
scene is the geometry where the anyhit variant won +39%, so the
nearest-hit variant gets its shot here too.

Run standalone: python scripts/tpu_refworkload_tilecull.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_probe_cache")  # probe cache: keep the committed .jax_cache official-pathway-only
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import bench
from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
    make_minarg_intersect,
)
from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
    make_tilecull_intersect,
)
from opencl_path_tracer_tpu.scene import library


def run(name, scene, w, h, iters, configs):
    cam = library.cornell_camera(w, h)
    n = w * h
    for label, mk in configs:
        t0 = time.time()
        try:
            mrays, dt, spp = bench.run_wavefront(
                scene, cam, n, mk(), iters=iters, steps=32, chunk=8,
            )
            print(f"RESULT {name}/{label}: {mrays:.1f} Mrays/s "
                  f"(total {time.time()-t0:.0f}s)", flush=True)
        except Exception as exc:
            print(f"RESULT {name}/{label}: FAILED "
                  f"{type(exc).__name__}: {exc}", flush=True)


def main():
    print(f"# device {jax.devices()[0].device_kind}", file=sys.stderr)
    models = os.path.join("/root/repo", "tests", "assets", "models")
    ref = library.reference_scene(models)
    run("ref-workload(i5)", ref, 1536, 864, 5, [
        ("minarg", lambda: make_minarg_intersect(ref.tris)),
        ("tile128", lambda: make_tilecull_intersect(ref.tris, gs=128)),
        ("tile256", lambda: make_tilecull_intersect(ref.tris, gs=256)),
    ])
    cor = library.cornell_box(with_spheres=True)
    run("cornell(i1-preview)", cor, 1920, 1080, 1, [
        ("minarg", lambda: make_minarg_intersect(cor.tris)),
        ("tile128", lambda: make_tilecull_intersect(cor.tris, gs=128)),
    ])


if __name__ == "__main__":
    main()
