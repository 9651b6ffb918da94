"""TPU: NEE shadow rays through the any-hit kernel vs the nearest-hit
intersect (VERDICT r4 #5: NEE cost target <= 1.2x base; round 3
measured ~2x — reference-analytic 30.5 base -> 15.1 nee).

Shadow rays are the coherent case tile culling was built for: every
diffuse vertex in a pixel tile aims at the same lamp, so per-tile
group skips fire WITHOUT sorting (the e2e sort measured 42 ms/step at
2M lanes and killed the main-path win — docs/BENCHMARKS.md round 4).

Run standalone: python scripts/tpu_anyhit_nee_bench.py
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
from opencl_path_tracer_tpu.ops.nee import build_emitter_table
from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
    make_scene_occluded,
)
from opencl_path_tracer_tpu.scene import library


def bench_scene(name, scene, w, h, iters=5, steps=32):
    n = w * h
    cam = library.cornell_camera(w, h)
    isect = bench.make_isect(scene, "auto", False)
    table = build_emitter_table(scene.tris, scene.mats,
                                getattr(scene, "spheres", None))
    for label, nee, occ in [
        ("base", None, None),
        ("nee", table, None),
        ("nee+anyhit", table, make_scene_occluded(scene)),
        ("nee+anyhit256", table, make_scene_occluded(scene, gs=256)),
    ]:
        t0 = time.time()
        try:
            mrays, dt, spp = bench.run_wavefront(
                scene, cam, n, isect, iters=iters, steps=steps,
                chunk=8, nee=nee, occluded_fn=occ,
            )
            print(f"RESULT {name}/{label}: {mrays:.1f} Mrays/s "
                  f"(dt {dt:.2f}s, total {time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as exc:
            print(f"RESULT {name}/{label}: FAILED "
                  f"{type(exc).__name__}: {exc}", flush=True)


def main():
    print(f"# device {jax.devices()[0].device_kind}", file=sys.stderr)
    scene = library.cornell_box(with_spheres=True)
    bench_scene("cornell", scene, 1920, 1080)

    models = os.path.join("/root/repo", "tests", "assets", "models")
    scene = library.reference_scene(models, analytic=True)
    bench_scene("ref-analytic", scene, 1536, 864)


if __name__ == "__main__":
    main()
