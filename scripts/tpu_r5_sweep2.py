"""TPU sweep, round 5 part 2: ref-workload >= 65 hunt (VERDICT r4 #6).

Best known: tilecull gs=128 chunk=64 -> 60.47 (sweep 1). Levers here:
  * chunk=32 (finer pl.when granularity inside a group),
  * tile size tr=512 / 2048 (skip granularity vs grid overhead),
  * front-to-back group ordering from the camera eye (build_groups
    origin=...): near groups first makes the per-lane tn < best_t
    early-out kill far groups for the primary-heavy mix.
Also re-checks cornell iterations=1 preview with chunk=64 + eye order
(the other tilecull production user) before changing any defaults.

Probe run: /tmp cache. One TPU process at a time.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_probe_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import bench
from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
    make_tilecull_intersect,
)
from opencl_path_tracer_tpu.scene import library

RESULTS = {}


def run(tag, scene, cam, n, mk, steps=32, iters=5):
    t0 = time.time()
    try:
        isect = mk()
        mrays, dt, spp = bench.run_wavefront(
            scene, cam, n, isect, iters=iters, steps=steps, chunk=8)
        RESULTS[tag] = round(mrays, 2)
        print(f"## {tag}: {mrays:.2f} Mrays/s ({time.time()-t0:.1f}s "
              f"total)", file=sys.stderr)
    except Exception as exc:
        RESULTS[tag] = f"FAIL {type(exc).__name__}: {exc}"
        print(f"## {tag}: FAILED {type(exc).__name__}: {exc}",
              file=sys.stderr)
    print(json.dumps(RESULTS), flush=True)


def main():
    print(f"# device {jax.devices()[0].device_kind}", file=sys.stderr)

    w, h = 1536, 864
    n = w * h
    models = "/root/repo/tests/assets/models"
    sc = library.reference_scene(
        models if os.path.isdir(models) else None)
    cam = library.cornell_camera(w, h)
    eye = tuple(float(v) for v in cam.eye)
    print(f"# ref-workload {sc.num_triangles} tris, eye {eye}",
          file=sys.stderr)
    T = sc.tris

    run("R.c64", sc, cam, n,
        lambda: make_tilecull_intersect(T, gs=128, chunk=64))
    run("R.c64-eye", sc, cam, n,
        lambda: make_tilecull_intersect(T, gs=128, chunk=64,
                                        origin=eye))
    run("R.c32", sc, cam, n,
        lambda: make_tilecull_intersect(T, gs=128, chunk=32))
    run("R.c64-tr512", sc, cam, n,
        lambda: make_tilecull_intersect(T, gs=128, chunk=64, tr=512))
    run("R.c64-tr2048", sc, cam, n,
        lambda: make_tilecull_intersect(T, gs=128, chunk=64,
                                        tr=2048))
    run("R.c32-eye", sc, cam, n,
        lambda: make_tilecull_intersect(T, gs=128, chunk=32,
                                        origin=eye))
    run("R.c64-tr512-eye", sc, cam, n,
        lambda: make_tilecull_intersect(T, gs=128, chunk=64, tr=512,
                                        origin=eye))

    # Preview guard: cornell iterations=1 (the 133 Mrays/s round-4
    # result at gs=128 chunk=128) with the candidate new settings.
    w, h = 1920, 1080
    n = w * h
    sc = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    eye = tuple(float(v) for v in cam.eye)
    run("P.c128", sc, cam, n,
        lambda: make_tilecull_intersect(sc.tris, gs=128), iters=1)
    run("P.c64-eye", sc, cam, n,
        lambda: make_tilecull_intersect(sc.tris, gs=128, chunk=64,
                                        origin=eye), iters=1)

    print("FINAL " + json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
