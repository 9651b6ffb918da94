"""TPU sweep, round 5 part 3: ref-workload fixed-cost amortization.

Sweep 2 plateaued tilecull at 60.66 Mrays/s (gs=128 chunk=64); the
kernel knobs are exhausted. At 1536x864 the wavefront is only 1.33M
lanes — the per-step fixed costs (shade, regen, bookkeeping) weigh
more than at 2M. lanes=k multiplies samples in flight per pixel
(bench.run_wavefront lanes; colors_by_pixel merges sample-weighted),
amortizing fixed costs over more rays. Also micro-checks gs=96 and
chunk=96 around the ridge.

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


def run(tag, scene, cam, n, mk, steps=32, iters=5, lanes=1):
    t0 = time.time()
    try:
        isect = mk()
        mrays, dt, spp = bench.run_wavefront(
            scene, cam, n, isect, iters=iters, steps=steps, chunk=8,
            lanes=lanes)
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
    T = sc.tris

    run("R.c64-l2", sc, cam, n,
        lambda: make_tilecull_intersect(T, gs=128, chunk=64,
                                        origin=eye), lanes=2)
    run("R.c64-l3", sc, cam, n,
        lambda: make_tilecull_intersect(T, gs=128, chunk=64,
                                        origin=eye), lanes=3)
    run("R.c64-l4", sc, cam, n,
        lambda: make_tilecull_intersect(T, gs=128, chunk=64,
                                        origin=eye), lanes=4)
    run("R.gs96-c64", sc, cam, n,
        lambda: make_tilecull_intersect(T, gs=96, chunk=96,
                                        origin=eye))
    run("R.c96", sc, cam, n,
        lambda: make_tilecull_intersect(T, gs=128, chunk=96,
                                        origin=eye))

    print("FINAL " + json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
