"""TPU sweep, round 5 part 5: pixel-block shape vs tilecull tiles.

bench.run_wavefront lays lanes out in 16x16 tile-major pixel blocks,
so one 1024-lane kernel tile spans FOUR horizontally-adjacent blocks
= a 64x16-pixel strip. A 32x32 block (1536 and 864 both divide by 32)
makes the kernel tile exactly one square block — a tighter solid
angle per tile, hence potentially tighter per-tile group-need unions
for primary lanes and origin-local bounce lanes. Costs nothing at
runtime (the ids are baked at init). Sweeps ref-workload at
(16,16) control / (32,32) / (32,16) / (16,8).

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
from opencl_path_tracer_tpu.ops import raygen
from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
    make_tilecull_intersect,
)
from opencl_path_tracer_tpu.scene import library

RESULTS = {}
_orig_tile_major = raygen.tile_major_ids


def run(tag, scene, cam, n, mk, block, steps=32, iters=5):
    t0 = time.time()

    def forced(w, h, bw, bh):
        return _orig_tile_major(w, h, *block)

    raygen.tile_major_ids = forced
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
    finally:
        raygen.tile_major_ids = _orig_tile_major
    print(json.dumps(RESULTS), flush=True)


def main():
    w, h = 1536, 864
    models = os.path.join("/root/repo", "tests", "assets", "models")
    scene = library.reference_scene(models)
    cam = library.cornell_camera(w, h)
    n = w * h
    eye = tuple(float(v) for v in cam.eye)

    def mk():
        return bench.make_isect(scene, "tilecull", False, cam, 5)

    for block in ((16, 16), (32, 32), (32, 16), (16, 8)):
        run(f"ref tilecull block={block[0]}x{block[1]}",
            scene, cam, n, mk, block)


if __name__ == "__main__":
    main()
