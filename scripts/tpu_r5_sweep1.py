"""TPU sweep, round 5 part 1 (VERDICT r4 #3/#4/#6).

Leg A — tessellated cornell (804 tris) @1080p iters=5: can an
  in-intersect coherence presort (thin-key permute, octant counting
  sort or morton lax.sort — tilecull_kernel._presort_perm) make tile
  culling beat the ~71 Mrays/s minarg wall? Round 4 showed the FULL
  STATE sort costs 42 ms/step — 14x what culling saves; the thin
  permute moves only 6 ray rows + 6 result rows.

Leg B — ref-workload (reference default scene, 1838 tris) @1536x864
  iters=5: gs / chunk sweep of the tilecull winner (59.1 in
  BENCH_r04; target >= 65), plus presort variants.

Leg C — enclosed mid-size anchor: dense-tessellated cornell
  (sphere_res=(26, 50), ~5k tris) @1080p iters=5 — the predictor's
  blind region (VERDICT r4 #4). Measures tilecull vs pairwin vs
  minarg and prints the auto predictor's pick.

Probe run: uses /tmp cache so the COMMITTED .jax_cache stays
official-pathway-only (round-4 bloat lesson). One TPU process at a
time; ~200 s first dispatch is normal.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_probe_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import bench
from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
    make_minarg_intersect,
)
from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
    PAIR_TPU_WINNER, make_pair_intersect,
)
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
        print(f"## {tag}: {mrays:.2f} Mrays/s ({dt:.2f}s measure, "
              f"{time.time()-t0:.1f}s total)", file=sys.stderr)
    except Exception as exc:
        RESULTS[tag] = f"FAIL {type(exc).__name__}: {exc}"
        print(f"## {tag}: FAILED {type(exc).__name__}: {exc}",
              file=sys.stderr)
    print(json.dumps(RESULTS), flush=True)


def main():
    print(f"# device {jax.devices()[0].device_kind}", file=sys.stderr)

    # --- Leg A: tessellated cornell @1080p --------------------------
    w, h = 1920, 1080
    n = w * h
    sc = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    print(f"# legA cornell {sc.num_triangles} tris", file=sys.stderr)
    run("A.minarg", sc, cam, n,
        lambda: make_minarg_intersect(sc.tris))
    run("A.tile128-oct", sc, cam, n,
        lambda: make_tilecull_intersect(sc.tris, gs=128,
                                        presort="octant"))
    run("A.tile128-mor", sc, cam, n,
        lambda: make_tilecull_intersect(sc.tris, gs=128,
                                        presort="morton"))
    run("A.tile64-mor", sc, cam, n,
        lambda: make_tilecull_intersect(sc.tris, gs=64,
                                        presort="morton"))

    # --- Leg B: ref-workload @1536x864 ------------------------------
    w, h = 1536, 864
    n = w * h
    import os
    models = "/root/repo/tests/assets/models"
    sc = library.reference_scene(
        models if os.path.isdir(models) else None)
    cam = library.cornell_camera(w, h)
    print(f"# legB ref-workload {sc.num_triangles} tris",
          file=sys.stderr)
    run("B.tile128", sc, cam, n,
        lambda: make_tilecull_intersect(sc.tris, gs=128))
    run("B.tile64", sc, cam, n,
        lambda: make_tilecull_intersect(sc.tris, gs=64))
    run("B.tile256", sc, cam, n,
        lambda: make_tilecull_intersect(sc.tris, gs=256))
    run("B.tile128-c64", sc, cam, n,
        lambda: make_tilecull_intersect(sc.tris, gs=128, chunk=64))
    run("B.tile128-mor", sc, cam, n,
        lambda: make_tilecull_intersect(sc.tris, gs=128,
                                        presort="morton"))
    run("B.tile64-mor", sc, cam, n,
        lambda: make_tilecull_intersect(sc.tris, gs=64,
                                        presort="morton"))

    # --- Leg C: enclosed ~5k anchor @1080p --------------------------
    w, h = 1920, 1080
    n = w * h
    sc = library.cornell_box(with_spheres=True, sphere_res=(26, 50))
    cam = library.cornell_camera(w, h)
    print(f"# legC dense cornell {sc.num_triangles} tris",
          file=sys.stderr)
    from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
        auto_small_accel,
    )
    pick = auto_small_accel(sc.tris, cam, iterations=5,
                            fallback="pairwin")
    RESULTS["C.auto_pick"] = pick
    print(f"## C auto predictor pick: {pick}", file=sys.stderr)
    run("C.tile128", sc, cam, n,
        lambda: make_tilecull_intersect(sc.tris, gs=128))
    run("C.tile128-mor", sc, cam, n,
        lambda: make_tilecull_intersect(sc.tris, gs=128,
                                        presort="morton"))
    run("C.pairwin", sc, cam, n,
        lambda: make_pair_intersect(sc.tris, **PAIR_TPU_WINNER))
    run("C.minarg", sc, cam, n,
        lambda: make_minarg_intersect(sc.tris))

    print("FINAL " + json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
