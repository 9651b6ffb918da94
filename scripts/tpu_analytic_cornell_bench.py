"""TPU job: the analytic-cornell headline experiment.

Cornell's 804 triangles are 12 box triangles + 792 sphere-tessellation
triangles; the reference tessellates only because prog.cl has no
sphere primitive. With the analytic quadric primitive the same scene
content is 12 tris + 2 spheres — ~67x fewer triangle tests per ray.
This job measures what that buys end-to-end:

  1. sphere-kernel exactness at scale: Pallas baked-constant kernel
     vs the XLA form on 2.07M primary rays (hit/miss, t, mati),
  2. merged-step cost: minarg(12 tris) + sphere kernel + merge vs the
     804-tri flat minarg step,
  3. bench-pathway e2e: run_wavefront on cornell-analytic at
     1920x1080 iters=5 (the exact headline workload) vs the 'cornell'
     number.

Run through the worker:  cp scripts/tpu_analytic_cornell_bench.py /tmp/tpu_jobs/
"""

import argparse
import datetime
import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    # The worker executes jobs in ONE long-lived process: a bench
    # module imported by an earlier job wins over the on-disk edit
    # (job zr3 measured the stress scene because of exactly this).
    import importlib
    import bench
    bench = importlib.reload(bench)
    from opencl_path_tracer_tpu.ops import intersect, raygen
    from opencl_path_tracer_tpu.ops.pallas.sphere_kernel import (
        make_sphere_intersect,
    )
    from opencl_path_tracer_tpu.scene import library

    on_cpu = jax.default_backend() == "cpu"
    w, h = (128, 128) if on_cpu else (1920, 1080)
    n = w * h
    scene = library.cornell_box(with_spheres=True,
                                analytic_spheres=True)
    cam = library.cornell_camera(w, h)
    ids_px = raygen.pixel_ids(w, h)
    half = jnp.full((n,), 0.5, jnp.float32)
    rays = raygen.camera_rays(cam, ids_px, half, half)
    out = {"job": "analytic_cornell", "tris": scene.num_triangles}

    # --- 1. kernel exactness vs XLA form -----------------------------
    xla_fn = jax.jit(lambda r: intersect.sphere_intersect(
        r, scene.spheres))
    krn_fn = jax.jit(make_sphere_intersect(scene.spheres,
                                           interpret=on_cpu))
    a = jax.block_until_ready(xla_fn(rays))
    b = jax.block_until_ready(krn_fn(rays))
    va, vb = np.asarray(a.valid), np.asarray(b.valid)
    both = va & vb
    rel = np.abs(np.asarray(a.t)[both] - np.asarray(b.t)[both]) / (
        np.abs(np.asarray(a.t)[both]) + 1.0)
    out["kernel_vs_xla"] = {
        "rays": n, "valid_flips": int((va != vb).sum()),
        "t_rel_max": float(rel.max()),
        "mati_flips": int((np.asarray(a.mati)[both]
                           != np.asarray(b.mati)[both]).sum()),
    }

    # --- 2. step cost: merged analytic vs 804-tri flat ---------------
    def timeit(fn, reps=5):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps * 1e3

    merged = bench.make_isect(scene, "auto", on_cpu)
    assert scene.spheres is not None and merged.__name__ == "merged"
    merged_j = jax.jit(lambda r: merged(r).t)
    tess = library.cornell_box(with_spheres=True)
    flat = bench.make_isect(tess, "auto", on_cpu)
    flat_j = jax.jit(lambda r: flat(r).t)
    sph_j = jax.jit(lambda r: krn_fn(r).t)
    out["step_ms"] = {
        "analytic_merged": round(timeit(lambda: merged_j(rays)), 2),
        "sphere_kernel_only": round(timeit(lambda: sph_j(rays)), 2),
        "tessellated_flat": round(timeit(lambda: flat_j(rays)), 2),
    }

    # --- 3. bench-pathway e2e on the headline workload ---------------
    args = argparse.Namespace(
        size=f"{w}x{h}", steps=16 if on_cpu else 64, iters=5,
        model="wavefront", accel="auto", chunk=8, lanes=1,
    )
    res = bench.bench_scene("cornell-analytic", args)
    out["e2e"] = res

    sha = "unknown"
    try:
        sha = subprocess.check_output(
            ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
            text=True).strip()
    except Exception:
        pass
    out["sha"] = sha
    out["date"] = datetime.date.today().isoformat()
    out["device"] = jax.devices()[0].device_kind
    ok = (out["kernel_vs_xla"]["valid_flips"] < 50
          and out["kernel_vs_xla"]["t_rel_max"] < 1e-4
          and out["kernel_vs_xla"]["mati_flips"] == 0)
    out["ok"] = bool(ok)
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__" or __name__ == "__job__":
    main()
