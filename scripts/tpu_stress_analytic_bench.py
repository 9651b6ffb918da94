"""TPU job: stress-analytic — the stress content as ~20 tris + ~138
analytic quadrics through the table-driven sphere kernel.

1. table kernel vs XLA sphere_intersect on 2.07M primary rays,
2. merged step cost (minarg shell + table kernel + merge),
3. bench-pathway e2e wavefront at 1920x1080 iters=5.

Record (job zr8, 2026-08-18, sha fa4a03d, v5e): 240.5 Mrays/s e2e;
0 valid flips / bitwise t / 0 mati flips vs the XLA form on 2.07M
rays; merged step 10.8 ms. See docs/BENCHMARKS.md.

Run through the worker:  cp scripts/tpu_stress_analytic_bench.py /tmp/tpu_jobs/
"""
import argparse
import importlib
import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
import bench
# The worker executes jobs in ONE long-lived process; reload so an
# edited bench.py wins over a stale import (the zr3 landmine).
bench = importlib.reload(bench)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from opencl_path_tracer_tpu.ops import intersect, raygen
    from opencl_path_tracer_tpu.ops.pallas.sphere_kernel import (
        make_sphere_table_intersect,
    )
    from opencl_path_tracer_tpu.scene import library

    on_cpu = jax.default_backend() == "cpu"
    w, h = (128, 128) if on_cpu else (1920, 1080)
    n = w * h
    scene = library.stress_scene(100_000, analytic=True)
    cam = library.cornell_camera(w, h)
    ids_px = raygen.pixel_ids(w, h)
    half = jnp.full((n,), 0.5, jnp.float32)
    rays = raygen.camera_rays(cam, ids_px, half, half)
    out = {"job": "stress_analytic", "tris": scene.num_triangles,
           "spheres": int(scene.spheres.count)}

    xla_fn = jax.jit(lambda r: intersect.sphere_intersect(
        r, scene.spheres))
    tab_fn = jax.jit(make_sphere_table_intersect(scene.spheres,
                                                 interpret=on_cpu))
    a = jax.block_until_ready(xla_fn(rays))
    b = jax.block_until_ready(tab_fn(rays))
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

    def timeit(fn, reps=5):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps * 1e3

    merged = bench.make_isect(scene, "auto", on_cpu)
    merged_j = jax.jit(lambda r: merged(r).t)
    out["step_ms"] = {
        "analytic_merged": round(timeit(lambda: merged_j(rays)), 2),
        "sphere_table_only": round(timeit(lambda: tab_fn(rays).t), 2),
    }

    args = argparse.Namespace(
        size=f"{w}x{h}", steps=16 if on_cpu else 64, iters=5,
        model="wavefront", accel="auto", chunk=8, lanes=1,
    )
    out["e2e"] = bench.bench_scene("stress-analytic", args)

    sha = "unknown"
    try:
        sha = subprocess.check_output(
            ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
            text=True).strip()
    except Exception:
        pass
    out["sha"] = sha
    out["device"] = jax.devices()[0].device_kind
    out["ok"] = bool(out["kernel_vs_xla"]["valid_flips"] < 100
                     and out["kernel_vs_xla"]["t_rel_max"] < 1e-3
                     and out["kernel_vs_xla"]["mati_flips"] < 10)
    print(json.dumps(out))


if __name__ in ("__main__", "__job__"):
    main()
