"""TPU job: fused smooth-refine kernel — exactness + cost on device.

Companion to tpu_shading_check.py, which measured the XLA gather form
of smooth shading at 289 ms/step vs 32.5 flat (2.07M cornell rays).
This validates the fix (ops/pallas/shading_kernel.py):

  1. make_smooth_minarg_intersect == first_intersect_ids +
     smooth_hit_normals on t (bitwise vs minarg t) / mati (bitwise) /
     normals (<= 2e-5, the hit-point ulp slide) at 2.07M rays,
  2. its step cost is within a few ms of the flat minarg step.

Run through the worker:  cp scripts/tpu_smooth_kernel_check.py /tmp/tpu_jobs/
"""

import datetime
import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from opencl_path_tracer_tpu.ops import intersect, raygen, shading
from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
    make_minarg_intersect,
)
from opencl_path_tracer_tpu.ops.pallas.shading_kernel import (
    make_smooth_minarg_intersect,
)
from opencl_path_tracer_tpu.scene import library


def main() -> int:
    on_cpu = jax.default_backend() == "cpu"
    w, h = (128, 128) if on_cpu else (1920, 1080)
    n = w * h
    scene = library.cornell_box(with_spheres=True, smooth_spheres=True)
    cam = library.cornell_camera(w, h)
    ids_px = raygen.pixel_ids(w, h)
    half = jnp.full((n,), 0.5, jnp.float32)
    rays = raygen.camera_rays(cam, ids_px, half, half)

    fused_isect = make_smooth_minarg_intersect(
        scene.tris, scene.attribs, interpret=on_cpu)
    fused = jax.jit(fused_isect)
    mk = jax.jit(make_minarg_intersect(scene.tris, with_ids=True,
                                       interpret=on_cpu))

    def xla_smooth(r):
        hh, ii = mk(r)
        return shading.smooth_hit_normals(hh, ii, scene.attribs)

    ref_fn = jax.jit(xla_smooth)
    h_f = jax.block_until_ready(fused(rays))
    h_r = jax.block_until_ready(ref_fn(rays))

    t_flips = int((np.asarray(h_f.t) != np.asarray(h_r.t)).sum())
    m_flips = int((np.asarray(h_f.mati) != np.asarray(h_r.mati)).sum())
    n_err = max(
        float(np.abs(np.asarray(h_f.n[k]) - np.asarray(h_r.n[k])).max())
        for k in range(3)
    )

    def timeit(fn, reps=5):
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps * 1e3

    flat_isect = make_minarg_intersect(scene.tris, interpret=on_cpu)
    flat_fn = jax.jit(lambda r: flat_isect(r).n)
    fused_n = jax.jit(lambda r: fused_isect(r).n)
    perf = {
        "flat_minarg": round(timeit(lambda: flat_fn(rays)), 2),
        "fused_smooth": round(timeit(lambda: fused_n(rays)), 2),
    }

    sha = "unknown"
    try:
        sha = subprocess.check_output(
            ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
            text=True).strip()
    except Exception:
        pass
    ok = t_flips == 0 and m_flips == 0 and n_err <= 2e-5
    print(json.dumps({
        "job": "smooth_kernel_check", "rays": n,
        "t_flips": t_flips, "mati_flips": m_flips,
        "n_err_max": n_err, "perf_ms": perf, "ok": bool(ok),
        "sha": sha, "date": datetime.date.today().isoformat(),
        "device": jax.devices()[0].device_kind,
    }))
    return 0 if ok else 1


if __name__ == "__main__" or __name__ == "__job__":
    main()
