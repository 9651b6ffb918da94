"""TPU job: scene-size scaling of the production pair winner.

Times the PAIR_TPU_WINNER intersect on stress scenes of 100k / 300k /
1M triangles with the saved 2.07M-ray steady-state wavefront (the
shell geometry is identical across sizes; only the sphere-grid density
changes, so the ray population stays representative). Exactness is
re-checked against the dense kernel at 100k and 300k; at 1M the dense
reference costs ~40 s/call, so that size is timing-only (the winner's
exactness argument is config- and scene-independent and CI covers it).

Expected shape: the candidate-selection kernel is O(C) per ray per
call (C = ceil(T/256) clusters), so cost grows with T beyond the
~5 Mrays/s 100k point — this job turns that expectation into a
documented measurement for the scaling section of BENCHMARKS.

Run through the worker: cp scripts/tpu_scale_sweep.py \
    /tmp/tpu_jobs/z9_scale_sweep.py
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

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    make_pallas_intersect,
)
from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
    PAIR_TPU_WINNER, make_pair_intersect,
)
from opencl_path_tracer_tpu.scene import library
from opencl_path_tracer_tpu.utils.constlift import lift_consts

RAYS_NPZ = "/tmp/stress_rays5.npz"


def _jit_lifted(isect, rays):
    """jit with the scene packs as runtime args (program size must not
    scale with the scene — the first run of this job failed at 300k
    tris on compile-request size from the baked literals alone)."""
    lifted, consts = lift_consts(isect, rays)
    j = jax.jit(lifted)
    return lambda r: j(consts, r)


def _time(fn, rays, reps=3):
    h = fn(rays)
    jax.block_until_ready(h.t)
    t0 = time.perf_counter()
    for _ in range(reps):
        h = fn(rays)
        jax.block_until_ready(h.t)
    return (time.perf_counter() - t0) / reps


def _flips(hd, hx):
    out = {}
    hit = np.asarray(hd.t) >= 0.0
    for name in ("t", "mati"):
        out[name] = int(
            (np.asarray(getattr(hd, name))
             != np.asarray(getattr(hx, name))).sum()
        )
    for k in range(3):
        out[f"n{k}_on_hits"] = int(
            (np.asarray(hd.n[k])[hit] != np.asarray(hx.n[k])[hit]).sum()
        )
    out["hits"] = int(hit.sum())
    return out


def main() -> int:
    z = np.load(RAYS_NPZ)
    rays = Rays(
        p=tuple(jnp.asarray(z[f"s0_p{a}"]) for a in "xyz"),
        d=tuple(jnp.asarray(z[f"s0_d{a}"]) for a in "xyz"),
    )
    n = int(rays.p[0].shape[0])
    sha = "unknown"
    try:
        sha = subprocess.check_output(
            ["git", "-C", "/root/repo", "rev-parse", "--short",
             "HEAD"], text=True).strip()
    except Exception:
        pass
    print(json.dumps({"job": "scale_sweep", "rays": n, "sha": sha,
                      "date": datetime.date.today().isoformat()}),
          flush=True)

    for tcount, check in ((100_000, True), (300_000, True),
                          (1_000_000, False)):
        try:
            scene = library.stress_scene(tcount)
            f = _jit_lifted(
                make_pair_intersect(scene.tris, **PAIR_TPU_WINNER),
                rays)
            t0 = time.perf_counter()
            hh = f(rays)
            jax.block_until_ready(hh.t)
            warm = time.perf_counter() - t0
            tt = _time(f, rays)
            rec = {"tris": tcount, "ms": round(tt * 1e3, 1),
                   "mrays_s": round(n / tt / 1e6, 2),
                   "warmup_s": round(warm, 1)}
            if check:
                dense = _jit_lifted(
                    make_pallas_intersect(scene.tris), rays)
                hd = dense(rays)
                jax.block_until_ready(hd.t)
                rec["fields"] = _flips(hd, hh)
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"tris": tcount,
                              "error": repr(e)[:400]}), flush=True)
    return 0


if __name__ == "__main__" or __name__ == "__job__":
    main()
