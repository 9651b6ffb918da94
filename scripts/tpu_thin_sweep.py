"""TPU job: second-order sweep over thin-mode variants.

Runs after z3 (thin baseline vs winner): with thin payloads the HBM
feature stream and pair-row sort volume economics shift, so re-test
infeat (deletes the (32, Ppad) featp stream — was neutral non-thin),
a shallower round-2 window (l2=5/6 — halves the 6M-row round-2 pair
expansion; p50 cert rank is 2-3), and trp=1024 (fewer visit-grid
steps; the VMEM budget the non-thin 5-stream kernel exceeded may now
fit). Every config exactness-checks against the dense kernel.

Run through the worker: cp scripts/tpu_thin_sweep.py \
    /tmp/tpu_jobs/z4_thin_sweep.py
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

RAYS_NPZ = "/tmp/stress_rays5.npz"


def _time(fn, rays, reps=4):
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
    scene = library.stress_scene(100_000)
    dense = jax.jit(make_pallas_intersect(scene.tris))
    hd = dense(rays)
    jax.block_until_ready(hd.t)
    sha = "unknown"
    try:
        sha = subprocess.check_output(
            ["git", "-C", "/root/repo", "rev-parse", "--short",
             "HEAD"], text=True).strip()
    except Exception:
        pass
    print(json.dumps({"job": "thin_sweep", "rays": n, "sha": sha,
                      "date": datetime.date.today().isoformat()}),
          flush=True)

    results = []

    def run(tag, **overrides):
        kw = dict(PAIR_TPU_WINNER)
        kw["thin"] = True
        kw.update(overrides)
        try:
            f = jax.jit(make_pair_intersect(scene.tris, **kw))
            t0 = time.perf_counter()
            hh = f(rays)
            jax.block_until_ready(hh.t)
            warm = time.perf_counter() - t0
            tt = _time(f, rays)
            rec = {"cfg": tag, "ms": round(tt * 1e3, 1),
                   "mrays_s": round(n / tt / 1e6, 2),
                   "warmup_s": round(warm, 1),
                   "fields": _flips(hd, hh)}
            print(json.dumps(rec), flush=True)
            results.append((tt, tag, kw))
        except Exception as e:
            print(json.dumps({"cfg": tag, "error": repr(e)[:400]}),
                  flush=True)

    run("thin+infeat", infeat=True)
    run("thin l2=5", l2=5)
    run("thin l2=6", l2=6)
    run("thin trp=1024", trp=1024)
    run("thin l2=5 infeat", l2=5, infeat=True)

    results.sort(key=lambda r: r[0])
    if results:
        tt, tag, kw = results[0]
        print(json.dumps({"job": "thin_sweep_best", "winner": tag,
                          "ms": round(tt * 1e3, 1),
                          "mrays_s": round(n / tt / 1e6, 2),
                          "kw": {k: v for k, v in kw.items()}}),
              flush=True)
    return 0


if __name__ == "__main__" or __name__ == "__job__":
    main()
