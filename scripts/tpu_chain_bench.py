"""TPU job: pair v7 chain mode vs the v6 sort winner, on-device.

The chain replaces the 3 full-width fwd+back sort pairs of the
escalation schedule (and the 2 full-width sorts every tail iteration
pays) with: one full-width fwd sort, prefix re-sorts of the shrinking
live region, a chain-resident chunked minarg tail, and one back sort.
Re-times the z5 winner (thin l2=6 trp=1024, move=sort) in the same
session for a paired comparison, then the chain at both trp values and
at l2=8 (the chain shifts sort economics, so the l2 optimum may move).
Every config exactness-checks against the dense kernel.

Run through the worker: cp scripts/tpu_chain_bench.py \
    /tmp/tpu_jobs/z6_chain_bench.py
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
    make_pair_intersect,
)
from opencl_path_tracer_tpu.scene import library

RAYS_NPZ = "/tmp/stress_rays5.npz"
BASE = dict(mxu=True, dop=True, cluster_size=256, l1=2, l2=6,
            thin=True)


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
    print(json.dumps({"job": "chain_bench", "rays": n, "sha": sha,
                      "date": datetime.date.today().isoformat()}),
          flush=True)

    results = []

    def run(tag, **overrides):
        kw = dict(BASE)
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

    run("sort trp=1024", move="sort", trp=1024)
    run("chain trp=1024", move="chain", trp=1024)
    run("chain trp=512", move="chain", trp=512)
    run("chain l2=8 trp=1024", move="chain", trp=1024, l2=8)

    results.sort(key=lambda r: r[0])
    if results:
        tt, tag, kw = results[0]
        print(json.dumps({"job": "chain_bench_best", "winner": tag,
                          "ms": round(tt * 1e3, 1),
                          "mrays_s": round(n / tt / 1e6, 2),
                          "kw": {k: v for k, v in kw.items()}}),
              flush=True)
    return 0


if __name__ == "__main__" or __name__ == "__job__":
    main()
