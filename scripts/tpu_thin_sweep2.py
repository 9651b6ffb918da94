"""TPU job: third-order sweep — combos around the thin l2=6 result.

z4 found thin l2=6 at 5.16 Mrays/s (vs thin-default-l2=8 4.60,
non-thin winner 4.26); l2=5 LOST (3.90), so the gain is not monotone
in window depth — the round-2 pair width w = l2 - l1 is 4 at l2=6
(lane-aligned) vs 3 at l2=5 and 6 at l2=8.  This job tests:
  * l2=6 combined with the two knobs that were individually ~neutral
    on the non-thin winner (trp=1024, infeat) — the visit-grid and
    feature-stream economics both shifted under thin payloads;
  * the other aligned widths w=2 (l2=4) and w=8 (l2=10);
  * l1=1 (was within noise of l1=2 non-thin) and a bigger dense tail
    under the shallower escalation.
Every config exactness-checks against the dense kernel on the saved
2.07M-ray steady-state stress wavefront.

Run through the worker: cp scripts/tpu_thin_sweep2.py \
    /tmp/tpu_jobs/z5_thin_sweep2.py
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
    print(json.dumps({"job": "thin_sweep2", "rays": n, "sha": sha,
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

    run("thin l2=6 trp=1024", l2=6, trp=1024)
    run("thin l2=6 infeat", l2=6, infeat=True)
    run("thin l2=6 trp=1024 infeat", l2=6, trp=1024, infeat=True)
    run("thin l2=4", l2=4)
    run("thin l2=10", l2=10)
    run("thin l2=6 l1=1", l2=6, l1=1)
    run("thin l2=6 tail=16384", l2=6, tail=16384)

    results.sort(key=lambda r: r[0])
    if results:
        tt, tag, kw = results[0]
        print(json.dumps({"job": "thin_sweep2_best", "winner": tag,
                          "ms": round(tt * 1e3, 1),
                          "mrays_s": round(n / tt / 1e6, 2),
                          "kw": {k: v for k, v in kw.items()}}),
              flush=True)
    return 0


if __name__ == "__main__" or __name__ == "__job__":
    main()
