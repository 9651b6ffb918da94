"""TPU job: pair-v5 schedule sweep (l1 staircase / prefix fractions).

Reads e2_pair_mxu_bench.py.out (if present) to pick the fastest
measured v5 kernel config (cs, trp, dop), then sweeps the ESCALATION
SCHEDULE around it on the real steady-state stress wavefront:

  * l1 in {4, 6, 8, 12} — round-1 pair volume vs escalation load.
    Smaller l1 halves the 16.8M-row round-1 sorts (the dominant
    movement term) but pushes more rays through the ~100 ms/call
    escalation infrastructure; the certificate-rank distribution
    (p50=2, p75=6, p90=11) says the crossover is not obvious.
  * on the best l1: u2_frac in {1, 4} (round-2 prefix capacity) and
    tail in {16384} (dense-tail batch).

The overall winner is exactness-checked against the dense kernel on
the full live population (same bar as e2 / tpu_pair_exactness.py).

Run through the worker: cp into /tmp/tpu_jobs/ as e4_*.py (sorted
after e2/e3 so the adaptive read works).
"""

import datetime
import json
import re
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.models import wavefront
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    make_pallas_intersect,
)
from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
    make_pair_intersect,
)
from opencl_path_tracer_tpu.scene import library

E2_OUT = "/tmp/tpu_jobs/e2_pair_mxu_bench.py.out"


def pick_kernel_config():
    """Best (cs, trp, dop) from e2's timing lines; default if absent."""
    best = (512, 512, False)
    best_rate = -1.0
    try:
        with open(E2_OUT) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                cfg = rec.get("cfg", "")
                rate = rec.get("mrays_s")
                m = re.match(
                    r"v5 cs=(\d+) trp=(\d+)(?: dop=(\d))?", cfg
                )
                if m and rate is not None and rate > best_rate:
                    best_rate = rate
                    best = (int(m.group(1)), int(m.group(2)),
                            m.group(3) == "1")
    except OSError:
        pass
    return best, best_rate


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
        a = np.asarray(getattr(hd, name))
        b = np.asarray(getattr(hx, name))
        out[name] = int((a != b).sum())
    for k in range(3):
        a = np.asarray(hd.n[k])[hit]
        b = np.asarray(hx.n[k])[hit]
        out[f"n{k}_on_hits"] = int((a != b).sum())
    out["hits"] = int(hit.sum())
    return out


def main() -> int:
    w, h = 1536, 864
    n = w * h
    scene = library.stress_scene(100_000)
    cam = library.cornell_camera(w, h)
    key = jax.random.key(3)

    dense = make_pallas_intersect(scene.tris)
    state = wavefront.init_wavefront(cam, n, mode="fast", key=key)
    step = jax.jit(lambda st: wavefront.wavefront_step(
        cam, scene.mats, st, intersect_fn=dense, iterations=5,
        mode="fast", key=key,
    ))
    for _ in range(12):
        state = step(state)
    jax.block_until_ready(state.ray_p[0])
    rays = Rays(p=state.ray_p, d=state.ray_d)
    hd = jax.jit(dense)(rays)
    jax.block_until_ready(hd.t)

    (cs, trp, dop), seed_rate = pick_kernel_config()
    print(json.dumps({"picked": f"cs={cs} trp={trp} dop={int(dop)}",
                      "e2_rate": seed_rate}), flush=True)

    results = []

    def run(tag, **kw):
        kw.setdefault("cluster_size", cs)
        kw.setdefault("trp", trp)
        kw.setdefault("mxu", True)
        kw.setdefault("dop", dop)
        try:
            f = jax.jit(make_pair_intersect(scene.tris, **kw))
            t0 = time.perf_counter()
            hh = f(rays)
            jax.block_until_ready(hh.t)
            warm = time.perf_counter() - t0
            tt = _time(f, rays)
            rec = {"cfg": tag, "ms": round(tt * 1e3, 1),
                   "mrays_s": round(n / tt / 1e6, 2),
                   "warmup_s": round(warm, 1)}
            print(json.dumps(rec), flush=True)
            results.append((tt, tag, kw, f))
        except Exception as e:
            print(json.dumps({"cfg": tag, "error": repr(e)[:200]}),
                  flush=True)

    for l1 in (2, 4, 6, 8, 12):
        run(f"l1={l1}", l1=l1)
    # Sort-carried movement (move='sort'): fixed ~27 ms of wide sorts
    # per escalation replaces u-row gathers/scatters — shifts the l1
    # staircase economics, so sweep it jointly.
    for l1 in (2, 4, 8):
        run(f"l1={l1} move=sort", l1=l1, move="sort")
    # Exploratory: fine clusters + DOP bounds (kernel-test optimum —
    # 14-DOP need ~8.6 x 128 tris = 2.2 Gt/step; viability hinges on
    # the C=777 selection cost and the +~15% pair volume).
    run("cs=128 dop l1=10 move=sort", cluster_size=128, dop=True,
        l1=10, move="sort")
    # In-kernel features (drops the featp HBM stream; compiles only
    # if the e1 Mosaic probe passed — run() catches the failure).
    run("l1=8 move=sort infeat", l1=8, move="sort", infeat=True)

    results.sort(key=lambda r: r[0])
    if not results:
        return 1
    _, best_tag, best_kw, _f = results[0]
    bl1 = best_kw.get("l1", 8)
    run(f"l1={bl1} u2_frac=1", l1=bl1, u2_frac=1)
    run(f"l1={bl1} u2_frac=4", l1=bl1, u2_frac=4)
    run(f"l1={bl1} tail=16384", l1=bl1, tail=16384)

    results.sort(key=lambda r: r[0])
    tt, tag, kw, f = results[0]
    hm = f(rays)
    jax.block_until_ready(hm.t)
    sha = "unknown"
    try:
        sha = subprocess.check_output(
            ["git", "-C", "/root/repo", "rev-parse", "--short",
             "HEAD"], text=True).strip()
    except Exception:
        pass
    print(json.dumps({
        "job": "pair_schedule_winner", "winner": tag,
        "base": f"cs={cs} trp={trp} dop={int(dop)}",
        "ms": round(tt * 1e3, 1),
        "mrays_s": round(n / tt / 1e6, 2),
        "fields": _flips(hd, hm), "sha": sha,
        "date": datetime.date.today().isoformat(),
    }), flush=True)
    # Persist the winning kwargs for downstream jobs (e5 end-to-end).
    with open("/tmp/tpu_jobs/pair_winner.json", "w") as fh:
        json.dump(kw, fh)
    return 0


if __name__ == "__main__" or __name__ == "__job__":
    main()
