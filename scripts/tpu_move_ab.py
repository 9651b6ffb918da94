"""TPU job: A/B the escalation data-movement mode (gather vs sort).

move="sort" replaces each escalation's ~21 u-row gathers/scatters
(non-fusing, ~13-15 ms per 1M rows) with two fixed-cost wide sorts
(see sorted_intersect.make_pair_intersect docstring). This job times
both modes on the real steady-state stress wavefront at the e4 winner
config (pair_winner.json; falls back to pairmx defaults), records the
warmup (compile) delta — the sort form adds two 9-operand sorts per
escalation site, and XLA:TPU sort compile time is superlinear in
operand count — and exactness-checks the sort mode vs the dense
kernel.

Run through the worker: cp into /tmp/tpu_jobs/ as e6_*.py.
"""

import datetime
import json
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
    try:
        with open("/tmp/tpu_jobs/pair_winner.json") as fh:
            kw = json.load(fh)
    except OSError:
        kw = {"cluster_size": 512, "trp": 512, "mxu": True}
    kw.pop("move", None)
    print(json.dumps({"base_config": kw}), flush=True)

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

    results = {}
    for move in ("sort", "gather"):
        try:
            f = jax.jit(make_pair_intersect(scene.tris, move=move,
                                            **kw))
            t0 = time.perf_counter()
            hm = f(rays)
            jax.block_until_ready(hm.t)
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 4
            for _ in range(reps):
                hm = f(rays)
                jax.block_until_ready(hm.t)
            tt = (time.perf_counter() - t0) / reps
            rec = {"move": move, "ms": round(tt * 1e3, 1),
                   "mrays_s": round(n / tt / 1e6, 2),
                   "warmup_s": round(warm, 1)}
            if move == "sort":
                rec["fields"] = _flips(hd, hm)
            print(json.dumps(rec), flush=True)
            results[move] = (tt, kw)
        except Exception as e:
            print(json.dumps({"move": move, "error": repr(e)[:300]}),
                  flush=True)

    if "sort" in results and (
        "gather" not in results
        or results["sort"][0] < results["gather"][0]
    ):
        kw2 = dict(kw, move="sort")
        with open("/tmp/tpu_jobs/pair_winner.json", "w") as fh:
            json.dump(kw2, fh)
        print(json.dumps({"winner_updated": kw2}), flush=True)

    sha = "unknown"
    try:
        sha = subprocess.check_output(
            ["git", "-C", "/root/repo", "rev-parse", "--short",
             "HEAD"], text=True).strip()
    except Exception:
        pass
    print(json.dumps({"job": "move_ab_done", "sha": sha,
                      "date": datetime.date.today().isoformat()}),
          flush=True)
    return 0


if __name__ == "__main__" or __name__ == "__job__":
    main()
