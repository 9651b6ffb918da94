"""TPU job: second-order sweep around the round-3 pair winner config.

The e4 sweep fixed (cs=256, trp=512, dop, mxu) and found l1=2 +
move='sort' optimal, but its u2_frac / tail rows ran in the gather
form — the prefix-capacity and tail-batch knobs are UNTESTED under
sort-carried movement, and so are trb, l2, l3, u3_frac, cs=128+dop.
This job sweeps those on the saved 1080p steady-state wavefront
(/tmp/stress_rays5.npz, job f0) and exactness-checks anything that
beats the winner before persisting it to pair_winner.json.

Also probes the movement-primitive costs at winner shapes (9/15/17-
operand lax.sort at 2M..64k rows, runtime AND compile) to size the
"sort-resident escalation chain" idea (one fwd sort + prefix re-sorts
+ one back sort instead of 4x full-width fwd+back) before building it.

Run through the worker: cp scripts/tpu_winner_sweep2.py \
    /tmp/tpu_jobs/z1_winner_sweep2.py
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
    print(json.dumps({"job": "winner_sweep2", "rays": n}), flush=True)

    results = []

    def run(tag, **overrides):
        kw = dict(PAIR_TPU_WINNER)
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
                   "warmup_s": round(warm, 1)}
            print(json.dumps(rec), flush=True)
            results.append((tt, tag, kw, f))
        except Exception as e:
            print(json.dumps({"cfg": tag, "error": repr(e)[:200]}),
                  flush=True)

    run("winner")                      # baseline at 1080p
    run("u2_frac=4", u2_frac=4)
    run("u2_frac=8", u2_frac=8)
    run("u2_frac=1", u2_frac=1)
    run("l2=14", l2=14)
    run("tail=16384", tail=16384)
    run("trp=256", trp=256)
    run("trb=256", trb=256)
    run("u3_frac=8", u3_frac=8)
    run("l3=64", l3=64)
    run("l1=1", l1=1)
    run("l1=3", l1=3)
    run("cs=128", cluster_size=128)

    results.sort(key=lambda r: r[0])
    sha = "unknown"
    try:
        sha = subprocess.check_output(
            ["git", "-C", "/root/repo", "rev-parse", "--short",
             "HEAD"], text=True).strip()
    except Exception:
        pass
    tt, tag, kw, f = results[0]
    hm = f(rays)
    jax.block_until_ready(hm.t)
    print(json.dumps({
        "job": "winner_sweep2_best", "winner": tag,
        "ms": round(tt * 1e3, 1), "mrays_s": round(n / tt / 1e6, 2),
        "fields": _flips(hd, hm), "sha": sha,
        "date": datetime.date.today().isoformat(),
    }), flush=True)
    with open("/tmp/tpu_jobs/pair_winner.json", "w") as fh:
        json.dump({k: v for k, v in kw.items()}, fh)

    # --- movement-primitive probe (sizes the escalation-chain idea) --
    rng = np.random.default_rng(0)
    for rows in (2097152, 1048576, 524288, 262144, 65536):
        key = jnp.asarray(rng.integers(0, 2, rows, dtype=np.int32))
        slot = jnp.arange(rows, dtype=jnp.int32)
        pays = [jnp.asarray(rng.standard_normal(rows, dtype=np.float32))
                for _ in range(7)]

        def mk(nops):
            def srt(k, s, ps):
                return jax.lax.sort([k, s, *ps[:nops - 2]], num_keys=2)
            return jax.jit(srt)

        for nops in ((9, 15) if rows == 2097152 else (9,)):
            if nops - 2 > len(pays):
                pays += [pays[0]] * (nops - 2 - len(pays))
            f9 = mk(nops)
            t0 = time.perf_counter()
            out = f9(key, slot, pays)
            jax.block_until_ready(out[0])
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(8):
                out = f9(key, slot, pays)
                jax.block_until_ready(out[0])
            ms = (time.perf_counter() - t0) / 8 * 1e3
            print(json.dumps({
                "probe": "sort", "rows": rows, "ops": nops,
                "ms": round(ms, 2), "compile_s": round(comp, 1),
            }), flush=True)
    return 0


if __name__ == "__main__" or __name__ == "__job__":
    main()
