"""TPU measurement: wrong-hit DELTA variance on the 100k stress scene
(VERDICT r4 #1 — the last unexplored lever on the 5.3 Mrays/s number).

Question. The approx pair intersector (round-1-only march,
sorted_intersect approx=True) runs 1.3-3.7x the exact rate but returns
a wrong nearest hit on 2-10% of rays. Round 4's two-phase estimator
died to PATH-level error compounding — but if a wrong hit usually
lands on a NEIGHBORING sphere with similar shading, the per-sample
DELTA (exact - approx, coupled by shared RNG) may carry far less
variance than the sample itself, reviving the two-level estimator:

    I = E[approx] + E[exact - approx]
    Var = V_a/N + V_d/M,  cost = N c_a + M (c_e + c_a)

Measurement. Megakernel fast-mode samples are coupled EXACTLY by
construction: every RNG draw is keyed on (lane, sample_index, bounce)
(ops/rng.fast_uniforms), so running the same sample index through the
exact and approx intersectors consumes identical uniforms — paths
differ only downstream of a wrong hit. We accumulate per-pixel sums
of e, a, d = e - a and their squares over S coupled samples, then
report alpha = mean(V_d)/mean(V_e) and the optimal two-level speedup

    speedup = V_e c_e / (sqrt(V_a c_a) + sqrt(V_d (c_e + c_a)))^2

using the round-4 measured wavefront rates (exact 5.44 Mrays/s;
approx l1=2/4/8: 20.3/13.5/7.2). Decision rule (VERDICT): build the
coupled-correction renderer iff projected effective >= 10 Mrays/s.

Probe run: /tmp cache; one TPU process at a time.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_probe_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from opencl_path_tracer_tpu.models import megakernel
from opencl_path_tracer_tpu.ops import raygen
from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
    PAIR_TPU_WINNER, make_pair_intersect,
)
from opencl_path_tracer_tpu.scene import library
from opencl_path_tracer_tpu.utils.constlift import lift_consts

# Round-4 measured wavefront e2e rates on this scene (Mrays/s).
RATE_EXACT = 5.44
RATE_APPROX = {2: 20.3, 4: 13.5, 8: 7.2}

W = H = 512
S = 48          # coupled samples per config
CH = 4          # samples per dispatch (watchdog: ~1.5 s each)
ITERS = 5


def lum(colors):
    return (0.2126 * colors[0] + 0.7152 * colors[1]
            + 0.0722 * colors[2])


def main():
    n = W * H
    scene = library.stress_scene(100_000)
    cam = library.cornell_camera(W, H)
    key = jax.random.key(11)
    ids = raygen.pixel_ids_like(n)
    print(f"# device {jax.devices()[0].device_kind}; stress "
          f"{scene.num_triangles} tris @ {W}x{H}, S={S}",
          file=sys.stderr)

    exact = make_pair_intersect(scene.tris, **PAIR_TPU_WINNER)
    state0 = megakernel.init_state(n, seed=1)
    results = {}

    for l1 in (2, 4, 8):
        kw = dict(PAIR_TPU_WINNER)
        kw["l1"] = l1
        ap_raw = make_pair_intersect(scene.tris, approx=True, **kw)

        def approx_only(rays):
            return ap_raw(rays)[0]  # drop the certificate

        def one_sample(s_idx):
            se = megakernel.trace_sample(
                cam, scene.mats, state0, intersect_fn=exact,
                iterations=ITERS, mode="fast", key=key, ids=ids,
                sample_index=s_idx)
            sa = megakernel.trace_sample(
                cam, scene.mats, state0, intersect_fn=approx_only,
                iterations=ITERS, mode="fast", key=key, ids=ids,
                sample_index=s_idx)
            return lum(se.colors), lum(sa.colors)

        def chunk(s0, acc):
            def body(i, acc):
                le, la = one_sample(s0 + i)
                d = le - la
                return (acc[0] + le, acc[1] + le * le,
                        acc[2] + la, acc[3] + la * la,
                        acc[4] + d, acc[5] + d * d,
                        acc[6] + (d != 0.0).astype(jnp.float32))
            return jax.lax.fori_loop(0, CH, body, acc)

        acc = tuple(jnp.zeros((n,), jnp.float32) for _ in range(7))
        t0 = time.time()
        lifted, consts = lift_consts(chunk, jnp.int32(0), acc)
        run = jax.jit(lifted)
        acc = run(consts, jnp.int32(0), acc)
        jax.block_until_ready(acc[0])
        print(f"# l1={l1} warmup+compile {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        for s0 in range(CH, S, CH):
            acc = run(consts, jnp.int32(s0), acc)
        jax.block_until_ready(acc[0])
        dt = time.time() - t0
        se_, se2, sa_, sa2, sd, sd2, dnz = (
            np.asarray(x, np.float64) for x in acc)
        Ve = np.maximum(se2 - se_ ** 2 / S, 0.0) / (S - 1)
        Va = np.maximum(sa2 - sa_ ** 2 / S, 0.0) / (S - 1)
        Vd = np.maximum(sd2 - sd ** 2 / S, 0.0) / (S - 1)
        alpha = float(Vd.mean() / max(Ve.mean(), 1e-30))
        bias = float(sd.mean() / S)
        touched = float((dnz > 0).mean())
        c_e = 1.0 / RATE_EXACT
        c_a = 1.0 / RATE_APPROX[l1]
        denom = (np.sqrt(Va.mean() * c_a)
                 + np.sqrt(Vd.mean() * (c_e + c_a))) ** 2
        speedup = float(Ve.mean() * c_e / max(denom, 1e-30))
        eff = RATE_EXACT * speedup
        # Optimal pair fraction M/N for the report.
        m_over_n = float(np.sqrt(
            Vd.mean() * c_a / max(Va.mean() * (c_e + c_a), 1e-30)))
        results[f"l1={l1}"] = dict(
            alpha=round(alpha, 4), bias=round(bias, 5),
            frac_pixels_any_delta=round(touched, 4),
            Ve=float(Ve.mean()), Va=float(Va.mean()),
            Vd=float(Vd.mean()),
            mlmc_speedup=round(speedup, 3),
            effective_mrays=round(eff, 2),
            pair_fraction=round(m_over_n, 4),
            measure_s=round(dt, 1),
        )
        print(f"RESULT l1={l1}: alpha={alpha:.4f} bias={bias:.5f} "
              f"touched={touched*100:.1f}% speedup=x{speedup:.2f} "
              f"-> {eff:.2f} Mrays/s effective (pair frac "
              f"{m_over_n:.3f})", flush=True)
        print(json.dumps(results), flush=True)

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
