"""TPU probe for the two-phase stress design (VERDICT r4 #4 route c):
measure what an approximate-first phase actually buys.

On the 100k-tri stress steady-state wavefront (the official workload):
  * full winner pair kernel: exact ms / 2.07M rays,
  * approx (round-1-only) at l1 = 2 / 4 / 8: ms, certified fraction,
    and WRONG-HIT fraction (t mismatch vs exact on ALL lanes — the
    number that decides whether a coupled-correction debias
    (multilevel MC) could converge cheaply).

Projection printed at the end: effective exact-equivalent rate of
  approx-every-step + exact correction on a coupled 1/K subset,
  K chosen so the correction term's variance stays below the base
  estimator's (K ~ 1 / (2 * P_wrong)).

Run standalone: python scripts/tpu_stress_approx_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_probe_cache")  # probe cache: keep the committed .jax_cache official-pathway-only
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.models import wavefront
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    make_pallas_intersect,
)
from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
    PAIR_TPU_WINNER, make_pair_intersect,
)
from opencl_path_tracer_tpu.scene import library


def timed(fn, rays, reps=3):
    out = fn(rays)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for _ in range(reps):
        out = fn(rays)
        jax.block_until_ready(jax.tree.leaves(out))
    return (time.time() - t0) / reps, out


def main():
    w, h = 1920, 1080
    n = w * h
    scene = library.stress_scene(100_000)
    cam = library.cornell_camera(w, h)
    key = jax.random.key(3)
    print(f"# device {jax.devices()[0].device_kind}; stress "
          f"{scene.num_triangles} tris, {n} rays", file=sys.stderr)

    dense = make_pallas_intersect(scene.tris)
    st = wavefront.init_wavefront(cam, n, mode="fast", key=key)
    step = jax.jit(lambda s: wavefront.wavefront_step(
        cam, scene.mats, s, intersect_fn=dense, iterations=5,
        mode="fast", key=key))
    for _ in range(10):
        st = step(st)
    rays = Rays(p=st.ray_p, d=st.ray_d)
    jax.block_until_ready(rays.p[0])

    full = jax.jit(make_pair_intersect(scene.tris, **PAIR_TPU_WINNER))
    t_full, h_exact = timed(full, rays)
    print(f"RESULT full: {t_full*1e3:.1f} ms "
          f"({n/t_full/1e6:.2f} Mrays/s)", flush=True)

    te = np.asarray(h_exact.t)
    for l1 in (2, 4, 8):
        kw = dict(PAIR_TPU_WINNER)
        kw["l1"] = l1
        ap = jax.jit(make_pair_intersect(scene.tris, approx=True,
                                         **kw))
        t_ap, (h_ap, res) = timed(ap, rays)
        ta = np.asarray(h_ap.t)
        resn = np.asarray(res)
        wrong = float((ta != te).mean())
        wrong_unres = float((ta != te)[~resn].mean()) \
            if (~resn).any() else 0.0
        p = max(wrong, 1e-6)
        k = max(1.0 / (2.0 * p), 1.0)
        t_eff = t_ap + t_full / k
        print(f"RESULT approx l1={l1}: {t_ap*1e3:.1f} ms "
              f"({n/t_ap/1e6:.2f} Mrays/s), certified "
              f"{resn.mean()*100:.1f}%, wrong {wrong*100:.2f}% "
              f"(of uncertified {wrong_unres*100:.1f}%), MLMC proj "
              f"K={k:.1f} -> {n/t_eff/1e6:.2f} Mrays/s effective",
              flush=True)


if __name__ == "__main__":
    main()
