"""TPU e2e sweep: tile-culling grouped intersector vs minarg on the
tessellated cornell (VERDICT r4 #3: raise 71.7 toward >= 100-125).

Measures wavefront e2e Mrays/s for minarg baseline and tilecull at
several (gs, sort_every) points, then a TPU exactness check (t/mati
bits vs minarg on steady-state bounce rays).

Run standalone (one TPU process at a time): python scripts/tpu_tilecull_bench.py
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

import bench
from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
    make_minarg_intersect,
)
from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
    make_tilecull_intersect,
)
from opencl_path_tracer_tpu.scene import library


def main():
    w, h = 1920, 1080
    n = w * h
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    print(f"# device {jax.devices()[0].device_kind}; cornell "
          f"{scene.num_triangles} tris @ {w}x{h}", file=sys.stderr)

    configs = [
        ("minarg", lambda: make_minarg_intersect(scene.tris), 0),
        ("tile128-s1",
         lambda: make_tilecull_intersect(scene.tris, gs=128), 1),
        ("tile128-s0",
         lambda: make_tilecull_intersect(scene.tris, gs=128), 0),
        ("tile64-s1",
         lambda: make_tilecull_intersect(scene.tris, gs=64), 1),
        ("tile256-s1",
         lambda: make_tilecull_intersect(scene.tris, gs=256), 1),
        ("minarg-s1", lambda: make_minarg_intersect(scene.tris), 1),
    ]
    for name, mk, sort in configs:
        t0 = time.time()
        try:
            isect = mk()
            mrays, dt, spp = bench.run_wavefront(
                scene, cam, n, isect, iters=5, steps=32, chunk=8,
                sort_every=sort,
            )
            print(f"RESULT {name}: {mrays:.1f} Mrays/s "
                  f"(dt {dt:.2f}s, spp {spp:.1f}, total "
                  f"{time.time()-t0:.0f}s)", flush=True)
        except Exception as exc:
            print(f"RESULT {name}: FAILED {type(exc).__name__}: "
                  f"{exc}", flush=True)

    # Exactness on TPU: steady-state wavefront rays, tilecull vs minarg.
    from opencl_path_tracer_tpu.core.types import Rays
    from opencl_path_tracer_tpu.models import wavefront

    key = jax.random.key(3)
    ws, hs = 1024, 512
    st = wavefront.init_wavefront(
        library.cornell_camera(ws, hs), ws * hs, mode="fast", key=key)
    dense = make_minarg_intersect(scene.tris)
    step = jax.jit(lambda s: wavefront.wavefront_step(
        cam, scene.mats, s, intersect_fn=dense, iterations=5,
        mode="fast", key=key))
    for _ in range(8):
        st = step(st)
    rays = Rays(p=st.ray_p, d=st.ray_d)
    hd = jax.jit(dense)(rays)
    tc = make_tilecull_intersect(scene.tris, gs=128)
    hp = jax.jit(tc)(rays)
    flips = int(jnp.sum(hd.t != hp.t))
    hit = np.asarray(hd.t) >= 0
    mflips = int((np.asarray(hd.mati)[hit]
                  != np.asarray(hp.mati)[hit]).sum())
    print(f"EXACT: {ws*hs} steady rays, t flips {flips}, "
          f"mati flips {mflips}", flush=True)


if __name__ == "__main__":
    main()
