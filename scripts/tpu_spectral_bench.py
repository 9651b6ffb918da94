"""TPU timing for the spectral dispersion path (models/spectral.py).

Measures the 3-band dispersive render on cornell-analytic and the
matched single-pass render, reporting warmup (init+compile) and
steady-state separately — the claim under test is "dispersion costs
~B renders through ONE compiled program" (the materials table rides
as a runtime argument, so band 2 and 3 pay zero compile).

Probe run: /tmp cache. One TPU process at a time.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_probe_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp

import bench
from opencl_path_tracer_tpu.models import spectral, wavefront
from opencl_path_tracer_tpu.scene import library

RESULTS = {}


def main():
    w, h = map(int, (sys.argv[1] if len(sys.argv) > 1
                     else "960x540").split("x"))
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    scene = library.cornell_box(with_spheres=True,
                                analytic_spheres=True)
    cam = library.cornell_camera(w, h)
    n = w * h
    isect = bench.make_isect(scene, "auto", False, cam, 5)
    key = jax.random.key(1)

    CHUNK = 16  # steps per device program (tunnel RTT amortization)

    @jax.jit
    def step(band_mats, st):
        def body(_, s):
            return wavefront.wavefront_step(
                cam, band_mats, s, intersect_fn=isect, iterations=5,
                mode="fast", key=key)
        return jax.lax.fori_loop(0, CHUNK, body, st)

    centers = spectral.band_centers(3)
    tables = [spectral.dispersive_materials(scene.mats, c, 30.0)
              for c in centers]

    t0 = time.time()
    st = wavefront.init_wavefront(cam, n, mode="fast", key=key)
    st = step(tables[0], st)
    jax.block_until_ready(st.colors[0])
    RESULTS["warmup_s"] = round(time.time() - t0, 1)
    print(f"## warmup+compile {RESULTS['warmup_s']}s", file=sys.stderr)

    # Per-band steady state: same compiled program, different table.
    for b, tab in enumerate(tables):
        stb = wavefront.init_wavefront(cam, n, mode="fast", key=key)
        t0 = time.time()
        for _ in range(steps // CHUNK):
            stb = step(tab, stb)
        jax.block_until_ready(stb.colors[0])
        dt = time.time() - t0
        RESULTS[f"band{b}_mrays"] = round(n * steps / dt / 1e6, 2)
        print(f"## band {b} ({centers[b]:.0f} nm): "
              f"{RESULTS[f'band{b}_mrays']} Mrays/s ({dt:.2f}s)",
              file=sys.stderr)
    print(json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
