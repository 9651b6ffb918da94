"""TPU job: the reference default scene in native representation
(reference_scene(analytic=True) — emissive lamp + gold ball as
quadrics, five mesh models) vs the all-mesh build, plus NEE via the
sphere cone sampler on the reference's own content.

Measures: e2e wavefront throughput (1536x864, iters=5) for mesh vs
analytic builds, base vs NEE; writes a hero render.

Run through the worker:  cp scripts/tpu_reference_analytic.py /tmp/tpu_jobs/
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.ops import nee, tonemap
    from opencl_path_tracer_tpu.scene import library
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn
    from opencl_path_tracer_tpu.io.image import write_png

    w, h = 1536, 864
    n = w * h
    iters = 5
    mdir = "/root/repo/tests/assets/models"
    cam = library.reference_camera(w, h)

    def bench(scene, tab, steps=60):
        isect = make_intersect_fn(scene, "auto")
        key = jax.random.key(1)

        @jax.jit
        def run(st, k):
            def body(_, s):
                return wavefront.wavefront_step(
                    cam, scene.mats, s, intersect_fn=isect,
                    iterations=iters, mode="fast", key=key, nee=tab)
            st = jax.lax.fori_loop(0, k, body, st)
            return st, jnp.sum(st.colors[0][:8])

        st = wavefront.init_wavefront(cam, n, mode="fast", key=key)
        st, _ = run(st, 2)
        _ = float(jnp.sum(st.samples[:8]))
        # Chunk dispatches well under the remote runtime's ~19 s
        # device-program watchdog (docs/BENCHMARKS.md landmines).
        t0 = time.time()
        done = 0
        while done < steps:
            k = min(25, steps - done)
            st, chk = run(st, k)
            done += k
        float(chk)
        dt = time.time() - t0
        mrays = n * steps / dt / 1e6
        return mrays, dt, st

    mesh = library.reference_scene(mdir)
    ana = library.reference_scene(mdir, analytic=True)
    print(f"tris: mesh {mesh.num_triangles} -> analytic "
          f"{ana.num_triangles} + {ana.spheres.count} quadrics",
          flush=True)

    m0, _, _ = bench(mesh, None)
    print(f"mesh base:     {m0:7.1f} Mrays/s", flush=True)
    a0, _, _ = bench(ana, None)
    print(f"analytic base: {a0:7.1f} Mrays/s", flush=True)

    tab_m = nee.build_emitter_table(mesh.tris, mesh.mats, mesh.spheres)
    m1, _, _ = bench(mesh, tab_m)
    print(f"mesh nee ({tab_m.tri_count} tri emitters): "
          f"{m1:7.1f} Mrays/s", flush=True)
    tab_a = nee.build_emitter_table(ana.tris, ana.mats, ana.spheres)
    a1, _, st = bench(ana, tab_a, steps=200)
    print(f"analytic nee ({tab_a.sphere_count} sphere emitter): "
          f"{a1:7.1f} Mrays/s", flush=True)

    img = np.asarray(wavefront.colors_by_pixel(st, n))
    hero = np.stack(np.asarray(
        tonemap.reinhard(tuple(img[:, k] for k in range(3)))
    ), -1).reshape(h, w, 3)
    write_png("/root/repo/docs/images/reference_analytic_nee.png",
              hero[::-1])
    print("hero written", flush=True)


main()
