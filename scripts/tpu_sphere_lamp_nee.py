"""TPU job: sphere-emitter NEE (solid-angle cone sampler) on the
cornell-sphere-lamp scene — quality-vs-cost on the real chip plus a
hero render.

The scene is cornell with the lamp quad swapped for an emissive
ANALYTIC sphere (library.cornell_box(sphere_lamp=True)), so direct
light rides ops/nee.py's cone sampler and the pickup's sphere-kind
density. Protocol mirrors scripts/tpu_nee_bench.py: NEE@2048 reference
image, MSE sweep for base vs NEE at equal spp, wall clocks.

Run through the worker:  cp scripts/tpu_sphere_lamp_nee.py /tmp/tpu_jobs/
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.ops import nee, tonemap
    from opencl_path_tracer_tpu.scene import library
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn
    from opencl_path_tracer_tpu.io.image import write_png

    w = h = 256
    iters = 5
    scene = library.cornell_box(with_spheres=True,
                                analytic_spheres=True,
                                sphere_lamp=True)
    cam = library.cornell_camera(w, h)
    isect = make_intersect_fn(scene, "auto")
    tab = nee.build_emitter_table(scene.tris, scene.mats,
                                  scene.spheres)
    print(f"emitters: {tab.tri_count} tris + {tab.sphere_count} "
          f"spheres", flush=True)

    def render(spp, seed, use_nee):
        t0 = time.time()
        st = wavefront.render_wavefront(
            cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
            iterations=iters, min_spp=spp, exact_spp=True, mode="fast",
            seed=seed, nee=tab if use_nee else None)
        img = np.asarray(wavefront.colors_by_pixel(st, w * h))
        return img, time.time() - t0

    ref, t_ref = render(2048, 1, True)
    print(f"reference nee@2048: {t_ref:.1f}s", flush=True)

    rows = []
    for spp in (8, 16, 32, 64, 128):
        bi, tb = render(spp, 7, False)
        ni, tn = render(spp, 9, True)
        dim = ref.max(-1) < 1.0
        mse_b = float(((bi - ref) ** 2).mean())
        mse_n = float(((ni - ref) ** 2).mean())
        dmse_b = float(((bi - ref) ** 2)[dim].mean())
        dmse_n = float(((ni - ref) ** 2)[dim].mean())
        rows.append((spp, mse_b, tb, mse_n, tn, dmse_b, dmse_n))
        print(f"spp {spp:4d}: base mse {mse_b:.5f}/dim {dmse_b:.5f} "
              f"({tb:6.2f}s)  nee mse {mse_n:.5f}/dim {dmse_n:.5f} "
              f"({tn:6.2f}s)", flush=True)
    print("rows:", rows)

    hero = np.asarray(
        tonemap.reinhard(tuple(ref[:, k] for k in range(3)))
    )
    hero = np.stack(hero, -1).reshape(h, w, 3)
    write_png("/root/repo/docs/images/cornell_sphere_lamp_nee.png",
              hero[::-1])
    print("hero written", flush=True)


main()
