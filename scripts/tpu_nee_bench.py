"""TPU job: next-event estimation quality-vs-cost on cornell.

NEE (ops/nee.py) doubles the per-bounce intersection work (one shadow
ray) but removes the direct-light variance that dominates cornell at
low spp. This job quantifies the trade on the real chip:

  1. reference image: NEE at high spp (its dim-pixel variance is
     ~200x below base at equal spp, so it converges far tighter),
  2. MSE-vs-reference sweep over spp for base and NEE (tessellated
     cornell, wavefront fast mode, 256x256, iters=5),
  3. wall-clock per sample for both (the ~2x intersect tax measured
     end-to-end),
  4. the headline ratio: time each estimator needs to reach the same
     linear-light MSE.

Run through the worker:  cp scripts/tpu_nee_bench.py /tmp/tpu_jobs/
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import functools
    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.ops import nee
    from opencl_path_tracer_tpu.scene import library
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn

    w = h = 256
    iters = 5
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    isect = make_intersect_fn(scene, "auto")
    tab = nee.build_emitter_table(scene.tris, scene.mats,
                                  scene.spheres)

    def render(spp, seed, use_nee, mode="fast"):
        t0 = time.time()
        st = wavefront.render_wavefront(
            cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
            iterations=iters, min_spp=spp, exact_spp=True, mode=mode,
            seed=seed, nee=tab if use_nee else None)
        img = np.asarray(wavefront.colors_by_pixel(st, w * h))
        return img, time.time() - t0

    # Reference: NEE at 2048 spp (dim-pixel SEM ~1e-3).
    ref, t_ref = render(2048, 1, True)
    print(f"reference nee@2048: {t_ref:.1f}s", flush=True)

    rows = []
    for spp in (8, 16, 32, 64, 128, 256):
        bi, tb = render(spp, 7, False)
        ni, tn = render(spp, 9, True)
        mse_b = float(((bi - ref) ** 2).mean())
        mse_n = float(((ni - ref) ** 2).mean())
        rows.append((spp, mse_b, tb, mse_n, tn))
        print(f"spp {spp:4d}: base mse {mse_b:.5f} ({tb:6.2f}s)  "
              f"nee mse {mse_n:.5f} ({tn:6.2f}s)", flush=True)

    # Equal-quality: find base spp whose MSE matches nee@16's.
    target = rows[1][3]
    print(f"\nnee@16spp mse = {target:.5f}; base rows above show the "
          f"spp (and time) base needs to match it.")
    print("rows:", rows)


main()
