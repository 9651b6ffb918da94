"""Virtual-mesh scaling measurement for the aggregate-throughput
estimate (VERDICT r2 #4).

One real v5e chip is available, so aggregate (v5e-8) throughput cannot
be measured directly. This script measures the part that CAN be
measured without 8 chips: the OVERHEAD the sharded program adds on the
virtual CPU mesh (--xla_force_host_platform_device_count). Total
workload is FIXED while device count grows 1 -> 8 (strong scaling).
XLA:CPU uses the host's cores for every configuration, so compute time
is ~constant across rows and the step-time delta vs the 1-device row
bounds what sharding adds: program partitioning, per-device launch,
and the one psum scalar per step
(parallel/shard.py:make_tiled_wavefront_step) — the step itself is
communication-free by design.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/mesh_scaling.py

Caveat printed with the result: CPU devices share host cores, so
absolute times are meaningless; only the OVERHEAD DELTA (step time at
n devices vs 1 with the same per-device load and n-fold cores) is
informative, and ICI latency on real hardware is strictly better than
host-shared-memory emulation for a single scalar psum.
"""

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.ops import intersect
    from opencl_path_tracer_tpu.parallel import make_tiled_wavefront_step
    from opencl_path_tracer_tpu.parallel.mesh import RENDER_AXIS
    from opencl_path_tracer_tpu.parallel.shard import (
        shard_wavefront_state,
    )
    from opencl_path_tracer_tpu.scene import library

    import sys

    devs = jax.devices()
    assert len(devs) >= 8, "run with xla_force_host_platform_device_count=8"
    analytic = "--analytic" in sys.argv
    if analytic:
        # The session-8 HEADLINE composition: 12 tris + 2 quadrics,
        # minarg + sphere kernel (interpret on CPU) + merge.
        from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
            make_minarg_intersect,
        )
        from opencl_path_tracer_tpu.ops.pallas.sphere_kernel import (
            make_sphere_intersect,
        )
        scene = library.cornell_box(with_spheres=True,
                                    analytic_spheres=True)
        tri_fn = make_minarg_intersect(scene.tris, tr=128,
                                       interpret=True)
        sph_fn = make_sphere_intersect(scene.spheres, tr=128,
                                       interpret=True)

        def isect(rays):
            return intersect.merge_hits(tri_fn(rays), sph_fn(rays))
    else:
        scene = library.cornell_box(with_spheres=True)
        isect = functools.partial(intersect.first_intersect,
                                  tris=scene.tris)
    key = jax.random.key(1)

    rows = []
    w, h = 128, 128               # fixed TOTAL workload
    for n in (1, 2, 4, 8):
        cam = library.cornell_camera(w, h)
        mesh = Mesh(np.asarray(devs[:n]), axis_names=(RENDER_AXIS,))
        st = shard_wavefront_state(
            wavefront.init_wavefront(cam, w * h, mode="fast", key=key),
            mesh,
        )
        step = make_tiled_wavefront_step(
            cam, scene.mats, mesh, intersect_fn=isect, iterations=5,
            mode="fast", key=key,
        )
        st, lum = step(st)
        jax.block_until_ready(st.colors[0])  # compile + warm
        t0 = time.time()
        reps = 12
        for _ in range(reps):
            st, lum = step(st)
        jax.block_until_ready(st.colors[0])
        dt = (time.time() - t0) / reps
        rows.append((n, dt * 1e3))
        print(f"devices={n}: {dt*1e3:7.2f} ms/step "
              f"({w*h} px total, psum meter on)")

    base = rows[0][1]
    over = rows[-1][1] - base
    print(f"sharding overhead at 8 devices vs 1 (same total work): "
          f"{over:+.2f} ms/step ({100*over/base:+.1f}%)")
    print("note: XLA:CPU shares host cores across virtual devices, so "
          "compute time is ~constant across rows; the delta bounds "
          "partitioning + launch + one-scalar-psum overhead.")


if __name__ == "__main__":
    main()
