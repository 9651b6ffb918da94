"""Multi-chip rendering: the wavefront model tiled over a device mesh.

Each chip owns a slice of the lane axis; because every wavefront lane
carries its own pixel binding, RNG stream, and accumulators, the step
needs ZERO per-step communication — the only collective is a psum'd
mean-luminance scalar for the render meter. Per-lane results are
bit-identical to single-device execution (test_parallel.py).

Try it without TPU hardware on a virtual mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/04_multi_device.py
"""

import argparse
import functools
import time

import jax
import numpy as np

from opencl_path_tracer_tpu.io.image import write_png
from opencl_path_tracer_tpu.models import wavefront
from opencl_path_tracer_tpu.ops import intersect, tonemap
from opencl_path_tracer_tpu.parallel import make_tiled_wavefront_step
from opencl_path_tracer_tpu.parallel.mesh import make_render_mesh
from opencl_path_tracer_tpu.parallel.shard import shard_wavefront_state
from opencl_path_tracer_tpu.scene import library


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="128x128")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--out", default="out/example04.png")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    n = w * h
    if n % jax.device_count() != 0:
        raise SystemExit(
            f"{w}x{h} = {n} lanes must divide evenly over "
            f"{jax.device_count()} devices"
        )

    mesh = make_render_mesh()
    print(f"mesh: {mesh.devices.size} x {mesh.devices.flat[0].platform}")

    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    isect = functools.partial(intersect.first_intersect,
                              tris=scene.tris)

    key = jax.random.key(3)
    state = shard_wavefront_state(
        wavefront.init_wavefront(cam, n, mode="fast", key=key), mesh
    )
    step = make_tiled_wavefront_step(
        cam, scene.mats, mesh, intersect_fn=isect, iterations=5,
        mode="fast", key=key,
    )

    t0 = time.time()
    for i in range(args.steps):
        state, lum = step(state)
    jax.block_until_ready(lum)
    dt = time.time() - t0
    spp = float(np.mean(np.asarray(state.samples)))
    print(f"{args.steps} steps in {dt:.2f}s, mean {spp:.1f} spp, "
          f"meter luminance {float(lum):.4f}")

    img = np.asarray(
        tonemap.reinhard(wavefront.colors_by_pixel(state, n))
    ).reshape(h, w, 3)
    write_png(args.out, img[::-1])  # row 0 is bottom (GL convention)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
