"""Benchmark: Mrays/sec on the default JAX device.

Workload (BASELINE.md): progressive path tracing at 1080p on the
Cornell+spheres scene, bounce depth 5, LBVH acceleration, fast
(threefry) RNG. Reports useful-ray throughput (live lanes per bounce,
the derived rays/sec metric of BASELINE.md) as ONE JSON line.

vs_baseline: the driver-set north star is >= 1 Grays/sec aggregate on a
v5e-8, i.e. 125 Mrays/sec/chip; vs_baseline = value / 125.

Usage: python bench.py [--size WxH] [--spp N] [--iters N] [--scene S]
(run with the ambient env so the real TPU is used; CPU fallback works).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import numpy as np

PER_CHIP_TARGET_MRAYS = 125.0  # 1 Grays/s / 8 chips (BASELINE.md)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--scene", default="cornell",
                    choices=["cornell", "stress"])
    ap.add_argument("--accel", default="bvh",
                    choices=["bvh", "bruteforce"])
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    import functools
    from opencl_path_tracer_tpu.accel import build_lbvh, make_bvh_intersect
    from opencl_path_tracer_tpu.models import megakernel
    from opencl_path_tracer_tpu.ops import intersect
    from opencl_path_tracer_tpu.scene import library

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    if args.scene == "cornell":
        scene = library.cornell_box(with_spheres=True)
    else:
        scene = library.stress_scene(100_000)
    cam = library.cornell_camera(w, h)
    print(f"# scene: {scene.num_triangles} tris", file=sys.stderr)

    if args.accel == "bvh":
        bvh = build_lbvh(scene.tris, leaf_size=4)
        isect = make_bvh_intersect(bvh)
    else:
        isect = functools.partial(
            intersect.first_intersect, tris=scene.tris
        )

    key = jax.random.key(1)
    n = w * h
    state = megakernel.init_state(n, seed=1)

    @jax.jit
    def step(st):
        return megakernel.trace_sample(
            cam, scene.mats, st, intersect_fn=isect,
            iterations=args.iters, mode="fast", key=key,
        )

    @jax.jit
    def step_stats(st):
        return megakernel.trace_sample(
            cam, scene.mats, st, intersect_fn=isect,
            iterations=args.iters, mode="fast", key=key,
            with_stats=True,
        )

    # Warmup + calibration: rays actually traced per sample.
    t0 = time.time()
    state, stats = step_stats(state)
    jax.block_until_ready(state.colors)
    rays_per_sample = float(stats["rays_traced"])
    print(
        f"# warmup+compile {time.time()-t0:.1f}s; "
        f"rays/sample {rays_per_sample/1e6:.2f}M "
        f"(avg path len {rays_per_sample/n:.2f})",
        file=sys.stderr,
    )

    # Timed run.
    state = step(state)  # compile the plain step too
    jax.block_until_ready(state.colors)
    t0 = time.time()
    for _ in range(args.spp):
        state = step(state)
    jax.block_until_ready(state.colors)
    dt = time.time() - t0

    total_rays = rays_per_sample * args.spp
    mrays = total_rays / dt / 1e6
    samples_per_sec = args.spp / dt
    print(
        f"# {dt:.3f}s for {args.spp} samples @ {w}x{h} iters={args.iters}"
        f" -> {samples_per_sec:.2f} samples/s, {mrays:.1f} Mrays/s",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"Mrays/sec/chip ({args.scene} {w}x{h}, "
                  f"iters={args.iters}, {args.accel})",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / PER_CHIP_TARGET_MRAYS, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
