"""Benchmark: Mrays/sec on the default JAX device.

Workload (BASELINE.md): progressive path tracing at 1080p, bounce depth
5, on the Cornell+spheres scene (804 tris) or the 100k-tri stress scene.
Flagship path: wavefront model (path regeneration — every lane is a
live ray every step, so rays/sec is exact, not estimated) over the
two-level VMEM cluster intersector. Reports ONE JSON line.

vs_baseline: the driver-set north star is >= 1 Grays/sec aggregate on a
v5e-8, i.e. 125 Mrays/sec/chip; vs_baseline = value / 125.

Usage: python bench.py [--size WxH] [--steps N] [--iters N]
       [--scene cornell|stress] [--model wavefront|megakernel]
       [--accel cluster|bvh|bruteforce]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

PER_CHIP_TARGET_MRAYS = 125.0  # 1 Grays/s / 8 chips (BASELINE.md)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--steps", type=int, default=64,
                    help="wavefront steps (or samples for megakernel)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--scene", default="cornell",
                    choices=["cornell", "stress"])
    ap.add_argument("--model", default="wavefront",
                    choices=["wavefront", "megakernel"])
    ap.add_argument("--accel", default="auto",
                    choices=["auto", "cluster", "bvh", "bruteforce",
                             "pallas"])
    ap.add_argument("--chunk", type=int, default=8,
                    help="wavefront steps per device program")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    n = w * h

    from opencl_path_tracer_tpu.models import megakernel, wavefront
    from opencl_path_tracer_tpu.scene import library

    dev = jax.devices()[0]
    on_cpu = dev.platform == "cpu"
    print(f"# device: {dev.device_kind} ({dev.platform})",
          file=sys.stderr)

    scene = (library.cornell_box(with_spheres=True)
             if args.scene == "cornell"
             else library.stress_scene(100_000))
    print(f"# scene: {scene.num_triangles} tris", file=sys.stderr)
    cam = library.cornell_camera(w, h)

    if args.accel == "auto":
        # Brute beats the two-level scheme below ~4k triangles (the
        # whole scene is a handful of VMEM tiles; per-tile cull overhead
        # dominates any savings).
        args.accel = "pallas" if scene.num_triangles <= 4096 else "cluster"
        print(f"# accel auto -> {args.accel}", file=sys.stderr)
    if args.accel == "cluster":
        from opencl_path_tracer_tpu.ops.pallas.cluster_kernel import (
            make_cluster_intersect,
        )
        isect = make_cluster_intersect(
            scene.tris, cluster_size=128, tr=256,
            early_exit=True,  # bounce batches are incoherent
            interpret=on_cpu,
        )
    elif args.accel == "pallas":
        from opencl_path_tracer_tpu.ops.pallas import make_pallas_intersect
        isect = make_pallas_intersect(
            scene.tris, tr=1024, tt=128, interpret=on_cpu
        )
    elif args.accel == "bvh":
        from opencl_path_tracer_tpu.accel import (
            build_lbvh, make_bvh_intersect,
        )
        isect = make_bvh_intersect(build_lbvh(scene.tris, leaf_size=4))
    else:
        from opencl_path_tracer_tpu.ops import intersect
        isect = functools.partial(
            intersect.first_intersect, tris=scene.tris
        )

    key = jax.random.key(1)

    if args.model == "wavefront":
        import numpy as np
        from opencl_path_tracer_tpu.ops import raygen
        # Large scenes on the cluster path: re-sort lanes periodically
        # so bounce rays stay tile-coherent.
        sort_every = 0
        scene_bounds = None
        if args.accel == "cluster":
            v = np.concatenate([
                np.asarray(scene.tris.r1), np.asarray(scene.tris.r2),
                np.asarray(scene.tris.r3),
            ])
            lo = v.min(0)
            inv = 1.0 / np.maximum(v.max(0) - lo, 1e-9)
            scene_bounds = (tuple(map(float, lo)),
                            tuple(map(float, inv)))
            sort_every = 2
        # Square-tile pixel order: tighter ray bundles for the cluster
        # intersector's per-tile culling.
        if w % 16 == 0 and h % 16 == 0:
            ids = raygen.tile_major_ids(w, h, 16, 16)
        elif w % 16 == 0 and h % 8 == 0:
            ids = raygen.tile_major_ids(w, h, 16, 8)
        else:
            ids = raygen.pixel_ids_like(n)
        state = wavefront.init_wavefront(cam, n, mode="fast", key=key,
                                         ids=ids)

        @jax.jit
        def run(state, k):
            def body(_, st):
                return wavefront.wavefront_step(
                    cam, scene.mats, st, intersect_fn=isect,
                    iterations=args.iters, mode="fast", key=key,
                    ids=ids, sort_every=sort_every,
                    scene_bounds=scene_bounds,
                )
            st = jax.lax.fori_loop(0, k, body, state)
            return st, jnp.sum(st.colors[0][:8])

        t0 = time.time()
        # The remote TPU compile service occasionally returns transient
        # HTTP 500s — retry the first compile a couple of times.
        for attempt in range(3):
            try:
                state, _ = run(state, 2)
                float(jnp.sum(state.samples[:8]))
                break
            except Exception:
                if attempt == 2:
                    raise
                print(f"# warmup attempt {attempt + 1} failed, retrying",
                      file=sys.stderr)
                time.sleep(10)
        print(f"# warmup+compile {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        # Chunk device programs so no single execution risks the device
        # watchdog on slow (incoherent) workloads.
        done = 0
        while done < args.steps:
            k = min(args.chunk, args.steps - done)
            state, chk = run(state, k)
            done += k
        float(chk)  # dependent fetch = real sync
        dt = time.time() - t0
        # Every lane traces exactly one live ray per step.
        total_rays = float(n) * args.steps
        spp_done = float(jnp.mean(state.samples))
    else:
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

        t0 = time.time()
        state, stats = step_stats(state)
        rays_per_sample = float(stats["rays_traced"])
        state = step(state)
        float(jnp.sum(state.colors[0][:4]))
        print(f"# warmup+compile {time.time()-t0:.1f}s; "
              f"avg path len {rays_per_sample/n:.2f}", file=sys.stderr)
        t0 = time.time()
        for _ in range(args.steps):
            state = step(state)
        float(jnp.sum(state.colors[0][:4]))
        dt = time.time() - t0
        total_rays = rays_per_sample * args.steps
        spp_done = float(state.sample)

    mrays = total_rays / dt / 1e6
    print(
        f"# {dt:.3f}s for {args.steps} steps @ {w}x{h} "
        f"iters={args.iters} (mean spp {spp_done:.1f}) "
        f"-> {mrays:.1f} Mrays/s",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": (
            f"Mrays/sec/chip ({args.model}+{args.accel}, {args.scene} "
            f"{w}x{h}, iters={args.iters})"
        ),
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / PER_CHIP_TARGET_MRAYS, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
