"""TPU bench: cluster intersector vs brute-force kernel, coherent
(primary) vs incoherent (random) rays, Cornell (~800 tris) and stress
(100k tris)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.ops.pallas import make_pallas_intersect
from opencl_path_tracer_tpu.ops.pallas.cluster_kernel import (
    make_cluster_intersect,
)
from opencl_path_tracer_tpu.ops import raygen
from opencl_path_tracer_tpu.scene import library


def overhead():
    f = jax.jit(lambda x: x + 1.0)
    float(f(jnp.float32(0)))
    t0 = time.time()
    for i in range(10):
        float(f(jnp.float32(i)))
    return (time.time() - t0) / 10


def bench(fn, rays, oh, reps=6, n=3):
    def run(p):
        acc = jnp.float32(0)
        for i in range(reps):
            h = fn(Rays(p=p + jnp.float32(i) * 1e-5, d=rays.d))
            acc = acc + jnp.sum(h.t[:8])
        return acc
    g = jax.jit(run)
    float(g(rays.p))
    t0 = time.time()
    for _ in range(n):
        float(g(rays.p))
    return ((time.time() - t0) / n - oh) / reps


def primary_rays(w, h):
    cam = library.cornell_camera(w, h)
    ids = raygen.pixel_ids(w, h)
    half = jnp.full((w * h,), 0.5, jnp.float32)
    return raygen.camera_rays(cam, ids, half, half)


def random_rays(n, seed=7):
    rs = np.random.default_rng(seed)
    p = rs.uniform(0, 1000, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(p=jnp.asarray(p), d=jnp.asarray(d))


def main():
    oh = overhead()
    print(f"overhead {oh*1e3:.1f}ms")
    w, h = 1024, 1024
    n = w * h
    coh = primary_rays(w, h)
    inc = random_rays(n)

    for name, scene in [
        ("cornell", library.cornell_box(with_spheres=True)),
        ("stress100k", library.stress_scene(100_000)),
    ]:
        t = scene.num_triangles
        print(f"--- {name}: {t} tris ---")
        for kname, maker in [
            ("cluster64", lambda s: make_cluster_intersect(
                s.tris, cluster_size=64, tr=512)),
            ("cluster128", lambda s: make_cluster_intersect(
                s.tris, cluster_size=128, tr=512)),
            ("brute", lambda s: make_pallas_intersect(
                s.tris, tr=1024, tt=128)),
        ]:
            if kname == "brute" and t > 20000:
                continue
            try:
                fn = maker(scene)
                for rname, rays in [("coherent", coh),
                                    ("random", inc)]:
                    dt = bench(fn, rays, oh)
                    print(f"{kname:10s} {rname:9s}: {dt*1e3:7.2f}ms "
                          f"{n/dt/1e6:8.1f} Mrays/s")
            except Exception as e:
                print(f"{kname}: FAIL {type(e).__name__} {str(e)[:100]}")


if __name__ == "__main__":
    main()
