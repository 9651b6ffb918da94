"""Compose the ops layer directly: rays -> hits -> inspect, no model.

Everything the render models do is built from these pieces; use them
directly for custom integrators, debugging, or research. The flow
below is the front half of one bounce as explicit calls: seed the
reference's per-pixel Lehmer streams (main.cpp:522-527), generate
jittered camera rays (camera_get_ray, prog.cl:82-92), intersect
against the scene (first_intersect — the oracle XLA form; swap in
make_pallas_intersect or make_pair_intersect for the fused TPU
kernels), and fetch materials at the hits.
"""

import argparse

import jax.numpy as jnp
import numpy as np

from opencl_path_tracer_tpu.ops import intersect, raygen, rng
from opencl_path_tracer_tpu.scene import library


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="64x64")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    n = w * h

    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)

    # Per-pixel RNG streams, seeded exactly like the reference host
    # (one minstd_rand0 draw per pixel). Fast mode instead uses a
    # stateless counter hash — see ops/rng.py.
    streams = rng.seed_pixel_streams(n)

    # Jittered primary rays for pixel ids 0..n-1: two Lehmer draws
    # per pixel, advancing each stream like the reference's rand().
    ids = raygen.pixel_ids(w, h)
    streams, u1 = rng.lehmer_step(streams)
    streams, u2 = rng.lehmer_step(streams)
    rays = raygen.camera_rays(cam, ids, u1, u2)

    # Nearest hit for every ray (t < 0 encodes a miss).
    hits = intersect.first_intersect(rays, scene.tris)
    hit_mask = np.asarray(hits.t) >= 0.0

    # Gather-free material fetch on the hit lanes (static select
    # chain — cheaper than a gather for small material tables).
    m = scene.mats.take_select(jnp.maximum(hits.mati, 0))
    emissive = np.asarray(sum(m.emission)) > 0.0

    print(f"{n} rays: {int(hit_mask.sum())} hits, "
          f"{int((~hit_mask).sum())} misses")
    print(f"lamp lanes: {int((emissive & hit_mask).sum())}")
    t = np.asarray(hits.t)
    print(f"mean hit distance: {t[hit_mask].mean():.1f}")
    assert np.isfinite(t[hit_mask]).all()
    print("all hit distances finite — ok")


if __name__ == "__main__":
    main()
