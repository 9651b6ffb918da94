"""Parity report: render with the bit-faithful reference math and emit a
comparison artifact.

Protocol for RMSE-vs-OpenCL-reference comparison (BASELINE.md):
  1. Both renderers use the same scene, camera, resolution, bounce depth
     and spp.
  2. Both seed per-pixel Lehmer streams from std::minstd_rand0(1)
     (main.cpp:45, 522-527) — this renderer's parity mode replays the
     exact draw sequence (gen_ray's 2 draws + 2/1/2/0 per
     diffuse/refractive/emitter/specular bounce).
  3. Compare the LINEAR accumulation buffers (colors[], before
     tonemapping) at equal current_sample: images should agree to f32
     rounding; RMSE on the tonemapped output is then reported for
     human-scale comparison.

The reference app cannot export its buffer (download_image is commented
out, main.cpp:727-741); to compare, patch that in upstream or read the
GL texture. This script produces our side of the comparison:
  out/parity_<scene>_<WxH>_i<iters>_s<spp>.npz  (linear colors + rng
  fingerprint) and .png (tonemapped).

Usage: python scripts/parity_report.py [--scene cornell] [--size 256x256]
       [--iters 4] [--spp 64]
"""

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--size", default="256x256")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--outdir", default="out")
    ap.add_argument("--models-dir", default=None,
                    help="OBJ models for the reference scene (e.g. "
                         "tests/assets/models)")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    import functools
    import jax.numpy as jnp
    from opencl_path_tracer_tpu.models import megakernel
    from opencl_path_tracer_tpu.ops import intersect, tonemap
    from opencl_path_tracer_tpu.io.image import write_png
    from opencl_path_tracer_tpu.scene import library

    if args.scene == "cornell":
        scene = library.cornell_box(with_spheres=True)
        cam = library.cornell_camera(w, h)
    elif args.scene == "reference":
        scene = library.reference_scene(args.models_dir)
        cam = library.reference_camera(w, h)
    else:
        raise SystemExit(f"unknown scene {args.scene}")

    isect = functools.partial(intersect.first_intersect, tris=scene.tris)
    state = megakernel.render(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=args.iters, spp=args.spp, mode="parity", seed=1,
    )
    colors = np.asarray(megakernel.colors_array(state))
    rng_fp = hashlib.sha256(
        np.asarray(state.rng_state).tobytes()
    ).hexdigest()[:16]

    os.makedirs(args.outdir, exist_ok=True)
    base = os.path.join(
        args.outdir,
        f"parity_{args.scene}_{w}x{h}_i{args.iters}_s{args.spp}",
    )
    np.savez_compressed(
        base + ".npz", colors=colors,
        rng_state=np.asarray(state.rng_state),
        meta=json.dumps(dict(
            scene=args.scene, width=w, height=h, iterations=args.iters,
            spp=args.spp, seed=1, rng_fingerprint=rng_fp,
        )),
    )
    img = np.asarray(
        tonemap.reinhard(jnp.asarray(colors))
    ).reshape(h, w, 3)[::-1]
    write_png(base + ".png", img)
    print(json.dumps(dict(
        artifact=base + ".npz",
        mean=float(colors.mean()), std=float(colors.std()),
        max=float(colors.max()), rng_fingerprint=rng_fp,
    )))


if __name__ == "__main__":
    main()
