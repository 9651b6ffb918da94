"""UV interpolation: a procedural checker AOV from OBJ texcoords.

The reference parses `vt` via tinyobj and never reads it
(main.cpp:595-611). Here OBJ texture coordinates flow end-to-end:
loader (io/obj.py) -> builder (per-corner uv) -> Scene.attribs ->
ops.shading.interpolate_uvs at hit points. This example renders a
checker pattern driven by the interpolated (s, t) — the gather-free
"texture" that proves the plumbing without an image-sampling stack.

Custom-integrator style (like examples/05): primary rays only, no
light transport — the output is an AOV, not a beauty render.
"""

import argparse

import jax.numpy as jnp
import numpy as np

from opencl_path_tracer_tpu.core.camera import make_camera
from opencl_path_tracer_tpu.core.types import Rays, v3_from_array
from opencl_path_tracer_tpu.io.image import write_png
from opencl_path_tracer_tpu.ops import intersect, raygen, shading
from opencl_path_tracer_tpu.scene.builder import SceneBuilder


def _write_quad_obj(path: str) -> None:
    with open(path, "w") as fh:
        fh.write(
            "v -1 -1 0\nv 1 -1 0\nv -1 1 0\nv 1 1 0\n"
            "vt 0 0\nvt 1 0\nvt 0 1\nvt 1 1\n"
            "f 1/1 2/2 3/3\nf 2/2 4/4 3/3\n"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="128x128")
    ap.add_argument("--tiles", type=int, default=8)
    ap.add_argument("--out", default="uv_checker.png")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    import tempfile
    import os
    tmp = tempfile.mkdtemp()
    obj = os.path.join(tmp, "quad.obj")
    _write_quad_obj(obj)

    b = SceneBuilder()
    b.add_material((1, 1, 1), (0, 0, 0), (0, 0, 0),
                   (1, 1, 1), (0, 0, 0), 1.0, 0)
    # Scaled up and pushed in front of the reference camera.
    b.add_obj(obj, pos=(500.0, 500.0, 200.0),
              scale=(400.0, 400.0, 1.0))
    scene = b.build()
    assert scene.attribs is not None

    cam = make_camera(w, h, fov=60.0, yaw=0.0, pitch=0.0,
                      shift=(0.0, 0.0, 0.0))
    ids_px = raygen.pixel_ids(w, h)
    half = jnp.full(ids_px.shape, 0.5, jnp.float32)
    rays = raygen.camera_rays(cam, ids_px, half, half)

    hits, ids = intersect.first_intersect_ids(rays, scene.tris)
    s, t = shading.interpolate_uvs(hits, ids, scene.attribs)
    k = jnp.float32(args.tiles)
    checker = (jnp.floor(s * k) + jnp.floor(t * k)) % 2.0
    rgb = jnp.stack(
        [jnp.where(hits.valid, 0.15 + 0.8 * checker, 0.0),
         jnp.where(hits.valid, 0.15 + 0.8 * (1.0 - checker), 0.02),
         jnp.where(hits.valid, 0.35, 0.05)], axis=-1,
    ).reshape(h, w, 3)
    write_png(args.out, np.asarray(rgb)[::-1])
    frac = float(jnp.mean(checker[hits.valid]))
    print(f"wrote {args.out}; hit {float(hits.valid.mean()):.2f} "
          f"of pixels, checker balance {frac:.2f}")


if __name__ == "__main__":
    main()
