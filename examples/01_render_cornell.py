"""Render the Cornell box to a PNG with the high-level engine.

This is the library form of `ptx render --scene cornell`: build a
scene, configure the render, run N samples/pixel, write the image.
The engine picks the intersection backend for the device and scene
size (`accel='auto'`) and paces host sync the way the reference's
frame loop does (block every 3rd step, main.cpp:670-681).
"""

import argparse

from opencl_path_tracer_tpu.config import CameraConfig, RenderConfig
from opencl_path_tracer_tpu.runtime.engine import RenderEngine
from opencl_path_tracer_tpu.scene import library


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="256x256")
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--out", default="out/example01.png")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    scene = library.cornell_box(with_spheres=True)
    cfg = RenderConfig(
        width=w, height=h, iterations=5, spp=args.spp, mode="fast",
        camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0),
    )
    eng = RenderEngine(scene, cfg)
    eng.render(args.spp)
    eng.save_png(args.out)
    print(f"wrote {args.out} ({w}x{h}, {args.spp} spp)")


if __name__ == "__main__":
    main()
