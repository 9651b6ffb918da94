"""Many-light rendering: distance-aware emitter selection.

The reference finds light only by chance (prog.cl:358-381); NEE fixes
that with one shadow ray per diffuse vertex — but WHICH lamp should
that ray aim at? With many lamps, the default power-proportional pick
(`nee_select='power'`) sends most shadow rays to far-away lights.
`nee_select='distance'` weighs each lamp by P_j / max(d^2, r_j^2)
PER SHADING POINT instead, with the pickup MIS side recomputing the
same weights so the estimator still converges to the same image
(ops/nee.py; measured 1.5-2.5x gather-term variance reduction —
docs/BENCHMARKS.md round-5 session 5).

This example renders library.many_light_scene (cornell walls + N
small emissive spheres) both ways at the SAME spp and writes the pair
side by side — the distance half resolves the lamp pools with
visibly less noise.

Run:  python examples/11_many_lights.py [--lights 48] [--spp 24]
"""

import argparse

import numpy as np

from opencl_path_tracer_tpu.config import CameraConfig, RenderConfig
from opencl_path_tracer_tpu.io.image import write_png
from opencl_path_tracer_tpu.runtime.engine import RenderEngine
from opencl_path_tracer_tpu.scene import library


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="160x120")
    ap.add_argument("--lights", type=int, default=48)
    ap.add_argument("--spp", type=int, default=24)
    ap.add_argument("--out", default="out/many_lights_demo.png")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    scene = library.many_light_scene(args.lights)
    halves = []
    for select in ("power", "distance"):
        cfg = RenderConfig(
            width=w, height=h, iterations=5, mode="fast",
            model="wavefront", nee=True, nee_select=select,
            spp=args.spp,
            camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                                shift=(0.0, 0.0, 0.0)),
        )
        eng = RenderEngine(scene, cfg)
        eng.render(args.spp, progress=False)
        halves.append(eng.image())
        print(f"{select}: {args.spp} spp done")

    write_png(args.out, np.concatenate(halves, axis=1))
    print(f"wrote {args.out} (left: power, right: distance — same "
          f"spp, same converged image)")


if __name__ == "__main__":
    main()
