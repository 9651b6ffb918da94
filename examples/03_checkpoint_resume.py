"""Crash-safe progressive rendering: checkpoint, resume, verify.

The checkpoint carries the FULL progressive state — accumulated
colors, per-pixel RNG streams, sample counter — so a resumed render
continues the exact sample sequence: (N spp straight) and
(N/2 spp, save, load, N/2 more) produce BIT-identical images in
parity mode. The reference has no recovery mechanism at all (a
crash loses the accumulation); this is the subsystem SURVEY.md §5
adds on top of parity.
"""

import argparse

import numpy as np

from opencl_path_tracer_tpu.config import CameraConfig, RenderConfig
from opencl_path_tracer_tpu.runtime.engine import RenderEngine
from opencl_path_tracer_tpu.scene import library


def make_engine(w: int, h: int, spp: int) -> RenderEngine:
    scene = library.cornell_box(with_spheres=False)
    cfg = RenderConfig(
        width=w, height=h, iterations=3, spp=spp, mode="parity",
        camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0),
    )
    return RenderEngine(scene, cfg)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="64x64")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--ckpt", default="out/example03.ckpt.npz")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    half = max(1, args.spp // 2)

    # Straight render.
    eng = make_engine(w, h, args.spp)
    eng.render(2 * half, progress=False)
    straight = np.asarray(eng.image())

    # Render half, checkpoint, resume in a FRESH engine, finish.
    eng1 = make_engine(w, h, args.spp)
    eng1.render(half, progress=False)
    eng1.save(args.ckpt)
    eng2 = make_engine(w, h, args.spp)
    eng2.load(args.ckpt)
    eng2.render(half, progress=False)
    resumed = np.asarray(eng2.image())

    if np.array_equal(straight, resumed):
        print(f"resume is bit-exact at {2 * half} spp "
              f"({w}x{h}, parity mode)")
    else:
        diff = int((straight != resumed).sum())
        raise SystemExit(f"MISMATCH: {diff} differing pixels")


if __name__ == "__main__":
    main()
