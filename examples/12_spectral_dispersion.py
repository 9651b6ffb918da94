"""Spectral dispersion: rainbows through glass.

The reference's dielectric bends all light identically — main.cpp:103
collapses the per-channel IOR to one scalar before prog.cl's Snell
path ever runs, so its glass sphere can never split white light.
`models/spectral.py` renders B wavelength bands, each an ordinary
wavefront pass whose REFRACTIVE rows carry n(lambda) from the
Abbe/Cauchy model, and combines them to RGB with per-channel
partition-of-unity weights (a scene without glass reproduces the
non-spectral image exactly — test_spectral pins that identity).

This example renders the analytic-glass cornell twice — achromatic
(the reference's physics) and as a strong flint (V_d=20) — and writes
the pair side by side: look at the glass sphere's rim and caustic for
the color fringing.

Run:  python examples/12_spectral_dispersion.py [--spp 24] [--abbe 20]
      (equivalent CLI: ptx render --model wavefront --dispersion 20)
"""

import argparse

import numpy as np

from opencl_path_tracer_tpu.io.image import write_png
from opencl_path_tracer_tpu.models import spectral
from opencl_path_tracer_tpu.ops import tonemap as tonemap_ops
from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn
from opencl_path_tracer_tpu.scene import library


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="160x120")
    ap.add_argument("--spp", type=int, default=24)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--abbe", type=float, default=20.0,
                    help="Abbe number (lower = stronger dispersion)")
    ap.add_argument("--bands", type=int, default=3)
    ap.add_argument("--out", default="out/spectral_dispersion.png")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))

    scene = library.cornell_box(with_spheres=True,
                                analytic_spheres=True)
    cam = library.cornell_camera(w, h)
    isect = make_intersect_fn(scene, "auto", cam=cam,
                              iterations=args.iters)

    def render(v_d):
        return spectral.render_dispersive(
            cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
            iterations=args.iters, min_spp=args.spp,
            bands=args.bands, v_d=v_d,
        ).reshape(h, w, 3)[::-1]

    flat = render(None)          # the reference's achromatic glass
    disp = render(args.abbe)     # flint-glass rainbow

    import jax.numpy as jnp
    pair = np.concatenate([flat, disp], axis=1)
    import os
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    write_png(args.out, np.asarray(
        tonemap_ops.apply(jnp.asarray(pair), "reinhard")))
    delta = np.abs(disp - flat).max()
    print(f"wrote {args.out} (achromatic | V_d={args.abbe:g}); "
          f"max channel split {delta:.4f}")


if __name__ == "__main__":
    main()
