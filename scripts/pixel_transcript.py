"""Pixel transcript: a committed, human-checkable execution trace.

Walks ONE pixel through several progressive samples of the scalar
prog.cl oracle (utils/oracle.py) and emits a markdown table of every
RNG draw (integer Lehmer state in -> uniform -> state out) and every
bounce decision (hit t, material, dispatch branch, factors), each line
cited to the prog.cl statement it executes. Then cross-checks the
renderer: the same pixel's final color and Lehmer state from the
vectorized megakernel (parity mode) are printed next to the oracle's.

Usage:
  python scripts/pixel_transcript.py [--pixel 136] [--size 16x16]
      [--iters 5] [--spp 3] [--out docs/parity/pixel_transcript.md]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pixel", type=int, default=136)
    ap.add_argument("--size", default="16x16")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--spp", type=int, default=3)
    ap.add_argument("--out", default="docs/parity/pixel_transcript.md")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split("x"))
    pid = args.pixel

    import functools
    from opencl_path_tracer_tpu.models import megakernel
    from opencl_path_tracer_tpu.ops import intersect
    from opencl_path_tracer_tpu.ops.rng import minstd_rand0_raw
    from opencl_path_tracer_tpu.scene import library
    from opencl_path_tracer_tpu.utils import oracle

    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    tris_np = oracle.scene_to_numpy(scene)
    mats_np = oracle.mats_to_numpy(scene.mats)
    seeds = minstd_rand0_raw(w * h, 1).astype(np.int64)
    seed0 = int(seeds[pid])

    lines = [
        "# Pixel transcript (parity evidence)",
        "",
        f"Scene `cornell` {w}x{h}, pixel id **{pid}** "
        f"(x={pid % w}, y={pid // w}), iterations={args.iters}, "
        f"spp={args.spp}, seed 1.",
        "",
        f"Per-pixel Lehmer stream seeded by the {pid}-th output of "
        "`std::minstd_rand0(1)` (main.cpp:45, 522-527): "
        f"initial state **{seed0}**.",
        "",
        "Every RNG draw below is `state' = state * 48271 mod "
        "2147483647`, uniform = `float(state') / 2147483647.0f` "
        "(prog.cl:72-77). Integer states are exact; re-derive any line "
        "by hand to audit.",
        "",
    ]

    colors = np.zeros(3, np.float32)
    for s in range(args.spp):
        trace = oracle.OracleTrace(events=[])
        c = oracle.trace_pixel(pid, seeds, cam, tris_np, mats_np,
                               args.iters, trace=trace)
        s_f = np.float32(s)
        colors = (colors * s_f + c) * (np.float32(1) / (s_f + 1))
        lines.append(f"## Sample {s} (current_sample={s})")
        lines.append("")
        for ev in trace.events:
            kind = ev.pop("ev")
            cite = ev.pop("cite")
            body = ", ".join(
                f"{k}={_fmt(v)}" for k, v in ev.items()
            )
            lines.append(f"- **{kind}** [{cite}]: {body}")
        lines.append(
            f"- sample color = {c.tolist()}; progressive colors[] = "
            f"{colors.tolist()} (prog.cl:379)"
        )
        lines.append("")

    # Cross-check against the vectorized renderer.
    isect = functools.partial(intersect.first_intersect, tris=scene.tris)
    st = megakernel.render(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=args.iters, spp=args.spp, mode="parity", seed=1,
    )
    ours = np.asarray(megakernel.colors_array(st))[pid]
    ours_rng = int(np.asarray(st.rng_state)[pid])
    lines += [
        "## Cross-check: vectorized renderer (megakernel, parity mode)",
        "",
        "| quantity | scalar oracle | vectorized renderer | match |",
        "|---|---|---|---|",
        f"| final Lehmer state | {int(seeds[pid])} | {ours_rng} | "
        f"{'EXACT' if int(seeds[pid]) == ours_rng else 'MISMATCH'} |",
    ]
    for k in range(3):
        a, b = float(colors[k]), float(ours[k])
        ok = abs(a - b) <= 2e-5 * max(abs(a), 1e-3)
        lines.append(
            f"| colors[{pid}].{'xyz'[k]} | {a!r} | {b!r} | "
            f"{'f32-rounding' if ok else 'MISMATCH'} |"
        )
    lines += [
        "",
        "The integer state match proves the renderer made the same "
        "number of draws in the same order through every data-dependent "
        "branch; color differences are float32 op-order rounding "
        "(documented in utils/oracle.py's interpretation contract).",
    ]

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")
    mismatch = int(seeds[pid]) != ours_rng
    sys.exit(1 if mismatch else 0)


def _fmt(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, list):
        return "(" + ", ".join(f"{x:.9g}" for x in v) + ")"
    return str(v)


if __name__ == "__main__":
    main()
