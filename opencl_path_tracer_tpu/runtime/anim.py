"""Turntable / camera-path animation rendering.

The reference is interactive-only: a fly camera (onKeyboard/onMouse,
main.cpp:1041-1168) over a progressive accumulator that any input
resets (current_sample=0, main.cpp:1100-1148), with no export path at
all — even the single-frame `download_image` helper is commented out
(main.cpp:727-741). This module drives the same camera model
offline: a pose sequence, each pose rendered to convergence
(accumulation reset between poses, exactly the reference's input
semantics), frames written as PNGs and optionally an animated GIF.

The camera stays a RUNTIME argument of the jitted step (the engine's
step(state, cam)), so a 90-frame orbit compiles ONCE — the per-frame
cost is pure rendering. Single-device megakernel/wavefront only: the
multi-device tiled steps bake the camera per pose (engine._tiled_step)
and would recompile every frame.
"""

from __future__ import annotations

import os

import numpy as np

from opencl_path_tracer_tpu.core.camera import BASE_EYE
from opencl_path_tracer_tpu.core.geometry import rotate_x, rotate_y


def orbit_shift(center, radius: float, yaw: float, pitch: float):
    """global_shift placing the eye on an orbit around `center`.

    The camera model fixes eye = BASE_EYE + shift and derives the view
    direction from (yaw, pitch) (main.cpp:327-343); to LOOK AT `center`
    from distance `radius` we back the eye off along the pose's own
    ahead vector: eye = center - radius * ahead(yaw, pitch)."""
    ahead = np.asarray(
        rotate_y(rotate_x(np.asarray([0.0, 0.0, 1.0]), pitch), yaw),
        np.float64,
    )
    eye = np.asarray(center, np.float64) - radius * ahead
    return eye - np.asarray(BASE_EYE, np.float64)


def turntable_poses(*, frames: int, center, radius: float,
                    pitch: float = 12.0, start_yaw: float = 0.0,
                    sweep: float = 360.0):
    """(yaw, pitch, shift) per frame for a `sweep`-degree orbit.

    A full turn (|sweep| >= 360) yields N end-exclusive poses (the
    closing frame equals frame 0, so it is not emitted twice —
    loopable GIFs). A partial sweep is end-INCLUSIVE: the last frame
    lands exactly on start_yaw + sweep (a 180-degree pan actually
    reaches 180)."""
    poses = []
    den = frames if abs(sweep) >= 360.0 else max(frames - 1, 1)
    for i in range(frames):
        yaw = start_yaw + sweep * i / den
        poses.append((yaw, pitch, orbit_shift(center, radius, yaw,
                                              pitch)))
    return poses


def render_animation(engine, poses, *, spp: int,
                     out_dir: str | None = None,
                     gif_path: str | None = None, fps: float = 12.0,
                     progress: bool = True, denoise: bool = False):
    """Render one frame per (yaw, pitch, shift) pose.

    engine: a RenderEngine (single-device; model megakernel or
    wavefront — both take the camera as a runtime arg, so the loop
    never recompiles). Each pose starts from a fresh accumulator but
    the SAME running RNG streams, matching the reference's reset rule
    (rnds[] is never reseeded, main.cpp:522-527).

    Returns the list of (H, W, 3) uint8/float frames (tonemapped).
    out_dir: write frame_%04d.png there. gif_path: also assemble an
    animated GIF (loop forever) at `fps`.

    denoise=True runs each frame through the à-trous denoiser
    (ops/denoise.py) — the jitted AOV+wavelet program compiles once
    and is reused by every pose, so low-spp denoised turntables cost
    barely more than raw ones.
    """
    from opencl_path_tracer_tpu.io.image import to_uint8

    frames = []
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    for i, (yaw, pitch, shift) in enumerate(poses):
        st = engine.controller.state
        st.yaw = float(yaw)
        st.pitch = float(pitch)
        st.shift = np.asarray(shift, np.float64)
        engine.reset_accumulation()
        engine.render(spp, progress=False)
        img = to_uint8(engine.denoised_image() if denoise
                       else engine.image())
        frames.append(img)
        if out_dir:
            from opencl_path_tracer_tpu.io.image import write_png
            write_png(os.path.join(out_dir, f"frame_{i:04d}.png"), img)
        if progress:
            import sys
            print(f"\rframe {i + 1}/{len(poses)} "
                  f"(yaw {yaw:.1f})", end="", flush=True,
                  file=sys.stderr)
    if progress:
        import sys
        print(file=sys.stderr)
    if gif_path:
        write_gif(gif_path, frames, fps=fps)
    return frames


def write_gif(path: str, frames, fps: float = 12.0) -> None:
    """Assemble uint8 frames into a looping GIF (PIL)."""
    from PIL import Image

    if not frames:
        raise ValueError("write_gif needs at least one frame")
    ims = [Image.fromarray(np.asarray(f)) for f in frames]
    ims[0].save(
        path, save_all=True, append_images=ims[1:],
        duration=max(1, int(round(1000.0 / fps))), loop=0,
    )
