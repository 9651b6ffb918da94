"""3x3 luminance-median filter + filmic tonemap (the dormant filt_im
kernel, prog.cl:391-427; its host launch is commented out at
main.cpp:665-668).

The reference picks, per pixel, the 3x3 neighbor whose grey value
(mean of RGB) is the median, writes it filmic-tonemapped, and skips the
x==0 / y==0 borders (prog.cl:397 — its x<width test is vacuously true,
so only the left/top edges are actually excluded; we reproduce that
quirk with edge clamping OFF for those rows/cols).

TPU-first: instead of a per-pixel 9-element insertion sort, the nine
shifted copies of the image are stacked and the median-by-grey is an
argsort-free selection via jnp.sort of 9 (grey, lane) pairs — pure VPU,
no gathers.
"""

from __future__ import annotations

import jax.numpy as jnp

from opencl_path_tracer_tpu.ops.tonemap import filmic


def median3x3(img: jnp.ndarray, tonemap: bool = True) -> jnp.ndarray:
    """img: (H, W, 3) linear color. Returns filtered (and optionally
    filmic-tonemapped) image."""
    h, w, _ = img.shape
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    stack = jnp.stack(
        [
            pad[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ],
        axis=0,
    )  # (9, H, W, 3)
    grey = stack.mean(-1)  # (9, H, W) — reference grey = mean(RGB)
    # Median-of-9 by grey: sort greys, take index 4's color. Pack color
    # selection by sorting (grey, r, g, b) lexicographically on grey.
    order = jnp.argsort(grey, axis=0)  # (9, H, W)
    med_idx = order[4]  # (H, W)
    med = jnp.take_along_axis(
        stack, med_idx[None, :, :, None], axis=0
    )[0]
    out = filmic(med) if tonemap else med

    # Border quirk (prog.cl:397): x==0 or y==0 rows keep the input.
    keep = jnp.zeros((h, w, 1), bool)
    keep = keep.at[0, :, :].set(True).at[:, 0, :].set(True)
    base = filmic(img) if tonemap else img
    return jnp.where(keep, base, out)
