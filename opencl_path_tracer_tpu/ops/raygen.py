"""Camera ray generation (gen_ray kernel, prog.cl:384-389 + 82-92).

The reference launches one work-item per pixel over a 1D range; here the
whole framebuffer is a single vectorized computation: ids are a lane
dimension, two RNG draws jitter the sample position inside the pixel,
and the pinhole projection is pure VPU arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp

from opencl_path_tracer_tpu.core.camera import Camera
from opencl_path_tracer_tpu.core.types import Rays


def camera_rays(cam: Camera, ids: jnp.ndarray, rnd1: jnp.ndarray,
                rnd2: jnp.ndarray) -> Rays:
    """camera_get_ray (prog.cl:82-92) vectorized over pixel ids.

    ids: (N,) int32 linear pixel index (row-major, id = y*W + x).
    rnd1/rnd2: (N,) float32 jitter in [0, 1).
    """
    x_dim = cam.xm.astype(jnp.int32)
    y_dim = cam.ym.astype(jnp.int32)
    x = (ids % x_dim).astype(jnp.float32) + rnd1
    y = (ids // x_dim).astype(jnp.float32) + rnd2
    xf = x_dim.astype(jnp.float32)
    yf = y_dim.astype(jnp.float32)
    right = cam.right[None, :] * (2.0 * x / xf - 1.0)[:, None]
    up = cam.up[None, :] * (2.0 * y / yf - 1.0)[:, None]
    p = cam.lookat[None, :] + right + up
    d = p - cam.eye[None, :]
    d = d / jnp.sqrt(jnp.sum(d * d, -1, keepdims=True))
    origins = jnp.broadcast_to(cam.eye[None, :], d.shape)
    return Rays(p=origins, d=d)


def pixel_ids(width: int, height: int) -> jnp.ndarray:
    return jnp.arange(width * height, dtype=jnp.int32)


def pixel_ids_like(num_pixels: int) -> jnp.ndarray:
    return jnp.arange(num_pixels, dtype=jnp.int32)
