"""Camera ray generation (gen_ray kernel, prog.cl:384-389 + 82-92).

The reference launches one work-item per pixel over a 1D range; here the
whole framebuffer is a single vectorized computation: ids are a lane
dimension, two RNG draws jitter the sample position inside the pixel,
and the pinhole projection is pure VPU arithmetic over 1-D component
arrays (see core/types.py on why (N, 3) layouts are avoided).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.camera import Camera
from opencl_path_tracer_tpu.core.types import Rays, vnormalize


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
    sx = 2.0 * x / cam.xm - 1.0          # (N,)
    sy = 2.0 * y / cam.ym - 1.0

    d = tuple(
        cam.lookat[k] + cam.right[k] * sx + cam.up[k] * sy - cam.eye[k]
        for k in range(3)
    )
    d = vnormalize(d)
    origins = tuple(
        jnp.broadcast_to(cam.eye[k], d[0].shape) for k in range(3)
    )
    return Rays(p=origins, d=d)


def camera_rays_dof(cam: Camera, ids: jnp.ndarray, rnd1, rnd2,
                    lens1, lens2, aperture: float,
                    focus: float) -> Rays:
    """Thin-lens extension of camera_rays (no reference counterpart —
    the reference camera is a pure pinhole, prog.cl:82-92).

    Each ray starts from a uniform point on a lens disk of radius
    `aperture` (world units, spanned by the camera's unit right/up)
    and is aimed at the pinhole ray's intersection with the FOCAL
    PLANE at distance `focus` along the view axis — the thin-lens
    property that all of a pixel's rays converge on the focal plane
    (tests/test_dof.py asserts it). aperture == 0 degenerates to the
    exact pinhole ray."""
    pin = camera_rays(cam, ids, rnd1, rnd2)
    ahead = vnormalize(tuple(cam.lookat[k] - cam.eye[k]
                             for k in range(3)))
    right_u = vnormalize(tuple(cam.right[k] for k in range(3)))
    up_u = vnormalize(tuple(cam.up[k] for k in range(3)))
    # Pinhole ray's focal-plane point: t = focus / dot(d, ahead).
    cosv = sum(pin.d[k] * ahead[k] for k in range(3))
    t = jnp.float32(focus) / jnp.maximum(cosv, 1e-6)
    target = tuple(pin.p[k] + pin.d[k] * t for k in range(3))
    # Uniform disk sample on the lens.
    r = jnp.sqrt(lens1) * jnp.float32(aperture)
    th = jnp.float32(2.0 * np.pi) * lens2
    lx = r * jnp.cos(th)
    ly = r * jnp.sin(th)
    origin = tuple(pin.p[k] + right_u[k] * lx + up_u[k] * ly
                   for k in range(3))
    d = vnormalize(tuple(target[k] - origin[k] for k in range(3)))
    return Rays(p=origin, d=d)


def pixel_ids(width: int, height: int) -> jnp.ndarray:
    return jnp.arange(width * height, dtype=jnp.int32)


def pixel_ids_like(num_pixels: int) -> jnp.ndarray:
    return jnp.arange(num_pixels, dtype=jnp.int32)


def tile_major_ids(width: int, height: int, tile_w: int = 16,
                   tile_h: int = 16) -> jnp.ndarray:
    """Linear pixel ids in square-tile-major order.

    Rays processed in square screen tiles have far tighter origin/
    direction bounds than scanline strips, which is what the cluster
    intersector's per-tile conservative culling feeds on (a 256-pixel
    strip spans a quarter of a scanline; a 16x16 tile spans 1/64 of the
    screen in both axes).
    """
    assert width % tile_w == 0 and height % tile_h == 0, (
        f"{width}x{height} not divisible by {tile_w}x{tile_h} tiles"
    )
    ids = np.arange(width * height, dtype=np.int32).reshape(
        height, width
    )
    tiles = ids.reshape(
        height // tile_h, tile_h, width // tile_w, tile_w
    )
    return jnp.asarray(
        tiles.transpose(0, 2, 1, 3).reshape(-1)
    )


def inverse_permutation(perm: jnp.ndarray) -> jnp.ndarray:
    inv = np.empty(perm.shape[0], np.int32)
    inv[np.asarray(perm)] = np.arange(perm.shape[0], dtype=np.int32)
    return jnp.asarray(inv)
