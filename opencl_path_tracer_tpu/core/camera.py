"""Pinhole camera, exact reference math.

Reference: host Camera ctor main.cpp:306-348, device mirror prog.cl:32-35.
Basis vectors up/right/ahead start axis-aligned, are rotated by pitch
(about x) then yaw (about y) using the degree-input rotations at
main.cpp:47-70; up is scaled by H/2, right by W/2, and
ahead_length = (W/2) / tan(fov/2) (main.cpp:321). The eye sits at
(500, 500, -1299.037842) + shift (main.cpp:343); lookat = eye + ahead.

The reference Camera ctor also *applies movement* by mutating the
global_shift global (main.cpp:334-336); that statefulness lives in
runtime/controller.py here — this module is pure.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.geometry import REF_PI, rotate_x, rotate_y

# Base eye position before shift (main.cpp:343).
BASE_EYE = np.array([500.0, 500.0, -1299.037842], np.float32)


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class Camera:
    """Device camera (prog.cl:32-35): eye, lookat, up*(H/2), right*(W/2),
    and the integer screen dims XM, YM stored as float32."""

    eye: jnp.ndarray     # (3,)
    lookat: jnp.ndarray  # (3,)
    up: jnp.ndarray      # (3,) scaled by H/2
    right: jnp.ndarray   # (3,) scaled by W/2
    xm: jnp.ndarray      # () float32 = width
    ym: jnp.ndarray      # () float32 = height


def basis(yaw: float, pitch: float):
    """Unit up/right/ahead after pitch-then-yaw rotation
    (main.cpp:323-332)."""
    up = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    right = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    ahead = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    up = rotate_y(rotate_x(up, pitch), yaw)
    right = rotate_y(rotate_x(right, pitch), yaw)
    ahead = rotate_y(rotate_x(ahead, pitch), yaw)
    return up, right, ahead


def make_camera(width: int, height: int, fov: float, yaw: float,
                pitch: float, shift) -> Camera:
    """Build the device camera. Pure version of main.cpp:306-348."""
    up, right, ahead = basis(yaw, pitch)
    up_length = jnp.float32(height) / 2.0
    right_length = jnp.float32(width) / 2.0
    fov_rad = jnp.asarray(fov, jnp.float32) / 2.0 / 180.0 * REF_PI
    ahead_length = right_length / jnp.tan(fov_rad)

    eye = jnp.asarray(BASE_EYE) + jnp.asarray(shift, jnp.float32)
    return Camera(
        eye=eye,
        lookat=eye + ahead * ahead_length,
        up=up * up_length,
        right=right * right_length,
        xm=jnp.float32(width),
        ym=jnp.float32(height),
    )


def camera_view_dir(cam: Camera, p: jnp.ndarray) -> jnp.ndarray:
    """normalize(eye - p) (prog.cl:79-81); p is (..., 3)."""
    v = cam.eye - p
    return v / jnp.sqrt(jnp.sum(v * v, -1, keepdims=True))
