"""SoA pytree types for the compute path.

The reference packs per-ray data into AoS OpenCL structs (prog.cl:1-35:
Ray{P,D}, Hit{t,P,N,mati}). On TPU the right layout is stricter than
structure-of-arrays: XLA stores HBM buffers in (8, 128) tiles, so an
(N, 3) array wastes 42x memory/bandwidth (3 lanes used of 128) and an
(N, 1) array 128x — measured as the difference between fitting a 1080p
wavefront in HBM and a 4.2 GB OOM. Every hot per-ray quantity here is
therefore a **1-D (N,) array**, with 3-vectors as plain tuples of three
such arrays ("V3"). 1-D arrays tile densely; elementwise math fuses
identically; nothing is lost but the `[..., :3]` indexing habit.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

V3 = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]


# --- V3 helpers -----------------------------------------------------------

def v3(x, y, z) -> V3:
    return (x, y, z)


def v3_from_array(a: jnp.ndarray) -> V3:
    """(N, 3) or (3,) array -> V3 tuple."""
    a = jnp.asarray(a, jnp.float32)
    return (a[..., 0], a[..., 1], a[..., 2])


def v3_stack(v: V3) -> jnp.ndarray:
    """V3 -> (N, 3) array (materializes a lane-padded layout on TPU:
    use only at API edges, never in hot loops)."""
    return jnp.stack(v, axis=-1)


def vfull_like(v: V3, value) -> V3:
    return tuple(jnp.full_like(c, value) for c in v)


def vadd(a: V3, b: V3) -> V3:
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def vsub(a: V3, b: V3) -> V3:
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def vmul(a: V3, b: V3) -> V3:
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def vscale(a: V3, s) -> V3:
    return (a[0] * s, a[1] * s, a[2] * s)


def vneg(a: V3) -> V3:
    return (-a[0], -a[1], -a[2])


def vdot(a: V3, b: V3) -> jnp.ndarray:
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a: V3, b: V3) -> V3:
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def vnormalize(a: V3) -> V3:
    """OpenCL normalize(): no epsilon (zero vectors -> inf/nan, matching
    reference hardware semantics)."""
    inv = 1.0 / jnp.sqrt(vdot(a, a))
    return vscale(a, inv)


def vwhere(mask: jnp.ndarray, a: V3, b: V3) -> V3:
    """mask: (N,) bool."""
    return (
        jnp.where(mask, a[0], b[0]),
        jnp.where(mask, a[1], b[1]),
        jnp.where(mask, a[2], b[2]),
    )


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class Rays:
    """A batch of rays. Mirrors Ray{P,D} (prog.cl:7-9). p, d: V3 of (N,)."""

    p: V3
    d: V3

    @property
    def count(self) -> int:
        return self.p[0].shape[0]

    @staticmethod
    def make(p, d) -> "Rays":
        """From (N, 3) arrays (test/API convenience)."""
        return Rays(p=v3_from_array(p), d=v3_from_array(d))


@_register
@dataclasses.dataclass(frozen=True)
class Hits:
    """A batch of hit records. Mirrors Hit{t,P,N,mati} (prog.cl:11-16).

    t: (N,) float32; <= 0 means miss (init_Hit uses -1, prog.cl:68-70,
    and all validity checks are `hit.t > 0`). p, n: V3. mati: (N,) int32.
    """

    t: jnp.ndarray
    p: V3
    n: V3
    mati: jnp.ndarray

    @property
    def valid(self) -> jnp.ndarray:
        return self.t > 0.0

    @staticmethod
    def none(n: int) -> "Hits":
        z = jnp.zeros((n,), jnp.float32)
        return Hits(
            t=jnp.full((n,), -1.0, jnp.float32),
            p=(z, z, z),
            n=(z, z, z),
            mati=jnp.zeros((n,), jnp.int32),
        )


# Legacy aliases used by a few call sites.
def normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return v / jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True))


def dot(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jnp.sum(a * b, axis=axis)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)
