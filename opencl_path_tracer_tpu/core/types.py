"""SoA pytree types for the compute path.

The reference packs per-ray data into AoS OpenCL structs (prog.cl:1-35:
Ray{P,D}, Hit{t,P,N,mati}). On TPU, structure-of-arrays is the native
layout: each field is a dense (N, ...) array that the VPU consumes in
(8, 128) tiles, so we register lightweight frozen dataclasses as pytrees
and keep every field a separate jnp array.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class Rays:
    """A batch of rays. Mirrors Ray{P,D} (prog.cl:7-9) as SoA.

    p: (N, 3) float32 origins. d: (N, 3) float32 unit directions.
    """

    p: jnp.ndarray
    d: jnp.ndarray

    @property
    def count(self) -> int:
        return self.p.shape[0]


@_register
@dataclasses.dataclass(frozen=True)
class Hits:
    """A batch of hit records. Mirrors Hit{t,P,N,mati} (prog.cl:11-16).

    t: (N,) float32 hit distance; <= 0 means miss (init_Hit uses -1,
    prog.cl:68-70, and all validity checks are `hit.t > 0`).
    p: (N, 3) hit point. n: (N, 3) geometric normal. mati: (N,) int32.
    """

    t: jnp.ndarray
    p: jnp.ndarray
    n: jnp.ndarray
    mati: jnp.ndarray

    @property
    def valid(self) -> jnp.ndarray:
        return self.t > 0.0

    @staticmethod
    def none(n: int) -> "Hits":
        """A batch of misses (t = -1, like init_Hit, prog.cl:68-70)."""
        return Hits(
            t=jnp.full((n,), -1.0, jnp.float32),
            p=jnp.zeros((n, 3), jnp.float32),
            n=jnp.zeros((n, 3), jnp.float32),
            mati=jnp.zeros((n,), jnp.int32),
        )


def normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """OpenCL normalize(): v / sqrt(dot(v, v)). No epsilon (zero vectors
    produce inf/nan exactly as the reference hardware would)."""
    return v / jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=True))


def dot(a: jnp.ndarray, b: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return jnp.sum(a * b, axis=axis)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)
