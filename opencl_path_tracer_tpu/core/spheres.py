"""Analytic sphere primitive (SoA).

The reference has no sphere primitive — its "spheres" are tessellated
UV-sphere OBJ meshes fed through the triangle path
(/root/reference/main.cpp:1002,1009). BASELINE.json's north star for
the rebuild, however, calls for "sphere + Möller–Trumbore triangle"
intersection, so the TPU framework carries analytic spheres as a
first-class primitive: exact silhouettes and normals at any zoom, ~60x
fewer intersection tests than a lat=12/lon=18 tessellation, and no
faceting artifacts in glass refraction.

Layout follows core/types.py's rule: every per-sphere quantity is a
1-D (S,) array (centers as a V3 tuple of (S,) components, never an
(S, 3) array) so HBM tiles stay dense and the ray-vs-sphere batch
reduces to (R,)x(S,) outer products + one (R,3)x(3,S) contraction
(see ops.intersect.sphere_intersect).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from opencl_path_tracer_tpu.core.types import V3


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields,
                                     meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class SpheresSoA:
    """All scene spheres, SoA.

    c: V3 of (S,) float32 centers.
    rad: (S,) float32 radii.
    mati: (S,) int32 material index (same material table as triangles).
    """

    c: V3
    rad: jnp.ndarray
    mati: jnp.ndarray

    @property
    def count(self) -> int:
        return int(self.rad.shape[0])

    @staticmethod
    def build(centers, radii, mati) -> "SpheresSoA":
        centers = np.asarray(centers, np.float32).reshape(-1, 3)
        radii = np.asarray(radii, np.float32).reshape(-1)
        mati = np.asarray(mati, np.int32).reshape(-1)
        if not (centers.shape[0] == radii.shape[0] == mati.shape[0]):
            raise ValueError(
                f"mismatched sphere arrays: {centers.shape[0]} centers, "
                f"{radii.shape[0]} radii, {mati.shape[0]} materials"
            )
        if np.any(radii <= 0.0):
            raise ValueError("sphere radii must be > 0")
        return SpheresSoA(
            c=(jnp.asarray(centers[:, 0]), jnp.asarray(centers[:, 1]),
               jnp.asarray(centers[:, 2])),
            rad=jnp.asarray(radii),
            mati=jnp.asarray(mati),
        )
