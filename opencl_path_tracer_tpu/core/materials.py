"""Material system.

Mirrors the reference host Material (main.cpp:92-112) and the device
struct Material{kd,ks,emission,F0,n,shininess,type} (prog.cl:1-5).

Material types (int, host comment main.cpp:96 and dispatch prog.cl:329-366):
  0 diffuse (Lambert kd + Blinn ks lobe), 1 specular conductor (mirror with
  per-channel Fresnel F0), 2 refractive dielectric (Snell + Russian
  roulette), 3 emitter (adds emission, then quirkily continues with a
  diffuse bounce — reproduced faithfully in models/megakernel.py).

Conductor F0 is computed per channel from complex IOR (n, k)
(main.cpp:104-110): F0 = (k^2 + (n-1)^2) / (k^2 + (n+1)^2); the scalar
refraction index is mean(n) (main.cpp:103).
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np
import jax
import jax.numpy as jnp


class MaterialType(enum.IntEnum):
    DIFFUSE = 0
    SPECULAR = 1
    REFRACTIVE = 2
    EMITTER = 3


def conductor_f0(n: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Per-channel conductor reflectance at normal incidence
    (main.cpp:104-110)."""
    n = np.asarray(n, np.float32)
    k = np.asarray(k, np.float32)
    a = (n - 1.0) * (n - 1.0)
    b = (n + 1.0) * (n + 1.0)
    return (k * k + a) / (k * k + b)


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class MaterialsSoA:
    """All scene materials, SoA (M entries). Color fields are V3 tuples
    of (M,) arrays — 1-D so the per-ray material gathers in the render
    loop stay dense (an (R, 3) gather output is lane-padded 42x in HBM
    on TPU)."""

    kd: tuple        # V3 of (M,) diffuse color
    ks: tuple        # V3 of (M,) specular (Blinn) color
    emission: tuple  # V3 of (M,)
    f0: tuple        # V3 of (M,) Fresnel at normal incidence
    n: jnp.ndarray         # (M,) scalar refraction index (mean of channels)
    shininess: jnp.ndarray # (M,) Blinn exponent
    type: jnp.ndarray      # (M,) int32 MaterialType

    @property
    def count(self) -> int:
        return self.n.shape[0]

    def take(self, idx) -> "MaterialsSoA":
        """Per-ray material fetch: component-wise 1-D gathers."""
        return jax.tree.map(lambda a: jnp.take(a, idx, axis=0), self)

    def take_select(self, idx) -> "MaterialsSoA":
        """Per-ray material fetch as static where-chains — M is small
        (10 archetypes; tens for OBJ scenes), and TPU gathers cost ~10ms
        per 2M-element fetch while M-1 selects on (R,) lanes are ~free.
        Falls back to gathers past 64 materials."""
        m = self.count
        if m > 64:
            return self.take(idx)

        def sel(tab):
            acc = jnp.full(idx.shape, tab[0], tab.dtype)
            for j in range(1, m):
                acc = jnp.where(idx == j, tab[j], acc)
            return acc

        return jax.tree.map(sel, self)


def make_material(kd, ks, emission, N, K, shininess, type) -> dict:
    """One material row as plain numpy, reference ctor semantics
    (main.cpp:101-111): F0 from (N, K) per channel, n = mean(N)."""
    N = np.asarray(N, np.float32)
    return dict(
        kd=np.asarray(kd, np.float32),
        ks=np.asarray(ks, np.float32),
        emission=np.asarray(emission, np.float32),
        f0=conductor_f0(N, np.asarray(K, np.float32)),
        n=np.float32((N[0] + N[1] + N[2]) / 3.0),
        shininess=np.float32(shininess),
        type=np.int32(type),
    )


def stack_materials(rows: list[dict]) -> MaterialsSoA:
    """Stack make_material() rows into a device-ready SoA."""
    if not rows:
        rows = [make_material((0, 0, 0), (0, 0, 0), (0, 0, 0),
                              (0, 0, 0), (0, 0, 0), 0, 0)]
    def col(k):
        return jnp.asarray(np.stack([r[k] for r in rows]))

    def col3(k):
        a = np.stack([r[k] for r in rows])  # (M, 3)
        return (jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]),
                jnp.asarray(a[:, 2]))

    return MaterialsSoA(
        kd=col3("kd"), ks=col3("ks"), emission=col3("emission"),
        f0=col3("f0"),
        n=col("n"), shininess=col("shininess"), type=col("type"),
    )


# The ten hardcoded archetypes from the reference scene script
# (main.cpp:751-762), exported so the default scene matches.
def reference_archetypes() -> list[dict]:
    m = make_material
    z3 = (0.0, 0.0, 0.0)
    return [
        # LAMP
        m(z3, z3, (120.0, 100.0, 80.0), z3, z3, 0, 3),
        # SUN
        m(z3, z3, (300.0, 250.0, 200.0), z3, z3, 0, 3),
        # WHITE_DIFFUSE
        m((0.3, 0.3, 0.3), z3, z3, z3, z3, 50, 0),
        # RED_DIFFUSE
        m((0.3, 0.1, 0.1), z3, z3, z3, z3, 50, 0),
        # GREEN_DIFFUSE
        m((0.1, 0.3, 0.1), z3, z3, z3, z3, 50, 0),
        # PURPLE_SPECULAR
        m((0.3, 0.0, 0.0), (0.3, 0.3, 0.3), z3, z3, z3, 200, 0),
        # BLACK_SPECULAR
        m((0.05, 0.05, 0.05), (0.3, 0.3, 0.3), z3, z3, z3, 200, 0),
        # CHROMIUM
        m(z3, z3, z3, (3.10, 3.05, 2.05), (3.3, 3.3, 2.9), 0, 1),
        # GOLD
        m(z3, z3, z3, (0.17, 0.35, 1.50), (3.1, 2.7, 1.9), 0, 1),
        # GLASS
        m(z3, z3, z3, (1.50, 1.50, 1.50), z3, 0, 2),
    ]
