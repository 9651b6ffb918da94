"""Image textures: the consumption path for OBJ `map_Kd`.

The reference's vendored tinyobjloader parses `map_Kd` into
material_t.diffuse_texname (tiny_obj_loader.h:124-182) but the
reference never samples it — materials are flat colors (main.cpp:
564-581 reads Kd/Ks/Ke and the custom Kn/Kk/Tp keys only). This module
closes that gap the TPU-first way:

  * All textures live in ONE padded device atlas, V3-of-1-D component
    arrays (the codebase-wide SoA convention — an (R, 3) gather output
    is lane-padded 42x in HBM on TPU, core/types.py). Per-texture
    true sizes ride in tiny (N,) tables.
  * Per-material texture binding is an (M,) int32 table (-1 = none),
    fetched per lane with the same static where-chain trick as
    core/materials.take_select — M and N are tens, and TPU gathers
    cost ~10 ms per 2M-element fetch while selects on lanes are ~free.
  * Sampling is bilinear with repeat-wrap, 4 taps x 3 channels = 12
    dense 1-D gathers per shaded wavefront. Untextured lanes (texi <
    0, misses, analytic-sphere winners — quadrics carry no UVs) get a
    multiplier of exactly 1.0.

Row orientation: atlas rows are stored bottom-up, i.e. t = 0 samples
the BOTTOM row of the source image — matching the OBJ `vt` convention
(origin at the lower-left). build() does the flip, so callers pass
ordinary top-down (H, W, 3) image arrays (io.image.read_png output).

The kd modulation itself happens in the models (megakernel/wavefront):
an intersect_fn may return (Hits, kd_scale) and the fetched material's
kd is multiplied lane-wise before shading — see
runtime.engine.make_intersect_fn(textured=True).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.types import V3


def _register(cls):
    fields = dataclasses.fields(cls)
    jax.tree_util.register_dataclass(
        cls,
        data_fields=[f.name for f in fields if f.metadata.get("data", True)],
        meta_fields=[f.name for f in fields if not f.metadata.get("data", True)],
    )
    return cls


def _meta(**kw):
    return dataclasses.field(metadata={"data": False}, **kw)


@_register
@dataclasses.dataclass(frozen=True)
class TexturesSoA:
    """Texture atlas + per-material binding, device-ready."""

    atlas: tuple     # V3 of (N*HM*WM,) float32, rows bottom-up
    height: jnp.ndarray   # (N,) int32 true heights
    width: jnp.ndarray    # (N,) int32 true widths
    mat_texi: jnp.ndarray  # (M,) int32 texture index per material, -1=none
    hm: int = _meta(default=0)  # padded (static) atlas height
    wm: int = _meta(default=0)  # padded (static) atlas width

    @property
    def count(self) -> int:
        return int(self.height.shape[0])

    @staticmethod
    def build(images: "list[np.ndarray]",
              mat_texi: "np.ndarray | list") -> "TexturesSoA":
        """images: top-down (H, W, 3) arrays, uint8 or float in [0, 1].
        mat_texi: (M,) texture index per material (-1 = untextured)."""
        if not images:
            raise ValueError("TexturesSoA.build needs >= 1 image")
        imgs = []
        for im in images:
            a = np.asarray(im)
            if a.dtype == np.uint8:
                a = a.astype(np.float32) / 255.0
            a = np.asarray(a, np.float32)
            if a.ndim == 2:
                a = np.stack([a] * 3, -1)
            if a.shape[-1] == 4:
                a = a[..., :3]
            imgs.append(a[::-1])  # store bottom-up (OBJ vt origin)
        hm = max(a.shape[0] for a in imgs)
        wm = max(a.shape[1] for a in imgs)
        n = len(imgs)
        pad = np.zeros((n, hm, wm, 3), np.float32)
        for i, a in enumerate(imgs):
            pad[i, : a.shape[0], : a.shape[1]] = a
        flat = pad.reshape(-1, 3)
        return TexturesSoA(
            atlas=tuple(jnp.asarray(flat[:, k]) for k in range(3)),
            height=jnp.asarray(
                np.asarray([a.shape[0] for a in imgs], np.int32)),
            width=jnp.asarray(
                np.asarray([a.shape[1] for a in imgs], np.int32)),
            mat_texi=jnp.asarray(np.asarray(mat_texi, np.int32)),
            hm=hm, wm=wm,
        )


def _select_small(tab: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Static where-chain fetch of tab[idx] (materials.take_select
    rationale: tiny tables, dense lanes). Falls back to a gather past
    64 rows."""
    m = int(tab.shape[0])
    if m > 64:
        return jnp.take(tab, idx)
    acc = jnp.full(idx.shape, tab[0], tab.dtype)
    for j in range(1, m):
        acc = jnp.where(idx == j, tab[j], acc)
    return acc


def kd_scale(tex: TexturesSoA, mati: jnp.ndarray, s: jnp.ndarray,
             t: jnp.ndarray, ok: jnp.ndarray) -> V3:
    """Per-lane diffuse multiplier: bilinear repeat-wrap sample of the
    material's bound texture at (s, t), or exactly 1.0 where `ok` is
    False or the material is unbound (texi < 0).

    mati: (R,) int32 material index at the hit. s, t: (R,) texture
    coordinates (ops.shading.interpolate_uvs). ok: (R,) bool — lanes
    whose (s, t) is meaningful (triangle-stream winners with UV data).
    """
    texi = _select_small(tex.mat_texi, mati)
    has = ok & (texi >= 0)
    ti = jnp.maximum(texi, 0)
    h = _select_small(tex.height, ti)
    w = _select_small(tex.width, ti)
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)

    # Repeat wrap to [0, 1), then texel-center bilinear footprint.
    sf = s - jnp.floor(s)
    tf = t - jnp.floor(t)
    x = sf * wf - 0.5
    y = tf * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    # remainder handles the -1 underflow and the ==size overflow.
    x0w = jnp.remainder(x0, w)
    x1w = jnp.remainder(x0 + 1, w)
    y0w = jnp.remainder(y0, h)
    y1w = jnp.remainder(y0 + 1, h)

    base = ti * np.int32(tex.hm * tex.wm)

    def fetch(yy, xx):
        idx = base + yy * np.int32(tex.wm) + xx
        return tuple(jnp.take(tex.atlas[k], idx) for k in range(3))

    c00 = fetch(y0w, x0w)
    c01 = fetch(y0w, x1w)
    c10 = fetch(y1w, x0w)
    c11 = fetch(y1w, x1w)
    one = jnp.float32(1.0)
    out = tuple(
        (c00[k] * (one - fx) + c01[k] * fx) * (one - fy)
        + (c10[k] * (one - fx) + c11[k] * fx) * fy
        for k in range(3)
    )
    return tuple(jnp.where(has, out[k], one) for k in range(3))
