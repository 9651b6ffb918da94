"""Tone mapping operators (prog.cl:247-269).

reinhard_tone_map (active path, prog.cl:380): Reinhard on Rec.709
luminance followed by the reference's piecewise sRGB encode (with its
exact constants 0.00304 / 0.4167). filmic_tone_map: Hable-style curve
used only by the dormant median-filter kernel.

Parity quirk: the reference computes c * (L/(1+L)) / L, which is NaN for
pure black (L == 0). `safe=True` (default) maps L == 0 to black instead;
`safe=False` reproduces the reference bit pattern.
"""

from __future__ import annotations

import jax.numpy as jnp


def srgb(c: jnp.ndarray) -> jnp.ndarray:
    """Piecewise sRGB encode, reference constants (prog.cl:247-258)."""
    c = jnp.asarray(c, jnp.float32)
    return jnp.where(
        c <= 0.00304,
        12.92 * c,
        1.055 * jnp.power(c, 0.4167) - 0.055,
    )


def reinhard(c: jnp.ndarray, safe: bool = True) -> jnp.ndarray:
    """Reinhard luminance tonemap + sRGB (prog.cl:264-269). c: (..., 3)."""
    c = jnp.asarray(c, jnp.float32)
    lum = (
        0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]
    )[..., None]
    l2 = lum / (1.0 + lum)
    if safe:
        scale = jnp.where(lum > 0.0, l2 / jnp.where(lum > 0, lum, 1.0), 0.0)
    else:
        scale = l2 / lum
    return srgb(c * scale)


def filmic(c: jnp.ndarray) -> jnp.ndarray:
    """Hable-ish filmic curve (prog.cl:259-263); no sRGB step."""
    c = jnp.maximum(0.0, jnp.asarray(c, jnp.float32) - 0.004)
    return (c * (c * 6.2 + 0.5)) / (c * (c * 6.2 + 1.7) + 0.06)


def apply(c: jnp.ndarray, kind: str = "reinhard", safe: bool = True):
    if kind == "reinhard":
        return reinhard(c, safe=safe)
    if kind == "filmic":
        return filmic(c)
    if kind == "none":
        return c
    raise ValueError(f"unknown tonemap {kind!r}")
