"""BSDF sampling and bounce logic (prog.cl:186-245, dispatch :329-366).

All functions are vectorized over a ray batch: where the reference's
megakernel branches per work-item on material type, we compute every
branch for every lane and select — the TPU is a lockstep vector machine,
so select is the native control flow. The megakernel/wavefront renderers
own the dispatch; this module owns the math:

  * orthonormal_base (prog.cl:186-204): axis-aligned-normal special case
    (|x|,|z| <= 1e-3) included, faithfully.
  * diffuse: cosine-weighted hemisphere sample around N (prog.cl:205-218),
    offset origin by N * 1e-3.
  * Fresnel: Schlick with per-channel conductor F0 (prog.cl:219-222).
  * specular: mirror reflect (prog.cl:223-227).
  * refractive: Snell with 1/n flip when inside, Russian roulette between
    refraction (prob 1-mean(F)) and reflection (prob mean(F)) with
    throughput compensation (prog.cl:228-245 + :346-357).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

EPS = jnp.float32(0.001)
TWO_PI = np.float32(2.0 * np.pi)


def _normalize(v):
    return v / jnp.sqrt(jnp.sum(v * v, -1, keepdims=True))


def _dot(a, b):
    return jnp.sum(a * b, -1)


def orthonormal_base(v1: jnp.ndarray):
    """Given unit v1 (..., 3), return (v2, v3) with v3 = cross(v1, v2)
    (prog.cl:186-204). The reference picks the branch on |x|,|z| <= 1e-3."""
    x, y, z = v1[..., 0], v1[..., 1], v1[..., 2]
    near_y_axis = (jnp.abs(x) <= EPS) & (jnp.abs(z) <= EPS)

    rl_a = 1.0 / jnp.sqrt(y * y + z * z)
    v2_a = jnp.stack([jnp.zeros_like(x), -z * rl_a, y * rl_a], -1)

    rl_b = 1.0 / jnp.sqrt(x * x + z * z)
    v2_b = jnp.stack([-z * rl_b, jnp.zeros_like(x), x * rl_b], -1)

    v2 = jnp.where(near_y_axis[..., None], v2_a, v2_b)
    v3 = jnp.cross(v1, v2)
    return v2, v3


def diffuse_ray(hit_p: jnp.ndarray, hit_n: jnp.ndarray, rnd1: jnp.ndarray,
                rnd2: jnp.ndarray):
    """Cosine-weighted bounce (new_ray_diffuse, prog.cl:205-218).
    Returns (origin, direction)."""
    y_axis = hit_n
    z_axis, x_axis = orthonormal_base(y_axis)
    r = jnp.sqrt(rnd1)
    theta = TWO_PI * rnd2
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    z = jnp.sqrt(1.0 - rnd1)
    d = _normalize(
        x_axis * x[..., None] + y_axis * z[..., None] + z_axis * y[..., None]
    )
    return hit_p + y_axis * EPS, d


def fresnel(f0: jnp.ndarray, hit_n: jnp.ndarray, d: jnp.ndarray):
    """Schlick conductor Fresnel (prog.cl:219-222): cosa = |dot(N, D)|,
    F = F0 + (1 - F0) (1 - cosa)^5. f0: (..., 3)."""
    cosa = jnp.abs(_dot(hit_n, d))[..., None]
    one_minus = 1.0 - cosa
    p5 = one_minus * one_minus
    p5 = p5 * p5 * one_minus
    return f0 + (1.0 - f0) * p5


def specular_ray(hit_p: jnp.ndarray, hit_n: jnp.ndarray, d: jnp.ndarray):
    """Mirror reflection (new_ray_specular, prog.cl:223-227)."""
    cosa = _dot(hit_n, d)[..., None]
    new_d = _normalize(d - hit_n * cosa * 2.0)
    return hit_p + hit_n * EPS, new_d


def refractive_ray(hit_p, hit_n, d, mat_n, f0, inside, rnd):
    """Refract-or-reflect with Russian roulette (new_ray_refractive,
    prog.cl:228-245) plus the megakernel's factor_R update (prog.cl:346-357).

    Args are batch arrays: mat_n (R,), f0 (R,3), inside (R,) bool,
    rnd (R,) the roulette draw.
    Returns (origin, direction, new_inside, factor_r_multiplier).
    """
    n_eff = jnp.where(inside, 1.0 / mat_n, mat_n)
    cosa = _dot(-d, hit_n)
    disc = 1.0 - (1.0 - cosa * cosa) / n_eff / n_eff
    f = fresnel(f0, hit_n, d)  # (R, 3)
    prob = (f[..., 0] + f[..., 1] + f[..., 2]) / 3.0

    refracted = (disc > 0.0) & (rnd > prob)

    # Refraction branch (prog.cl:236-241).
    inv_n = 1.0 / n_eff
    safe_disc = jnp.maximum(disc, 0.0)
    refr_d = _normalize(
        d * inv_n[..., None]
        + hit_n * (cosa * inv_n - jnp.sqrt(safe_disc))[..., None]
    )
    refr_p = hit_p - hit_n * EPS

    # Reflection branch falls back to new_ray_specular (prog.cl:242-244).
    spec_p, spec_d = specular_ray(hit_p, hit_n, d)

    m = refracted[..., None]
    origin = jnp.where(m, refr_p, spec_p)
    direction = jnp.where(m, refr_d, spec_d)
    new_inside = jnp.where(refracted, ~inside, inside)

    # Throughput compensation (prog.cl:352-356): refracted ->
    # (1 - F) / (1 - prob); reflected -> F / prob.
    factor_r = jnp.where(
        m,
        (1.0 - f) / (1.0 - prob)[..., None],
        f / prob[..., None],
    )
    return origin, direction, new_inside, factor_r
