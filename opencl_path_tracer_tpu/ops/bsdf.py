"""BSDF sampling and bounce logic (prog.cl:186-245, dispatch :329-366).

All functions are vectorized over a ray batch: where the reference's
megakernel branches per work-item on material type, we compute every
branch for every lane and select — the TPU is a lockstep vector machine,
so select is the native control flow. Vectors are V3 tuples of (N,)
arrays (core/types.py). The megakernel/wavefront renderers own the
dispatch; this module owns the math:

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

from opencl_path_tracer_tpu.core.types import (
    V3, vadd, vcross, vdot, vneg, vnormalize, vscale, vsub, vwhere,
)

EPS = jnp.float32(0.001)
TWO_PI = np.float32(2.0 * np.pi)


def orthonormal_base(v1: V3) -> tuple[V3, V3]:
    """Given unit v1, return (v2, v3) with v3 = cross(v1, v2)
    (prog.cl:186-204). The reference picks the branch on |x|,|z| <= 1e-3."""
    x, y, z = v1
    near_y_axis = (jnp.abs(x) <= EPS) & (jnp.abs(z) <= EPS)

    rl_a = 1.0 / jnp.sqrt(y * y + z * z)
    v2_a = (jnp.zeros_like(x), -z * rl_a, y * rl_a)

    rl_b = 1.0 / jnp.sqrt(x * x + z * z)
    v2_b = (-z * rl_b, jnp.zeros_like(x), x * rl_b)

    v2 = vwhere(near_y_axis, v2_a, v2_b)
    return v2, vcross(v1, v2)


def diffuse_ray(hit_p: V3, hit_n: V3, rnd1: jnp.ndarray,
                rnd2: jnp.ndarray) -> tuple[V3, V3]:
    """Cosine-weighted bounce (new_ray_diffuse, prog.cl:205-218).
    Returns (origin, direction)."""
    y_axis = hit_n
    z_axis, x_axis = orthonormal_base(y_axis)
    r = jnp.sqrt(rnd1)
    theta = TWO_PI * rnd2
    x = r * jnp.cos(theta)
    y = r * jnp.sin(theta)
    z = jnp.sqrt(1.0 - rnd1)
    d = vnormalize(vadd(
        vadd(vscale(x_axis, x), vscale(y_axis, z)), vscale(z_axis, y)
    ))
    return vadd(hit_p, vscale(y_axis, EPS)), d


def fresnel(f0: V3, hit_n: V3, d: V3) -> V3:
    """Schlick conductor Fresnel (prog.cl:219-222): cosa = |dot(N, D)|,
    F = F0 + (1 - F0)(1 - cosa)^5. Per-channel."""
    cosa = jnp.abs(vdot(hit_n, d))
    one_minus = 1.0 - cosa
    p2 = one_minus * one_minus
    p5 = p2 * p2 * one_minus
    return tuple(c + (1.0 - c) * p5 for c in f0)


def specular_ray(hit_p: V3, hit_n: V3, d: V3) -> tuple[V3, V3]:
    """Mirror reflection (new_ray_specular, prog.cl:223-227)."""
    cosa = vdot(hit_n, d)
    new_d = vnormalize(vsub(d, vscale(hit_n, cosa * 2.0)))
    return vadd(hit_p, vscale(hit_n, EPS)), new_d


def refractive_ray(hit_p: V3, hit_n: V3, d: V3, mat_n, f0: V3, inside,
                   rnd):
    """Refract-or-reflect with Russian roulette (new_ray_refractive,
    prog.cl:228-245) plus the megakernel's factor_R update
    (prog.cl:346-357).

    mat_n (R,), f0 V3, inside (R,) bool, rnd (R,).
    Returns (origin, direction, new_inside, factor_r_multiplier V3).
    """
    n_eff = jnp.where(inside, 1.0 / mat_n, mat_n)
    cosa = vdot(vneg(d), hit_n)
    disc = 1.0 - (1.0 - cosa * cosa) / n_eff / n_eff
    f = fresnel(f0, hit_n, d)
    prob = (f[0] + f[1] + f[2]) / 3.0

    refracted = (disc > 0.0) & (rnd > prob)

    # Refraction branch (prog.cl:236-241).
    inv_n = 1.0 / n_eff
    safe_disc = jnp.maximum(disc, 0.0)
    refr_d = vnormalize(vadd(
        vscale(d, inv_n),
        vscale(hit_n, cosa * inv_n - jnp.sqrt(safe_disc)),
    ))
    refr_p = vsub(hit_p, vscale(hit_n, EPS))

    # Reflection branch falls back to new_ray_specular (prog.cl:242-244).
    spec_p, spec_d = specular_ray(hit_p, hit_n, d)

    origin = vwhere(refracted, refr_p, spec_p)
    direction = vwhere(refracted, refr_d, spec_d)
    new_inside = jnp.where(refracted, ~inside, inside)

    # Throughput compensation (prog.cl:352-356): refracted ->
    # (1 - F) / (1 - prob); reflected -> F / prob.
    inv_1mp = 1.0 / (1.0 - prob)
    inv_p = 1.0 / prob
    factor_r = tuple(
        jnp.where(refracted, (1.0 - c) * inv_1mp, c * inv_p) for c in f
    )
    return origin, direction, new_inside, factor_r
