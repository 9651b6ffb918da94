"""Wavefront path tracer with path regeneration (flagship perf model).

The reference megakernel gives every pixel a fixed bounce budget per
sample and lets work-items idle after a miss (`break`, prog.cl:375) —
on a lockstep TPU that idling is pure waste: with bounce depth 5 and
mean path length ~3, ~40% of every intersection batch is dead lanes.

This model keeps the machine saturated with PATH REGENERATION: one lane
per pixel, and the moment a lane's path terminates (miss, or bounce
budget reached) it folds the finished sample into that pixel's running
average and immediately starts the next sample of the SAME pixel.
Every intersection batch is 100% live rays; per-pixel sample counts
advance at their own rate (each sample is an unbiased estimate, so
per-pixel averaging stays unbiased).

Crucially this preserves the reference's per-pixel RNG draw ORDER
exactly (gen_ray's two draws, then per-bounce draws, then the next
sample's gen_ray draws — the same sequence the sequential megakernel
produces), so parity mode works here too: a pixel that has accumulated
s samples has bit-identical color to the megakernel at s samples.

Shading math is shared with models/megakernel.py conceptually; the
dispatch is duplicated here because the loop structure (per-step
termination/regeneration instead of per-sample bounce loop) is the
whole point of the model.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.camera import Camera
from opencl_path_tracer_tpu.core.materials import MaterialsSoA
from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.models.megakernel import _draws_parity
from opencl_path_tracer_tpu.ops import bsdf, raygen, rng


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields,
                                     meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class WavefrontState:
    """Accumulation + in-flight path state, one lane per pixel."""

    colors: jnp.ndarray     # (N, 3) running per-pixel average
    samples: jnp.ndarray    # (N,) int32 per-pixel completed samples
    rng_state: jnp.ndarray  # (N,) uint32 Lehmer streams (parity)
    ray_p: jnp.ndarray      # (N, 3) current path ray
    ray_d: jnp.ndarray
    f_l: jnp.ndarray        # (N, 3) throughput factors (prog.cl:307-310)
    f_b: jnp.ndarray
    f_s: jnp.ndarray
    f_r: jnp.ndarray
    cur_color: jnp.ndarray  # (N, 3) current sample's accumulated color
    inside: jnp.ndarray     # (N,) bool refraction state
    bounce: jnp.ndarray     # (N,) int32 bounces done on current path
    step: jnp.ndarray       # () uint32 global step counter (fast RNG)


def init_wavefront(cam: Camera, num_pixels: int, *, seed: int = 1,
                   mode: str = "parity", key=None,
                   ids: jnp.ndarray | None = None) -> WavefrontState:
    """ids: optional pixel-id permutation — pass raygen.tile_major_ids to
    process pixels in square screen tiles (tighter ray-bundle bounds for
    the cluster intersector). Lane j of every state array then belongs
    to pixel ids[j]."""
    n = num_pixels
    if ids is None:
        ids = raygen.pixel_ids_like(n)
    # Lane j serves pixel ids[j]: permute the per-pixel streams so
    # parity mode keeps each pixel's reference Lehmer sequence.
    rng_state = rng.seed_pixel_streams(n, seed)[ids]
    if mode == "parity":
        rng_state, r1, r2 = _draws_parity(
            rng_state, jnp.ones((n,), bool), jnp.ones((n,), bool)
        )
    else:
        u = rng.fast_uniforms(key, 0, 0, (n,), 2)
        r1, r2 = u[:, 0], u[:, 1]
    rays = raygen.camera_rays(cam, ids, r1, r2)
    one = jnp.ones((n, 3), jnp.float32)
    return WavefrontState(
        colors=jnp.zeros((n, 3), jnp.float32),
        samples=jnp.zeros((n,), jnp.int32),
        rng_state=rng_state,
        ray_p=rays.p, ray_d=rays.d,
        f_l=one, f_b=one, f_s=one, f_r=one,
        cur_color=jnp.zeros((n, 3), jnp.float32),
        inside=jnp.zeros((n,), bool),
        bounce=jnp.zeros((n,), jnp.int32),
        step=jnp.uint32(1),
    )


def wavefront_step(cam: Camera, mats: MaterialsSoA, st: WavefrontState,
                   *, intersect_fn, iterations: int,
                   mode: str = "parity", key=None,
                   max_samples: int | None = None,
                   ids: jnp.ndarray | None = None) -> WavefrontState:
    """One wavefront step: intersect every live lane once, shade,
    terminate/regenerate. `ids` must match init_wavefront's."""
    n = st.colors.shape[0]
    if ids is None:
        ids = raygen.pixel_ids_like(n)

    # Lanes past their sample budget idle completely.
    if max_samples is None:
        active = jnp.ones((n,), bool)
    else:
        active = st.samples < max_samples

    hit = intersect_fn(Rays(p=st.ray_p, d=st.ray_d))
    has_hit = hit.valid & active
    mat = mats.take(hit.mati)
    mtype = mat.type

    n_vec = jnp.where(
        (jnp.sum(st.ray_d * hit.n, -1) > 0.0)[:, None], -hit.n, hit.n
    )

    is_diff = has_hit & (mtype == 0)
    is_spec = has_hit & (mtype == 1)
    is_refr = has_hit & (mtype == 2)
    is_emit = has_hit & (mtype == 3)

    # --- bounce draws (2 diffuse/emit, 1 refr; prog.cl:330,349,361) ---
    rng_state = st.rng_state
    if mode == "parity":
        need1 = is_diff | is_emit | is_refr
        need2 = is_diff | is_emit
        rng_state, r1, r2 = _draws_parity(rng_state, need1, need2)
    else:
        u = rng.fast_uniforms(key, st.step, 0, (n,), 2)
        r1, r2 = u[:, 0], u[:, 1]

    diff_p, diff_d = bsdf.diffuse_ray(hit.p, n_vec, r1, r2)
    spec_p, spec_d = bsdf.specular_ray(hit.p, n_vec, st.ray_d)
    refr_p, refr_d, new_inside, refr_fac = bsdf.refractive_ray(
        hit.p, n_vec, st.ray_d, mat.n, mat.f0, st.inside, r1
    )

    # --- factor updates (prog.cl:329-366) ---
    cos_theta = jnp.sum(diff_d * n_vec, -1)
    intens_d = jnp.maximum(0.0, cos_theta)[:, None]
    eye_dir = cam.eye[None, :] - hit.p
    eye_dir = eye_dir / jnp.sqrt(
        jnp.sum(eye_dir * eye_dir, -1, keepdims=True)
    )
    halfway = eye_dir + diff_d
    halfway = halfway / jnp.sqrt(
        jnp.sum(halfway * halfway, -1, keepdims=True)
    )
    intens_s = jnp.power(
        jnp.maximum(0.0, jnp.sum(n_vec * halfway, -1)), mat.shininess
    )[:, None]
    f_l = jnp.where(is_diff[:, None], st.f_l * mat.kd * intens_d, st.f_l)
    f_b = jnp.where(is_diff[:, None], st.f_b * mat.ks * intens_s, st.f_b)

    fres = bsdf.fresnel(mat.f0, n_vec, st.ray_d)
    f_s = jnp.where(is_spec[:, None], st.f_s * fres, st.f_s)
    f_r = jnp.where(is_refr[:, None], st.f_r * refr_fac, st.f_r)
    inside = jnp.where(is_refr, new_inside, st.inside)

    emit_cos = jnp.maximum(
        0.0, jnp.sum(-st.ray_d * n_vec, -1)
    )[:, None]
    contrib = mat.emission * (f_l + f_b) * f_s * f_r * emit_cos
    cur_color = jnp.where(
        is_emit[:, None], st.cur_color + contrib, st.cur_color
    )
    if iterations == 1:  # preview (prog.cl:323-325)
        cur_color = jnp.where(
            has_hit[:, None], mat.kd + mat.emission, cur_color
        )

    use_diff = (is_diff | is_emit)[:, None]
    new_p = jnp.where(use_diff, diff_p,
                      jnp.where(is_refr[:, None], refr_p, spec_p))
    new_d = jnp.where(use_diff, diff_d,
                      jnp.where(is_refr[:, None], refr_d, spec_d))
    ray_p = jnp.where(has_hit[:, None], new_p, st.ray_p)
    ray_d = jnp.where(has_hit[:, None], new_d, st.ray_d)

    bounce = jnp.where(active, st.bounce + 1, st.bounce)
    terminated = active & (~hit.valid | (bounce >= iterations))

    # --- fold finished samples into the running average (prog.cl:379)
    s = st.samples.astype(jnp.float32)[:, None]
    folded = (st.colors * s + cur_color) / (s + 1.0)
    colors = jnp.where(terminated[:, None], folded, st.colors)
    samples = jnp.where(terminated, st.samples + 1, st.samples)

    # --- regenerate: next sample's camera ray (gen_ray, prog.cl:384-389)
    if mode == "parity":
        rng_state, g1, g2 = _draws_parity(
            rng_state, terminated, terminated
        )
    else:
        u = rng.fast_uniforms(key, st.step, 1, (n,), 2)
        g1, g2 = u[:, 0], u[:, 1]
    fresh = raygen.camera_rays(cam, ids, g1, g2)

    t3 = terminated[:, None]
    one = jnp.ones((n, 3), jnp.float32)
    zero = jnp.zeros((n, 3), jnp.float32)
    return WavefrontState(
        colors=colors,
        samples=samples,
        rng_state=rng_state,
        ray_p=jnp.where(t3, fresh.p, ray_p),
        ray_d=jnp.where(t3, fresh.d, ray_d),
        f_l=jnp.where(t3, one, f_l),
        f_b=jnp.where(t3, one, f_b),
        f_s=jnp.where(t3, one, f_s),
        f_r=jnp.where(t3, one, f_r),
        cur_color=jnp.where(t3, zero, cur_color),
        inside=jnp.where(terminated, False, inside),
        bounce=jnp.where(terminated, 0, bounce),
        step=st.step + jnp.uint32(1),
    )


def render_wavefront(cam, mats, *, intersect_fn, num_pixels, iterations,
                     min_spp, mode="parity", seed=1, key=None,
                     max_extra_steps: int = 1_000_000,
                     exact_spp: bool = False) -> WavefrontState:
    """Run wavefront steps until every pixel has >= min_spp samples.

    exact_spp=True caps every pixel at exactly min_spp samples (lanes
    idle once done — use for bit-parity comparisons against the
    megakernel at equal spp)."""
    if mode == "fast" and key is None:
        key = jax.random.key(seed)
    state = init_wavefront(cam, num_pixels, seed=seed, mode=mode,
                           key=key)
    cap = min_spp if exact_spp else None

    step = jax.jit(lambda st: wavefront_step(
        cam, mats, st, intersect_fn=intersect_fn,
        iterations=iterations, mode=mode, key=key, max_samples=cap,
    ))
    # Fixed-size macro-steps between host-side convergence checks.
    chunk = max(iterations * 2, 8)
    for _ in range(max_extra_steps):
        for _ in range(chunk):
            state = step(state)
        if int(jax.device_get(jnp.min(state.samples))) >= min_spp:
            break
    return state
