"""Megakernel-style progressive path tracer (reference-parity model).

Reimplements the trace_ray megakernel (prog.cl:292-381) + gen_ray
(prog.cl:384-389) as one jitted function over the whole pixel batch.
Where the reference runs one work-item per pixel with data-dependent
branching and an early `break` on miss, this model runs every lane in
lockstep through a `lax.fori_loop` over bounces with:

  * an `alive` mask instead of break (miss kills the lane, prog.cl:367-376),
  * select over the four material branches (prog.cl:329-366),
  * conditional RNG stepping so each lane's Lehmer stream advances by
    exactly the number of draws the reference would make (2 for diffuse
    and emitter, 1 for refractive, 0 for specular/miss) — this is what
    makes converged images bit-comparable.

The intersection routine is injected (`intersect_fn`) so the same model
runs brute-force (ops.intersect.first_intersect) or BVH-accelerated
(accel.traverse) or Pallas-kernel backends.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.camera import Camera
from opencl_path_tracer_tpu.core.materials import MaterialsSoA
from opencl_path_tracer_tpu.core.types import Hits, Rays
from opencl_path_tracer_tpu.ops import bsdf, raygen, rng

IntersectFn = Callable[[Rays], Hits]


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class TraceState:
    """Per-sample accumulation state (the reference's device buffers:
    colors (prog.cl:379), per-pixel RNG seeds (main.cpp:522-527), and the
    sample counter)."""

    colors: jnp.ndarray          # (N, 3) running average
    rng_state: jnp.ndarray       # (N,) uint32 Lehmer states (parity mode)
    sample: jnp.ndarray          # () int32 current_sample


def init_state(num_pixels: int, seed: int = 1) -> TraceState:
    return TraceState(
        colors=jnp.zeros((num_pixels, 3), jnp.float32),
        rng_state=rng.seed_pixel_streams(num_pixels, seed),
        sample=jnp.int32(0),
    )


def _draws_parity(state, need1, need2):
    """Advance each lane's Lehmer stream by 0, 1 or 2 steps.

    need1: lane draws at least one rnd; need2: lane draws two.
    Returns (new_state, r1, r2). Dead lanes keep their state untouched,
    exactly like a broken-out work-item in the reference.
    """
    s1, u1 = rng.lehmer_step(state)
    state1 = jnp.where(need1, s1, state)
    s2, u2 = rng.lehmer_step(state1)
    state2 = jnp.where(need2, s2, state1)
    return state2, u1, u2


def trace_sample(
    cam: Camera,
    mats: MaterialsSoA,
    state: TraceState,
    *,
    intersect_fn: IntersectFn,
    iterations: int,
    mode: str = "parity",
    key: jax.Array | None = None,
    ids: jnp.ndarray | None = None,
    sample_index: jnp.ndarray | None = None,
    with_stats: bool = False,
) -> TraceState:
    """Render ONE progressive sample for every pixel and fold it into the
    running average (prog.cl:379). `iterations` is the bounce depth
    (static, like the kernel arg at main.cpp:657).

    ids: optional (N,) global linear pixel ids — pass when this call
    renders a *tile* of a larger framebuffer (multi-chip sharding).
    sample_index: optional override of the sample counter used for fast-
    mode RNG decorrelation (multi-chip sample sharding renders sample
    s_dev = axis_index + i * n_dev on each chip).
    """
    n = state.colors.shape[0]
    if ids is None:
        ids = raygen.pixel_ids_like(n)
    s_idx = state.sample if sample_index is None else sample_index

    # --- gen_ray (prog.cl:384-389): two unconditional draws per pixel.
    if mode == "parity":
        rng_state, r1, r2 = _draws_parity(
            state.rng_state,
            jnp.ones((n,), bool),
            jnp.ones((n,), bool),
        )
    else:
        tile_key = jax.random.fold_in(key, ids[0].astype(jnp.uint32))
        u = rng.fast_uniforms(tile_key, s_idx, 0, (n,), 2)
        r1, r2 = u[:, 0], u[:, 1]
        rng_state = state.rng_state
    rays = raygen.camera_rays(cam, ids, r1, r2)

    factor_one = jnp.ones((n, 3), jnp.float32)

    def body(b, carry):
        (ray_p, ray_d, rng_state, f_l, f_b, f_s, f_r,
         color, alive, inside, rays_traced) = carry

        rays_traced = rays_traced + jnp.sum(alive.astype(jnp.float32))
        hit = intersect_fn(Rays(p=ray_p, d=ray_d))
        has_hit = hit.valid & alive
        mat = mats.take(hit.mati)
        mtype = mat.type

        # Preview mode (prog.cl:323-325): iterations==1 -> flat shading.
        if iterations == 1:
            color = jnp.where(
                has_hit[:, None], mat.kd + mat.emission, color
            )

        # Flip normal toward the incoming ray (prog.cl:326-328).
        n_vec = jnp.where(
            (jnp.sum(ray_d * hit.n, -1) > 0.0)[:, None], -hit.n, hit.n
        )

        is_diff = has_hit & (mtype == 0)
        is_spec = has_hit & (mtype == 1)
        is_refr = has_hit & (mtype == 2)
        is_emit = has_hit & (mtype == 3)

        # RNG draws: diffuse/emitter take 2, refractive takes 1
        # (prog.cl:330, :349, :361).
        if mode == "parity":
            need1 = is_diff | is_emit | is_refr
            need2 = is_diff | is_emit
            rng_state, r1, r2 = _draws_parity(rng_state, need1, need2)
        else:
            u = rng.fast_uniforms(tile_key, s_idx, b + 1, (n,), 2)
            r1, r2 = u[:, 0], u[:, 1]

        # Candidate bounces (diffuse result shared by emitter,
        # prog.cl:330 and :361 both call new_ray_diffuse).
        diff_p, diff_d = bsdf.diffuse_ray(hit.p, n_vec, r1, r2)
        spec_p, spec_d = bsdf.specular_ray(hit.p, n_vec, ray_d)
        refr_p, refr_d, new_inside, refr_fac = bsdf.refractive_ray(
            hit.p, n_vec, ray_d, mat.n, mat.f0, inside, r1
        )

        # --- factor updates (prog.cl:329-366) ---
        # Diffuse: Lambert + Blinn with the *camera* view direction
        # (camera_view_dir, prog.cl:79-81, used at :335).
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
        cos_delta = jnp.sum(n_vec * halfway, -1)
        intens_s = jnp.power(
            jnp.maximum(0.0, cos_delta), mat.shininess
        )[:, None]
        f_l = jnp.where(is_diff[:, None], f_l * mat.kd * intens_d, f_l)
        f_b = jnp.where(is_diff[:, None], f_b * mat.ks * intens_s, f_b)

        # Specular conductor (prog.cl:341-345).
        fres = bsdf.fresnel(mat.f0, n_vec, ray_d)
        f_s = jnp.where(is_spec[:, None], f_s * fres, f_s)

        # Refractive Russian roulette compensation (prog.cl:346-357).
        f_r = jnp.where(is_refr[:, None], f_r * refr_fac, f_r)
        inside = jnp.where(is_refr, new_inside, inside)

        # Emitter (prog.cl:358-366): cos against the *old* ray direction.
        emit_cos = jnp.maximum(0.0, jnp.sum(-ray_d * n_vec, -1))[:, None]
        contrib = mat.emission * (f_l + f_b) * f_s * f_r * emit_cos
        color = jnp.where(is_emit[:, None], color + contrib, color)

        # Next ray: diffuse for types 0 and 3, mirror for 1, refr for 2.
        use_diff = (is_diff | is_emit)[:, None]
        new_p = jnp.where(use_diff, diff_p,
                          jnp.where(is_refr[:, None], refr_p, spec_p))
        new_d = jnp.where(use_diff, diff_d,
                          jnp.where(is_refr[:, None], refr_d, spec_d))
        ray_p = jnp.where(has_hit[:, None], new_p, ray_p)
        ray_d = jnp.where(has_hit[:, None], new_d, ray_d)

        # Miss -> break (prog.cl:367-376): lane goes dead.
        alive = has_hit
        return (ray_p, ray_d, rng_state, f_l, f_b, f_s, f_r,
                color, alive, inside, rays_traced)

    carry = (
        rays.p, rays.d, rng_state,
        factor_one, factor_one, factor_one, factor_one,
        jnp.zeros((n, 3), jnp.float32),
        jnp.ones((n,), bool),
        jnp.zeros((n,), bool),
        jnp.float32(0.0),
    )
    carry = jax.lax.fori_loop(0, iterations, body, carry, unroll=False)
    rng_state, color = carry[2], carry[7]

    # Progressive average (prog.cl:379). current_sample==0 overwrites
    # (prog.cl:312-314 zeroes first, same result).
    s = state.sample.astype(jnp.float32)
    colors = (state.colors * s + color) / (s + 1.0)
    new_state = TraceState(
        colors=colors, rng_state=rng_state, sample=state.sample + 1
    )
    if with_stats:
        # rays actually traced this sample: live lanes at each bounce
        # (the derived rays/sec metric of BASELINE.md).
        return new_state, {"rays_traced": carry[10]}
    return new_state


def make_sample_step(cam, mats, *, intersect_fn, iterations, mode="parity",
                     key=None):
    """A jitted state -> state progressive step (one sample/pixel)."""
    @jax.jit
    def step(state: TraceState) -> TraceState:
        return trace_sample(
            cam, mats, state,
            intersect_fn=intersect_fn, iterations=iterations,
            mode=mode, key=key,
        )
    return step


def render(cam, mats, *, intersect_fn, num_pixels, iterations, spp,
           mode="parity", seed=1, key=None,
           state: TraceState | None = None) -> TraceState:
    """Accumulate `spp` progressive samples (the onIdle loop,
    main.cpp:1171-1241, minus interactivity)."""
    if state is None:
        state = init_state(num_pixels, seed)
    if mode == "fast" and key is None:
        key = jax.random.key(seed)
    step = make_sample_step(
        cam, mats, intersect_fn=intersect_fn, iterations=iterations,
        mode=mode, key=key,
    )
    for _ in range(spp):
        state = step(state)
    return state
