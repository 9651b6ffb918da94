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

All per-ray quantities are 1-D component arrays (V3 tuples, see
core/types.py — (N, 3) buffers are lane-padded 42x in TPU HBM).

The intersection routine is injected (`intersect_fn`) so the same model
runs brute-force (ops.intersect.first_intersect), BVH-accelerated
(accel.traverse) or Pallas cluster-kernel backends.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.camera import Camera
from opencl_path_tracer_tpu.core.materials import MaterialsSoA
from opencl_path_tracer_tpu.core.types import (
    Hits, Rays, V3, vadd, vdot, vmul, vneg, vnormalize, vscale,
    vwhere,
)
from opencl_path_tracer_tpu.ops import bsdf, raygen, rng

IntersectFn = Callable[[Rays], Hits]


@dataclasses.dataclass(frozen=True)
class EnvLight:
    """Environment light — the reference's dormant miss shading.

    The shipped kernel breaks on a miss with no contribution, but
    carries commented-out sky-light code in the miss branch
    (prog.cl:367-376): a primary-ray miss shows `sky` directly
    (prog.cl:369); a miss on a path with no diffuse bounce yet
    (cntr<=0, prog.cl:370 — cntr counts type-0 bounces only,
    prog.cl:339) tints `sky` by the path throughput
    (factor_L+factor_B)*factor_S*factor_R; a miss after at least one
    diffuse bounce contributes `deep` (white in the dormant code,
    prog.cl:372) times the throughput — an ambient fill. This
    resurrects that code as an opt-in; env=None everywhere keeps
    shipped-kernel parity (miss = plain break).

    Fields are python floats: the light is a static compile-time
    constant. Disabled costs zero (the miss update is not traced);
    toggling or recoloring it retraces. `scale` multiplies `sky`
    (the literal `*1` at prog.cl:369)."""

    sky: tuple = (0.0, 0.75, 2.0)   # prog.cl:369,371 constant
    deep: tuple = (1.0, 1.0, 1.0)   # prog.cl:373 constant
    scale: float = 1.0              # prog.cl:369 intensity


def env_miss_update(env: EnvLight, miss_now, is_primary, had_diffuse,
                    f_l: V3, f_b: V3, f_s: V3, f_r: V3, color: V3) -> V3:
    """Fold the dormant-code miss contribution (prog.cl:367-376) into
    `color`. miss_now: lanes whose LIVE path missed this bounce — they
    die immediately after, so each path contributes at most once.
    is_primary: bounce index == 0 (scalar in the megakernel, per-lane
    in the wavefront model). had_diffuse: per-lane cntr>0 equivalent."""
    # f32 * f32 like the oracle/kernel would fold it (not python f64).
    sky = tuple(jnp.float32(c) * jnp.float32(env.scale)
                for c in env.sky)
    deep = tuple(jnp.float32(c) for c in env.deep)
    # Left-associated like the reference expression
    # `tint*(factor_L+factor_B)*factor_S*factor_R` (prog.cl:371,373)
    # so parity mode stays bit-comparable to the scalar oracle.
    tint = vwhere(had_diffuse, deep, sky)
    tinted = vmul(vmul(vmul(tint, vadd(f_l, f_b)), f_s), f_r)
    contrib = vwhere(is_primary, sky, tinted)
    return vwhere(miss_now, vadd(color, contrib), color)


def fetch_material(mats: MaterialsSoA, intersect_fn, rays: Rays):
    """Intersect + per-lane material fetch, shared by both models.

    An intersect_fn may return plain Hits, or (Hits, kd_scale) where
    kd_scale is a V3 of per-lane diffuse multipliers (the textured
    path, runtime.engine.make_intersect_fn(textured=True) — image
    textures modulate kd, core/textures.py). The tuple shape is
    static, so the branch resolves at trace time."""
    res = intersect_fn(rays)
    if isinstance(res, tuple):
        hit, kd_mod = res
        mat = mats.take_select(hit.mati)
        mat = dataclasses.replace(mat, kd=vmul(mat.kd, kd_mod))
    else:
        hit = res
        mat = mats.take_select(hit.mati)
    return hit, mat


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class TraceState:
    """Per-sample accumulation state (the reference's device buffers:
    colors (prog.cl:379), per-pixel RNG seeds (main.cpp:522-527), and the
    sample counter). colors: V3 of (N,)."""

    colors: V3
    rng_state: jnp.ndarray       # (N,) uint32 Lehmer states (parity mode)
    sample: jnp.ndarray          # () int32 current_sample


def init_state(num_pixels: int, seed: int = 1,
               ids: jnp.ndarray | None = None) -> TraceState:
    """ids: optional pixel permutation (lane j serves pixel ids[j]);
    parity RNG streams are permuted to match."""
    streams = rng.seed_pixel_streams(num_pixels, seed)
    if ids is not None:
        streams = streams[ids]
    z = jnp.zeros((num_pixels,), jnp.float32)
    return TraceState(
        colors=(z, z, z),
        rng_state=streams,
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


def shade(cam: Camera, mat: MaterialsSoA, hit: Hits, ray_p: V3,
          ray_d: V3, inside, r1, r2, has_hit):
    """One bounce of the reference dispatch (prog.cl:326-366), all
    branches computed and selected. `mat` is the per-ray material fetch
    (mats.take_select(hit.mati)). Returns a dict of updates shared by
    the megakernel and wavefront models."""
    mtype = mat.type

    # Flip normal toward the incoming ray (prog.cl:326-328).
    n_vec = vwhere(vdot(ray_d, hit.n) > 0.0, vneg(hit.n), hit.n)

    is_diff = has_hit & (mtype == 0)
    is_spec = has_hit & (mtype == 1)
    is_refr = has_hit & (mtype == 2)
    is_emit = has_hit & (mtype == 3)

    # Candidate bounces (diffuse result shared by emitter,
    # prog.cl:330 and :361 both call new_ray_diffuse).
    diff_p, diff_d = bsdf.diffuse_ray(hit.p, n_vec, r1, r2)
    spec_p, spec_d = bsdf.specular_ray(hit.p, n_vec, ray_d)
    refr_p, refr_d, new_inside, refr_fac = bsdf.refractive_ray(
        hit.p, n_vec, ray_d, mat.n, mat.f0, inside, r1
    )

    # Diffuse: Lambert + Blinn with the *camera* view direction
    # (camera_view_dir, prog.cl:79-81, used at :335).
    cos_theta = vdot(diff_d, n_vec)
    intens_d = jnp.maximum(0.0, cos_theta)
    eye_dir = vnormalize(tuple(cam.eye[k] - hit.p[k] for k in range(3)))
    halfway = vnormalize(vadd(eye_dir, diff_d))
    intens_s = jnp.power(
        jnp.maximum(0.0, vdot(n_vec, halfway)), mat.shininess
    )

    fres = bsdf.fresnel(mat.f0, n_vec, ray_d)
    emit_cos = jnp.maximum(0.0, vdot(vneg(ray_d), n_vec))

    use_diff = is_diff | is_emit
    new_p = vwhere(use_diff, diff_p, vwhere(is_refr, refr_p, spec_p))
    new_d = vwhere(use_diff, diff_d, vwhere(is_refr, refr_d, spec_d))

    return dict(
        mat=mat, n_vec=n_vec,
        is_diff=is_diff, is_spec=is_spec, is_refr=is_refr,
        is_emit=is_emit,
        intens_d=intens_d, intens_s=intens_s, fres=fres,
        refr_fac=refr_fac, new_inside=new_inside, emit_cos=emit_cos,
        new_p=vwhere(has_hit, new_p, ray_p),
        new_d=vwhere(has_hit, new_d, ray_d),
    )


def apply_factors(s, f_l: V3, f_b: V3, f_s: V3, f_r: V3, inside, color: V3,
                  emit_mask=None, emit_scale=None):
    """Factor updates + emitter contribution (prog.cl:329-366).

    emit_mask: optional override of the emitter-pickup lanes.
    emit_scale: optional per-lane pickup multiplier — NEE passes the
    MIS balance weight (ops.nee.pickup_mis_weight) so the emitter hit
    after a diffuse bounce shares the direct-light term with the
    explicit gather instead of double-counting it; None keeps
    reference behavior (every emitter hit contributes fully)."""
    mat = s["mat"]
    f_l = vwhere(
        s["is_diff"], vmul(f_l, vscale(mat.kd, s["intens_d"])), f_l
    )
    f_b = vwhere(
        s["is_diff"], vmul(f_b, vscale(mat.ks, s["intens_s"])), f_b
    )
    f_s = vwhere(s["is_spec"], vmul(f_s, s["fres"]), f_s)
    f_r = vwhere(s["is_refr"], vmul(f_r, s["refr_fac"]), f_r)
    inside = jnp.where(s["is_refr"], s["new_inside"], inside)

    contrib = vscale(
        vmul(mat.emission, vmul(vadd(f_l, f_b), vmul(f_s, f_r))),
        s["emit_cos"],
    )
    if emit_scale is not None:
        contrib = vscale(contrib, emit_scale)
    if emit_mask is None:
        emit_mask = s["is_emit"]
    color = vwhere(emit_mask, vadd(color, contrib), color)
    return f_l, f_b, f_s, f_r, inside, color


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
    env=None,  # EnvLight | ops.envmap.EnvMap | None
    nee=None,
    qmc: bool = False,
    dof: tuple[float, float] | None = None,
    occluded_fn=None,
):
    """Render ONE progressive sample for every pixel and fold it into the
    running average (prog.cl:379). `iterations` is the bounce depth
    (static, like the kernel arg at main.cpp:657).

    ids: optional (N,) global linear pixel ids — pass when this call
    renders a tile of a larger framebuffer or uses a tile-major pixel
    permutation. sample_index: optional override of the sample counter
    for fast-mode RNG decorrelation (multi-chip sample sharding).
    env: optional EnvLight (the reference's dormant sky-light code,
    prog.cl:367-376) or ops.envmap.EnvMap (equirect radiance image;
    env.nee=True adds an importance-sampled environment gather per
    diffuse vertex, MIS-split with the miss pickup); None = shipped
    parity.
    nee: optional ops.nee.EmitterTable — gather direct light at every
    diffuse vertex via one shadow ray; gather and the next bounce's
    emitter pickup split the term by MIS balance weights (ops/nee.py)
    so the converged image is unchanged at far lower variance (~2x
    intersect cost per bounce). NEE draws come from an independent
    counter-hash stream, so parity mode's per-lane Lehmer streams
    still match the reference bit for bit.
    """
    n = state.rng_state.shape[0]
    if ids is None:
        ids = raygen.pixel_ids_like(n)
    s_idx = state.sample if sample_index is None else sample_index
    if nee is not None:
        from opencl_path_tracer_tpu.ops import nee as nee_mod
        base_key = key if key is not None else jax.random.key(1791)
        nee_key = jax.random.fold_in(
            base_key, ids[0].astype(jnp.uint32)
        )
    from opencl_path_tracer_tpu.ops.envmap import EnvMap
    env_is_map = isinstance(env, EnvMap)
    if env_is_map:
        from opencl_path_tracer_tpu.ops import envmap as envmap_mod
        if env.nee:
            ebase = key if key is not None else jax.random.key(3791)
            env_key = jax.random.fold_in(
                ebase, ids[0].astype(jnp.uint32)
            )

    # --- gen_ray (prog.cl:384-389): two unconditional draws per pixel.
    if mode == "parity":
        rng_state, r1, r2 = _draws_parity(
            state.rng_state,
            jnp.ones((n,), bool),
            jnp.ones((n,), bool),
        )
    else:
        tile_key = jax.random.fold_in(key, ids[0].astype(jnp.uint32))
        if qmc:
            # Low-discrepancy pixel jitter (rng.r2_jitter): each
            # pixel's sample sequence is an R2 point set — O(1/N)
            # footprint coverage where the hash engine gives
            # O(1/sqrt(N)). Keyed on GLOBAL pixel id, so tiling and
            # sharding cannot change any pixel's sequence.
            r1, r2 = rng.r2_jitter(key, ids, s_idx)
        else:
            u = rng.fast_uniforms(tile_key, s_idx, 0, (n,), 2)
            r1, r2 = u[0], u[1]
        rng_state = state.rng_state
    if dof is not None:
        # Thin-lens primary rays (raygen.camera_rays_dof). Lens draws
        # ride the independent counter-hash stream so parity mode's
        # Lehmer sequences stay reference-exact.
        dof_key = jax.random.fold_in(
            key if key is not None else jax.random.key(401),
            ids[0].astype(jnp.uint32))
        # Salt 20_000: the bounce draws use salts 1..iterations
        # (<= max_iterations 50) and NEE uses 10_000+b — the lens
        # draws must not collide with either.
        lu = rng.fast_uniforms(dof_key, s_idx, 20_000, (n,), 2)
        rays = raygen.camera_rays_dof(cam, ids, r1, r2, lu[0], lu[1],
                                      dof[0], dof[1])
    else:
        rays = raygen.camera_rays(cam, ids, r1, r2)

    ones = tuple(jnp.ones((n,), jnp.float32) for _ in range(3))
    zeros = tuple(jnp.zeros((n,), jnp.float32) for _ in range(3))

    def body(b, carry):
        (ray_p, ray_d, rng_state, f_l, f_b, f_s, f_r,
         color, alive, inside, had_diffuse, prev_pdf,
         rays_traced) = carry
        # The PREVIOUS bounce's direction pdf — the env miss pickup
        # below weights against this, not this vertex's update.
        prev_pdf_prev = prev_pdf

        rays_traced = rays_traced + jnp.sum(alive.astype(jnp.float32))
        hit, mat = fetch_material(mats, intersect_fn,
                                  Rays(p=ray_p, d=ray_d))
        has_hit = hit.valid & alive

        # RNG draws: diffuse/emitter take 2, refractive takes 1
        # (prog.cl:330, :349, :361).
        mtype = mat.type
        is_d_or_e = has_hit & ((mtype == 0) | (mtype == 3))
        if mode == "parity":
            need1 = is_d_or_e | (has_hit & (mtype == 2))
            rng_state, r1, r2 = _draws_parity(
                rng_state, need1, is_d_or_e
            )
        else:
            u = rng.fast_uniforms(tile_key, s_idx, b + 1, (n,), 2)
            r1, r2 = u[0], u[1]

        s = shade(cam, mat, hit, ray_p, ray_d, inside, r1, r2, has_hit)

        # Preview mode (prog.cl:323-325): iterations==1 -> flat shading.
        if iterations == 1:
            color = vwhere(
                has_hit, vadd(s["mat"].kd, s["mat"].emission), color
            )

        if nee is not None:
            # Direct-light gather at this bounce's diffuse vertices,
            # gated on the path SURVIVING to the next intersect
            # (b < iterations-1) so truncation matches the base
            # estimator exactly; gather and the next bounce's pickup
            # split the term by MIS balance weights (ops/nee.py) —
            # prev_pdf carries the previous diffuse bounce's
            # direction pdf for the pickup side.
            u = rng.fast_uniforms(nee_key, s_idx, 10_000 + b, (n,), 3)
            gather = s["is_diff"] & (b < iterations - 1)
            color = vadd(color, nee_mod.direct_light(
                nee, intersect_fn=intersect_fn, cam_eye=cam.eye,
                hit_p=hit.p, n_vec=s["n_vec"], mat=mat,
                f_l=f_l, f_b=f_b, f_s=f_s, f_r=f_r,
                is_diff=gather, u1=u[0], u2=u[1], u3=u[2],
                occluded_fn=occluded_fn,
            ))
            rays_traced = rays_traced + jnp.sum(
                alive.astype(jnp.float32)
            )  # the shadow ray batch
            emit_scale = nee_mod.pickup_mis_weight(
                nee, prev_pdf, s["emit_cos"], hit.t, mat.emission,
                mati=hit.mati, hit_p=hit.p, ray_p=ray_p,
            )
            prev_pdf = jnp.where(
                s["is_diff"],
                s["intens_d"] * jnp.float32(1.0 / np.pi),
                0.0,
            )
        else:
            emit_scale = None
            if env_is_map and env.nee:
                # env NEE alone still needs the pickup-side pdf.
                prev_pdf = jnp.where(
                    s["is_diff"],
                    s["intens_d"] * jnp.float32(1.0 / np.pi),
                    0.0,
                )

        if env_is_map and env.nee:
            # Environment gather at this bounce's diffuse vertices —
            # same survival gating and MIS split as the emitter
            # gather, in solid-angle measure (ops/envmap.py). Salt
            # 30_000+b: bounce draws use 1..50, NEE 10_000+b, lens
            # 20_000.
            u = rng.fast_uniforms(env_key, s_idx, 30_000 + b, (n,), 3)
            gather = s["is_diff"] & (b < iterations - 1)
            color = vadd(color, envmap_mod.direct_light_env(
                env, intersect_fn=intersect_fn, cam_eye=cam.eye,
                hit_p=hit.p, n_vec=s["n_vec"], mat=mat,
                f_l=f_l, f_b=f_b, f_s=f_s, f_r=f_r,
                is_diff=gather, u1=u[0], u2=u[1], u3=u[2],
                occluded_fn=occluded_fn,
            ))
            rays_traced = rays_traced + jnp.sum(
                alive.astype(jnp.float32)
            )  # the environment shadow-ray batch

        f_l, f_b, f_s, f_r, inside, color = apply_factors(
            s, f_l, f_b, f_s, f_r, inside, color,
            emit_scale=emit_scale,
        )

        # Miss -> break (prog.cl:367-376): lane goes dead. With an
        # EnvLight, the dying lane first collects the dormant-code sky
        # contribution (cntr there counts diffuse bounces, prog.cl:339).
        if env_is_map:
            color = envmap_mod.envmap_miss_update(
                env, alive & ~hit.valid, b == 0, prev_pdf_prev,
                f_l, f_b, f_s, f_r, ray_d, color,
            )
        elif env is not None:
            color = env_miss_update(
                env, alive & ~hit.valid, b == 0, had_diffuse,
                f_l, f_b, f_s, f_r, color,
            )
            had_diffuse = had_diffuse | s["is_diff"]
        # env=None: had_diffuse stays the untouched zeros carry (free).
        alive = has_hit
        return (s["new_p"], s["new_d"], rng_state, f_l, f_b, f_s, f_r,
                color, alive, inside, had_diffuse, prev_pdf,
                rays_traced)

    carry = (
        rays.p, rays.d, rng_state,
        ones, ones, ones, ones,
        zeros,
        jnp.ones((n,), bool),
        jnp.zeros((n,), bool),
        jnp.zeros((n,), bool),
        jnp.zeros((n,), jnp.float32),
        jnp.float32(0.0),
    )
    carry = jax.lax.fori_loop(0, iterations, body, carry, unroll=False)
    rng_state, color = carry[2], carry[7]

    # Progressive average (prog.cl:379). current_sample==0 overwrites
    # (prog.cl:312-314 zeroes first, same result).
    s_f = state.sample.astype(jnp.float32)
    inv = 1.0 / (s_f + 1.0)
    colors = tuple(
        (state.colors[k] * s_f + color[k]) * inv for k in range(3)
    )
    new_state = TraceState(
        colors=colors, rng_state=rng_state, sample=state.sample + 1
    )
    if with_stats:
        # Rays actually traced this sample: live lanes at each bounce
        # (the derived rays/sec metric of BASELINE.md).
        return new_state, {"rays_traced": carry[-1]}
    return new_state


def make_sample_step(cam, mats, *, intersect_fn, iterations, mode="parity",
                     key=None, env=None, nee=None,
                     qmc: bool = False, dof=None):
    """A jitted state -> state progressive step (one sample/pixel)."""
    @jax.jit
    def step(state: TraceState) -> TraceState:
        return trace_sample(
            cam, mats, state,
            intersect_fn=intersect_fn, iterations=iterations,
            mode=mode, key=key, env=env, nee=nee, qmc=qmc, dof=dof,
        )
    return step


def render(cam, mats, *, intersect_fn, num_pixels, iterations, spp,
           mode="parity", seed=1, key=None,
           state: TraceState | None = None,
           env=None, nee=None,
           qmc: bool = False, dof=None) -> TraceState:
    """Accumulate `spp` progressive samples (the onIdle loop,
    main.cpp:1171-1241, minus interactivity)."""
    if state is None:
        state = init_state(num_pixels, seed)
    if mode == "fast" and key is None:
        key = jax.random.key(seed)
    step = make_sample_step(
        cam, mats, intersect_fn=intersect_fn, iterations=iterations,
        mode=mode, key=key, env=env, nee=nee, qmc=qmc, dof=dof,
    )
    for _ in range(spp):
        state = step(state)
    return state


def colors_array(state: TraceState):
    """(N, 3) numpy-convertible color array (API edge only)."""
    return jnp.stack(state.colors, axis=-1)
