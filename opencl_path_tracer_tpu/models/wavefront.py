"""Wavefront path tracer with path regeneration (flagship perf model).

The reference megakernel gives every pixel a fixed bounce budget per
sample and lets work-items idle after a miss (`break`, prog.cl:375) —
on a lockstep TPU that idling is wasted lanes whenever mean path
length < budget. (Measured caveat, docs/BENCHMARKS.md "Engine model
A/B": on the reference's OWN scenes the reference's termination rules
— miss-only death, emitter-continues, roulette compensation — push
mean path length to ~the budget, so regeneration reclaims little
there; its standing wins are steady-state progressive throughput with
no end-of-render tail, lane-local sharding, and exact-spp capping.)

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
(One deliberate lookahead: when a lane hits a sample cap it has already
drawn the next sample's two gen_ray jitters.)

Shading math is shared with models/megakernel.py (shade/apply_factors);
this module owns the regeneration scheduling. State is V3 component
arrays throughout (core/types.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.camera import Camera
from opencl_path_tracer_tpu.core.materials import MaterialsSoA
from opencl_path_tracer_tpu.core.types import (
    Rays, V3, vadd, vscale, vwhere,
)
from opencl_path_tracer_tpu.models.megakernel import (
    _draws_parity, apply_factors, fetch_material, shade,
)
from opencl_path_tracer_tpu.ops import raygen, rng


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields,
                                     meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class WavefrontState:
    """Accumulation + in-flight path state, one lane per pixel.
    All V3 fields are tuples of (N,) arrays."""

    colors: V3              # running per-pixel average
    samples: jnp.ndarray    # (N,) int32 per-pixel completed samples
    pixel: jnp.ndarray      # (N,) int32 pixel id this lane serves
    rng_state: jnp.ndarray  # (N,) uint32 Lehmer streams (parity)
    ray_p: V3               # current path ray
    ray_d: V3
    f_l: V3                 # throughput factors (prog.cl:307-310)
    f_b: V3
    f_s: V3
    f_r: V3
    cur_color: V3           # current sample's accumulated color
    inside: jnp.ndarray     # (N,) bool refraction state
    bounce: jnp.ndarray     # (N,) int32 bounces done on current path
    # (N,) bool: path has had a diffuse bounce (the reference's cntr>0,
    # prog.cl:316,339 — only consumed by the optional EnvLight's miss
    # tiers, megakernel.env_miss_update).
    had_diffuse: jnp.ndarray
    # (N,) f32: the PREVIOUS bounce's diffuse direction pdf (cos/pi;
    # 0 = previous bounce was not diffuse) — NEE's MIS bookkeeping
    # (ops.nee.pickup_mis_weight: the emitter hit after a diffuse
    # bounce shares the direct-light term with the explicit gather).
    # Identity pass-through when nee is None.
    prev_pdf: jnp.ndarray
    # (N,) f32: Welford M2 of completed-sample LUMINANCE per pixel —
    # per-pixel variance for adaptive sampling (sample variance =
    # m2/(samples-1)). Updated only when a step runs with
    # variance_tol set; identity pass-through otherwise (same
    # zero-cost discipline as had_diffuse).
    lum_m2: jnp.ndarray
    step: jnp.ndarray       # () uint32 global step counter (fast RNG)


def init_wavefront(cam: Camera, num_pixels: int, *, seed: int = 1,
                   mode: str = "parity", key=None,
                   ids: jnp.ndarray | None = None,
                   qmc: bool = False, dof=None) -> WavefrontState:
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
    elif qmc:
        r1, r2 = rng.r2_jitter(key, ids, 0)
    else:
        u = rng.fast_uniforms(key, 0, 0, (n,), 2)
        r1, r2 = u[0], u[1]
    if dof is not None:
        dkey = key if key is not None else jax.random.key(401)
        lu = rng.fast_uniforms(dkey, 0, 4, (n,), 2)
        rays = raygen.camera_rays_dof(cam, ids, r1, r2, lu[0], lu[1],
                                      dof[0], dof[1])
    else:
        rays = raygen.camera_rays(cam, ids, r1, r2)
    ones = tuple(jnp.ones((n,), jnp.float32) for _ in range(3))
    zeros = tuple(jnp.zeros((n,), jnp.float32) for _ in range(3))
    return WavefrontState(
        colors=zeros,
        samples=jnp.zeros((n,), jnp.int32),
        pixel=jnp.asarray(ids, jnp.int32),
        rng_state=rng_state,
        ray_p=rays.p, ray_d=rays.d,
        f_l=ones, f_b=ones, f_s=ones, f_r=ones,
        cur_color=zeros,
        inside=jnp.zeros((n,), bool),
        bounce=jnp.zeros((n,), jnp.int32),
        had_diffuse=jnp.zeros((n,), bool),
        prev_pdf=jnp.zeros((n,), jnp.float32),
        lum_m2=jnp.zeros((n,), jnp.float32),
        step=jnp.uint32(1),
    )


def sort_state(st: WavefrontState,
               scene_lo, scene_inv_extent) -> WavefrontState:
    """Reorder lanes by (direction octant, origin Morton cell) so ray
    tiles stay spatially coherent for the cluster intersector's per-tile
    culling. Correct for any lane order because every lane carries its
    pixel binding (st.pixel) and its own accumulators. scene_lo /
    scene_inv_extent: python/np 3-vectors of the scene bounds."""
    from opencl_path_tracer_tpu.accel.lbvh import morton3

    q = tuple(
        jnp.clip((st.ray_p[k] - scene_lo[k]) * scene_inv_extent[k],
                 0.0, 1.0)
        for k in range(3)
    )
    cell = morton3_components(q)
    octant = (
        (st.ray_d[0] >= 0).astype(jnp.uint32) * jnp.uint32(4)
        + (st.ray_d[1] >= 0).astype(jnp.uint32) * jnp.uint32(2)
        + (st.ray_d[2] >= 0).astype(jnp.uint32)
    )
    key = (octant << jnp.uint32(27)) | (cell >> jnp.uint32(3))

    leaves, treedef = jax.tree.flatten(st)
    vec_idx = [i for i, a in enumerate(leaves) if a.ndim != 0]
    # Chunked 2-key sorts: XLA:TPU variadic-sort compile time is
    # superlinear in operand count (8 payloads ~40 s, 27+ hangs —
    # docs/BENCHMARKS.md round 3). The (key, iota) compound key is a
    # total order, so every chunk computes the identical permutation
    # (= the stable-by-key one).
    iota = jnp.arange(st.samples.shape[0], dtype=jnp.int32)
    CHUNK = 13
    for i0 in range(0, len(vec_idx), CHUNK):
        grp = vec_idx[i0:i0 + CHUNK]
        sorted_ops = jax.lax.sort(
            [key, iota] + [leaves[i] for i in grp], dimension=0,
            num_keys=2, is_stable=False,
        )
        for j, i in enumerate(grp):
            leaves[i] = sorted_ops[2 + j]
    return jax.tree.unflatten(treedef, leaves)


def morton3_components(q) -> jnp.ndarray:
    """30-bit Morton code from a V3 of normalized coords (lbvh.morton3
    takes an (N, 3) array; this is the component-array twin)."""
    from opencl_path_tracer_tpu.accel.lbvh import _expand_bits

    def scale(c):
        return jnp.clip(c * 1024.0, 0.0, 1023.0).astype(jnp.uint32)

    return (
        (_expand_bits(scale(q[0])) << jnp.uint32(2))
        | (_expand_bits(scale(q[1])) << jnp.uint32(1))
        | _expand_bits(scale(q[2]))
    )


_LUM = (0.2126, 0.7152, 0.0722)  # Reinhard's weights (prog.cl:249)


def _luminance(v3: V3) -> jnp.ndarray:
    return _LUM[0] * v3[0] + _LUM[1] * v3[1] + _LUM[2] * v3[2]


def converged_mask(samples, colors: V3, lum_m2,
                   tol: float, min_samples: int):
    """Adaptive-sampling stop rule, per pixel: the standard error of
    the mean sample luminance is within `tol` relative to the mean
    (0.05 absolute luminance floor so near-black pixels can stop).
    sem^2 = m2 / (n (n-1)); compared multiplied out (no divisions).
    Pixels below min_samples never count as converged."""
    n = samples.astype(jnp.float32)
    mean_lum = _luminance(colors)
    rhs = (tol * (mean_lum + 0.05)) ** 2 * n * (n - 1.0)
    return (samples >= min_samples) & (lum_m2 <= rhs)


def wavefront_step(cam: Camera, mats: MaterialsSoA, st: WavefrontState,
                   *, intersect_fn, iterations: int,
                   mode: str = "parity", key=None,
                   max_samples: int | None = None,
                   ids: jnp.ndarray | None = None,
                   sort_every: int = 0,
                   scene_bounds=None, env=None, nee=None,
                   rr: tuple[int, float] | None = None,
                   qmc: bool = False, dof=None,
                   variance_tol: float | None = None,
                   min_samples: int = 8,
                   lane_offset=0, occluded_fn=None) -> WavefrontState:
    """One wavefront step: intersect every live lane once, shade,
    terminate/regenerate. `ids` must match init_wavefront's (unused once
    lanes carry st.pixel, kept for API compatibility).

    lane_offset: global index of this state's first lane — a lane-axis
    SHARD of a larger wavefront passes its start offset so fast-mode
    counter-hash draws continue the single-device streams (the tiled
    step passes axis_index * lanes_per_shard; see rng.fast_uniforms).
    Parity mode ignores it (Lehmer streams ride in st.rng_state).

    sort_every > 0: re-sort lanes for spatial coherence every that many
    steps (requires scene_bounds = (lo, inv_extent) 3-vectors); use with
    the cluster intersector on large scenes where bounce-ray incoherence
    otherwise degrades per-tile culling to brute force.

    env: optional megakernel.EnvLight OR ops.envmap.EnvMap — a lane
    whose path dies on a miss first collects the environment
    contribution; None = shipped-kernel parity (miss = plain break).
    EnvLight is the reference's dormant constant sky
    (prog.cl:367-376). EnvMap is an equirect radiance image; with
    env.nee=True one importance-sampled environment gather runs at
    each diffuse vertex and the miss pickup is MIS-weighted against
    it (ops/envmap.py — balance heuristic, same split as `nee`).
    Budget-terminated lanes collect nothing (the reference loop just
    ends).

    nee: optional ops.nee.EmitterTable — next-event estimation: one
    shadow ray gathers direct light at each diffuse vertex; gather and
    the next bounce's emitter pickup split the term by MIS balance
    weights (ops/nee.py, prev_pdf bookkeeping) so nothing is
    double-counted. Converges to the same image with far less
    variance; ~2x intersect cost per step. NEE draws use an
    independent counter-hash stream keyed on lane POSITION, so
    parity-mode Lehmer streams stay reference-exact but the gathered
    term varies under lane permutations (sort_every / compaction) —
    unbiased either way.

    rr: optional (start_bounce, p_min) — RUSSIAN ROULETTE path
    termination: after `start_bounce` completed bounces, a continuing
    path survives each further bounce with probability
    p = clip(max_channel((f_l+f_b) f_s f_r), p_min, 1) and survivors
    scale their throughput by 1/p, so the estimator still converges
    to the SAME depth-capped image as rr=None (each pickup term's
    expectation is preserved). Dim paths die early and their lanes
    REGENERATE fresh samples immediately — on a lockstep machine this
    converts pruned bounces directly into samples/sec (the megakernel
    model deliberately has no rr: its lanes run the fixed fori_loop
    regardless, so roulette would add variance and save nothing).
    Roulette draws ride the independent counter-hash stream (parity
    Lehmer streams stay reference-exact).

    variance_tol: enable ADAPTIVE SAMPLING — track per-pixel Welford
    M2 of completed-sample luminance and idle pixels once
    converged_mask() passes (>= min_samples and relative SEM within
    tol). Converged lanes stop exactly like capped lanes; a pixel's
    accumulated mean stays the unweighted average of its completed
    samples. (Standard caveat: stopping on the estimate itself is
    very mildly biased — the RMS win at equal rays dwarfs it.)
    None = fixed-budget behavior, and the M2 field costs nothing
    (identity pass-through).

    occluded_fn: optional any-hit visibility kernel (tilecull_kernel.
    make_anyhit_occluded contract) routed to the nee / env-map
    gathers' shadow rays — same visibility bits as the nearest-hit
    form (proven bit-identical in test_tilecull), cheaper per step."""
    n = st.samples.shape[0]
    if sort_every and scene_bounds is not None:
        do_sort = (st.step % jnp.uint32(sort_every)) == 0
        st = jax.lax.cond(
            do_sort,
            lambda s: sort_state(s, scene_bounds[0], scene_bounds[1]),
            lambda s: s,
            st,
        )
    ids = st.pixel

    # Lanes past their sample budget idle completely.
    if max_samples is None:
        active = jnp.ones((n,), bool)
    else:
        active = st.samples < max_samples
    if variance_tol is not None:
        active = active & ~converged_mask(
            st.samples, st.colors, st.lum_m2, variance_tol,
            min_samples,
        )

    hit, mat = fetch_material(mats, intersect_fn,
                              Rays(p=st.ray_p, d=st.ray_d))
    has_hit = hit.valid & active

    # --- bounce draws (2 diffuse/emit, 1 refr; prog.cl:330,349,361) ---
    rng_state = st.rng_state
    mtype = mat.type
    is_d_or_e = has_hit & ((mtype == 0) | (mtype == 3))
    if mode == "parity":
        need1 = is_d_or_e | (has_hit & (mtype == 2))
        rng_state, r1, r2 = _draws_parity(rng_state, need1, is_d_or_e)
    else:
        u = rng.fast_uniforms(key, st.step, 0, (n,), 2,
                              lane_offset=lane_offset)
        r1, r2 = u[0], u[1]

    s = shade(cam, mat, hit, st.ray_p, st.ray_d, st.inside, r1, r2,
              has_hit)
    cur_color = st.cur_color
    if iterations == 1:  # preview (prog.cl:323-325)
        cur_color = vwhere(
            has_hit, vadd(s["mat"].kd, s["mat"].emission), cur_color
        )
    from opencl_path_tracer_tpu.ops.envmap import EnvMap
    env_is_map = isinstance(env, EnvMap)
    # prev_pdf bookkeeping is shared by BOTH MIS splits (surface-
    # emitter NEE and environment NEE): it carries the previous
    # diffuse bounce's direction pdf (cos/pi in solid angle).
    want_pdf = (nee is not None) or (env_is_map and env.nee)
    if nee is not None:
        from opencl_path_tracer_tpu.ops import nee as nee_mod
        nee_key = key if key is not None else jax.random.key(1791)
        u = rng.fast_uniforms(nee_key, st.step, 2, (n,), 3,
                              lane_offset=lane_offset)
        # Gather only when the path survives to the next intersect
        # (bounce+1 < iterations), matching the base estimator's
        # truncation exactly (the replaced pickup happens at the NEXT
        # vertex, which a budget-terminated path never reaches).
        gather = s["is_diff"] & (st.bounce + 1 < iterations)
        cur_color = vadd(cur_color, nee_mod.direct_light(
            nee, intersect_fn=intersect_fn, cam_eye=cam.eye,
            hit_p=hit.p, n_vec=s["n_vec"], mat=mat,
            f_l=st.f_l, f_b=st.f_b, f_s=st.f_s, f_r=st.f_r,
            is_diff=gather, u1=u[0], u2=u[1], u3=u[2],
            occluded_fn=occluded_fn,
        ))
        emit_scale = nee_mod.pickup_mis_weight(
            nee, st.prev_pdf, s["emit_cos"], hit.t, mat.emission,
            mati=hit.mati, hit_p=hit.p, ray_p=st.ray_p,
        )
        prev_pdf = jnp.where(
            active,
            jnp.where(s["is_diff"],
                      s["intens_d"] * jnp.float32(1.0 / np.pi), 0.0),
            st.prev_pdf,
        )
    else:
        emit_scale = None
        if want_pdf:  # env NEE alone still needs the pickup pdf
            prev_pdf = jnp.where(
                active,
                jnp.where(s["is_diff"],
                          s["intens_d"] * jnp.float32(1.0 / np.pi),
                          0.0),
                st.prev_pdf,
            )
        else:
            prev_pdf = st.prev_pdf  # identity: costs nothing
    if env_is_map and env.nee:
        from opencl_path_tracer_tpu.ops import envmap as envmap_mod
        ekey = key if key is not None else jax.random.key(3791)
        u = rng.fast_uniforms(ekey, st.step, 5, (n,), 3,
                              lane_offset=lane_offset)
        # Same survival gating as the emitter gather: the replaced
        # pickup happens at the NEXT vertex (the miss), which a
        # budget-terminated path never reaches.
        gather = s["is_diff"] & (st.bounce + 1 < iterations)
        cur_color = vadd(cur_color, envmap_mod.direct_light_env(
            env, intersect_fn=intersect_fn, cam_eye=cam.eye,
            hit_p=hit.p, n_vec=s["n_vec"], mat=mat,
            f_l=st.f_l, f_b=st.f_b, f_s=st.f_s, f_r=st.f_r,
            is_diff=gather, u1=u[0], u2=u[1], u3=u[2],
            occluded_fn=occluded_fn,
        ))
    f_l, f_b, f_s, f_r, inside, cur_color = apply_factors(
        s, st.f_l, st.f_b, st.f_s, st.f_r, st.inside, cur_color,
        emit_scale=emit_scale,
    )
    if env_is_map:
        from opencl_path_tracer_tpu.ops import envmap as envmap_mod
        # st.prev_pdf (the PREVIOUS bounce's pdf) weights the pickup —
        # the freshly updated prev_pdf belongs to THIS vertex, which a
        # missing lane never had.
        cur_color = envmap_mod.envmap_miss_update(
            env, active & ~hit.valid, st.bounce == 0, st.prev_pdf,
            f_l, f_b, f_s, f_r, st.ray_d, cur_color,
        )
        had_diffuse = st.had_diffuse
    elif env is not None:
        from opencl_path_tracer_tpu.models.megakernel import (
            env_miss_update,
        )
        cur_color = env_miss_update(
            env, active & ~hit.valid, st.bounce == 0, st.had_diffuse,
            f_l, f_b, f_s, f_r, cur_color,
        )
        had_diffuse = st.had_diffuse | s["is_diff"]
    else:
        # env=None: identity pass-through, so the flag costs the hot
        # loop nothing (no read-modify-write of the lane array —
        # measured 353.8 -> 316.3 Mrays/s on cornell-analytic when it
        # was updated unconditionally).
        had_diffuse = st.had_diffuse

    bounce = jnp.where(active, st.bounce + 1, st.bounce)
    terminated = active & (~hit.valid | (bounce >= iterations))

    if rr is not None:
        start, pmin = rr
        continuing = active & hit.valid & (bounce < iterations)
        # Survival probability from the post-bounce pickup throughput
        # (max channel of the weight every future pickup multiplies).
        w_lb = vadd(f_l, f_b)
        thr = tuple(w_lb[k] * f_s[k] * f_r[k] for k in range(3))
        p = jnp.clip(jnp.maximum(jnp.maximum(thr[0], thr[1]), thr[2]),
                     pmin, 1.0)
        rr_key = key if key is not None else jax.random.key(2791)
        u = rng.fast_uniforms(rr_key, st.step, 3, (n,), 1,
                              lane_offset=lane_offset)[0]
        gate = continuing & (bounce >= start)
        dead = gate & (u >= p)
        # Survivors compensate: scaling any one factor scales every
        # future pickup term uniformly ((f_l+f_b) f_s f_r products).
        f_s = vscale(f_s, jnp.where(gate & ~dead, 1.0 / p, 1.0))
        terminated = terminated | dead

    # --- fold finished samples into the running average (prog.cl:379)
    s_f = st.samples.astype(jnp.float32)
    inv = 1.0 / (s_f + 1.0)
    colors = tuple(
        jnp.where(
            terminated,
            (st.colors[k] * s_f + cur_color[k]) * inv,
            st.colors[k],
        )
        for k in range(3)
    )
    samples = jnp.where(terminated, st.samples + 1, st.samples)

    if variance_tol is not None:
        # Welford on completed-sample luminance: colors is the running
        # MEAN per channel and luminance is linear, so
        # _luminance(colors) IS the running mean of sample luminances.
        lum_new = _luminance(cur_color)
        delta = lum_new - _luminance(st.colors)
        mean1 = _luminance(colors)
        lum_m2 = jnp.where(
            terminated,
            st.lum_m2 + delta * (lum_new - mean1),
            st.lum_m2,
        )
    else:
        lum_m2 = st.lum_m2  # identity: costs the hot loop nothing

    # --- regenerate: next sample's camera ray (gen_ray, prog.cl:384-389)
    if mode == "parity":
        rng_state, g1, g2 = _draws_parity(
            rng_state, terminated, terminated
        )
    elif qmc:
        # Low-discrepancy pixel jitter: the fresh ray starts sample
        # number `samples` (0-based), so each pixel's camera jitters
        # walk ITS OWN R2 sequence regardless of when its lane
        # regenerates (rng.r2_jitter is stateless in
        # (pixel, sample index)).
        g1, g2 = rng.r2_jitter(key, st.pixel, samples)
    else:
        u = rng.fast_uniforms(key, st.step, 1, (n,), 2,
                              lane_offset=lane_offset)
        g1, g2 = u[0], u[1]
    if dof is not None:
        dkey = key if key is not None else jax.random.key(401)
        lu = rng.fast_uniforms(dkey, st.step, 4, (n,), 2,
                               lane_offset=lane_offset)
        fresh = raygen.camera_rays_dof(cam, ids, g1, g2, lu[0], lu[1],
                                       dof[0], dof[1])
    else:
        fresh = raygen.camera_rays(cam, ids, g1, g2)

    ones = tuple(jnp.ones((n,), jnp.float32) for _ in range(3))
    zeros = tuple(jnp.zeros((n,), jnp.float32) for _ in range(3))
    return WavefrontState(
        colors=colors,
        samples=samples,
        pixel=st.pixel,
        rng_state=rng_state,
        ray_p=vwhere(terminated, fresh.p, s["new_p"]),
        ray_d=vwhere(terminated, fresh.d, s["new_d"]),
        f_l=vwhere(terminated, ones, f_l),
        f_b=vwhere(terminated, ones, f_b),
        f_s=vwhere(terminated, ones, f_s),
        f_r=vwhere(terminated, ones, f_r),
        cur_color=vwhere(terminated, zeros, cur_color),
        inside=jnp.where(terminated, False, inside),
        bounce=jnp.where(terminated, 0, bounce),
        had_diffuse=(jnp.where(terminated, False, had_diffuse)
                     if (env is not None and not env_is_map)
                     else had_diffuse),
        prev_pdf=(jnp.where(terminated, 0.0, prev_pdf)
                  if want_pdf else prev_pdf),
        lum_m2=lum_m2,
        step=st.step + jnp.uint32(1),
    )


def render_wavefront(cam, mats, *, intersect_fn, num_pixels, iterations,
                     min_spp, mode="parity", seed=1, key=None,
                     max_extra_steps: int = 1_000_000,
                     exact_spp: bool = False,
                     ids: jnp.ndarray | None = None,
                     env=None, nee=None, rr=None,
                     qmc: bool = False, dof=None) -> WavefrontState:
    """Run wavefront steps until every pixel has >= min_spp samples.

    exact_spp=True caps every pixel at exactly min_spp samples (lanes
    idle once done — use for bit-parity comparisons against the
    megakernel at equal spp)."""
    if mode == "fast" and key is None:
        key = jax.random.key(seed)
    state = init_wavefront(cam, num_pixels, seed=seed, mode=mode,
                           key=key, ids=ids, qmc=qmc, dof=dof)
    cap = min_spp if exact_spp else None

    step = jax.jit(lambda st: wavefront_step(
        cam, mats, st, intersect_fn=intersect_fn,
        iterations=iterations, mode=mode, key=key, max_samples=cap,
        ids=ids, env=env, nee=nee, rr=rr, qmc=qmc, dof=dof,
    ))
    # Fixed-size macro-steps between host-side convergence checks.
    chunk = max(iterations * 2, 8)
    for _ in range(max_extra_steps):
        for _ in range(chunk):
            state = step(state)
        if int(jax.device_get(jnp.min(state.samples))) >= min_spp:
            break
    return state


def sort_open_first(st: WavefrontState, open_mask) -> WavefrontState:
    """Permute lanes so open (still-sampling) lanes come first.

    Any lane order is semantically free — every lane carries its pixel
    binding, accumulators, and RNG stream (see sort_state) — so this
    enables ADAPTIVE COMPACTION: once few lanes are open, step only a
    prefix bucket and park the converged tail (idle lanes otherwise
    still pay full intersection cost in lockstep). Stable order within
    each class via the (key, iota) compound key."""
    key = (~open_mask).astype(jnp.uint32)
    leaves, treedef = jax.tree.flatten(st)
    vec_idx = [i for i, a in enumerate(leaves) if a.ndim != 0]
    iota = jnp.arange(st.samples.shape[0], dtype=jnp.int32)
    CHUNK = 13  # variadic-sort compile cliff (docs/BENCHMARKS.md)
    for i0 in range(0, len(vec_idx), CHUNK):
        grp = vec_idx[i0:i0 + CHUNK]
        sorted_ops = jax.lax.sort(
            [key, iota] + [leaves[i] for i in grp], dimension=0,
            num_keys=2, is_stable=False,
        )
        for j, i in enumerate(grp):
            leaves[i] = sorted_ops[2 + j]
    return jax.tree.unflatten(treedef, leaves)


def state_split(st: WavefrontState, n: int):
    """(first n lanes, rest) — static n; scalars ride with both."""
    head = jax.tree.map(lambda a: a if a.ndim == 0 else a[:n], st)
    tail = jax.tree.map(lambda a: a if a.ndim == 0 else a[n:], st)
    return head, tail


def state_concat(parts) -> WavefrontState:
    """Concatenate lane-axis state slices (scalars from the first)."""
    first = parts[0]
    return jax.tree.unflatten(
        jax.tree.structure(first),
        [
            leaves[0] if leaves[0].ndim == 0
            else jnp.concatenate(leaves, axis=0)
            for leaves in zip(*(jax.tree.leaves(p) for p in parts))
        ],
    )


def render_adaptive(cam, mats, *, intersect_fn, num_pixels,
                    iterations, tol: float, max_spp: int,
                    min_spp: int = 8, mode="fast", seed=1, key=None,
                    env=None, nee=None, rr=None, qmc: bool = False,
                    dof=None, compact: bool = True,
                    min_bucket: int = 4096,
                    max_extra_steps: int = 1_000_000) -> WavefrontState:
    """Adaptive render: every pixel gets between min_spp and max_spp
    samples, stopping early once its relative luminance SEM is within
    `tol` (converged_mask). The reference has no adaptivity at all
    (every pixel gets every sample forever, prog.cl:379).

    compact=True is what makes adaptivity PAY on a lockstep machine:
    idle lanes otherwise still ride the full-width intersection. When
    the open-lane count falls below half the live bucket, lanes are
    permuted open-first (sort_open_first — lane order is free) and
    the bucket halves (power-of-two sizes, so jit retraces once per
    size); the converged tail is parked untouched and re-concatenated
    at the end. Parity mode is BIT-identical with compaction on or
    off (per-lane streams travel with the lane); fast mode stays
    unbiased but draws differ (the counter engine keys on lane
    position)."""
    if mode == "fast" and key is None:
        key = jax.random.key(seed)
    state = init_wavefront(cam, num_pixels, seed=seed, mode=mode,
                           key=key, qmc=qmc, dof=dof)
    step = jax.jit(lambda st: wavefront_step(
        cam, mats, st, intersect_fn=intersect_fn,
        iterations=iterations, mode=mode, key=key,
        max_samples=max_spp, env=env, nee=nee, rr=rr, qmc=qmc,
        dof=dof,
        variance_tol=tol, min_samples=min_spp,
    ))
    # Every convergence check is a host round-trip; ~6 samples' worth
    # of steps between checks bounds the sync tax (see
    # RenderEngine.render_adaptive).
    chunk = max(iterations * 6, 24)
    parked = []
    bucket = num_pixels
    for _ in range(max_extra_steps):
        for _ in range(chunk):
            state = step(state)
        done = converged_mask(state.samples, state.colors,
                              state.lum_m2, tol, min_spp)
        done = done | (state.samples >= max_spp)
        n_open = int(jax.device_get(jnp.sum(~done)))
        if n_open == 0:
            break
        if compact:
            target = bucket
            while (target // 2 >= max(n_open, min_bucket)
                   and target % 2 == 0):
                target //= 2
            if target < bucket:
                state = sort_open_first(state, ~done)
                state, tail = state_split(state, target)
                parked.append(tail)
                bucket = target
    if parked:
        state = state_concat([state] + parked)
    return state


def colors_by_pixel(state: WavefrontState, num_pixels: int | None = None):
    """(num_pixels, 3) color array indexed by pixel id.

    Undoes any lane reordering (tile-major init, sorting). With MORE
    lanes than pixels (several samples in flight per pixel — pass
    ids=jnp.tile(...) to init_wavefront), each pixel's lanes hold
    independent running averages; the correct combined mean weights
    each lane by its completed sample count (a lane mid-path
    contributes its finished samples only, matching the reference's
    progressive average semantics, prog.cl:379)."""
    import numpy as np
    pix = np.asarray(state.pixel)
    n = int(num_pixels) if num_pixels is not None else (
        int(pix.max()) + 1 if pix.size else 0
    )
    if pix.shape[0] == n and np.unique(pix).shape[0] == n:
        out = np.zeros((n, 3), np.float32)
        for k in range(3):
            out[pix, k] = np.asarray(state.colors[k])
        return out
    w = np.asarray(state.samples, np.float64)
    den = np.zeros((n,), np.float64)
    np.add.at(den, pix, w)
    out = np.zeros((n, 3), np.float32)
    for k in range(3):
        num = np.zeros((n,), np.float64)
        np.add.at(num, pix, w * np.asarray(state.colors[k], np.float64))
        out[:, k] = (num / np.maximum(den, 1.0)).astype(np.float32)
    return out
