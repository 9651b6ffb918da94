"""Multi-chip progressive rendering.

The reference is strictly single-device (one OpenCL work-item per pixel,
main.cpp:674,678; no multi-GPU, no communication backend — SURVEY.md §2).
Progressive path tracing is additive, so two shardings scale it out over
a jax.sharding.Mesh with XLA collectives over ICI:

  * TILE sharding (`make_tiled_step`): the framebuffer's pixel axis is
    sharded across chips via shard_map; each chip raygen/traces only its
    own rows (global pixel ids = shard offset + lane). Zero per-sample
    communication; works in parity mode because each pixel's sequential
    Lehmer stream lives wholly on one chip. A psum'd luminance scalar is
    returned as a cheap cross-chip render metric.

  * SAMPLE sharding (`make_sample_sharded_render`): every chip renders
    the full frame with its own slice of sample indices (chip k renders
    samples k, k+n, k+2n, ...) using the stateless counter-hash engine,
    and
    one `psum` at the end averages the framebuffers — the
    communication-optimal layout for high-spp offline renders (one
    all-reduce per render, not per sample). Fast mode only: parity mode's
    per-pixel stream is sequential in samples by construction.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from opencl_path_tracer_tpu.core.camera import Camera
from opencl_path_tracer_tpu.core.materials import MaterialsSoA
from opencl_path_tracer_tpu.models import megakernel
from opencl_path_tracer_tpu.utils.constlift import lazy_lift_jit
from opencl_path_tracer_tpu.models.megakernel import TraceState
from opencl_path_tracer_tpu.parallel.mesh import RENDER_AXIS


def shard_state(state: TraceState, mesh: Mesh) -> TraceState:
    """Place a TraceState with its pixel axis sharded over the mesh."""
    sh = NamedSharding(mesh, P(RENDER_AXIS))
    return TraceState(
        colors=tuple(jax.device_put(c, sh) for c in state.colors),
        rng_state=jax.device_put(state.rng_state, sh),
        sample=jax.device_put(
            state.sample, NamedSharding(mesh, P())
        ),
    )


def make_tiled_step(cam: Camera, mats: MaterialsSoA, mesh: Mesh, *,
                    intersect_fn, iterations: int, mode: str = "parity",
                    key=None, env=None, nee=None, qmc: bool = False,
                    dof=None, occluded_fn=None):
    """One progressive sample, framebuffer tiled across the mesh.

    Returns step(state) -> (state, mean_luminance) where state's pixel
    axis is sharded over the mesh and mean_luminance is a psum-reduced
    scalar (exercises the ICI collective; also the live render meter).
    """
    n_dev = mesh.devices.size

    def per_shard(state: TraceState) -> tuple[TraceState, jnp.ndarray]:
        n_local = state.rng_state.shape[0]
        shard = jax.lax.axis_index(RENDER_AXIS)
        ids = shard.astype(jnp.int32) * n_local + jnp.arange(
            n_local, dtype=jnp.int32
        )
        new = megakernel.trace_sample(
            cam, mats, state,
            intersect_fn=intersect_fn, iterations=iterations,
            mode=mode, key=key, ids=ids, env=env, nee=nee, qmc=qmc,
            dof=dof, occluded_fn=occluded_fn,
        )
        lum = jax.lax.psum(
            sum(jnp.sum(c) for c in new.colors), RENDER_AXIS
        )
        total_px = jnp.float32(n_local * n_dev * 3)
        return new, lum / total_px

    state_spec = TraceState(
        colors=(P(RENDER_AXIS),) * 3,
        rng_state=P(RENDER_AXIS), sample=P(),
    )
    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(state_spec,),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return lazy_lift_jit(fn)


def shard_wavefront_state(state, mesh: Mesh):
    """Place a WavefrontState with its lane axis sharded over the mesh.

    Every per-lane array (colors, rng, ray, factors, pixel binding) is
    split; the scalar step counter is replicated."""
    sh = NamedSharding(mesh, P(RENDER_AXIS))
    rep = NamedSharding(mesh, P())

    def place(x):
        return jax.device_put(x, rep if x.ndim == 0 else sh)

    return jax.tree.map(place, state)


def make_tiled_wavefront_step(cam: Camera, mats: MaterialsSoA,
                              mesh: Mesh, *, intersect_fn,
                              iterations: int, mode: str = "parity",
                              key=None, max_samples: int | None = None,
                              env=None, nee=None, rr=None,
                              qmc: bool = False, dof=None,
                              variance_tol: float | None = None,
                              min_samples: int = 8,
                              occluded_fn=None):
    """One wavefront step (the flagship perf model), lane axis tiled
    across the mesh.

    The wavefront state is lane-local by construction — every lane
    carries its own pixel binding (state.pixel), RNG stream, and
    accumulators (models/wavefront.py) — so sharding needs NO
    communication in the step itself: each chip regenerates and traces
    only its own lanes, exactly the reference's one-work-item-per-pixel
    dispatch (main.cpp:674,678) scaled out chip-wise. A psum'd
    mean-luminance scalar rides along as the cross-chip render meter.

    Returns step(state) -> (state, mean_luminance); state sharded as by
    shard_wavefront_state. Per-lane results are bit-identical to the
    single-device wavefront_step in BOTH modes (test_parallel.py):
    parity streams ride in the state, and fast-mode counter-hash draws
    get each shard's global lane offset (axis_index x lanes/shard) so
    every shard draws its slice of the single-device streams — without
    it all shards would share the same local-iota streams (cross-chip
    correlated sampling)."""
    from opencl_path_tracer_tpu.models import wavefront

    n_dev = mesh.devices.size

    def per_shard(state):
        offset = (
            jax.lax.axis_index(RENDER_AXIS).astype(jnp.uint32)
            * jnp.uint32(state.samples.shape[0])
        )
        new = wavefront.wavefront_step(
            cam, mats, state, intersect_fn=intersect_fn,
            iterations=iterations, mode=mode, key=key,
            max_samples=max_samples, env=env, nee=nee, rr=rr,
            qmc=qmc, dof=dof, occluded_fn=occluded_fn,
            variance_tol=variance_tol, min_samples=min_samples,
            lane_offset=offset,
        )
        lum = jax.lax.psum(
            sum(jnp.sum(c) for c in new.colors), RENDER_AXIS
        )
        total = jnp.float32(new.samples.shape[0] * n_dev * 3)
        return new, lum / total

    state_spec = wavefront_state_spec()
    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(state_spec,),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return lazy_lift_jit(fn)


def wavefront_state_spec():
    """WavefrontState partition spec: every lane array sharded on the
    render axis, the scalar step counter replicated."""
    from opencl_path_tracer_tpu.models import wavefront

    lane = P(RENDER_AXIS)
    v3 = (lane,) * 3
    return wavefront.WavefrontState(
        colors=v3, samples=lane, pixel=lane, rng_state=lane,
        ray_p=v3, ray_d=v3, f_l=v3, f_b=v3, f_s=v3, f_r=v3,
        cur_color=v3, inside=lane, bounce=lane, had_diffuse=lane,
        prev_pdf=lane, lum_m2=lane, step=P(),
    )


def make_shard_sort_open_first(mesh: Mesh):
    """Shard-LOCAL open-first lane permutation for adaptive
    compaction over a mesh (models.wavefront.sort_open_first applied
    per shard — no cross-chip movement; lane order is semantically
    free, so per-shard vs global order only changes WHICH lanes park
    together, never any lane's result)."""
    from opencl_path_tracer_tpu.models import wavefront

    spec = wavefront_state_spec()
    return jax.jit(shard_map(
        wavefront.sort_open_first, mesh=mesh,
        in_specs=(spec, P(RENDER_AXIS)), out_specs=spec,
        check_vma=False,
    ))


def make_shard_split(mesh: Mesh, n_local: int):
    """split(state) -> (head, tail): the first n_local lanes OF EACH
    SHARD stay live, the rest park — the mesh analog of
    wavefront.state_split (uniform per-shard shapes keep shard_map
    legal)."""
    from opencl_path_tracer_tpu.models import wavefront

    spec = wavefront_state_spec()
    return jax.jit(shard_map(
        lambda st: wavefront.state_split(st, n_local), mesh=mesh,
        in_specs=(spec,), out_specs=(spec, spec),
        check_vma=False,
    ))


def make_sample_sharded_render(cam: Camera, mats: MaterialsSoA,
                               mesh: Mesh, *, intersect_fn,
                               iterations: int, num_pixels: int,
                               samples_per_device: int, key):
    """Offline high-spp render: chip k renders samples k + i*n_dev of the
    FULL frame (fast counter-hash engine), one psum averages at the end.

    Returns render() -> (num_pixels, 3) replicated mean framebuffer of
    samples_per_device * n_dev total samples."""
    n_dev = mesh.devices.size

    def per_shard() -> jnp.ndarray:
        shard = jax.lax.axis_index(RENDER_AXIS)
        z = jnp.zeros((num_pixels,), jnp.float32)
        state = megakernel.TraceState(
            colors=(z, z, z),
            rng_state=jnp.zeros((num_pixels,), jnp.uint32),
            sample=jnp.int32(0),
        )

        def body(i, st):
            s_global = shard.astype(jnp.int32) + i * n_dev
            return megakernel.trace_sample(
                cam, mats, st,
                intersect_fn=intersect_fn, iterations=iterations,
                mode="fast", key=key, sample_index=s_global,
            )

        state = jax.lax.fori_loop(0, samples_per_device, body, state)
        # state.colors is the mean of this chip's samples; the global
        # mean is the mean over chips (equal sample counts).
        return jax.lax.pmean(
            jnp.stack(state.colors, axis=-1), RENDER_AXIS
        )

    fn = shard_map(per_shard, mesh=mesh, in_specs=(), out_specs=P(),
                   check_vma=False)
    return lazy_lift_jit(fn)


def gather_colors(state: TraceState) -> jnp.ndarray:
    """Fetch the (possibly sharded) framebuffer to the host, (N, 3)."""
    import numpy as np
    return np.stack(
        [np.asarray(jax.device_get(c)) for c in state.colors], axis=-1
    )
