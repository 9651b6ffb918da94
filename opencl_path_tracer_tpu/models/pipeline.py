"""Flagship fast-mode render pipeline: Plucker-MXU intersect + rotating
exact slice + fused shade, all on packed lane state.

Step anatomy (all per 2M-lane wavefront step, fast mode):
 1. intersect_rows: MXU candidates + exact refine
    (ops/pallas/plucker_kernel.py) straight off the packed ray rows.
 2. rotating exact slice: lanes [s*L, (s+1)*L), s = step mod n_slices,
    are re-intersected with the fused f32 kernel and their rows
    overwritten (pending cleared). This is the unconditional net that
    turns the refine's rare PENDING lanes (both top-2 candidates
    spurious) into exact results within n_slices steps — degraded
    latency, never degraded correctness (the round-2 design rule).
 3. fused step: the entire shade/terminate/regenerate pass as one
    Pallas kernel (models/fused_step.py). Pending lanes freeze.

The unfused models/wavefront.py remains the parity path (bit-exact
reference Lehmer math) and the megakernel the reference-shaped model;
this pipeline is the perf path the headline bench measures. Reference
anchor: the whole thing is still one-lane-per-pixel progressive path
tracing (prog.cl:292-389) — reorganized for MXU + HBM economics.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.models import fused_step as fs
from opencl_path_tracer_tpu.models import wavefront
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    BIG, build_tri_pack, _run as _run_dense,
)
from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
    make_plucker_intersect,
)


def make_fast_pipeline(scene, cam, *, width: int, height: int,
                       iterations: int, key, tr: int = 1024,
                       n_slices: int = 32, lanes: int = 1,
                       interpret: bool = False):
    """Returns (state0, step, unpack) where state0 = (F, I, ctr),
    step is jittable (F, I, ctr) -> (F, I, ctr+1), and
    unpack(F, I, ctr) -> WavefrontState.

    Lane count = width*height*lanes rounded up to tr; the pad lanes
    render extra samples of pixel 0 (harmless — colors are read back
    per-pixel-id, sample-weighted)."""
    from opencl_path_tracer_tpu.ops import raygen

    if getattr(scene, "spheres", None) is not None:
        raise ValueError(
            "the fused pipeline intersects triangles only; analytic-"
            "sphere scenes would render silently wrong. Use the "
            "wavefront model (bench --model wavefront / the engine), "
            "which min-merges the sphere kernel."
        )

    n_raw = width * height
    if width % 16 == 0 and height % 8 == 0:
        ids = raygen.tile_major_ids(width, height, 16, 8)
    else:
        ids = raygen.pixel_ids_like(n_raw)
    if lanes > 1:
        ids = jnp.tile(ids, lanes)
    n = ((ids.shape[0] + tr - 1) // tr) * tr
    if n != ids.shape[0]:
        ids = jnp.concatenate(
            [ids, jnp.zeros((n - ids.shape[0],), jnp.int32)]
        )

    st = wavefront.init_wavefront(cam, n, mode="fast", key=key,
                                  ids=ids)
    F0, I0, ctr0 = fs.pack_state(st, width, height)

    plucker = make_plucker_intersect(
        scene.tris, tr=tr, interpret=interpret
    )
    fstep = fs.make_fused_step(
        cam, scene.mats, width=width, height=height,
        iterations=iterations, key=key, tr=tr, interpret=interpret,
    )

    # Exact-slice dense kernel state.
    tri_pack = build_tri_pack(scene.tris, 1024)
    tt = min(1024, tri_pack.shape[0])
    # Slice length must be whole tr-blocks: use the largest divisor of
    # the block count that is <= the requested n_slices (1080p at
    # tr=1024 has 2025 blocks -> 25 slices for a request of 32).
    n_blocks = n // tr
    n_slices = max(
        d for d in range(1, n_slices + 1) if n_blocks % d == 0
    )
    L = n // n_slices

    def step(F, I, ctr):
        rays8 = jnp.concatenate(
            [F[fs._RAYP:fs._RAYP + 6],
             jnp.zeros((2, n), jnp.float32)], axis=0
        )
        t, nx, ny, nz, m, pend = plucker.rows(rays8)

        # Rotating exact slice (unconditional pending net).
        s = (ctr.astype(jnp.int32) % n_slices) * L
        sl = jax.lax.dynamic_slice(rays8, (0, s), (8, L))
        dt_, _di, dnx, dny, dnz, dm = _run_dense(
            sl, tri_pack, min(tr, L), tt, interpret, 256
        )
        dt_ = jnp.where(dt_ < BIG, dt_, -1.0)

        def put(row, val):
            return jax.lax.dynamic_update_slice(
                row, val[None, :], (0, s)
            )

        t = put(t, dt_)
        nx = put(nx, dnx)
        ny = put(ny, dny)
        nz = put(nz, dnz)
        m = put(m, dm)
        pend = put(pend, jnp.zeros_like(dt_))

        H = jnp.concatenate(
            [t, nx, ny, nz, m, pend, jnp.zeros((2, n), jnp.float32)],
            axis=0,
        )
        F2, I2 = fstep(F, I, ctr.astype(jnp.int32), H)
        return F2, I2, ctr + jnp.uint32(1)

    def unpack(F, I, ctr):
        return fs.unpack_state(F, I, ctr)

    return (F0, I0, ctr0), step, unpack


def render_fast(scene, cam, *, width, height, iterations, steps, key,
                lanes: int = 1, interpret: bool = False,
                chunk: int = 8):
    """Run `steps` pipeline steps; returns (WavefrontState, seconds)."""
    import time

    (F, I, ctr), step, unpack = make_fast_pipeline(
        scene, cam, width=width, height=height, iterations=iterations,
        key=key, lanes=lanes, interpret=interpret,
    )

    @jax.jit
    def run(F, I, ctr, k):
        def body(_, c):
            return step(*c)
        return jax.lax.fori_loop(0, k, body, (F, I, ctr))

    F, I, ctr = run(F, I, ctr, 2)
    jax.block_until_ready(F)
    t0 = time.time()
    done = 0
    while done < steps:
        k = min(chunk, steps - done)
        F, I, ctr = run(F, I, ctr, k)
        done += k
    jax.block_until_ready(F)
    dt = time.time() - t0
    return unpack(F, I, ctr), dt
