"""Fused wavefront step (interpret mode) vs wavefront_step (fast
mode): identical expressions, so every integer field must match
exactly and every float field to ~8 ULP (rtol 1e-6; several FMA contractions stack per step). Bit-level float equality is
NOT required between the two: XLA may contract mul+add chains into
FMAs differently per fusion context (excess precision), which shifts
results by 1 ULP on a small fraction of lanes. Reference parity
(bit-exact Lehmer math) lives on the unfused parity path."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.models import fused_step, wavefront
from opencl_path_tracer_tpu.ops import intersect
from opencl_path_tracer_tpu.scene import library

pytestmark = pytest.mark.slow


def _fields_equal(a: wavefront.WavefrontState,
                  b: wavefront.WavefrontState):
    for name in ("colors", "ray_p", "ray_d", "f_l", "f_b", "f_s",
                 "f_r", "cur_color"):
        for k in range(3):
            x = np.asarray(getattr(a, name)[k])
            y = np.asarray(getattr(b, name)[k])
            both_nan = np.isnan(x) & np.isnan(y)
            # Positions: FMA-vs-not differences in p + d*t are absolute
            # at the ~1e3 coordinate scale and can land on a component
            # that nearly cancels, so tolerance there is absolute.
            atol = 1e-3 if name in ("ray_p", "cur_color") else 1e-6
            np.testing.assert_allclose(
                np.where(both_nan, 0, x), np.where(both_nan, 0, y),
                rtol=1e-6, atol=atol, err_msg=f"{name}[{k}]"
            )
    for name in ("samples", "pixel", "inside", "bounce"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name,
        )


@pytest.mark.parametrize("iters", [1, 3])
def test_fused_step_matches_wavefront_step_per_step(iters):
    """Each step compared from IDENTICAL input state: a 1-ULP FMA
    difference in a bounce direction compounds across steps (slightly
    different hit points), so cross-step trajectories legitimately
    drift; per-step outputs must agree to ULP."""
    w = h = 64
    n = w * h
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    key = jax.random.key(7)
    isect = functools.partial(intersect.first_intersect,
                              tris=scene.tris)

    ref = wavefront.init_wavefront(cam, n, mode="fast", key=key)
    fstep = fused_step.make_fused_step(
        cam, scene.mats, width=w, height=h, iterations=iters, key=key,
        tr=2048, interpret=True,
    )
    step1 = jax.jit(lambda st: wavefront.wavefront_step(
        cam, scene.mats, st, intersect_fn=isect, iterations=iters,
        mode="fast", key=key,
    ))

    for s in range(4):
        st_f, st_i, ctr = fused_step.pack_state(ref, w, h)
        hits = isect(wavefront.Rays(p=ref.ray_p, d=ref.ray_d))
        H = fused_step.hits_to_pack(hits)
        st_f, st_i = fstep(st_f, st_i, ctr, H)
        got = fused_step.unpack_state(st_f, st_i, ctr + 1)
        ref = step1(ref)          # advance the trajectory on ref path
        _fields_equal(ref, got)
        np.testing.assert_array_equal(
            np.asarray(ref.step), np.asarray(got.step)
        )


def test_fused_multistep_statistical():
    """Free-running fused loop converges to the same image as the
    unfused loop (trajectories drift by ULPs; estimators agree)."""
    w = h = 32
    n = w * h
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    key = jax.random.key(7)
    isect = functools.partial(intersect.first_intersect,
                              tris=scene.tris)
    ref = wavefront.init_wavefront(cam, n, mode="fast", key=key)
    st_f, st_i, ctr = fused_step.pack_state(ref, w, h)
    fstep = fused_step.make_fused_step(
        cam, scene.mats, width=w, height=h, iterations=3, key=key,
        tr=1024, interpret=True,
    )
    step1 = jax.jit(lambda st: wavefront.wavefront_step(
        cam, scene.mats, st, intersect_fn=isect, iterations=3,
        mode="fast", key=key,
    ))
    for s in range(24):
        ref = step1(ref)
        cur = fused_step.unpack_state(st_f, st_i, ctr)
        hits = isect(wavefront.Rays(p=cur.ray_p, d=cur.ray_d))
        st_f, st_i = fstep(st_f, st_i, ctr,
                           fused_step.hits_to_pack(hits))
        ctr = ctr + jnp.uint32(1)
    got = fused_step.unpack_state(st_f, st_i, ctr)
    a = np.stack([np.asarray(c) for c in ref.colors], -1)
    b = np.stack([np.asarray(c) for c in got.colors], -1)
    np.testing.assert_array_equal(np.asarray(got.samples) > 0, True)
    assert abs(a.mean() - b.mean()) / a.mean() < 0.02


def test_fused_step_pending_freezes_lane():
    """A pending lane must not change at all (ray, factors, rng draws,
    bounce) while others advance normally."""
    w = h = 32
    n = w * h
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    key = jax.random.key(3)
    isect = functools.partial(intersect.first_intersect,
                              tris=scene.tris)

    st = wavefront.init_wavefront(cam, n, mode="fast", key=key)
    F, I, ctr = fused_step.pack_state(st, w, h)
    fstep = fused_step.make_fused_step(
        cam, scene.mats, width=w, height=h, iterations=3, key=key,
        tr=1024, interpret=True,
    )
    hits = isect(wavefront.Rays(p=st.ray_p, d=st.ray_d))
    pend = jnp.zeros((n,), bool).at[:100].set(True)
    H = fused_step.hits_to_pack(hits, pending=pend)
    F2, I2 = fstep(F, I, ctr, H)
    got = fused_step.unpack_state(F2, I2, ctr + 1)

    for k in range(3):
        np.testing.assert_array_equal(
            np.asarray(got.ray_p[k][:100]), np.asarray(st.ray_p[k][:100])
        )
        np.testing.assert_array_equal(
            np.asarray(got.ray_d[k][:100]), np.asarray(st.ray_d[k][:100])
        )
    np.testing.assert_array_equal(
        np.asarray(got.bounce[:100]), np.asarray(st.bounce[:100])
    )
    np.testing.assert_array_equal(
        np.asarray(got.samples[:100]), np.asarray(st.samples[:100])
    )
    # Non-pending lanes did advance.
    assert (np.asarray(got.bounce[100:]) != 0).any() or (
        np.asarray(got.samples[100:]) != 0
    ).any()
