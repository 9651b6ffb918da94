"""Constant lifting (utils/constlift.py): the lifted program must be
bit-identical to the closure form, and must actually remove the scene
packs from the lowered module (program size is what broke >=300k-tri
compiles through the remote compile service)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.scene import library
from opencl_path_tracer_tpu.utils.constlift import lift_consts


def _rand_rays(n, seed=0):
    rs = np.random.default_rng(seed)
    p = rs.uniform(100, 900, (3, n)).astype(np.float32)
    d = rs.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    return Rays(p=tuple(jnp.asarray(p[i]) for i in range(3)),
                d=tuple(jnp.asarray(d[i]) for i in range(3)))


@pytest.mark.slow  # 40 s of interpret-mode pair rounds; the wavefront
# constlift test below keeps the lifting contract in the quick loop.
def test_lifted_pair_intersect_bit_exact_and_small():
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        PAIR_TPU_WINNER, make_pair_intersect,
    )
    scene = library.stress_scene(6000)
    isect = make_pair_intersect(scene.tris, interpret=True,
                                **PAIR_TPU_WINNER)
    rays = _rand_rays(2048, seed=3)
    h0 = isect(rays)
    lifted, consts = lift_consts(isect, rays)
    h1 = jax.jit(lifted)(consts, rays)
    hit = np.asarray(h0.t) >= 0.0
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t))
    np.testing.assert_array_equal(np.asarray(h0.mati),
                                  np.asarray(h1.mati))
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(h0.n[k])[hit],
                                      np.asarray(h1.n[k])[hit])
    # The packs (> 500 kB of scene constants at 6k tris) must be gone
    # from the module text.
    plain = len(jax.jit(isect).lower(rays).as_text())
    small = len(jax.jit(lifted).lower(consts, rays).as_text())
    assert small < plain / 2, (small, plain)


def test_lifted_wavefront_step_bit_exact():
    """The bench/engine integration shape: a jitted wavefront step with
    the intersect closure lifted must reproduce the plain step's state
    bit-for-bit."""
    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.ops import intersect

    w = h = 32
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    isect = functools.partial(intersect.first_intersect,
                              tris=scene.tris)
    key = jax.random.key(5)
    st0 = wavefront.init_wavefront(cam, w * h, mode="fast", key=key)

    def step(state):
        return wavefront.wavefront_step(
            cam, scene.mats, state, intersect_fn=isect, iterations=3,
            mode="fast", key=key,
        )

    ref = st0
    stepj = jax.jit(step)
    for _ in range(3):
        ref = stepj(ref)

    lifted, consts = lift_consts(step, st0)
    liftedj = jax.jit(lifted)
    st = st0
    for _ in range(3):
        st = liftedj(consts, st)

    for name in ("colors", "ray_p", "ray_d", "cur_color"):
        for a, b in zip(getattr(ref, name), getattr(st, name)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for name in ("samples", "pixel", "rng_state", "bounce"):
        np.testing.assert_array_equal(np.asarray(getattr(ref, name)),
                                      np.asarray(getattr(st, name)))
