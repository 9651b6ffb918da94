"""End-to-end megakernel renders: smoke, energy sanity, RNG-draw parity,
and a golden statistical regression at fixed seed."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.models import megakernel
from opencl_path_tracer_tpu.ops import intersect
from opencl_path_tracer_tpu.scene import library


def _c(state_or_colors):
    """(N, 3) array from a V3 colors tuple or a state holding one."""
    c = getattr(state_or_colors, "colors", state_or_colors)
    return np.stack([np.asarray(x) for x in c], axis=-1)


def _cornell_setup(w=32, h=32, with_spheres=False):
    scene = library.cornell_box(with_spheres=with_spheres)
    cam = library.cornell_camera(w, h)
    isect = functools.partial(intersect.first_intersect, tris=scene.tris)
    return scene, cam, isect


def test_preview_mode_shapes_and_values():
    scene, cam, isect = _cornell_setup()
    state = megakernel.render(
        cam, scene.mats, intersect_fn=isect, num_pixels=32 * 32,
        iterations=1, spp=1, mode="parity",
    )
    img = _c(state).reshape(32, 32, 3)
    assert img.shape == (32, 32, 3)
    assert int(state.sample) == 1
    # Preview shows kd+emission: box walls have kd in {0.3, 0.1}; pixels
    # seeing the lamp show emission 120,100,80.
    assert img.max() > 1.0  # some lamp pixels or wall values
    assert np.all(np.isfinite(img))
    # Red wall visible on the left side of the image.
    left = img[:, :4]
    assert left[..., 0].mean() > 0.0


@pytest.mark.slow
def test_progressive_average_accumulates():
    scene, cam, isect = _cornell_setup()
    s1 = megakernel.render(cam, scene.mats, intersect_fn=isect,
                           num_pixels=32 * 32, iterations=2, spp=1,
                           mode="parity")
    s4 = megakernel.render(cam, scene.mats, intersect_fn=isect,
                           num_pixels=32 * 32, iterations=2, spp=4,
                           mode="parity")
    # More samples -> lower variance but similar mean (diffuse-only box).
    m1 = _c(s1).mean()
    m4 = _c(s4).mean()
    assert m4 > 0
    assert abs(m1 - m4) / max(m4, 1e-9) < 0.6


@pytest.mark.slow
def test_rng_stream_advances_only_for_consuming_lanes():
    """A lane that misses everything must keep its RNG state frozen after
    gen_ray's two draws (the reference work-item breaks, prog.cl:375)."""
    scene, cam, isect = _cornell_setup()
    n = 32 * 32
    state0 = megakernel.init_state(n, seed=1)
    state1 = megakernel.trace_sample(
        cam, scene.mats, state0, intersect_fn=isect, iterations=3,
        mode="parity",
    )
    # Every pixel consumed at least gen_ray's 2 draws.
    assert not np.any(
        np.asarray(state1.rng_state) == np.asarray(state0.rng_state)
    )


@pytest.mark.slow
def test_parity_mode_deterministic():
    scene, cam, isect = _cornell_setup()
    a = megakernel.render(cam, scene.mats, intersect_fn=isect,
                          num_pixels=16 * 16, iterations=3, spp=2,
                          mode="parity")
    b = megakernel.render(cam, scene.mats, intersect_fn=isect,
                          num_pixels=16 * 16, iterations=3, spp=2,
                          mode="parity")
    np.testing.assert_array_equal(_c(a),
                                  _c(b))
    np.testing.assert_array_equal(np.asarray(a.rng_state),
                                  np.asarray(b.rng_state))


@pytest.mark.slow
def test_fast_mode_runs_and_converges_similarly():
    scene, cam, isect = _cornell_setup()
    par = megakernel.render(cam, scene.mats, intersect_fn=isect,
                            num_pixels=24 * 24, iterations=4, spp=24,
                            mode="parity")
    fast = megakernel.render(cam, scene.mats, intersect_fn=isect,
                             num_pixels=24 * 24, iterations=4, spp=24,
                             mode="fast", seed=3)
    a = _c(par)
    b = _c(fast)
    # Same scene, different samplers: image means should agree loosely.
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-9) < 0.25


def test_emitter_contributes_light():
    scene, cam, isect = _cornell_setup()
    state = megakernel.render(cam, scene.mats, intersect_fn=isect,
                              num_pixels=24 * 24, iterations=4, spp=8,
                              mode="parity")
    img = _c(state)
    assert img.mean() > 1e-3  # light reached the film
    assert np.all(np.isfinite(img))


def test_golden_statistics():
    """Regression anchor: fixed seed, fixed scene, iterations=2, spp=4 on
    16x16. If the sampling math changes, this catches it. Values were
    produced by this implementation (v0.1) after all component-level
    parity tests passed."""
    scene, cam, isect = _cornell_setup(w=16, h=16)
    state = megakernel.render(cam, scene.mats, intersect_fn=isect,
                              num_pixels=16 * 16, iterations=2, spp=4,
                              mode="parity")
    img = _c(state)
    stats = np.array([img.mean(), img.std(), img.max()])
    golden = np.load("tests/golden/cornell_16x16_i2_s4.npy")
    np.testing.assert_allclose(stats, golden[:3], rtol=1e-5)
    np.testing.assert_allclose(
        img.reshape(16, 16, 3), golden[3:].reshape(16, 16, 3), rtol=1e-4,
        atol=1e-6,
    )


def test_golden_statistics_full_bsdf():
    """Second golden anchor covering the specular (chromium) and
    refractive (glass) paths via the sphere scene at bounce depth 4."""
    scene, cam, isect = _cornell_setup(w=16, h=16, with_spheres=True)
    state = megakernel.render(cam, scene.mats, intersect_fn=isect,
                              num_pixels=16 * 16, iterations=4, spp=4,
                              mode="parity")
    img = _c(state)
    stats = np.array([img.mean(), img.std(), img.max()])
    golden = np.load("tests/golden/cornell_spheres_16x16_i4_s4.npy")
    np.testing.assert_allclose(stats, golden[:3], rtol=1e-5)
    np.testing.assert_allclose(
        img.reshape(16, 16, 3), golden[3:].reshape(16, 16, 3),
        rtol=1e-4, atol=1e-6,
    )


def test_golden_statistics_analytic_spheres():
    """Regression anchor for the analytic-sphere path: fixed seed,
    cornell with quadric spheres, parity megakernel over the merged
    intersector (first_intersect + sphere_intersect + merge_hits).
    Locks the sphere math the headline bench rides on. Values were
    produced by this implementation after the TPU exactness records
    (jobs zr4/zr8, docs/BENCHMARKS.md)."""
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn

    scene = library.cornell_box(with_spheres=True,
                                analytic_spheres=True)
    cam = library.cornell_camera(16, 16)
    isect = make_intersect_fn(scene, "bruteforce")
    state = megakernel.render(cam, scene.mats, intersect_fn=isect,
                              num_pixels=16 * 16, iterations=2, spp=4,
                              mode="parity")
    img = _c(state)
    stats = np.array([img.mean(), img.std(), img.max()])
    golden = np.load("tests/golden/cornell_analytic_16x16_i2_s4.npy")
    np.testing.assert_allclose(stats, golden[:3], rtol=1e-5)
    np.testing.assert_allclose(
        img.reshape(16, 16, 3), golden[3:].reshape(16, 16, 3),
        rtol=1e-4, atol=1e-6,
    )
