"""Wavefront (path regeneration) model: must agree with the megakernel
bit-for-bit in parity mode at equal per-pixel spp."""

import functools

import numpy as np
import pytest
import jax.numpy as jnp

from opencl_path_tracer_tpu.models import megakernel, wavefront
from opencl_path_tracer_tpu.ops import intersect
from opencl_path_tracer_tpu.scene import library


def _c(state_or_colors):
    """(N, 3) array from a V3 colors tuple or a state holding one."""
    c = getattr(state_or_colors, "colors", state_or_colors)
    return np.stack([np.asarray(x) for x in c], axis=-1)


def _setup(w=24, h=24):
    scene = library.cornell_box(with_spheres=False)
    cam = library.cornell_camera(w, h)
    isect = functools.partial(intersect.first_intersect, tris=scene.tris)
    return scene, cam, isect


@pytest.mark.slow
def test_wavefront_matches_megakernel_parity():
    w = h = 24
    scene, cam, isect = _setup(w, h)
    spp, iters = 4, 3

    mk = megakernel.render(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=iters, spp=spp, mode="parity",
    )
    wf = wavefront.render_wavefront(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=iters, min_spp=spp, mode="parity", exact_spp=True,
    )
    assert int(np.asarray(wf.samples).min()) == spp
    assert int(np.asarray(wf.samples).max()) == spp
    a, b = _c(mk), _c(wf)
    # Same math, same RNG draws; the two compiled graphs may reassociate
    # float adds differently, so allow last-ulp wiggle but require the
    # overwhelming majority to be bit-identical.
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-30)
    bit_equal = (a == b).all(axis=1).mean()
    assert bit_equal > 0.95
    # rng_state intentionally differs: each wavefront lane has already
    # drawn the NEXT sample's gen_ray jitter when it hit the spp cap.


@pytest.mark.slow
def test_wavefront_free_running_unbiased():
    w = h = 16
    scene, cam, isect = _setup(w, h)
    wf = wavefront.render_wavefront(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=3, min_spp=16, mode="fast", seed=2,
    )
    samples = np.asarray(wf.samples)
    assert samples.min() >= 16
    mk = megakernel.render(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=3, spp=32, mode="fast", seed=2,
    )
    a = _c(wf).mean()
    b = _c(mk).mean()
    assert abs(a - b) / max(b, 1e-9) < 0.2


@pytest.mark.slow
def test_wavefront_every_step_full_occupancy():
    """Regeneration means no idle lanes: after any number of steps with
    no cap, bounce counts stay within [0, iterations)."""
    w = h = 8
    scene, cam, isect = _setup(w, h)
    import jax
    key = jax.random.key(0)
    st = wavefront.init_wavefront(cam, w * h, mode="fast", key=key)
    for _ in range(10):
        st = wavefront.wavefront_step(
            cam, scene.mats, st, intersect_fn=isect, iterations=4,
            mode="fast", key=key,
        )
    b = np.asarray(st.bounce)
    assert np.all((b >= 0) & (b < 4))
    assert np.asarray(st.samples).sum() > 0
