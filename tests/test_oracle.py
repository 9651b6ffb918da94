"""Independent-oracle parity: the vectorized renderer vs a scalar,
statement-by-statement execution of prog.cl (utils/oracle.py).

The two implementations share no code paths (select-everything
vectorization vs literal sequential control flow), so agreement here is
the repo's parity evidence:
  * final per-pixel Lehmer integer states must match EXACTLY — this
    pins the draw order and the per-branch draw counts, and transitively
    every hit/miss and material-dispatch decision along every path;
  * colors agree to float32 rounding noise.
"""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.models import megakernel, wavefront
from opencl_path_tracer_tpu.ops import intersect
from opencl_path_tracer_tpu.scene import library
from opencl_path_tracer_tpu.utils import oracle

pytestmark = pytest.mark.slow


def _render_both(scene, cam, w, h, iterations, spp):
    isect = functools.partial(intersect.first_intersect, tris=scene.tris)
    st = megakernel.render(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=iterations, spp=spp, mode="parity", seed=1,
    )
    ours = np.asarray(megakernel.colors_array(st))
    ours_rng = np.asarray(st.rng_state)
    ref_colors, ref_rng = oracle.render_oracle(
        scene, cam, width=w, height=h, iterations=iterations, spp=spp,
        seed=1,
    )
    return ours, ours_rng, ref_colors, ref_rng


@pytest.mark.parametrize("iterations,spp", [(1, 2), (2, 3), (5, 2)])
def test_megakernel_matches_scalar_oracle(iterations, spp):
    w = h = 16
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    ours, ours_rng, ref_colors, ref_rng = _render_both(
        scene, cam, w, h, iterations, spp
    )
    # Integer RNG states: exact. This is the draw-order/draw-count proof.
    np.testing.assert_array_equal(ours_rng, ref_rng)
    # Colors: float32 rounding only.
    np.testing.assert_allclose(ours, ref_colors, rtol=2e-5, atol=2e-6)


def test_wavefront_matches_scalar_oracle():
    """The flagship wavefront model (path regeneration) reproduces the
    same per-pixel streams and colors at equal spp."""
    w = h = 16
    iterations, spp = 3, 2
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    isect = functools.partial(intersect.first_intersect, tris=scene.tris)
    st = wavefront.render_wavefront(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=iterations, min_spp=spp, mode="parity", seed=1,
        exact_spp=True,
    )
    ours = wavefront.colors_by_pixel(st)
    ref_colors, _ = oracle.render_oracle(
        scene, cam, width=w, height=h, iterations=iterations, spp=spp,
        seed=1,
    )
    np.testing.assert_allclose(ours, ref_colors, rtol=2e-5, atol=2e-6)


def test_oracle_rand_matches_reference_closed_form():
    """The oracle's rand() IS the Lehmer recurrence of prog.cl:72-77."""
    seeds = np.asarray([1], np.int64)
    vals = [oracle.rand(seeds, 0) for _ in range(5)]
    x, expect = 1, []
    for _ in range(5):
        x = (x * 48271) % 2147483647
        expect.append(np.float32(x) / np.float32(2147483647.0))
    assert vals == expect
