"""Lane sorting keeps the wavefront unbiased and pixel-correct."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.models import wavefront
from opencl_path_tracer_tpu.ops import intersect, raygen
from opencl_path_tracer_tpu.scene import library


@pytest.mark.slow
def test_sorted_wavefront_matches_unsorted_statistically():
    w = h = 16
    scene = library.cornell_box(with_spheres=False)
    cam = library.cornell_camera(w, h)
    isect = functools.partial(intersect.first_intersect, tris=scene.tris)
    key = jax.random.key(3)

    v = np.concatenate([
        np.asarray(scene.tris.r1), np.asarray(scene.tris.r2),
        np.asarray(scene.tris.r3),
    ])
    lo = v.min(0)
    inv = 1.0 / np.maximum(v.max(0) - lo, 1e-9)
    bounds = (tuple(map(float, lo)), tuple(map(float, inv)))

    def run(sort_every):
        st = wavefront.init_wavefront(cam, w * h, mode="fast", key=key)
        step = jax.jit(lambda s: wavefront.wavefront_step(
            cam, scene.mats, s, intersect_fn=isect, iterations=3,
            mode="fast", key=key, sort_every=sort_every,
            scene_bounds=bounds,
        ))
        for _ in range(60):
            st = step(st)
        return st

    plain = run(0)
    srt = run(2)

    # Sorted lanes end scrambled; colors_by_pixel unscrambles them.
    img_a = wavefront.colors_by_pixel(plain)
    img_b = wavefront.colors_by_pixel(srt)
    # Pixel ids must remain a permutation of all pixels.
    assert sorted(np.asarray(srt.pixel).tolist()) == list(range(w * h))
    # Unbiased estimators of the same image: means agree loosely.
    assert abs(img_a.mean() - img_b.mean()) / img_a.mean() < 0.2
    assert np.asarray(srt.samples).min() >= 1


def test_colors_by_pixel_merges_multi_lane_sample_weighted():
    """More lanes than pixels: per-pixel color = sample-weighted mean
    of the lanes' running averages."""
    import dataclasses
    import jax.numpy as jnp
    import numpy as np
    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.scene import library

    scene = library.cornell_box(with_spheres=False)
    cam = library.cornell_camera(8, 8)
    n_pix = 64
    ids = jnp.tile(jnp.arange(n_pix, dtype=jnp.int32), 2)
    st = wavefront.init_wavefront(cam, n_pix * 2, mode="fast",
                                  key=jax.random.key(0), ids=ids)
    # Lane i of pixel p holds mean c with s samples; lane n_pix+i holds
    # mean 2c with 3s samples -> merged mean = (c*s + 2c*3s)/(4s).
    base = jnp.arange(n_pix, dtype=jnp.float32) + 1.0
    colors = tuple(
        jnp.concatenate([base * (k + 1), 2.0 * base * (k + 1)])
        for k in range(3)
    )
    samples = jnp.concatenate([
        jnp.full((n_pix,), 2, jnp.int32), jnp.full((n_pix,), 6, jnp.int32)
    ])
    st = dataclasses.replace(st, colors=colors, samples=samples)
    out = wavefront.colors_by_pixel(st, n_pix)
    expect = np.stack([
        (np.arange(n_pix) + 1.0) * (k + 1) * (2 + 2 * 6) / 8.0
        for k in range(3)
    ], axis=1).astype(np.float32)
    np.testing.assert_allclose(out, expect, rtol=1e-6)
