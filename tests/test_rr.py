"""Russian-roulette path termination (wavefront model)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.models import wavefront
from opencl_path_tracer_tpu.ops import intersect, nee
from opencl_path_tracer_tpu.scene import library


def _isect(scene):
    return functools.partial(intersect.first_intersect,
                             tris=scene.tris)


@pytest.mark.slow
def test_rr_matches_base_statistically():
    """RR estimates the SAME depth-capped image: dim-pixel means agree
    (1/p compensation preserves every pickup term's expectation)."""
    w = h = 8
    scene = library.cornell_box(with_spheres=False)
    cam = library.cornell_camera(w, h)
    kw = dict(intersect_fn=_isect(scene), num_pixels=w * h,
              iterations=5, mode="fast", exact_spp=True)
    base = wavefront.render_wavefront(
        cam, scene.mats, min_spp=600, seed=5, **kw)
    rr = wavefront.render_wavefront(
        cam, scene.mats, min_spp=600, seed=9, rr=(2, 0.05), **kw)
    cb = np.asarray(wavefront.colors_by_pixel(base, w * h))
    cr = np.asarray(wavefront.colors_by_pixel(rr, w * h))
    dim = cb.max(-1) < 1.0
    assert dim.sum() > w * h // 2
    a, b = cb[dim].mean(), cr[dim].mean()
    assert abs(a - b) < 0.06 * a + 0.005, (a, b)


def test_rr_shortens_paths():
    """At a fixed step budget, RR completes more samples per lane —
    the whole point: dead-dim bounces become fresh samples."""
    w = h = 16
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    isect = _isect(scene)

    def run(rr):
        st = wavefront.init_wavefront(cam, w * h, seed=1, mode="fast",
                                      key=jax.random.key(1))
        step = jax.jit(lambda s: wavefront.wavefront_step(
            cam, scene.mats, s, intersect_fn=isect, iterations=8,
            mode="fast", key=jax.random.key(1), rr=rr))
        for _ in range(64):
            st = step(st)
        return float(jnp.mean(st.samples))

    base, rr = run(None), run((2, 0.05))
    assert rr > base * 1.1, (base, rr)


@pytest.mark.slow
def test_rr_composes_with_nee():
    w = h = 8
    scene = library.cornell_box(with_spheres=False)
    cam = library.cornell_camera(w, h)
    tab = nee.build_emitter_table(scene.tris, scene.mats,
                                  scene.spheres)
    kw = dict(intersect_fn=_isect(scene), num_pixels=w * h,
              iterations=5, mode="fast", exact_spp=True)
    both = wavefront.render_wavefront(
        cam, scene.mats, min_spp=300, seed=3, rr=(2, 0.05), nee=tab,
        **kw)
    ref = wavefront.render_wavefront(
        cam, scene.mats, min_spp=300, seed=7, nee=tab, **kw)
    cb = np.asarray(wavefront.colors_by_pixel(both, w * h))
    cn = np.asarray(wavefront.colors_by_pixel(ref, w * h))
    assert np.all(np.isfinite(cb))
    dim = cn.max(-1) < 1.0
    a, b = cn[dim].mean(), cb[dim].mean()
    assert abs(a - b) < 0.06 * a + 0.005, (a, b)


def test_rr_config_needs_wavefront():
    from opencl_path_tracer_tpu.config import RenderConfig
    with pytest.raises(ValueError, match="wavefront"):
        RenderConfig(model="megakernel", rr_start=2).validate()
    RenderConfig(model="wavefront", rr_start=2).validate()


def test_cli_rr_render(tmp_path, monkeypatch):
    import sys, os
    from opencl_path_tracer_tpu import cli
    png = str(tmp_path / "r.png")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-empty", "--size", "16x12",
        "--spp", "4", "--iters", "5", "--model", "wavefront",
        "--rr", "2", "--out", png,
    ])
    assert cli.main() == 0
    assert os.path.exists(png)
