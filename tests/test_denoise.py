"""Edge-aware à-trous denoiser (ops/denoise.py)."""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.config import RenderConfig
from opencl_path_tracer_tpu.ops import denoise, intersect
from opencl_path_tracer_tpu.runtime.engine import RenderEngine
from opencl_path_tracer_tpu.scene import library


def _isect(scene):
    return functools.partial(intersect.first_intersect,
                             tris=scene.tris)


def test_primary_aovs_shapes_and_semantics():
    w, h = 24, 16
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    normal, depth = denoise.primary_aovs(
        cam, scene.mats, _isect(scene), w, h
    )
    assert normal.shape == (h, w, 3) and depth.shape == (h, w)
    d = np.asarray(depth)
    n = np.asarray(normal)
    hit = d > 0
    assert hit.mean() > 0.9  # the camera faces the box
    # Hit normals are unit; miss normals zero.
    ln = np.linalg.norm(n, axis=-1)
    np.testing.assert_allclose(ln[hit], 1.0, atol=1e-4)
    np.testing.assert_array_equal(ln[~hit], 0.0)


def test_atrous_constant_image_is_fixed_point():
    """A flat image with flat guides passes through unchanged (the
    weights normalize out)."""
    h, w = 12, 16
    c = jnp.full((h, w, 3), 0.7, jnp.float32)
    n = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (h, w, 1))
    d = jnp.full((h, w), 5.0, jnp.float32)
    out = np.asarray(denoise.atrous_denoise(c, n, d, iterations=3))
    np.testing.assert_allclose(out, 0.7, atol=1e-5)


def test_atrous_preserves_guided_edges():
    """Noise is smoothed within a region but a normal/depth edge
    blocks mixing across it."""
    rng = np.random.default_rng(0)
    h, w = 16, 32
    c = np.full((h, w, 3), 0.2, np.float32)
    c[:, 16:] = 0.9
    noisy = c + rng.normal(0, 0.08, c.shape).astype(np.float32)
    n = np.zeros((h, w, 3), np.float32)
    n[:, :16, 2] = 1.0
    n[:, 16:, 0] = 1.0
    d = np.where(np.arange(w)[None, :] < 16, 3.0, 9.0).astype(
        np.float32
    )[np.zeros(h, int)][..., :]
    out = np.asarray(denoise.atrous_denoise(
        jnp.asarray(noisy), jnp.asarray(n), jnp.asarray(d),
        iterations=3,
    ))
    # Interior noise drops a lot...
    assert out[:, 4:12].std() < 0.35 * noisy[:, 4:12].std()
    # ...while the two sides keep their distinct means (no bleed).
    assert abs(out[:, :14].mean() - 0.2) < 0.03
    assert abs(out[:, 18:].mean() - 0.9) < 0.03


@pytest.mark.slow
def test_denoise_reduces_error_vs_converged():
    """2-spp cornell render, denoised, must land closer to a 128-spp
    render than the noisy input is (linear-light MSE)."""
    w = h = 48
    scene = library.cornell_box(with_spheres=False)

    def render(spp, seed):
        cfg = RenderConfig(width=w, height=h, iterations=3, spp=spp,
                           mode="fast", seed=seed, tonemap="none")
        eng = RenderEngine(scene, cfg)
        eng.render(spp, progress=False)
        return eng

    eng2 = render(2, 1)
    ref = render(128, 2).image(apply_tonemap=False)
    noisy = eng2.image(apply_tonemap=False)
    den = eng2.denoised_image(apply_tonemap=False)
    mse_noisy = float(np.mean((noisy - ref) ** 2))
    mse_den = float(np.mean((den - ref) ** 2))
    # Swept defaults land ~0.04x on this workload; assert a safe 0.2x.
    assert mse_den < 0.2 * mse_noisy, (mse_noisy, mse_den)


@pytest.mark.slow
def test_cli_render_denoise(tmp_path, monkeypatch):
    import os
    import sys
    from opencl_path_tracer_tpu import cli
    png = str(tmp_path / "d.png")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell", "--size", "32x24",
        "--spp", "2", "--iters", "2", "--denoise", "--out", png,
    ])
    assert cli.main() == 0
    assert os.path.exists(png)
