"""Low-discrepancy (R2) camera jitter: ops.rng.r2_jitter + --qmc."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.models import megakernel
from opencl_path_tracer_tpu.ops import intersect, rng
from opencl_path_tracer_tpu.scene import library


def test_r2_points_stratify():
    """One pixel's first 64 points keep the R2 minimum-distance
    guarantee (~0.55/sqrt(N)); a hash sequence clusters far tighter."""
    key = jax.random.key(3)
    pix = jnp.zeros((64,), jnp.int32)
    s = jnp.arange(64)
    u, v = rng.r2_jitter(key, pix, s)
    pts = np.stack([np.asarray(u), np.asarray(v)], -1)
    d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    np.fill_diagonal(d, 1.0)
    # Torus distance (the sequence wraps).
    dw = np.linalg.norm(
        np.minimum(np.abs(pts[:, None] - pts[None, :]),
                   1 - np.abs(pts[:, None] - pts[None, :])), axis=-1)
    np.fill_diagonal(dw, 1.0)
    assert dw.min() > 0.3 / np.sqrt(64), dw.min()
    # Determinism + per-pixel decorrelation.
    u2, v2 = rng.r2_jitter(key, pix, s)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))
    u3, _ = rng.r2_jitter(key, jnp.ones((64,), jnp.int32), s)
    assert not np.array_equal(np.asarray(u), np.asarray(u3))
    assert np.all(pts >= 0.0) and np.all(pts < 1.0)


def test_r2_integrates_smooth_function_faster():
    """Mean of f(u,v)=u+v over each pixel's first 256 samples: R2's
    error is far below the hash engine's O(1/sqrt(N))."""
    key = jax.random.key(5)
    P, N = 128, 256
    pix = jnp.repeat(jnp.arange(P, dtype=jnp.int32), N)
    s = jnp.tile(jnp.arange(N, dtype=jnp.int32), P)
    u, v = rng.r2_jitter(key, pix, s)
    qmc_means = (np.asarray(u) + np.asarray(v)).reshape(P, N).mean(1)
    # Hash engine baseline: same count of draws per pixel.
    us = [rng.fast_uniforms(key, i, 0, (P,), 2) for i in range(N)]
    pr = np.stack([np.asarray(a[0] + a[1]) for a in us], -1).mean(1)
    err_qmc = np.abs(qmc_means - 1.0).mean()
    err_prng = np.abs(pr - 1.0).mean()
    assert err_qmc < 0.25 * err_prng, (err_qmc, err_prng)


@pytest.mark.slow
def test_qmc_preview_converges_faster():
    """Preview mode (iterations=1) integrates flat shading over the
    pixel footprint — the pure anti-aliasing workload. QMC at 32 spp
    beats the hash engine at 32 spp in MSE vs a converged preview."""
    w = h = 24
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    isect = functools.partial(intersect.first_intersect,
                              tris=scene.tris)
    kw = dict(intersect_fn=isect, num_pixels=w * h, iterations=1,
              mode="fast")

    def img(spp, seed, qmc):
        st = megakernel.render(cam, scene.mats, spp=spp, seed=seed,
                               qmc=qmc, **kw)
        return np.asarray(megakernel.colors_array(st))

    ref = img(2048, 1, True)
    mse_q = ((img(32, 7, True) - ref) ** 2).mean()
    mse_p = ((img(32, 7, False) - ref) ** 2).mean()
    assert mse_q < 0.6 * mse_p, (mse_q, mse_p)


def test_qmc_config_needs_fast_mode():
    from opencl_path_tracer_tpu.config import RenderConfig
    with pytest.raises(ValueError, match="fast"):
        RenderConfig(mode="parity", qmc=True).validate()
    RenderConfig(mode="fast", qmc=True).validate()


def test_cli_qmc_render(tmp_path, monkeypatch):
    import sys, os
    from opencl_path_tracer_tpu import cli
    png = str(tmp_path / "q.png")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-empty", "--size", "16x12",
        "--spp", "4", "--iters", "3", "--model", "wavefront", "--qmc",
        "--out", png,
    ])
    assert cli.main() == 0
    assert os.path.exists(png)
