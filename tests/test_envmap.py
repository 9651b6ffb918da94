"""Image-based environment lighting (ops/envmap.py): build, sampler,
pdf identity, MIS estimator equality, and variance reduction.

The reference has no environment-map machinery at all (its miss
branch carries only the dormant constant-sky code, prog.cl:367-376)
— these tests validate the beyond-parity feature against itself:
both MIS estimator halves must integrate the same light.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.models import megakernel, wavefront
from opencl_path_tracer_tpu.ops import envmap
from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn
from opencl_path_tracer_tpu.scene import library
from opencl_path_tracer_tpu.scene.builder import SceneBuilder


def _open_scene():
    """Floor + a floating blocker panel under an open sky: env light
    dominates, the blocker makes shadow-ray visibility matter, and
    bounce rays frequently escape (so BOTH MIS halves are exercised)."""
    b = SceneBuilder()
    white = b.add_material((0.75, 0.75, 0.75), (0.2, 0.2, 0.2),
                           (0, 0, 0), (1.5, 1.5, 1.5), (0, 0, 0), 30.0, 0)
    red = b.add_material((0.7, 0.2, 0.2), (0.2, 0.2, 0.2),
                         (0, 0, 0), (1.5, 1.5, 1.5), (0, 0, 0), 30.0, 0)
    s = 600.0
    # floor at y=0 (two tris), centered under the cornell camera axis
    z0, z1 = -s, 1000.0 + s
    b.add_triangle((-s, 0, z0), (s, 0, z0), (s, 0, z1), white)
    b.add_triangle((-s, 0, z0), (s, 0, z1), (-s, 0, z1), white)
    # blocker panel above, small, casts an env shadow onto the floor
    y, hw = 250.0, 120.0
    zc = 500.0
    b.add_triangle((-hw, y, zc - hw), (hw, y, zc - hw),
                   (hw, y, zc + hw), red)
    b.add_triangle((-hw, y, zc - hw), (hw, y, zc + hw),
                   (-hw, y, zc + hw), red)
    return b.build()


def _imgs(scene, env, w=16, h=16, spp=300, iters=3, seeds=(3, 11)):
    isect = make_intersect_fn(scene, "bruteforce")
    cam = library.cornell_camera(w, h)
    out = []
    for seed in seeds:
        st = megakernel.render(cam, scene.mats, spp=spp, seed=seed,
                               intersect_fn=isect, num_pixels=w * h,
                               iterations=iters, mode="fast", env=env)
        out.append(np.asarray(
            megakernel.colors_array(st)).reshape(-1, 3))
    return out


def test_build_tables():
    E = envmap.build_envmap(envmap.sun_sky(), sample_res=(64, 32))
    p = np.asarray(E.prob)
    c = np.asarray(E.cum)
    assert abs(p.sum() - 1.0) < 1e-4
    assert np.all(np.diff(c) >= 0) and c[-1] == 1.0
    assert np.all(p >= 0)
    assert E.img.shape == (E.Hi * E.Wi, 4)
    with pytest.raises(ValueError):
        envmap.build_envmap(np.zeros((8, 16, 3)))  # black
    with pytest.raises(ValueError):
        envmap.build_envmap(np.full((8, 16, 3), -1.0))  # negative


def test_sampler_pdf_identity():
    """env_pdf_sa recomputes the sampler's own pdf bit-for-bit (the
    MIS split is consistent only if both sides agree on p_env)."""
    E = envmap.build_envmap(envmap.sun_sky(), sample_res=(32, 16))
    u = jax.random.uniform(jax.random.key(7), (3, 50_000))
    d, pdf = envmap.sample_envmap(E, u[0], u[1], u[2])
    pdf2 = envmap.env_pdf_sa(E, d)
    assert np.array_equal(np.asarray(pdf), np.asarray(pdf2))
    # unit directions
    n2 = sum(np.asarray(c) ** 2 for c in d)
    assert np.abs(n2 - 1.0).max() < 1e-5
    # every pdf positive (sampled texels have prob > 0 by definition)
    assert np.asarray(pdf).min() > 0


def test_sampler_integrates_radiance():
    """E[L/pdf] over pdf-sampled directions = integral of L — tight on
    a smooth map where L/pdf is near-constant per texel."""
    img = envmap.gradient_sky(res=(64, 32))
    E = envmap.build_envmap(img, sample_res=(64, 32))
    u = jax.random.uniform(jax.random.key(3), (3, 100_000))
    d, pdf = envmap.sample_envmap(E, u[0], u[1], u[2])
    L = envmap.env_radiance(E, d)
    lum = (0.2126 * np.asarray(L[0]) + 0.7152 * np.asarray(L[1])
           + 0.0722 * np.asarray(L[2]))
    est = (lum / np.asarray(pdf)).mean()
    th = np.cos(np.linspace(0, np.pi, img.shape[0] + 1))
    dc = th[:-1] - th[1:]
    lumimg = img @ np.array([0.2126, 0.7152, 0.0722])
    ana = (lumimg * dc[:, None] * (2 * np.pi / img.shape[1])).sum()
    assert abs(est - ana) < 0.02 * ana, (est, ana)


def test_radiance_lookup_constant_and_rows():
    """A constant map reads back constant anywhere; a row-graded map
    reads the right row at texel centers (equirect v = theta/pi)."""
    img = np.full((16, 32, 3), 2.5)
    E = envmap.build_envmap(img, sample_res=(8, 4))
    d = (jnp.array([0.0, 1.0, 0.3]), jnp.array([1.0, 0.0, -0.4]),
         jnp.array([0.0, 0.0, 0.866]))
    n = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)
    d = tuple(c / n for c in d)
    L = envmap.env_radiance(E, d)
    for c in L:
        np.testing.assert_allclose(np.asarray(c), 2.5, rtol=1e-5)
    # graded rows: value = row index; sample at exact row centers
    hi, wi = 8, 16
    img2 = np.broadcast_to(
        np.arange(hi, dtype=np.float64)[:, None, None], (hi, wi, 3)
    ).copy() + 1.0
    E2 = envmap.build_envmap(img2, sample_res=(4, 4))
    theta = (np.arange(hi) + 0.5) / hi * np.pi
    dy = jnp.asarray(np.cos(theta), jnp.float32)
    st = jnp.asarray(np.sin(theta), jnp.float32)
    L2 = envmap.env_radiance(E2, (st, dy, jnp.zeros_like(dy)))
    np.testing.assert_allclose(np.asarray(L2[0]),
                               np.arange(hi) + 1.0, rtol=1e-4)


def test_scale_folds_into_radiance():
    img = envmap.gradient_sky(res=(32, 16))
    E1 = envmap.build_envmap(img, sample_res=(16, 8))
    E3 = envmap.build_envmap(img, sample_res=(16, 8), scale=3.0)
    d = (jnp.array([0.0]), jnp.array([1.0]), jnp.array([0.0]))
    a = np.asarray(envmap.env_radiance(E1, d))
    b = np.asarray(envmap.env_radiance(E3, d))
    np.testing.assert_allclose(b, 3.0 * a, rtol=1e-5)
    # the sampling distribution is scale-invariant
    np.testing.assert_allclose(np.asarray(E1.prob),
                               np.asarray(E3.prob), atol=1e-6)


def test_estimator_equality_and_variance():
    """Renderer-level MIS identity: env NEE converges to the pickup-
    only image (same light, same scene), at much lower variance under
    a small bright sun — the same protocol as the emitter-NEE
    equality tests (tests/test_nee.py)."""
    scene = _open_scene()
    img = envmap.sun_sky(sun_dir=(0.25, 0.9, 0.1),
                         sun_radiance=(900.0, 850.0, 800.0),
                         sun_angle_deg=4.0, sky=(0.08, 0.1, 0.16),
                         res=(128, 64))
    base = envmap.build_envmap(img, sample_res=(64, 32), nee=False)
    nee = envmap.build_envmap(img, sample_res=(64, 32), nee=True)
    b1, b2 = _imgs(scene, base, spp=1000)
    n1, n2 = _imgs(scene, nee, spp=250)
    bm, nm = 0.5 * (b1 + b2), 0.5 * (n1 + n2)
    # compare on floor/blocker pixels (primary misses show the map
    # identically in both configs — exclude them from the mean)
    lit = bm.max(-1) < 5.0
    assert lit.sum() > bm.shape[0] // 3
    bd, nd = bm[lit].mean(), nm[lit].mean()
    assert abs(bd - nd) < 0.06 * bd + 0.01, (bd, nd)
    base_dev = np.abs(b1 - b2)[lit].mean()
    nee_dev = np.abs(n1 - n2)[lit].mean()
    # 4x fewer samples AND far smaller seed-to-seed deviation
    assert nee_dev < 0.5 * base_dev, (nee_dev, base_dev)


def test_wavefront_matches_megakernel_envnee():
    """The wavefront model's env-NEE composition converges to the
    megakernel's (different scheduling, same estimator)."""
    scene = _open_scene()
    E = envmap.build_envmap(
        envmap.sun_sky(sun_angle_deg=6.0,
                       sun_radiance=(300.0, 280.0, 260.0),
                       res=(64, 32)),
        sample_res=(32, 16), nee=True)
    isect = make_intersect_fn(scene, "bruteforce")
    w = h = 12
    cam = library.cornell_camera(w, h)
    mk = megakernel.render(cam, scene.mats, spp=220, seed=5,
                           intersect_fn=isect, num_pixels=w * h,
                           iterations=3, mode="fast", env=E)
    a = np.asarray(megakernel.colors_array(mk)).reshape(-1, 3)
    ws = wavefront.render_wavefront(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=3, min_spp=220, exact_spp=True, mode="fast",
        seed=9, env=E)
    b = wavefront.colors_by_pixel(ws, w * h)
    lit = a.max(-1) < 5.0
    assert abs(a[lit].mean() - b[lit].mean()) < \
        0.08 * a[lit].mean() + 0.01


def test_envmap_none_paths_untouched():
    """env=None and EnvLight behavior are unchanged by the EnvMap
    wiring (bit-identical to a pre-envmap reference run is covered by
    the parity suites; here: EnvLight still routes to the constant
    path and produces the dormant-code sky on a primary miss)."""
    scene = _open_scene()
    isect = make_intersect_fn(scene, "bruteforce")
    cam = library.cornell_camera(8, 8)
    st = megakernel.render(cam, scene.mats, spp=2, seed=1,
                           intersect_fn=isect, num_pixels=64,
                           iterations=2, mode="fast",
                           env=megakernel.EnvLight())
    c = np.asarray(megakernel.colors_array(st)).reshape(-1, 3)
    assert np.isfinite(c).all()
    # some pixel sees the sky constant (0, 0.75, 2) directly
    sky = np.array([0.0, 0.75, 2.0])
    assert (np.abs(c - sky).max(-1) < 1e-4).any()


def test_cli_envmap_render(tmp_path, monkeypatch):
    import sys
    out = str(tmp_path / "env.png")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell", "--size", "16x16",
        "--spp", "2", "--iters", "2", "--mode", "fast",
        "--accel", "bruteforce", "--model", "wavefront",
        "--envmap", "gradient", "--env-scale", "0.7", "--out", out,
    ])
    from opencl_path_tracer_tpu.cli import main
    main()
    import os
    assert os.path.getsize(out) > 100


def test_config_envmap_roundtrip_and_validation():
    from opencl_path_tracer_tpu.config import RenderConfig
    cfg = RenderConfig(env_map="sunsky", env_scale=2.0,
                       env_nee=False, env_sample_res=(32, 16))
    cfg2 = RenderConfig.from_json(cfg.to_json())
    assert cfg2.env_map == "sunsky" and cfg2.env_scale == 2.0
    assert cfg2.env_sample_res == (32, 16) and not cfg2.env_nee
    with pytest.raises(ValueError):
        RenderConfig(env_map="sunsky", env_light=True).validate()
    with pytest.raises(ValueError):
        RenderConfig(env_map="sunsky", env_scale=0.0).validate()
