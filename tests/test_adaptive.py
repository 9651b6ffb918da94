"""Adaptive sampling (per-pixel variance stop + lane compaction)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.models import megakernel, wavefront
from opencl_path_tracer_tpu.ops import intersect
from opencl_path_tracer_tpu.scene import library


def _isect(scene):
    return functools.partial(intersect.first_intersect,
                             tris=scene.tris)


@pytest.mark.slow
def test_welford_m2_matches_numpy_variance():
    """lum_m2 after n completed samples equals numpy's sum of squared
    deviations of the per-sample luminances (reconstructed from the
    running means of successive fixed-spp renders)."""
    w = h = 8
    n_spp = 5
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    isect = _isect(scene)
    st = wavefront.render_wavefront(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=3, min_spp=n_spp, mode="parity", seed=1,
        exact_spp=True,
    )
    # Variance-tracked run at the same spp (tol=0 never converges
    # below the cap, so sampling is identical).
    state = wavefront.init_wavefront(cam, w * h, seed=1,
                                     mode="parity")
    step = jax.jit(lambda s: wavefront.wavefront_step(
        cam, scene.mats, s, intersect_fn=isect, iterations=3,
        mode="parity", max_samples=n_spp, variance_tol=0.0,
        min_samples=n_spp,  # never stop early: tracking-only run
    ))
    for _ in range(n_spp * 3 + 8):
        state = step(state)
    assert int(jnp.min(state.samples)) == n_spp
    # Per-sample luminances via differencing running means at k spp.
    means = []
    for k in range(1, n_spp + 1):
        stk = wavefront.render_wavefront(
            cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
            iterations=3, min_spp=k, mode="parity", seed=1,
            exact_spp=True,
        )
        means.append(wavefront.colors_by_pixel(stk))
    lums = []
    prev = np.zeros_like(means[0])
    for k, m in enumerate(means, start=1):
        sample = m * k - prev * (k - 1)
        prev = m
        lums.append(0.2126 * sample[:, 0] + 0.7152 * sample[:, 1]
                    + 0.0722 * sample[:, 2])
    lums = np.stack(lums, 0)  # (n_spp, N)
    expected_m2 = ((lums - lums.mean(0)) ** 2).sum(0)
    got = np.zeros(w * h, np.float32)
    got[np.asarray(state.pixel)] = np.asarray(state.lum_m2)
    np.testing.assert_allclose(got, expected_m2, rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_adaptive_compaction_bit_equal_parity():
    """Parity mode: compaction on == compaction off, bit for bit
    (lane order is free; per-lane streams travel with the lane)."""
    w = h = 16
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    isect = _isect(scene)
    kw = dict(intersect_fn=isect, num_pixels=w * h, iterations=3,
              tol=0.25, max_spp=12, min_spp=2, mode="parity", seed=1,
              min_bucket=32)
    a = wavefront.render_adaptive(cam, scene.mats, compact=True, **kw)
    b = wavefront.render_adaptive(cam, scene.mats, compact=False, **kw)
    ca = wavefront.colors_by_pixel(a, w * h)
    cb = wavefront.colors_by_pixel(b, w * h)
    np.testing.assert_array_equal(ca, cb)
    sa = np.zeros(w * h, np.int32)
    sa[np.asarray(a.pixel)] = np.asarray(a.samples)
    sb = np.zeros(w * h, np.int32)
    sb[np.asarray(b.pixel)] = np.asarray(b.samples)
    np.testing.assert_array_equal(sa, sb)
    # The run actually compacted (open lanes fell below half) and
    # actually adapted (spp varies across pixels within the bounds).
    assert sa.min() >= 2 and sa.max() <= 12
    assert sa.min() < sa.max()


@pytest.mark.slow
def test_engine_adaptive_render_and_cli(tmp_path, monkeypatch, capsys):
    import sys
    from opencl_path_tracer_tpu import cli
    png = str(tmp_path / "a.png")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell", "--size", "32x24",
        "--spp", "16", "--iters", "3", "--model", "wavefront",
        "--adaptive", "0.2", "--min-spp", "2", "--out", png,
    ])
    assert cli.main() == 0
    import os
    assert os.path.exists(png)
    err = capsys.readouterr().err
    assert "adaptive: spp min" in err


def test_cli_adaptive_requires_wavefront(tmp_path, monkeypatch):
    import sys
    from opencl_path_tracer_tpu import cli
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-empty", "--size", "8x8",
        "--spp", "4", "--adaptive", "0.1",
        "--out", str(tmp_path / "x.png"),
    ])
    with pytest.raises(SystemExit, match="wavefront"):
        cli.main()


def test_adaptive_spends_rays_where_variance_is():
    """Pixels that converge early take fewer samples than the noisy
    ones, and high-sample pixels have higher empirical variance."""
    w = h = 16
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    st = wavefront.render_adaptive(
        cam, scene.mats, intersect_fn=_isect(scene),
        num_pixels=w * h, iterations=3, tol=0.15, max_spp=32,
        min_spp=2, mode="fast", seed=1, min_bucket=32,
    )
    smp = np.zeros(w * h, np.int32)
    smp[np.asarray(st.pixel)] = np.asarray(st.samples)
    m2 = np.zeros(w * h, np.float32)
    m2[np.asarray(st.pixel)] = np.asarray(st.lum_m2)
    assert smp.min() >= 2 and smp.max() <= 32 and smp.min() < smp.max()
    # Mean per-sample variance among capped pixels exceeds the
    # early-stoppers' (that's what drove the extra samples).
    var = m2 / np.maximum(smp - 1, 1)
    capped = smp >= 32
    early = smp <= 4
    if capped.any() and early.any():
        assert var[capped].mean() > var[early].mean()

@pytest.mark.slow
def test_engine_adaptive_mesh_matches_single_device():
    """Mesh-sharded adaptive render (per-shard compaction) is
    bit-identical to the single-device adaptive render in parity
    mode: open lanes step every step in both schemes regardless of
    bucket membership, and per-lane parity streams travel with the
    lane, so parking policy cannot change any lane's result."""
    from opencl_path_tracer_tpu.config import RenderConfig
    from opencl_path_tracer_tpu.runtime.engine import RenderEngine
    from opencl_path_tracer_tpu.scene import library as _lib

    w, h = 32, 16
    scene = _lib.cornell_box(with_spheres=True)

    def run(devices):
        cfg = RenderConfig(width=w, height=h, iterations=3, spp=12,
                           mode="parity", model="wavefront",
                           accel="bruteforce", devices=devices)
        eng = RenderEngine(scene, cfg)
        eng.render_adaptive(0.25, max_spp=12, min_spp=2,
                            progress=False)
        colors = wavefront.colors_by_pixel(eng.state, w * h)
        smp = np.zeros(w * h, np.int32)
        smp[np.asarray(eng.state.pixel)] = np.asarray(
            eng.state.samples)
        return np.asarray(colors), smp

    c1, s1 = run(1)
    c8, s8 = run(8)
    np.testing.assert_array_equal(c1, c8)
    np.testing.assert_array_equal(s1, s8)
    assert s1.min() >= 2 and s1.max() <= 12 and s1.min() < s1.max()


def test_engine_adaptive_bucket_halving_regression():
    """The compaction ladder actually HALVES (num_pixels > 2x the
    engine's min_bucket=4096): the k-step runner must re-lift its
    jaxpr per lane count — replaying the full-size lifted jaxpr on a
    halved state was an MLIR verifier error (found on TPU
    2026-08-20; earlier CPU tests never crossed the 4096 floor)."""
    from opencl_path_tracer_tpu.config import RenderConfig
    from opencl_path_tracer_tpu.runtime.engine import RenderEngine
    from opencl_path_tracer_tpu.scene import library as _lib

    import jax.numpy as jnp

    w, h = 64, 32
    scene = _lib.cornell_box(with_spheres=False)
    cfg = RenderConfig(width=w, height=h, iterations=2, mode="fast",
                       model="wavefront", accel="bruteforce")
    eng = RenderEngine(scene, cfg)
    run = eng._wf_step(2, variance=(0.25, 2))
    cam = eng.controller.camera(w, h)
    full = eng.state
    st1 = run(full, cam, jnp.int32(8), 2)  # full-size trace
    # Drive the SAME cached runner with a halved state — exactly what
    # the compaction ladder does after parking the converged tail.
    open_mask = np.zeros(w * h, bool)
    open_mask[: w * h // 2] = True
    half, _tail = wavefront.state_split(
        wavefront.sort_open_first(st1, jnp.asarray(open_mask)),
        w * h // 2,
    )
    st2 = run(half, cam, jnp.int32(8), 2)  # raised pre-fix
    assert st2.samples.shape[0] == w * h // 2
    assert np.isfinite(np.asarray(st2.colors[0])).all()


# --- adaptive auto policy (VERDICT r4 #8) ----------------------------


def _auto_probe_engine(scene, nee, w=48, h=48, min_spp=8):
    from opencl_path_tracer_tpu.config import CameraConfig, RenderConfig
    from opencl_path_tracer_tpu.runtime.engine import RenderEngine
    cfg = RenderConfig(
        width=w, height=h, iterations=5, mode="fast",
        model="wavefront", nee=nee, spp=min_spp,
        camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                            shift=(0.0, 0.0, 0.0)),
    )
    eng = RenderEngine(scene, cfg)
    eng.render_adaptive(0.05, max_spp=min_spp, min_spp=min_spp,
                        progress=False)
    return eng


@pytest.mark.slow
def test_adaptive_auto_separates_anchor_scenes():
    """The auto policy's probe must clear the bars exactly on the
    measured anchors: sphere-lamp + NEE (the x3.04 win,
    docs/BENCHMARKS.md session 10) predicts adaptive; the no-NEE
    cornell (spiky emitter-hit variance — early SEMs lie) is kept on
    the fixed path by the zero-variance-liar guard."""
    from opencl_path_tracer_tpu.runtime.engine import (
        ADAPTIVE_MAX_ZERO_VAR_FRAC, ADAPTIVE_MIN_PREDICTED_SPEEDUP,
    )
    win = _auto_probe_engine(
        library.cornell_box(with_spheres=True, analytic_spheres=True,
                            sphere_lamp=True), nee=True)
    sp, zv = win.adaptive_prediction(0.05, 256, 8)
    assert sp >= ADAPTIVE_MIN_PREDICTED_SPEEDUP
    assert zv <= ADAPTIVE_MAX_ZERO_VAR_FRAC

    lose = _auto_probe_engine(
        library.cornell_box(with_spheres=True, analytic_spheres=True),
        nee=False)
    _sp, zv = lose.adaptive_prediction(0.05, 256, 8)
    assert zv > ADAPTIVE_MAX_ZERO_VAR_FRAC


@pytest.mark.slow
def test_engine_adaptive_auto_end_to_end(tmp_path, monkeypatch,
                                         capsys):
    """--adaptive auto runs the probe, prints the decision, and
    produces a render either way."""
    import sys

    from opencl_path_tracer_tpu import cli
    png = str(tmp_path / "auto.png")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-sphere-lamp",
        "--size", "24x16", "--spp", "12", "--iters", "3",
        "--model", "wavefront", "--nee", "--adaptive", "auto",
        "--adaptive-tol", "0.2", "--min-spp", "2", "--out", png,
    ])
    assert cli.main() == 0
    import os
    assert os.path.exists(png)
    err = capsys.readouterr().err
    assert "adaptive auto ->" in err
    assert "adaptive: spp min" in err


def test_cli_adaptive_rejects_garbage(tmp_path, monkeypatch):
    import sys

    from opencl_path_tracer_tpu import cli
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-empty", "--size", "8x8",
        "--spp", "4", "--model", "wavefront", "--adaptive", "soon",
        "--out", str(tmp_path / "x.png"),
    ])
    with pytest.raises(SystemExit, match="auto"):
        cli.main()
