"""Runtime layer: engine, controller, meter, median filter, CLI."""

import io
import os

import numpy as np
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.config import RenderConfig, CameraConfig
from opencl_path_tracer_tpu.ops.median_filter import median3x3
from opencl_path_tracer_tpu.runtime.controller import CameraController
from opencl_path_tracer_tpu.runtime.engine import RenderEngine
from opencl_path_tracer_tpu.runtime.meter import PerfMeter
from opencl_path_tracer_tpu.scene import library


def _c(state_or_colors):
    """(N, 3) array from a V3 colors tuple or a state holding one."""
    c = getattr(state_or_colors, "colors", state_or_colors)
    return np.stack([np.asarray(x) for x in c], axis=-1)


def _cfg(**kw):
    base = dict(
        width=24, height=24, iterations=2, spp=2, mode="parity",
        accel="bruteforce",
        camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                            shift=(0.0, 0.0, 0.0)),
    )
    base.update(kw)
    return RenderConfig(**base)


@pytest.mark.slow
def test_engine_offline_render_and_png(tmp_path):
    scene = library.cornell_box(with_spheres=False)
    eng = RenderEngine(scene, _cfg())
    eng.render(2, progress=False)
    assert int(eng.state.sample) == 2
    img = eng.image()
    assert img.shape == (24, 24, 3)
    out = tmp_path / "t.png"
    eng.save_png(str(out))
    assert out.exists()


@pytest.mark.slow
def test_engine_checkpoint_roundtrip(tmp_path):
    scene = library.cornell_box(with_spheres=False)
    eng = RenderEngine(scene, _cfg())
    eng.render(3, progress=False)
    p = tmp_path / "c.npz"
    eng.save(str(p))

    eng2 = RenderEngine(scene, _cfg())
    eng2.load(str(p))
    np.testing.assert_array_equal(_c(eng.state), _c(eng2.state))
    eng.render(2, progress=False)
    eng2.render(2, progress=False)
    np.testing.assert_array_equal(_c(eng.state), _c(eng2.state))


@pytest.mark.slow
def test_engine_interactive_frame_and_reset():
    scene = library.cornell_box(with_spheres=False)
    eng = RenderEngine(scene, _cfg())
    eng.frame(0.016)
    eng.frame(0.016)
    assert int(eng.state.sample) == 2
    # Key release resets accumulation (main.cpp:1098-1133).
    eng.controller.key_down("w")
    eng.frame(0.016)  # moving: resets + traces sample 1
    assert int(eng.state.sample) == 1
    eng.controller.key_up("w")
    eng.frame(0.016)
    assert int(eng.state.sample) == 1  # reset again on release


def test_controller_semantics():
    ctl = CameraController(_cfg(iterations=3))
    st = ctl.state
    # +/- clamp to [1, max_iterations] (main.cpp:1043-1054).
    ctl.key_down("-")
    ctl.key_down("-")
    assert st.iterations == 1
    ctl.key_down("-")
    assert st.iterations == 1
    for _ in range(100):
        ctl.key_down("+")
    assert st.iterations == st.iterations  # clamped
    assert ctl.state.iterations == 50
    # r toggles realtime (main.cpp:1067-1069).
    assert st.real_time
    ctl.key_down("r")
    assert not st.real_time
    # W integrates forward along +z at yaw=0,pitch=0 (speed 1000/s).
    ctl.consume_reset()
    ctl.key_down("w")
    ctl.update(0.1)
    assert ctl.consume_reset()
    np.testing.assert_allclose(st.shift, [0.0, 0.0, 100.0], atol=1e-4)
    ctl.key_up("w")
    # Mouse look: 0.2 deg/px (main.cpp:1151-1163).
    ctl.mouse_button(True, 10, 10)
    ctl.mouse_motion(20, 10)
    assert abs(st.yaw - 2.0) < 1e-6
    # E zooms fov down 20 deg/s (main.cpp:1211-1217).
    f0 = st.fov
    ctl.key_down("e")
    ctl.update(0.5)
    assert st.fov < f0


def test_meter_prints_at_interval():
    buf = io.StringIO()
    m = PerfMeter(interval=0.0, stream=buf)
    assert m.tick(10, iterations=2, rays_traced=1e6)
    line = buf.getvalue()
    assert "Samples/sec" in line and "Mrays/sec" in line


def test_median_filter():
    img = jnp.zeros((8, 8, 3)).at[4, 4].set(100.0)  # hot pixel
    out = median3x3(img, tonemap=False)
    # Median kills the outlier.
    assert float(out[4, 4, 0]) == 0.0
    # Uniform region unchanged.
    img2 = jnp.ones((8, 8, 3)) * 0.25
    out2 = median3x3(img2, tonemap=False)
    np.testing.assert_allclose(np.asarray(out2), 0.25, rtol=1e-6)


@pytest.mark.slow
def test_cli_render(tmp_path):
    from opencl_path_tracer_tpu.cli import main
    out = tmp_path / "cli.png"
    ck = tmp_path / "cli.npz"
    rc = main([
        "render", "--scene", "cornell-empty", "--size", "24x24",
        "--spp", "2", "--iters", "2", "--accel", "bruteforce",
        "--out", str(out), "--checkpoint", str(ck),
    ])
    assert rc == 0
    assert out.exists() and ck.exists()
    rc = main([
        "render", "--scene", "cornell-empty", "--size", "24x24",
        "--spp", "1", "--iters", "2", "--accel", "bruteforce",
        "--out", str(out), "--resume", str(ck),
    ])
    assert rc == 0


@pytest.mark.slow
def test_cli_view(tmp_path):
    from opencl_path_tracer_tpu.cli import main
    out = tmp_path / "v.png"
    rc = main([
        "view", "--scene", "cornell-empty", "--size", "16x16",
        "--frames", "3", "--iters", "2", "--accel", "bruteforce",
        "--out", str(out),
    ])
    assert rc == 0
    assert out.exists()


def test_cli_info(capsys):
    from opencl_path_tracer_tpu.cli import main
    assert main(["info"]) == 0
    assert "backend" in capsys.readouterr().out


@pytest.mark.slow
def test_engine_autosave(tmp_path):
    scene = library.cornell_box(with_spheres=False)
    eng = RenderEngine(scene, _cfg())
    ck = tmp_path / "auto.npz"
    eng.render(4, progress=False, autosave_every=2,
               autosave_path=str(ck))
    assert ck.exists()
    eng2 = RenderEngine(scene, _cfg())
    eng2.load(str(ck))
    assert int(eng2.state.sample) == 4


@pytest.mark.slow
def test_cli_config_json(tmp_path):
    from opencl_path_tracer_tpu.cli import main
    from opencl_path_tracer_tpu.config import RenderConfig, CameraConfig
    cfg = RenderConfig(width=16, height=16, iterations=2, spp=2,
                       mode="fast", accel="bruteforce",
                       camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                                           shift=(0.0, 0.0, 0.0)))
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    out = tmp_path / "c.png"
    rc = main(["render", "--scene", "cornell-empty",
               "--config", str(cfg_path), "--out", str(out)])
    assert rc == 0 and out.exists()


@pytest.mark.slow
def test_determinism_checker():
    import functools
    import jax
    from opencl_path_tracer_tpu.models import megakernel
    from opencl_path_tracer_tpu.ops import intersect
    from opencl_path_tracer_tpu.utils.determinism import (
        check_deterministic,
    )

    scene = library.cornell_box(with_spheres=False)
    from opencl_path_tracer_tpu.scene.library import cornell_camera
    cam = cornell_camera(8, 8)
    isect = functools.partial(intersect.first_intersect, tris=scene.tris)
    step = jax.jit(lambda st: megakernel.trace_sample(
        cam, scene.mats, st, intersect_fn=isect, iterations=2,
        mode="parity",
    ))
    state = megakernel.init_state(64, 1)
    assert check_deterministic(step, state) == []

    # A genuinely nondeterministic function is flagged.
    import itertools
    counter = itertools.count()
    bad = lambda st: jax.numpy.float32(next(counter))
    assert check_deterministic(bad, state) != []


def test_controller_esc_and_space():
    """ESC requests quit (main.cpp:1055-1058); space toggles fullscreen
    without resetting accumulation (main.cpp:1059-1066)."""
    from opencl_path_tracer_tpu.config import RenderConfig
    from opencl_path_tracer_tpu.runtime.controller import CameraController
    ctl = CameraController(RenderConfig(width=8, height=8))
    ctl.consume_reset()
    assert not ctl.state.fullscreen
    ctl.key_down(" ")
    assert ctl.state.fullscreen
    assert not ctl.consume_reset()  # display-only, no reset
    ctl.key_down("space")
    assert not ctl.state.fullscreen
    assert not ctl.state.quit_requested
    ctl.key_down("Escape")
    assert ctl.state.quit_requested


def test_accel_gate_on_tpu(monkeypatch):
    """Footgun gate (VERDICT r2 #6): on TPU, 'bvh'/'median' refuse
    (device-session faults), 'group'/'cluster' warn, force overrides."""
    import pytest

    from opencl_path_tracer_tpu.runtime import engine
    from opencl_path_tracer_tpu.scene import library

    scene = library.cornell_box(with_spheres=True)
    monkeypatch.setattr(engine.jax, "default_backend", lambda: "tpu")
    for accel in ("bvh", "median"):
        with pytest.raises(ValueError, match="refused on TPU"):
            engine.make_intersect_fn(scene, accel)
    # force=True builds them (host-side build work only, no device use).
    assert engine.make_intersect_fn(scene, "bvh", force=True) is not None


def test_accel_pairwin_builds_and_config_accepts():
    """'pairwin' (the TPU-swept production config, PAIR_TPU_WINNER) is
    a first-class accel choice: config validation accepts it and the
    engine builds a callable intersector from it on CPU."""
    from opencl_path_tracer_tpu.config import RenderConfig
    from opencl_path_tracer_tpu.runtime import engine
    from opencl_path_tracer_tpu.scene import library

    for accel in ("pairwin", "pairmx", "flat"):
        RenderConfig(width=64, height=64, accel=accel).validate()
    scene = library.stress_scene(3000)
    assert engine.make_intersect_fn(scene, "pairwin") is not None


@pytest.mark.slow
def test_engine_host_sample_mirror(tmp_path):
    """The host-side sample counter (which the frame loop and viewer
    report from, to avoid a per-frame device round-trip) must track
    the device counter through frame/render/reset/load."""
    scene = library.cornell_box(with_spheres=False)
    eng = RenderEngine(scene, _cfg())
    eng.frame(0.016)
    eng.render(2, progress=False)
    assert eng._sample_host == int(eng.state.sample) == 3
    eng.controller.key_down("w")
    eng.frame(0.016)  # movement resets accumulation, then traces 1
    assert eng._sample_host == int(eng.state.sample) == 1
    p = tmp_path / "m.npz"
    eng.save(str(p))
    eng2 = RenderEngine(scene, _cfg())
    eng2.load(str(p))
    assert eng2._sample_host == int(eng2.state.sample) == 1


@pytest.mark.slow
def test_engine_wavefront_model_matches_megakernel():
    """model='wavefront' through the ENGINE: exact-spp capped renders
    are bit-identical to the megakernel engine in parity mode (the
    model-level guarantee, wired end to end)."""
    scene = library.cornell_box(with_spheres=False)
    mk = RenderEngine(scene, _cfg())
    mk.render(3, progress=False)
    wf = RenderEngine(scene, _cfg(model="wavefront"))
    wf.render(3, progress=False)
    assert wf._sample_host == 3
    assert int(np.min(np.asarray(wf.state.samples))) == 3
    assert int(np.max(np.asarray(wf.state.samples))) == 3
    np.testing.assert_array_equal(wf._colors_np, mk._colors_np)


@pytest.mark.slow
def test_engine_wavefront_checkpoint_roundtrip(tmp_path):
    scene = library.cornell_box(with_spheres=False)
    straight = RenderEngine(scene, _cfg(model="wavefront"))
    straight.render(4, progress=False)

    eng = RenderEngine(scene, _cfg(model="wavefront"))
    eng.render(2, progress=False)
    p = tmp_path / "wf.npz"
    eng.save(str(p))
    eng2 = RenderEngine(scene, _cfg(model="wavefront"))
    eng2.load(str(p))
    assert eng2._sample_host == 2
    eng2.render(2, progress=False)
    np.testing.assert_array_equal(straight._colors_np, eng2._colors_np)

    # Model mismatch is refused, not silently misread.
    mk = RenderEngine(scene, _cfg())
    with pytest.raises(ValueError, match="model"):
        mk.load(str(p))


def test_engine_wavefront_refuses_interactive():
    scene = library.cornell_box(with_spheres=False)
    eng = RenderEngine(scene, _cfg(model="wavefront"))
    with pytest.raises(ValueError, match="megakernel"):
        eng.frame(0.016)


@pytest.mark.slow
def test_engine_multi_device_tiled_matches_single(tmp_path):
    """devices=8 through the ENGINE: framebuffer-tiled megakernel
    renders are bit-identical to single-device, and a single-device
    checkpoint resumes onto the mesh (re-sharded on load)."""
    scene = library.cornell_box(with_spheres=False)
    one = RenderEngine(scene, _cfg())
    one.render(4, progress=False)

    eight = RenderEngine(scene, _cfg(devices=8))
    eight.render(4, progress=True)  # progress covers estimated_rays
    np.testing.assert_array_equal(one._colors_np, eight._colors_np)

    # Resume a SINGLE-device checkpoint onto the 8-device mesh.
    half = RenderEngine(scene, _cfg())
    half.render(2, progress=False)
    p = tmp_path / "x.npz"
    half.save(str(p))
    resumed = RenderEngine(scene, _cfg(devices=8))
    resumed.load(str(p))
    resumed.render(2, progress=False)
    np.testing.assert_array_equal(one._colors_np, resumed._colors_np)

    with pytest.raises(ValueError, match="single-device"):
        eight.frame(0.016)


@pytest.mark.slow
def test_engine_multi_device_wavefront_matches_single():
    scene = library.cornell_box(with_spheres=False)
    one = RenderEngine(scene, _cfg(model="wavefront"))
    one.render(3, progress=False)
    eight = RenderEngine(scene, _cfg(model="wavefront", devices=8))
    eight.render(3, progress=False)
    assert eight._sample_host == 3
    np.testing.assert_array_equal(one._colors_np, eight._colors_np)


def test_cli_render_analytic_scene(tmp_path):
    from opencl_path_tracer_tpu.cli import main
    out = tmp_path / "quad.png"
    rc = main([
        "render", "--scene", "cornell-analytic", "--size", "32x32",
        "--spp", "2", "--iters", "2", "--accel", "bruteforce",
        "--out", str(out),
    ])
    assert rc == 0 and out.exists()


def test_engine_repicks_accel_on_iteration_change(monkeypatch):
    """VERDICT r4 #4: when the live bounce depth changes (the
    reference's '+'/'-' keys, main.cpp:1043-1054) and accel='auto',
    the engine re-runs the workload-sampling predictor before
    building the new step, caching one intersector per depth."""
    from opencl_path_tracer_tpu.runtime import engine as engine_mod

    scene = library.cornell_box(with_spheres=True)
    cfg = RenderConfig(
        width=16, height=16, iterations=3, mode="fast",
        accel="auto",
        camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                            shift=(0.0, 0.0, 0.0)),
    )
    eng = RenderEngine(scene, cfg)
    # CPU backends skip the predictor (no TPU tilecull win to pick);
    # force the dynamic path and record re-picks.
    eng._accel_auto = True
    calls = []
    real = engine_mod.make_intersect_fn

    def recording(scene_, accel_, **kw):
        calls.append(kw.get("iterations"))
        return real(scene_, "bruteforce", force=kw.get("force", False))

    monkeypatch.setattr(engine_mod, "make_intersect_fn", recording)
    fn3 = eng.intersect_fn
    eng._step(3)                      # unchanged depth: no re-pick
    assert calls == [] and eng.intersect_fn is fn3
    eng._step(1)                      # depth change: re-pick at 1
    assert calls == [1] and eng.intersect_fn is not fn3
    fn1 = eng.intersect_fn
    eng._step(3)                      # back: cached, no predictor run
    assert calls == [1] and eng.intersect_fn is fn3
    eng._step(1)
    assert calls == [1] and eng.intersect_fn is fn1


def test_display_u8_device_matches_display_u8():
    """The async device path (viewer double-buffer, VERDICT r4 #7)
    yields exactly display_u8()'s frame after the host flip."""
    scene = library.cornell_box(with_spheres=True)
    cfg = RenderConfig(
        width=24, height=16, iterations=2, mode="fast",
        accel="bruteforce",
        camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                            shift=(0.0, 0.0, 0.0)),
    )
    eng = RenderEngine(scene, cfg)
    eng.frame(dt=0.016, sync=False)
    dev = eng.display_u8_device()
    dev.copy_to_host_async()
    np.testing.assert_array_equal(np.asarray(dev)[::-1],
                                  eng.display_u8())
