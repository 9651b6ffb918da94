"""Turntable animation (runtime/anim.py + ptx anim)."""

import numpy as np
import pytest

from opencl_path_tracer_tpu.config import RenderConfig
from opencl_path_tracer_tpu.runtime import anim
from opencl_path_tracer_tpu.runtime.engine import RenderEngine
from opencl_path_tracer_tpu.scene import library


def test_orbit_shift_looks_at_center():
    """eye + radius*ahead(yaw,pitch) == center for every pose."""
    from opencl_path_tracer_tpu.core.camera import BASE_EYE
    from opencl_path_tracer_tpu.core.geometry import rotate_x, rotate_y

    center = np.array([500.0, 500.0, 500.0])
    for yaw, pitch in ((0, 0), (45, 12), (180, -30), (300, 80)):
        shift = anim.orbit_shift(center, 1700.0, yaw, pitch)
        eye = np.asarray(BASE_EYE, np.float64) + shift
        ahead = np.asarray(
            rotate_y(rotate_x(np.asarray([0.0, 0.0, 1.0]), pitch), yaw)
        )
        # rotate_x/rotate_y are f32 (reference parity) — ~1e-4 at
        # radius 1700.
        np.testing.assert_allclose(eye + 1700.0 * ahead, center,
                                   atol=1e-3)


def test_turntable_poses_cover_sweep():
    poses = anim.turntable_poses(frames=4, center=(0, 0, 0),
                                 radius=10.0, sweep=360.0)
    yaws = [p[0] for p in poses]
    assert yaws == [0.0, 90.0, 180.0, 270.0]
    # 360/4: frame 4 would equal frame 0 — loopable, not duplicated.


def test_render_animation_frames_and_gif(tmp_path):
    scene = library.cornell_box(with_spheres=False)
    cfg = RenderConfig(width=32, height=24, iterations=2, mode="fast",
                       env_light=True)
    eng = RenderEngine(scene, cfg)
    poses = anim.turntable_poses(frames=3, center=(500.0, 500.0, 500.0),
                                 radius=2500.0, pitch=20.0)
    gif = tmp_path / "t.gif"
    frames = anim.render_animation(
        eng, poses, spp=2, out_dir=str(tmp_path), gif_path=str(gif),
        progress=False,
    )
    assert len(frames) == 3
    assert all(f.shape == (24, 32, 3) for f in frames)
    # Env-lit exterior: frames are non-black and pose-dependent.
    assert all(f.mean() > 1 for f in frames)
    assert not np.array_equal(frames[0], frames[1])
    for i in range(3):
        assert (tmp_path / f"frame_{i:04d}.png").exists()
    from PIL import Image
    assert Image.open(str(gif)).n_frames == 3


@pytest.mark.slow
def test_cli_anim(tmp_path, monkeypatch, capsys):
    import sys
    from opencl_path_tracer_tpu import cli
    gif = str(tmp_path / "turn.gif")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "anim", "--scene", "cornell-empty", "--size", "32x24",
        "--spp", "1", "--frames", "2", "--iters", "2", "--env",
        "--gif", gif, "--out-dir", str(tmp_path / "frames"),
    ])
    assert cli.main() == 0
    assert (tmp_path / "frames" / "frame_0001.png").exists()
    import os
    assert os.path.exists(gif)


def test_hdr_pfm_roundtrip(tmp_path):
    from opencl_path_tracer_tpu.io.image import read_pfm, write_pfm
    img = np.random.default_rng(0).uniform(
        0, 9, (12, 16, 3)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    np.testing.assert_array_equal(read_pfm(p), img)


def test_cli_render_hdr(tmp_path, monkeypatch):
    """--out *.pfm writes linear untonemapped radiance."""
    import sys
    from opencl_path_tracer_tpu import cli
    from opencl_path_tracer_tpu.io.image import read_pfm
    pfm = str(tmp_path / "r.pfm")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-empty", "--size", "24x16",
        "--spp", "2", "--iters", "2", "--out", pfm,
    ])
    assert cli.main() == 0
    img = read_pfm(pfm)
    assert img.shape == (16, 24, 3)
    # Radiance is linear: emitter pixels exceed 1.0 (a tonemapped PNG
    # could never).
    assert float(img.max()) > 1.0


def test_turntable_partial_sweep_is_end_inclusive():
    poses = anim.turntable_poses(frames=4, center=(0, 0, 0),
                                 radius=10.0, sweep=180.0)
    assert [p[0] for p in poses] == [0.0, 60.0, 120.0, 180.0]


def test_write_gif_empty_raises(tmp_path):
    with pytest.raises(ValueError, match="at least one frame"):
        anim.write_gif(str(tmp_path / "e.gif"), [])


def test_read_pfm_applies_scale_magnitude(tmp_path):
    img = np.full((4, 4, 3), 2.0, np.float32)
    p = str(tmp_path / "s.pfm")
    with open(p, "wb") as fh:
        fh.write(b"PF\n4 4\n-2.5\n")
        fh.write(img[::-1].astype("<f4").tobytes())
    from opencl_path_tracer_tpu.io.image import read_pfm
    np.testing.assert_allclose(read_pfm(p), 5.0)


def test_cli_median_denoise_conflict(tmp_path, monkeypatch):
    import sys
    from opencl_path_tracer_tpu import cli
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-empty", "--size", "8x8",
        "--spp", "1", "--median", "--denoise",
        "--out", str(tmp_path / "x.png"),
    ])
    with pytest.raises(SystemExit, match="exclusive"):
        cli.main()


@pytest.mark.slow
def test_cli_wavefront_resume(tmp_path, monkeypatch, capsys):
    """Round-trip --checkpoint/--resume with the flagship model (the
    resume print used to crash on WavefrontState)."""
    import sys
    from opencl_path_tracer_tpu import cli
    ck = str(tmp_path / "wf.npz")
    base = ["ptx", "render", "--scene", "cornell-empty",
            "--size", "16x12", "--iters", "2",
            "--model", "wavefront", "--out", str(tmp_path / "a.png")]
    monkeypatch.setattr(sys, "argv", base + ["--spp", "2",
                                             "--checkpoint", ck])
    assert cli.main() == 0
    monkeypatch.setattr(sys, "argv", base + ["--spp", "1",
                                             "--resume", ck])
    assert cli.main() == 0
    assert "resumed at sample 2" in capsys.readouterr().err


@pytest.mark.slow
def test_cli_anim_dispersion(tmp_path, monkeypatch):
    """Dispersive turntable: the spectral path renders every pose
    through one factory-built program (ptx anim --dispersion)."""
    import sys
    from opencl_path_tracer_tpu import cli
    gif = str(tmp_path / "disp.gif")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "anim", "--scene", "cornell-analytic",
        "--size", "24x16", "--spp", "2", "--frames", "2",
        "--iters", "3", "--dispersion", "20", "--gif", gif,
        "--out-dir", str(tmp_path / "frames"),
    ])
    assert cli.main() == 0
    assert (tmp_path / "frames" / "frame_0000.png").exists()
    assert (tmp_path / "frames" / "frame_0001.png").exists()
    # (no n_frames check: PIL collapses identical consecutive GIF
    # frames, and a 2-pose orbit of the closed box can produce two
    # equal near-black exterior views at this size)
    import os
    assert os.path.exists(gif)
