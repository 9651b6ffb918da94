"""Every examples/ script must actually run (tiny sizes, CPU).

Run as subprocesses so import scope, argparse, and the documented
invocation all get exercised — a broken example is worse than no
example."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, *args: str, env_extra: dict | None = None):
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": REPO + os.pathsep + os.environ.get(
               "PYTHONPATH", "")}
    env.pop("PALLAS_AXON_POOL_IPS", None)  # don't claim a TPU grant
    env.update(env_extra or {})
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert out.returncode == 0, (out.stdout[-500:], out.stderr[-800:])
    return out.stdout


@pytest.mark.slow
def test_example_01_render(tmp_path):
    png = str(tmp_path / "e1.png")
    out = _run("01_render_cornell.py", "--size", "32x32",
               "--spp", "2", "--out", png)
    assert os.path.exists(png)
    assert "wrote" in out


@pytest.mark.slow
def test_example_02_custom_scene(tmp_path):
    png = str(tmp_path / "e2.png")
    out = _run("02_custom_scene.py", "--size", "32x32",
               "--spp", "2", "--out", png)
    assert os.path.exists(png)
    assert "triangles" in out


@pytest.mark.slow
def test_example_03_checkpoint_resume(tmp_path):
    out = _run("03_checkpoint_resume.py", "--size", "16x16",
               "--spp", "4", "--ckpt", str(tmp_path / "e3.npz"))
    assert "bit-exact" in out


@pytest.mark.slow
def test_example_04_multi_device(tmp_path):
    png = str(tmp_path / "e4.png")
    out = _run(
        "04_multi_device.py", "--size", "32x32", "--steps", "2",
        "--out", png,
        env_extra={
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8"
        },
    )
    assert os.path.exists(png)
    assert "mesh: 8" in out


@pytest.mark.slow
def test_example_05_low_level():
    out = _run("05_low_level_ops.py", "--size", "32x32")
    assert "ok" in out and "hits" in out


@pytest.mark.slow
def test_example_06_smooth_and_spheres(tmp_path):
    png = str(tmp_path / "e6.png")
    out = _run("06_smooth_and_spheres.py", "--size", "32x32",
               "--spp", "2", "--out", png)
    assert os.path.exists(png)
    assert "smooth-shaded" in out


@pytest.mark.slow
def test_example_07_uv_checker(tmp_path):
    png = str(tmp_path / "e7.png")
    out = _run("07_uv_checker.py", "--size", "48x48", "--out", png)
    assert os.path.exists(png)
    assert "checker balance" in out


@pytest.mark.slow
def test_example_08_textured_obj(tmp_path):
    png = str(tmp_path / "e8.png")
    out = _run("08_textured_obj.py", "--size", "48x32", "--spp", "2",
               "--out", png)
    assert os.path.exists(png)
    assert "1 texture" in out


@pytest.mark.slow
def test_example_09_environment_light(tmp_path):
    png = str(tmp_path / "e9.png")
    out = _run("09_environment_light.py", "--size", "32x32",
               "--spp", "2", "--out", png)
    assert os.path.exists(png)
    assert "env-lit" in out


@pytest.mark.slow
def test_example_10_nee_and_adaptive(tmp_path):
    png = str(tmp_path / "e10.png")
    out = _run("10_nee_and_adaptive.py", "--size", "32x24",
               "--out", png)
    assert os.path.exists(png)
    assert "NEE+adaptive" in out


@pytest.mark.slow
def test_example_11_many_lights(tmp_path):
    png = str(tmp_path / "e11.png")
    out = _run("11_many_lights.py", "--size", "32x24", "--lights",
               "6", "--spp", "3", "--out", png)
    assert os.path.exists(png)
    assert "right: distance" in out


@pytest.mark.slow
def test_example_12_spectral_dispersion(tmp_path):
    png = str(tmp_path / "e12.png")
    out = _run("12_spectral_dispersion.py", "--size", "32x24",
               "--spp", "3", "--out", png)
    assert os.path.exists(png)
    assert "channel split" in out
