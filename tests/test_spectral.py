"""Spectral dispersion (models/spectral.py): Abbe/Cauchy IOR model,
band weight partition, refractive-only table edits, exact identity on
non-dispersive scenes, and actual channel splitting through glass."""

import numpy as np
import jax
import pytest

from opencl_path_tracer_tpu.core.materials import MaterialType
from opencl_path_tracer_tpu.models import spectral, wavefront
from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn
from opencl_path_tracer_tpu.scene import library


def test_abbe_ior_anchors():
    n_d, v_d = 1.5, 30.0
    # Anchored at the d line.
    np.testing.assert_allclose(
        float(spectral.abbe_ior(n_d, 589.29, v_d)), n_d, atol=1e-6)
    # Blue bends more than red (normal dispersion).
    n_f = float(spectral.abbe_ior(n_d, 486.13, v_d))
    n_c = float(spectral.abbe_ior(n_d, 656.27, v_d))
    assert n_f > n_d > n_c
    # The F-C spread reproduces the Abbe number definition.
    np.testing.assert_allclose(n_f - n_c, (n_d - 1.0) / v_d, rtol=1e-5)
    # v_d=None / inf = no dispersion.
    assert spectral.abbe_ior(n_d, 480.0, None) == n_d
    assert spectral.abbe_ior(n_d, 480.0, float("inf")) == n_d


@pytest.mark.parametrize("bands", [1, 3, 5, 8])
def test_band_weights_partition(bands):
    w = spectral.band_weights(bands)
    assert w.shape == (bands, 3)
    assert np.all(w >= 0.0)
    # Each display channel's weight is a partition of unity across
    # bands: B identical band images must combine to that image.
    np.testing.assert_allclose(w.sum(axis=0), np.ones(3), rtol=1e-6)
    assert spectral.band_centers(bands).shape == (bands,)


def test_dispersive_materials_refractive_only():
    scene = library.cornell_box(with_spheres=True,
                                analytic_spheres=True)
    mats = scene.mats
    refr = np.asarray(mats.type) == int(MaterialType.REFRACTIVE)
    assert refr.any(), "cornell carries a glass sphere"
    blue = spectral.dispersive_materials(mats, 465.0, v_d=30.0)
    red = spectral.dispersive_materials(mats, 612.0, v_d=30.0)
    n0 = np.asarray(mats.n)
    nb, nr = np.asarray(blue.n), np.asarray(red.n)
    # Non-refractive rows untouched (n and all three F0 channels).
    np.testing.assert_array_equal(nb[~refr], n0[~refr])
    for c0, cb in zip(mats.f0, blue.f0):
        np.testing.assert_array_equal(
            np.asarray(cb)[~refr], np.asarray(c0)[~refr])
    # Refractive rows: blue index above red, both around n_d.
    assert np.all(nb[refr] > nr[refr])
    # F0 re-derived from the band index (dielectric formula).
    f0b = ((nb - 1.0) / (nb + 1.0)) ** 2
    np.testing.assert_allclose(
        np.asarray(blue.f0[0])[refr], f0b[refr], rtol=1e-5)
    # No dispersion = the very same table.
    assert spectral.dispersive_materials(mats, 465.0, None) is mats


def _render_args(scene, w, h):
    cam = library.cornell_camera(w, h)
    isect = make_intersect_fn(scene, "bruteforce")
    return cam, isect


@pytest.mark.parametrize("bands", [3, 5])
def test_identity_without_refractive_materials(bands):
    """A scene with no glass renders EXACTLY the non-spectral image at
    any band count: dispersive_materials is the identity on every row
    and the weights are a per-channel partition of unity."""
    scene = library.cornell_box(with_spheres=False)
    w = h = 16
    cam, isect = _render_args(scene, w, h)
    base_state = wavefront.render_wavefront(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=3, min_spp=2, mode="fast", seed=1, exact_spp=True,
    )
    base = wavefront.colors_by_pixel(base_state, w * h)
    img = spectral.render_dispersive(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=3, min_spp=2, bands=bands, v_d=25.0, seed=1,
    )
    np.testing.assert_allclose(img, base, rtol=1e-6, atol=1e-7)


def test_dispersion_splits_channels_through_glass():
    """With the glass sphere and a strong flint (v_d=20), the band
    renders diverge where refraction happens — the combined image is
    finite and differs from the non-dispersed render."""
    scene = library.cornell_box(with_spheres=True,
                                analytic_spheres=True)
    w = h = 24
    cam, isect = _render_args(scene, w, h)
    img_disp = spectral.render_dispersive(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=4, min_spp=3, bands=3, v_d=20.0, seed=1,
    )
    img_flat = spectral.render_dispersive(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=4, min_spp=3, bands=3, v_d=None, seed=1,
    )
    assert np.isfinite(img_disp).all() and (img_disp >= 0.0).all()
    # Same sampling decisions everywhere except the Snell angle and
    # Fresnel base, so a strong flint must move SOME pixels...
    assert np.abs(img_disp - img_flat).max() > 1e-4
    # ...but only around refraction: most of the (diffuse) image is
    # bit-identical under common random numbers.
    same = np.isclose(img_disp, img_flat, rtol=1e-6, atol=1e-7)
    assert same.mean() > 0.5


def test_cli_dispersion_render(tmp_path, monkeypatch):
    import os
    import sys
    from opencl_path_tracer_tpu import cli
    png = str(tmp_path / "d.png")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-analytic",
        "--model", "wavefront", "--size", "16x12", "--spp", "3",
        "--iters", "3", "--dispersion", "25", "--out", png,
    ])
    assert cli.main() == 0
    assert os.path.exists(png)


def test_cli_dispersion_composes_with_nee(tmp_path, monkeypatch):
    import os
    import sys
    from opencl_path_tracer_tpu import cli
    png = str(tmp_path / "dn.png")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-analytic",
        "--model", "wavefront", "--size", "16x12", "--spp", "3",
        "--iters", "3", "--dispersion", "30", "--bands", "5",
        "--nee", "--out", png,
    ])
    assert cli.main() == 0
    assert os.path.exists(png)


def test_cli_dispersion_rejects_megakernel(tmp_path, monkeypatch):
    import sys
    from opencl_path_tracer_tpu import cli
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-analytic",
        "--size", "16x12", "--spp", "2", "--dispersion", "25",
        "--out", str(tmp_path / "x.png"),
    ])
    with pytest.raises(SystemExit, match="wavefront"):
        cli.main()
