"""Thin-lens depth of field (ops.raygen.camera_rays_dof, --dof)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.models import megakernel
from opencl_path_tracer_tpu.ops import intersect, raygen
from opencl_path_tracer_tpu.scene import library


def test_dof_zero_aperture_is_pinhole():
    cam = library.cornell_camera(32, 24)
    ids = jnp.arange(32 * 24, dtype=jnp.int32)
    k = jax.random.key(0)
    u = jax.random.uniform(k, (4, ids.shape[0]))
    pin = raygen.camera_rays(cam, ids, u[0], u[1])
    dof = raygen.camera_rays_dof(cam, ids, u[0], u[1], u[2], u[3],
                                 0.0, 800.0)
    for kk in range(3):
        np.testing.assert_allclose(np.asarray(dof.p[kk]),
                                   np.asarray(pin.p[kk]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dof.d[kk]),
                                   np.asarray(pin.d[kk]), atol=1e-5)


def test_dof_rays_converge_on_focal_plane():
    """THE thin-lens property: all of a pixel's rays (same pixel
    jitter, different lens points) pass through one focal-plane
    point; off the focal plane they spread ~ aperture."""
    cam = library.cornell_camera(32, 24)
    N = 256
    ids = jnp.full((N,), 400, jnp.int32)      # one pixel
    j1 = jnp.full((N,), 0.5)
    j2 = jnp.full((N,), 0.5)
    u = jax.random.uniform(jax.random.key(1), (2, N))
    ap, focus = 30.0, 800.0
    rays = raygen.camera_rays_dof(cam, ids, j1, j2, u[0], u[1],
                                  ap, focus)
    ahead = np.asarray(
        jax.numpy.stack([cam.lookat[k] - cam.eye[k] for k in range(3)]))
    ahead = ahead / np.linalg.norm(ahead)
    p = np.stack([np.asarray(c) for c in rays.p], -1)
    d = np.stack([np.asarray(c) for c in rays.d], -1)

    def spread_at(dist):
        t = (dist - (p - np.asarray([cam.eye[k] for k in range(3)]))
             @ ahead) / (d @ ahead)
        pts = p + d * t[:, None]
        return np.linalg.norm(pts - pts.mean(0), axis=-1).max()

    assert spread_at(focus) < 0.05, spread_at(focus)
    assert spread_at(focus * 2) > ap * 0.5   # defocus blur exists
    assert spread_at(1.0) > ap * 0.5         # near-lens spread too
    # Origins actually sit on the lens disk.
    r = np.linalg.norm(
        p - np.asarray([cam.eye[k] for k in range(3)]), axis=-1)
    assert r.max() <= ap + 1e-3 and r.max() > ap * 0.7


def test_dof_render_blurs_offplane_geometry():
    """Converged preview renders: edges ON the focal plane stay
    sharper than with focus far off — total image gradient drops
    when the walls are defocused."""
    w = h = 32
    scene = library.cornell_box(with_spheres=False)
    cam = library.cornell_camera(w, h)
    isect = functools.partial(intersect.first_intersect,
                              tris=scene.tris)
    kw = dict(intersect_fn=isect, num_pixels=w * h, iterations=1,
              mode="fast")

    def grad_energy(dof):
        st = megakernel.render(cam, scene.mats, spp=256, seed=1,
                               dof=dof, **kw)
        img = np.asarray(
            megakernel.colors_array(st)).reshape(h, w, 3)
        gx = np.abs(np.diff(img, axis=1)).sum()
        gy = np.abs(np.diff(img, axis=0)).sum()
        return gx + gy

    # cornell back wall is ~1500 from the default camera; a wide
    # aperture focused very near defocuses everything.
    sharp = grad_energy((2.0, 1500.0))
    blurry = grad_energy((60.0, 100.0))
    assert blurry < 0.7 * sharp, (sharp, blurry)


def test_dof_config_validation():
    from opencl_path_tracer_tpu.config import RenderConfig
    with pytest.raises(ValueError, match="dof_focus"):
        RenderConfig(dof_aperture=5.0).validate()
    RenderConfig(dof_aperture=5.0, dof_focus=800.0).validate()
    RenderConfig().validate()


def test_cli_dof_render(tmp_path, monkeypatch):
    import sys, os
    from opencl_path_tracer_tpu import cli
    png = str(tmp_path / "d.png")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-empty", "--size", "16x12",
        "--spp", "4", "--iters", "2", "--model", "wavefront",
        "--dof", "10", "900", "--out", png,
    ])
    assert cli.main() == 0
    assert os.path.exists(png)


def test_cli_all_sampling_flags_compose(tmp_path, monkeypatch):
    """Every sampling extension in ONE render: NEE + RR + QMC + DOF +
    adaptive, through the real engine (the wiring-compose check)."""
    import sys, os
    from opencl_path_tracer_tpu import cli
    png = str(tmp_path / "all.png")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-empty", "--size", "16x12",
        "--spp", "8", "--iters", "3", "--model", "wavefront",
        "--nee", "--rr", "2", "--qmc", "--dof", "10", "900",
        "--adaptive", "0.3", "--min-spp", "2", "--out", png,
    ])
    assert cli.main() == 0
    assert os.path.exists(png)
