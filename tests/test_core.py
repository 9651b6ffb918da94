"""Core math unit tests: rotations, camera, materials, tonemaps —
checked against hand-computed / closed-form values from the reference
formulas."""

import numpy as np
import jax.numpy as jnp

from opencl_path_tracer_tpu.core import geometry, materials
from opencl_path_tracer_tpu.core.camera import make_camera, BASE_EYE
from opencl_path_tracer_tpu.ops import tonemap

PI_REF = 3.141593


def test_rotations_90deg():
    v = jnp.asarray([1.0, 0.0, 0.0])
    r = np.asarray(geometry.rotate_z(v, 90.0))
    np.testing.assert_allclose(r, [0, 1, 0], atol=1e-5)
    v = jnp.asarray([0.0, 1.0, 0.0])
    r = np.asarray(geometry.rotate_x(v, 90.0))
    np.testing.assert_allclose(r, [0, 0, 1], atol=1e-5)
    # Reference rotate_y convention: x' = x cos + z sin (main.cpp:55-62).
    v = jnp.asarray([1.0, 0.0, 0.0])
    r = np.asarray(geometry.rotate_y(v, 90.0))
    np.testing.assert_allclose(r, [0, 0, -1], atol=1e-5)


def test_rotation_matches_reference_formula():
    rs = np.random.default_rng(0)
    v = rs.normal(size=(5, 3)).astype(np.float32)
    beta = 37.0
    a = beta / 180.0 * PI_REF
    want = np.stack([
        v[:, 0] * np.cos(a) + v[:, 2] * np.sin(a),
        v[:, 1],
        -v[:, 0] * np.sin(a) + v[:, 2] * np.cos(a),
    ], -1)
    got = np.asarray(geometry.rotate_y(jnp.asarray(v), beta))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_triangle_normals():
    r1 = jnp.asarray([[0.0, 0.0, 0.0]])
    r2 = jnp.asarray([[1.0, 0.0, 0.0]])
    r3 = jnp.asarray([[0.0, 1.0, 0.0]])
    n = np.asarray(geometry.triangle_normals(r1, r2, r3))
    np.testing.assert_allclose(n, [[0, 0, 1]], atol=1e-7)


def test_triangle_normals_degenerate_is_finite_never_hit():
    """Zero-area triangles (e.g. pole fans with duplicate vertices in
    OBJ models — 4 exist in the reference-scene Wineglass stand-in)
    must produce n = 0, not NaN: both encodings never hit (reference
    parity — its NaN comparisons all reject, main.cpp:144-166), but
    NaN poisons the bf16 3-split tables' build-time equality assert,
    which broke make_minarg_intersect on the ref-workload scene."""
    from opencl_path_tracer_tpu.core.types import Rays
    from opencl_path_tracer_tpu.ops import intersect

    r1 = jnp.asarray([[0.0, 0.0, 0.0], [-1.0, -1.0, 1.0]])
    r2 = jnp.asarray([[1.0, 0.0, 0.0], [1.0, -1.0, 1.0]])
    r3 = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]])  # tri 0 degen
    n = np.asarray(geometry.triangle_normals(r1, r2, r3))
    assert np.isfinite(n).all()
    np.testing.assert_allclose(n[0], [0, 0, 0])
    tris = geometry.TrianglesSoA.build(r1, r2, r3, [0, 1])
    assert all(
        np.isfinite(np.asarray(getattr(tris, f))).all()
        for f in ("n", "m1", "m2", "m3", "c0", "d1", "d2", "d3")
    )
    # A ray through both triangles' locations hits only the real one.
    rays = Rays(p=(jnp.asarray([0.3]), jnp.asarray([0.0]),
                   jnp.asarray([-1.0])),
                d=(jnp.asarray([0.0]), jnp.asarray([0.0]),
                   jnp.asarray([1.0])))
    h = intersect.first_intersect(rays, tris)
    assert float(h.t[0]) == 2.0 and int(h.mati[0]) == 1


def test_reference_scene_builds_minarg_tables():
    """The ref-workload bench path: reference_scene (with the committed
    model stand-ins) must build the bit-exact minarg fetch tables —
    this is what the degenerate-triangle NaN broke."""
    from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
        make_minarg_intersect,
    )
    from opencl_path_tracer_tpu.scene import library

    scene = library.reference_scene("tests/assets/models")
    assert scene.num_triangles > 1000
    make_minarg_intersect(scene.tris, interpret=True)


def test_triangles_soa_precompute():
    tris = geometry.TrianglesSoA.build(
        [[0, 0, 0]], [[2, 0, 0]], [[0, 2, 0]], [0]
    )
    # m1 = cross(n, r2-r1) = cross(z, 2x) = 2y
    np.testing.assert_allclose(np.asarray(tris.m1), [[0, 2, 0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(tris.c0), [0.0], atol=1e-6)
    lo, hi = tris.bbox()
    np.testing.assert_allclose(np.asarray(lo), [[0, 0, 0]])
    np.testing.assert_allclose(np.asarray(hi), [[2, 2, 0]])
    np.testing.assert_allclose(
        np.asarray(tris.midpoint()), [[2 / 3, 2 / 3, 0]], rtol=1e-6
    )


def test_conductor_f0_gold():
    # Gold archetype (main.cpp:761): N=(0.17,0.35,1.50), K=(3.1,2.7,1.9).
    f0 = materials.conductor_f0(
        np.asarray([0.17, 0.35, 1.50]), np.asarray([3.1, 2.7, 1.9])
    )
    want = []
    for n, k in [(0.17, 3.1), (0.35, 2.7), (1.50, 1.9)]:
        want.append((k * k + (n - 1) ** 2) / (k * k + (n + 1) ** 2))
    np.testing.assert_allclose(f0, want, rtol=1e-6)


def test_archetypes_table():
    rows = materials.reference_archetypes()
    assert len(rows) == 10
    m = materials.stack_materials(rows)
    assert int(m.count) == 10
    types = np.asarray(m.type)
    np.testing.assert_array_equal(
        types, [3, 3, 0, 0, 0, 0, 0, 1, 1, 2]
    )
    # GLASS scalar n = mean(1.5,1.5,1.5) = 1.5 (main.cpp:103).
    assert np.isclose(float(np.asarray(m.n)[9]), 1.5)


def test_camera_geometry():
    w, h = 640, 360
    cam = make_camera(w, h, fov=60.0, yaw=0.0, pitch=0.0, shift=(0, 0, 0))
    np.testing.assert_allclose(np.asarray(cam.eye), BASE_EYE, rtol=1e-6)
    # ahead_length = (W/2)/tan(30deg)
    ahead = np.asarray(cam.lookat) - np.asarray(cam.eye)
    want_len = (w / 2) / np.tan(30.0 / 180.0 * PI_REF)
    np.testing.assert_allclose(np.linalg.norm(ahead), want_len, rtol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(cam.up)), h / 2, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(cam.right)), w / 2, rtol=1e-6
    )
    # up/right/ahead mutually orthogonal at zero yaw/pitch
    assert abs(np.dot(np.asarray(cam.up), np.asarray(cam.right))) < 1e-3


def test_camera_pitch_yaw_order():
    # pitch then yaw (main.cpp:327-332): ahead = Ry(yaw) Rx(pitch) z
    cam = make_camera(100, 100, fov=90.0, yaw=90.0, pitch=45.0,
                      shift=(0, 0, 0))
    ahead = np.asarray(cam.lookat - cam.eye)
    ahead = ahead / np.linalg.norm(ahead)
    s = np.sqrt(0.5)
    # Rx(45): z -> (0, -s, s); Ry(90) reference convention:
    # x' = x c + z s = z, z' = -x s + z c = -x... for v=(0,-s,s):
    # x' = s, y' = -s, z' = 0.
    np.testing.assert_allclose(ahead, [s, -s, 0], atol=1e-4)


def test_srgb_curve():
    c = jnp.asarray([0.0, 0.001, 0.5, 1.0])
    got = np.asarray(tonemap.srgb(c))
    assert got[0] == 0.0
    np.testing.assert_allclose(got[1], 12.92 * 0.001, rtol=1e-5)
    np.testing.assert_allclose(
        got[2], 1.055 * 0.5 ** 0.4167 - 0.055, rtol=1e-5
    )
    np.testing.assert_allclose(got[3], 1.0, atol=1e-6)


def test_reinhard_known_value():
    c = jnp.asarray([[1.0, 1.0, 1.0]])
    got = np.asarray(tonemap.reinhard(c))
    # L = 1, L2 = 0.5 -> c*0.5 -> srgb(0.5)
    want = 1.055 * 0.5 ** 0.4167 - 0.055
    np.testing.assert_allclose(got, [[want] * 3], rtol=1e-5)


def test_reinhard_black_safe_vs_parity():
    c = jnp.asarray([[0.0, 0.0, 0.0]])
    safe = np.asarray(tonemap.reinhard(c, safe=True))
    np.testing.assert_array_equal(safe, [[0.0, 0.0, 0.0]])
    par = np.asarray(tonemap.reinhard(c, safe=False))
    assert np.all(np.isnan(par))  # the reference's 0/0 quirk


def test_filmic_curve():
    c = jnp.asarray([[0.0, 0.004, 1.0]])
    got = np.asarray(tonemap.filmic(c))
    assert got[0, 0] == 0.0
    assert got[0, 1] == 0.0
    x = 1.0 - 0.004
    want = (x * (x * 6.2 + 0.5)) / (x * (x * 6.2 + 1.7) + 0.06)
    np.testing.assert_allclose(got[0, 2], want, rtol=1e-6)
