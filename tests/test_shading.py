"""Smooth shading: barycentrics, vertex-normal interpolation, wiring.

Capability the reference lacks: it shades with the face normal only
(Hit struct, prog.cl:11-16) and never consumes tinyobj's parsed vn
data (main.cpp:595-611). Here OBJ vn / computed / analytic vertex
normals are interpolated at hit points (ops/shading.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Rays, v3_from_array
from opencl_path_tracer_tpu.ops import intersect, shading
from opencl_path_tracer_tpu.scene import library
from opencl_path_tracer_tpu.scene.builder import SceneBuilder


def _rand_tris(rng, n):
    r1 = rng.normal(size=(n, 3)).astype(np.float32)
    r2 = r1 + rng.normal(size=(n, 3)).astype(np.float32)
    r3 = r1 + rng.normal(size=(n, 3)).astype(np.float32)
    return r1, r2, r3


def test_barycentrics_recover_known_weights():
    """Points constructed as (1-u-v) r1 + u r2 + v r3 give back (u, v)."""
    rng = np.random.default_rng(0)
    n = 256
    r1, r2, r3 = _rand_tris(rng, n)
    u = rng.uniform(0.0, 1.0, n).astype(np.float32)
    v = (rng.uniform(0.0, 1.0, n) * (1.0 - u)).astype(np.float32)
    p = ((1.0 - u - v)[:, None] * r1 + u[:, None] * r2
         + v[:, None] * r3).astype(np.float32)

    attribs = shading.build_vertex_attribs(
        r1, r2, r3, np.zeros_like(r1), np.zeros_like(r1),
        np.zeros_like(r1),
    )
    ids = jnp.arange(n, dtype=jnp.int32)
    uu, vv = shading.barycentrics(v3_from_array(jnp.asarray(p)), ids,
                                  attribs)
    np.testing.assert_allclose(np.asarray(uu), u, atol=2e-4)
    np.testing.assert_allclose(np.asarray(vv), v, atol=2e-4)


def test_packed_table_layout_matches_fused_kernel_pack():
    """The (T, 17) row-gather table and the fused kernel's (17, tpad)
    column table must keep the same column order (gu, gv, u0, v0,
    n1, n2, n3) — smooth_hit_normals indexes the former by constant,
    the Pallas refine kernel the latter."""
    rng = np.random.default_rng(1)
    n = 37
    r1, r2, r3 = _rand_tris(rng, n)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    attribs = shading.build_vertex_attribs(r1, r2, r3, nrm, -nrm,
                                           2.0 * nrm)
    packed = np.asarray(attribs.packed)
    assert packed.shape == (n, 17)
    cols = {0: attribs.gu, 3: attribs.gv, 8: attribs.n1,
            11: attribs.n2, 14: attribs.n3}
    for base, comp in cols.items():
        for k in range(3):
            np.testing.assert_array_equal(packed[:, base + k],
                                          np.asarray(comp[k]))
    np.testing.assert_array_equal(packed[:, 6], np.asarray(attribs.u0))
    np.testing.assert_array_equal(packed[:, 7], np.asarray(attribs.v0))


def test_barycentrics_match_moller_trumbore():
    """(u, v) at ray hit points agree with ray_tri_mt's barycentrics."""
    rng = np.random.default_rng(1)
    n = 256
    r1, r2, r3 = _rand_tris(rng, n)
    # Aim each ray at an interior point so every lane hits.
    w = rng.dirichlet((2.0, 2.0, 2.0), n).astype(np.float32)
    target = w[:, 0:1] * r1 + w[:, 1:2] * r2 + w[:, 2:3] * r3
    p = target + np.float32([0, 0, 7]) + rng.normal(
        size=(n, 3)).astype(np.float32) * 0.1
    d = (target - p).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t, u_mt, v_mt, valid = intersect.ray_tri_mt(
        v3_from_array(jnp.asarray(p)), v3_from_array(jnp.asarray(d)),
        v3_from_array(jnp.asarray(r1)), v3_from_array(jnp.asarray(r2)),
        v3_from_array(jnp.asarray(r3)),
    )
    valid = np.asarray(valid)
    assert valid.mean() > 0.95
    hitp = jnp.asarray(p + np.asarray(t)[:, None] * d)
    attribs = shading.build_vertex_attribs(
        r1, r2, r3, np.zeros_like(r1), np.zeros_like(r1),
        np.zeros_like(r1),
    )
    ids = jnp.arange(n, dtype=jnp.int32)
    u, v = shading.barycentrics(v3_from_array(hitp), ids, attribs)
    # Per-lane tolerance with two amplification terms: thin triangles
    # (gradient magnitude |g|) and grazing incidence (t's rounding
    # slides the hit point in-plane by ~ t*eps/cos).
    gu = np.stack([np.asarray(attribs.gu[k]) for k in range(3)], -1)
    gv = np.stack([np.asarray(attribs.gv[k]) for k in range(3)], -1)
    nrm = np.cross(r2 - r1, r3 - r1)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    cosi = np.maximum(np.abs(np.sum(d * nrm, axis=1)), 1e-3)
    pmag = np.linalg.norm(np.asarray(hitp), axis=1) + 1.0
    slide = np.asarray(t) * 1.2e-7 * 256 / cosi
    tol_u = np.linalg.norm(gu, axis=1) * (
        pmag * 64 * 1.2e-7 + slide) + 1e-5
    tol_v = np.linalg.norm(gv, axis=1) * (
        pmag * 64 * 1.2e-7 + slide) + 1e-5
    err_u = np.abs(np.asarray(u) - np.asarray(u_mt))
    err_v = np.abs(np.asarray(v) - np.asarray(v_mt))
    assert (err_u[valid] <= tol_u[valid]).all()
    assert (err_v[valid] <= tol_v[valid]).all()
    assert np.median(err_u[valid]) < 1e-5


def test_compute_vertex_normals_sphere_radial():
    tris = library.sphere_mesh((0, 0, 0), 1.0, lat=24, lon=36)
    verts, faces, vmap = [], [], {}
    for t in tris:
        idx = []
        for vtx in t:
            key = tuple(np.round(vtx, 6))
            if key not in vmap:
                vmap[key] = len(verts)
                verts.append(key)
            idx.append(vmap[key])
        faces.append(idx)
    verts = np.asarray(verts, np.float32)
    vn = shading.compute_vertex_normals(verts, np.asarray(faces))
    # Area-weighted normals on a fine UV sphere point radially.
    cos = np.sum(vn * verts / np.linalg.norm(verts, axis=1,
                                             keepdims=True), axis=1)
    assert cos.min() > 0.995


def test_smooth_normals_beat_face_normals_on_sphere():
    """Interpolated analytic vertex normals on a coarse tessellated
    sphere track the true quadric normal far better than face
    normals, including BETWEEN vertices."""
    center = np.float32([0, 0, 0])
    tris = library.sphere_mesh(center, 1.0, lat=8, lon=12)
    vn = (tris - center[None, None, :])  # analytic unit normals
    b = SceneBuilder()
    b.add_material((1, 1, 1), (0, 0, 0), (0, 0, 0),
                   (1, 1, 1), (0, 0, 0), 1.0, 0)
    for t, n3 in zip(tris, vn):
        b.add_triangle(t[0], t[1], t[2], 0, vn=n3)
    scene = b.build()
    assert scene.attribs is not None

    rng = np.random.default_rng(2)
    m = 512
    d = rng.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    p = jnp.asarray(-3.0 * d)
    rays = Rays(p=v3_from_array(p), d=v3_from_array(jnp.asarray(d)))
    hits, ids = intersect.first_intersect_ids(rays, scene.tris)
    valid = np.asarray(hits.valid)
    assert valid.mean() > 0.99

    sm = shading.smooth_hit_normals(hits, ids, scene.attribs)
    hp = np.stack([np.asarray(sm.p[k]) for k in range(3)], -1)
    true_n = hp / np.linalg.norm(hp, axis=1, keepdims=True)
    n_s = np.stack([np.asarray(sm.n[k]) for k in range(3)], -1)
    n_f = np.stack([np.asarray(hits.n[k]) for k in range(3)], -1)
    cos_s = np.sum(n_s[valid] * true_n[valid], axis=1)
    cos_f = np.abs(np.sum(n_f[valid] * true_n[valid], axis=1))
    # Smooth: sub-degree-scale error even at lat=8; face: degrees.
    assert cos_s.min() > 0.999
    assert np.median(cos_s) > np.median(cos_f)
    assert np.linalg.norm(n_s[valid], axis=1).max() < 1.0 + 1e-4


def test_smooth_fallbacks_keep_face_normal():
    """Misses and vn-less triangles keep the face normal."""
    r1 = np.float32([[-1, -1, 2], [-1, -1, 4]])
    r2 = np.float32([[1, -1, 2], [1, -1, 4]])
    r3 = np.float32([[0, 1, 2], [0, 1, 4]])
    tris = TrianglesSoA.build(r1, r2, r3, [0, 0])
    # Only triangle 1 has vertex normals (tilted +x); tri 0 has none.
    zeros = np.zeros((2, 3), np.float32)
    tilt = np.tile(np.float32([0.6, 0.0, -0.8]), (2, 3, 1))
    tilt[0] = 0.0
    attribs = shading.build_vertex_attribs(
        r1, r2, r3, tilt[:, 0], tilt[:, 1], tilt[:, 2]
    )
    rays = Rays(
        p=v3_from_array(jnp.asarray(
            [[0, 0, 0], [0, 0, 3], [5, 5, 0]], jnp.float32)),
        d=v3_from_array(jnp.asarray(
            [[0, 0, 1], [0, 0, 1], [0, 0, 1]], jnp.float32)),
    )
    hits, ids = intersect.first_intersect_ids(rays, tris)
    sm = shading.smooth_hit_normals(hits, ids, attribs)
    n = np.stack([np.asarray(sm.n[k]) for k in range(3)], -1)
    nf = np.stack([np.asarray(hits.n[k]) for k in range(3)], -1)
    np.testing.assert_allclose(n[0], nf[0], atol=1e-7)  # no vn
    np.testing.assert_allclose(n[1], [0.6, 0.0, -0.8], atol=1e-6)
    np.testing.assert_allclose(n[2], nf[2], atol=1e-7)  # miss
    assert not bool(np.asarray(sm.valid)[2])


def test_minarg_ids_match_bruteforce():
    """make_minarg_intersect(with_ids=True) reports the same winner
    ids and smooth normals as the bruteforce ids path."""
    from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
        make_minarg_intersect,
    )
    scene = library.cornell_box(with_spheres=True, smooth_spheres=True)
    cam = library.cornell_camera(32, 32)
    from opencl_path_tracer_tpu.ops import raygen
    ids_px = raygen.pixel_ids(32, 32)
    half = jnp.full(ids_px.shape, 0.5, jnp.float32)
    rays = raygen.camera_rays(cam, ids_px, half, half)

    h_bf, i_bf = intersect.first_intersect_ids(rays, scene.tris)
    fn = make_minarg_intersect(scene.tris, with_ids=True,
                               interpret=True)
    h_mk, i_mk = fn(rays)
    np.testing.assert_array_equal(np.asarray(i_bf), np.asarray(i_mk))
    np.testing.assert_allclose(np.asarray(h_bf.t), np.asarray(h_mk.t),
                               rtol=1e-6)
    s_bf = shading.smooth_hit_normals(h_bf, i_bf, scene.attribs)
    s_mk = shading.smooth_hit_normals(h_mk, i_mk, scene.attribs)
    # t agrees to f32 rounding (not bitwise — the kernel orders the
    # plane-test ops differently), so hit points and interpolated
    # normals match to ~1e-5.
    for k in range(3):
        np.testing.assert_allclose(np.asarray(s_bf.n[k]),
                                   np.asarray(s_mk.n[k]), atol=1e-5)


def test_engine_smooth_render_runs():
    """RenderConfig(smooth=True) renders end-to-end and the smooth
    image differs from the flat one (same scene geometry/RNG)."""
    from opencl_path_tracer_tpu.config import RenderConfig
    from opencl_path_tracer_tpu.runtime.engine import RenderEngine

    scene = library.cornell_box(with_spheres=True, smooth_spheres=True)
    imgs = {}
    for smooth in (False, True):
        cfg = RenderConfig(width=32, height=32, iterations=3, spp=4,
                           mode="fast", accel="bruteforce",
                           smooth=smooth)
        eng = RenderEngine(scene, cfg)
        eng.render(cfg.spp, progress=False)
        imgs[smooth] = eng.image(apply_tonemap=False)
        assert np.isfinite(imgs[smooth]).all()
    assert np.abs(imgs[True] - imgs[False]).max() > 1e-4


def test_engine_smooth_requires_attribs_and_ids_accel():
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn

    flat = library.cornell_box(with_spheres=True)
    with pytest.raises(ValueError, match="no vertex normals"):
        make_intersect_fn(flat, "bruteforce", smooth=True)
    sm = library.cornell_box(with_spheres=True, smooth_spheres=True)
    with pytest.raises(ValueError, match="ids-reporting"):
        make_intersect_fn(sm, "pallas", smooth=True)


def test_add_obj_smooth_normals_computed_and_from_vn(tmp_path):
    """add_obj(smooth_normals=True): computes welded area-weighted
    normals when the OBJ has no vn, and transforms file vn when it
    does (x-flip + nonuniform-scale inverse-transpose)."""
    library.write_sphere_obj(str(tmp_path / "s.obj"), radius=1.0,
                             lat=16, lon=24)
    b = SceneBuilder()
    b.add_obj(str(tmp_path / "s.obj"), pos=(0, 0, 0), scale=(2, 2, 2),
              smooth_normals=True)
    scene = b.build()
    assert scene.attribs is not None
    # Corner normals align with the radial axis. The x-flip
    # (main.cpp:598) mirrors the winding, so computed normals point
    # INWARD, consistent with the flipped face normals — shade()
    # flips toward the incoming ray either way (prog.cl:326-328).
    n1 = np.stack([np.asarray(scene.attribs.n1[k]) for k in range(3)],
                  -1)
    r1 = np.asarray(scene.tris.r1)
    rad = r1 / np.linalg.norm(r1, axis=1, keepdims=True)
    cos = np.sum(n1 * rad, axis=1)
    assert np.abs(cos).min() > 0.98
    face = np.asarray(scene.tris.n)
    assert (np.sum(n1 * face, axis=1) > 0).all()

    # vn path: a single +z-facing quad with tilted file normals, under
    # x-flip and nonuniform scale (1, 4, 1). n_file = (0, 1, 1)/√2 →
    # inverse-transpose: x flip (no x comp), divide y by 4 →
    # (0, .25, 1)/|.|.
    obj = tmp_path / "q.obj"
    obj.write_text(
        "v -1 -1 0\nv 1 -1 0\nv 0 1 0\n"
        "vn 0 0.7071 0.7071\n"
        "f 1//1 2//1 3//1\n"
    )
    b2 = SceneBuilder()
    b2.add_material((1, 1, 1), (0, 0, 0), (0, 0, 0),
                    (1, 1, 1), (0, 0, 0), 1.0, 0)
    b2.add_obj(str(obj), pos=(0, 0, 0), scale=(1, 4, 1),
               smooth_normals=True)
    sc2 = b2.build()
    n = np.stack([np.asarray(sc2.attribs.n1[k]) for k in range(3)], -1)
    expect = np.float32([0.0, 0.25, 1.0])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(n[0], expect, atol=1e-5)


def test_fused_smooth_kernel_matches_xla_path():
    """make_smooth_minarg_intersect (one-hot 3-split fetch +
    in-kernel interpolation) equals first_intersect_ids +
    smooth_hit_normals on every field (interpret mode here; the
    on-device record is job zr2 in docs/BENCHMARKS.md)."""
    from opencl_path_tracer_tpu.ops.pallas.shading_kernel import (
        make_smooth_minarg_intersect,
    )
    scene = library.cornell_box(with_spheres=True, smooth_spheres=True)
    cam = library.cornell_camera(48, 48)
    from opencl_path_tracer_tpu.ops import raygen
    ids_px = raygen.pixel_ids(48, 48)
    half = jnp.full(ids_px.shape, 0.5, jnp.float32)
    rays = raygen.camera_rays(cam, ids_px, half, half)

    h_bf, i_bf = intersect.first_intersect_ids(rays, scene.tris)
    ref = shading.smooth_hit_normals(h_bf, i_bf, scene.attribs)
    fused = make_smooth_minarg_intersect(
        scene.tris, scene.attribs, interpret=True)(rays)
    hit = np.asarray(ref.valid)
    assert hit.all()  # enclosed box
    np.testing.assert_allclose(np.asarray(fused.t), np.asarray(ref.t),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(fused.mati),
                                  np.asarray(ref.mati))
    # Same f32 ops in the same order; the only divergence allowed is
    # t's op-order difference inside the minarg kernel (~1 ulp),
    # which perturbs the hit point by ~1e-5 scene units.
    for k in range(3):
        np.testing.assert_allclose(np.asarray(fused.n[k]),
                                   np.asarray(ref.n[k]), atol=2e-5)


def test_interpolate_uvs_recover_and_obj_vt(tmp_path):
    """UV interpolation recovers per-corner vt values; add_obj carries
    OBJ texcoords into Scene.attribs (the consumption path for the vt
    data the reference parses but never reads, main.cpp:595-611)."""
    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v -1 -1 5\nv 1 -1 5\nv -1 1 5\nv 1 1 5\n"
        "vt 0 0\nvt 1 0\nvt 0 1\nvt 1 1\n"
        "f 1/1 2/2 3/3\nf 2/2 4/4 3/3\n"
    )
    b = SceneBuilder()
    b.add_material((1, 1, 1), (0, 0, 0), (0, 0, 0),
                   (1, 1, 1), (0, 0, 0), 1.0, 0)
    b.add_obj(str(obj), pos=(0, 0, 0), scale=(1, 1, 1))
    scene = b.build()
    assert scene.attribs is not None

    # Rays at known positions on the quad: uv should equal the
    # position mapped through the corner uvs. The x-flip negates
    # x, so world x = -file x; file u = (file_x + 1) / 2.
    targets = np.float32([[-0.5, -0.5], [0.25, 0.75], [0.0, 0.0]])
    p = np.concatenate([targets, np.zeros((3, 1), np.float32)], 1)
    rays = Rays(
        p=v3_from_array(jnp.asarray(p)),
        d=v3_from_array(jnp.asarray([[0, 0, 1]] * 3, jnp.float32)),
    )
    hits, ids = intersect.first_intersect_ids(rays, scene.tris)
    assert bool(hits.valid.all())
    s, t = shading.interpolate_uvs(hits, ids, scene.attribs)
    expect_u = (-targets[:, 0] + 1.0) / 2.0   # x-flip
    expect_v = (targets[:, 1] + 1.0) / 2.0
    np.testing.assert_allclose(np.asarray(s), expect_u, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), expect_v, atol=1e-6)

    # Miss lanes return (0, 0).
    miss_rays = Rays(
        p=v3_from_array(jnp.asarray([[50, 50, 0]], jnp.float32)),
        d=v3_from_array(jnp.asarray([[0, 0, 1]], jnp.float32)),
    )
    mh, mi = intersect.first_intersect_ids(miss_rays, scene.tris)
    ms, mt = shading.interpolate_uvs(mh, mi, scene.attribs)
    assert float(ms[0]) == 0.0 and float(mt[0]) == 0.0


@pytest.mark.slow
def test_engine_smooth_pairwin_large_scene():
    """Large-scene smooth shading rides the pair intersector's
    with_ids surface (engine accel='pairwin'; 'auto' picks it above
    4096 tris on TPU). Interpret-mode smoke: normals come back unit
    on a 6k-tri smooth stress scene."""
    from opencl_path_tracer_tpu.ops import raygen
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn

    scene = library.stress_scene(6000, smooth=True)
    fn = make_intersect_fn(scene, "pairwin", smooth=True)
    cam = library.cornell_camera(32, 32)
    ids = raygen.pixel_ids(32, 32)
    half = jnp.full(ids.shape, 0.5, jnp.float32)
    rays = raygen.camera_rays(cam, ids, half, half)
    h = fn(rays)
    v = np.asarray(h.valid)
    assert v.all()  # enclosed scene
    n = np.stack([np.asarray(h.n[k]) for k in range(3)], -1)
    np.testing.assert_allclose(np.linalg.norm(n[v], axis=1), 1.0,
                               atol=1e-5)
