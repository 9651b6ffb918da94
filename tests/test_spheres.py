"""Analytic sphere primitive + Möller–Trumbore + hit merging.

The sphere primitive and M-T test are BASELINE.json north-star items
with no reference counterpart (the reference tessellates spheres,
main.cpp:1002,1009, and uses plane+edge-sign triangle math,
prog.cl:94-112)."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.spheres import SpheresSoA
from opencl_path_tracer_tpu.core.types import Rays, v3_from_array
from opencl_path_tracer_tpu.ops import intersect
from opencl_path_tracer_tpu.scene import library
from opencl_path_tracer_tpu.scene.builder import SceneBuilder


def _rays(p, d, normalize=True):
    p = np.asarray(p, np.float32).reshape(-1, 3)
    d = np.asarray(d, np.float32).reshape(-1, 3)
    if normalize:
        d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return Rays.make(jnp.asarray(p), jnp.asarray(d))


def _unit_sphere(mati=3):
    return SpheresSoA.build([[0.0, 0.0, 0.0]], [1.0], [mati])


def test_sphere_hit_front():
    hits = intersect.sphere_intersect(
        _rays([0, 0, -3], [0, 0, 1]), _unit_sphere()
    )
    assert float(hits.t[0]) == pytest.approx(2.0, abs=1e-6)
    np.testing.assert_allclose(
        [float(hits.p[k][0]) for k in range(3)], [0, 0, -1], atol=1e-6
    )
    # Outward normal at the near pole.
    np.testing.assert_allclose(
        [float(hits.n[k][0]) for k in range(3)], [0, 0, -1], atol=1e-6
    )
    assert int(hits.mati[0]) == 3


def test_sphere_inside_uses_far_root():
    hits = intersect.sphere_intersect(
        _rays([0, 0, 0], [0, 0, 1]), _unit_sphere()
    )
    assert float(hits.t[0]) == pytest.approx(1.0, abs=1e-6)
    # Normal stays outward even from inside (inside-ness is carried
    # path state, models/fused_step.py).
    np.testing.assert_allclose(
        [float(hits.n[k][0]) for k in range(3)], [0, 0, 1], atol=1e-6
    )


def test_sphere_miss_and_behind():
    hits = intersect.sphere_intersect(
        _rays([[0, 5, -3], [0, 0, 3]], [[0, 0, 1], [0, 0, 1]]),
        _unit_sphere(),
    )
    assert not bool(hits.valid[0])   # passes above
    assert not bool(hits.valid[1])   # sphere behind the origin
    assert float(hits.t[0]) == -1.0


def test_sphere_grazing_tangent_is_miss():
    # Tangent ray: disc == 0 exactly -> miss (disc > 0 test).
    hits = intersect.sphere_intersect(
        _rays([1.0, 0.0, -3.0], [0, 0, 1]), _unit_sphere()
    )
    assert not bool(hits.valid[0])


def test_sphere_closest_of_two():
    spheres = SpheresSoA.build(
        [[0, 0, 2], [0, 0, 5]], [1.0, 1.0], [7, 8]
    )
    hits = intersect.sphere_intersect(
        _rays([0, 0, -3], [0, 0, 1]), spheres
    )
    assert float(hits.t[0]) == pytest.approx(4.0, abs=1e-6)
    assert int(hits.mati[0]) == 7


def test_sphere_normal_exact_off_axis():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(64, 3)).astype(np.float32) * 0.2 + [0, 0, -4]
    d = ([0, 0, 1] - p) + rng.normal(size=(64, 3)) * 0.1
    spheres = SpheresSoA.build([[0, 0, 1]], [0.5], [0])
    hits = intersect.sphere_intersect(_rays(p, d), spheres)
    hp = np.stack([np.asarray(hits.p[k]) for k in range(3)], -1)
    hn = np.stack([np.asarray(hits.n[k]) for k in range(3)], -1)
    v = np.asarray(hits.valid)
    assert v.any()
    expect = (hp[v] - [0, 0, 1]) / 0.5
    np.testing.assert_allclose(hn[v], expect, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(hn[v], axis=1), 1.0, atol=1e-4
    )


def test_merge_hits_prefers_nearer_and_ties_keep_first():
    tris = TrianglesSoA.build(
        [[-9, -9, 4.0]], [[9, -9, 4.0]], [[0, 9, 4.0]], [1]
    )
    rays = _rays([[0, 0, 0]] * 3, [[0, 0, 1]] * 3)
    a = intersect.first_intersect(rays, tris)          # t = 4
    spheres = SpheresSoA.build(
        [[0, 0, 2]], [1.0], [2]                        # t = 1
    )
    b = intersect.sphere_intersect(rays, spheres)
    m = intersect.merge_hits(a, b)
    assert float(m.t[0]) == pytest.approx(1.0, abs=1e-6)
    assert int(m.mati[0]) == 2
    # b invalid -> keep a; exact tie -> keep a.
    b_miss = intersect.sphere_intersect(
        rays, SpheresSoA.build([[0, 9, 2]], [0.5], [2])
    )
    m2 = intersect.merge_hits(a, b_miss)
    assert float(m2.t[0]) == pytest.approx(4.0, abs=1e-6)
    assert int(m2.mati[0]) == 1
    a_relabeled = type(a)(t=a.t, p=a.p, n=a.n,
                          mati=jnp.full_like(a.mati, 9))
    tie = intersect.merge_hits(a, a_relabeled)
    assert int(tie.mati[0]) == 1


def test_moller_trumbore_matches_reference_math():
    """Pairwise M-T agrees with ray_tri_t (prog.cl:94-112 form) on
    hit/miss and t across random ray/triangle pairs."""
    rng = np.random.default_rng(1)
    n = 512
    r1 = rng.normal(size=(n, 3)).astype(np.float32)
    r2 = r1 + rng.normal(size=(n, 3)).astype(np.float32)
    r3 = r1 + rng.normal(size=(n, 3)).astype(np.float32)
    p = rng.normal(size=(n, 3)).astype(np.float32) * 3
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    t_mt, u, v, valid_mt = intersect.ray_tri_mt(
        v3_from_array(jnp.asarray(p)), v3_from_array(jnp.asarray(d)),
        v3_from_array(jnp.asarray(r1)), v3_from_array(jnp.asarray(r2)),
        v3_from_array(jnp.asarray(r3)),
    )
    t_mt, u, v, valid_mt = map(np.asarray, (t_mt, u, v, valid_mt))

    # Reference-math verdict, one pair at a time via the (R, T) form.
    t_ref = np.empty(n, np.float32)
    valid_ref = np.empty(n, bool)
    for i in range(n):
        tris = TrianglesSoA.build(r1[i:i+1], r2[i:i+1], r3[i:i+1], [0])
        t2, v2 = intersect.ray_tri_t(
            jnp.asarray(p[i:i+1]), jnp.asarray(d[i:i+1]), tris
        )
        t_ref[i] = float(t2[0, 0])
        valid_ref[i] = bool(v2[0, 0])

    # Disagreements only from float rounding at edges: tolerate lanes
    # where a barycentric sits within 1e-5 of an edge.
    near_edge = (np.abs(u) < 1e-5) | (np.abs(v) < 1e-5) \
        | (np.abs(1.0 - u - v) < 1e-5) | (np.abs(t_mt) < 1e-5)
    hard = ~near_edge
    assert (valid_mt[hard] == valid_ref[hard]).all()
    both = valid_mt & valid_ref
    np.testing.assert_allclose(t_mt[both], t_ref[both],
                               rtol=1e-4, atol=1e-4)
    # Barycentric reconstruction: p + t d == (1-u-v) r1 + u r2 + v r3.
    w = (1.0 - u - v)[both, None]
    recon = w * r1[both] + u[both, None] * r2[both] \
        + v[both, None] * r3[both]
    hitp = p[both] + t_mt[both, None] * d[both]
    np.testing.assert_allclose(recon, hitp, rtol=1e-3, atol=1e-3)


def test_builder_and_engine_wire_spheres():
    """cornell_box(analytic_spheres=True) renders through the engine
    and converges to the tessellated version (same centers/radii)."""
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn

    mesh_scene = library.cornell_box(with_spheres=True)
    quad_scene = library.cornell_box(with_spheres=True,
                                     analytic_spheres=True)
    assert quad_scene.spheres is not None
    assert quad_scene.spheres.count == 2
    assert mesh_scene.spheres is None

    # Primary rays through both: hit masks agree except at the
    # tessellation's silhouette (the quadric is slightly larger than
    # its inscribed mesh), and sphere-material hit rates are close.
    cam = library.cornell_camera(64, 64)
    from opencl_path_tracer_tpu.ops import raygen
    ids = raygen.pixel_ids(64, 64)
    half = jnp.full(ids.shape, 0.5, jnp.float32)
    rays = raygen.camera_rays(cam, ids, half, half)
    f_mesh = make_intersect_fn(mesh_scene, "bruteforce")
    f_quad = make_intersect_fn(quad_scene, "bruteforce")
    hm = f_mesh(rays)
    hq = f_quad(rays)
    assert bool(hq.valid.all())  # box encloses every primary ray
    sph_m = np.isin(np.asarray(hm.mati), (library.CHROMIUM,
                                          library.GLASS))
    sph_q = np.isin(np.asarray(hq.mati), (library.CHROMIUM,
                                          library.GLASS))
    frac_m = sph_m.mean()
    frac_q = sph_q.mean()
    assert abs(frac_m - frac_q) < 0.02
    assert (sph_m & sph_q).sum() > 0.9 * sph_m.sum()


def test_spheres_soa_validation():
    with pytest.raises(ValueError, match="radii"):
        SpheresSoA.build([[0, 0, 0]], [0.0], [0])
    with pytest.raises(ValueError, match="mismatched"):
        SpheresSoA.build([[0, 0, 0]], [1.0, 2.0], [0])


def test_sphere_kernel_matches_xla_form():
    """The baked-constant Pallas kernel (interpret here) agrees with
    ops.intersect.sphere_intersect on hit/miss and t to f32 rounding
    (bitwise is not promised: MXU dots vs VPU chains round the 3-term
    sums differently; on-device record is job zr3)."""
    from opencl_path_tracer_tpu.ops.pallas.sphere_kernel import (
        make_sphere_intersect,
    )
    from opencl_path_tracer_tpu.scene import library as lib

    scene = lib.cornell_box(with_spheres=True, analytic_spheres=True)
    from opencl_path_tracer_tpu.ops import raygen
    cam = lib.cornell_camera(64, 64)
    ids = raygen.pixel_ids(64, 64)
    half = jnp.full(ids.shape, 0.5, jnp.float32)
    rays = raygen.camera_rays(cam, ids, half, half)

    a = intersect.sphere_intersect(rays, scene.spheres)
    b = make_sphere_intersect(scene.spheres, interpret=True)(rays)
    va, vb = np.asarray(a.valid), np.asarray(b.valid)
    # Hit/miss flips only possible at the tangency boundary; none on
    # this centered-pixel grid.
    np.testing.assert_array_equal(va, vb)
    both = va & vb
    assert both.sum() > 100
    np.testing.assert_allclose(np.asarray(a.t)[both],
                               np.asarray(b.t)[both], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.mati)[both],
                                  np.asarray(b.mati)[both])
    for k in range(3):
        np.testing.assert_allclose(np.asarray(a.n[k])[both],
                                   np.asarray(b.n[k])[both], atol=1e-4)
    # Miss conventions match (t=-1, n=0, mati=0).
    miss = ~va
    if miss.any():
        assert (np.asarray(b.t)[miss] == -1.0).all()
        assert (np.asarray(b.mati)[miss] == 0).all()


def test_sphere_kernel_two_sphere_order_and_caps():
    from opencl_path_tracer_tpu.ops.pallas.sphere_kernel import (
        make_sphere_intersect,
    )
    spheres = SpheresSoA.build([[0, 0, 2], [0, 0, 5]], [1.0, 1.0],
                               [7, 8])
    hits = make_sphere_intersect(spheres, interpret=True)(
        _rays([0, 0, -3], [0, 0, 1]))
    assert float(hits.t[0]) == pytest.approx(4.0, abs=1e-5)
    assert int(hits.mati[0]) == 7


def test_sphere_table_kernel_matches_baked_and_xla():
    """Many-sphere table kernel == baked kernel (same math order) and
    tracks the XLA form; make_sphere_intersect auto-dispatches above
    MAX_BAKED_SPHERES."""
    from opencl_path_tracer_tpu.ops.pallas.sphere_kernel import (
        MAX_BAKED_SPHERES, make_sphere_intersect,
        make_sphere_table_intersect,
    )
    rng = np.random.default_rng(5)
    s = 37  # > one 32-chunk, forces the cross-chunk strict-< path
    centers = rng.uniform(-4, 4, (s, 3)).astype(np.float32)
    radii = rng.uniform(0.3, 1.2, s).astype(np.float32)
    mats = (np.arange(s) % 9).astype(np.int32)
    spheres = SpheresSoA.build(centers, radii, mats)
    p = rng.uniform(-8, 8, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    rays = _rays(p, d)

    baked = make_sphere_intersect(spheres, interpret=True)(rays)
    table = make_sphere_table_intersect(spheres, chunk=32,
                                        interpret=True)(rays)
    # Same ops but NOT bitwise: the compiler contracts the scalar-
    # baked chains into FMAs differently than the broadcast ones; the
    # disc cancellation amplifies that to ~1e-5 relative on grazing
    # lanes (the sphere_intersect precision contract).
    np.testing.assert_array_equal(np.asarray(baked.valid),
                                  np.asarray(table.valid))
    np.testing.assert_allclose(np.asarray(baked.t),
                               np.asarray(table.t), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(baked.mati),
                                  np.asarray(table.mati))
    hit = np.asarray(baked.valid)
    assert hit.sum() > 50
    for k in range(3):
        np.testing.assert_allclose(np.asarray(baked.n[k])[hit],
                                   np.asarray(table.n[k])[hit],
                                   atol=1e-4)
    xla = intersect.sphere_intersect(rays, spheres)
    agree = np.asarray(xla.valid) == hit
    assert agree.mean() > 0.995  # tangency-boundary lanes only
    b2 = np.asarray(xla.valid) & hit
    np.testing.assert_allclose(np.asarray(xla.t)[b2],
                               np.asarray(table.t)[b2], rtol=1e-4)

    big = SpheresSoA.build(
        np.zeros((MAX_BAKED_SPHERES + 1, 3)),
        np.ones(MAX_BAKED_SPHERES + 1),
        np.zeros(MAX_BAKED_SPHERES + 1, np.int32),
    )
    assert make_sphere_intersect(big, interpret=True) is not None


def test_stress_scene_analytic_twin():
    """stress_scene(analytic=True) has the same shell triangles and
    the same sphere set (centers/radii/materials from the same RNG
    stream) as the tessellated scene, as quadrics."""
    tess = library.stress_scene(6000, seed=3)
    quad = library.stress_scene(6000, seed=3, analytic=True)
    assert quad.spheres is not None and tess.spheres is None
    n_shell = quad.num_triangles
    assert n_shell < 40
    np.testing.assert_array_equal(np.asarray(quad.tris.r1),
                                  np.asarray(tess.tris.r1[:n_shell]))
    per_sphere = 2 * 16 * 24 - 2 * 24
    expect = max(1, (6000 - n_shell) // per_sphere)
    assert quad.spheres.count == expect
    # Sphere centers land inside the tessellated scene's bounds.
    cx = np.asarray(quad.spheres.c[0])
    assert cx.min() > -100 and cx.max() < 1100
