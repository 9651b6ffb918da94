"""Next-event estimation (ops/nee.py): emitter table, gather math,
estimator equality with the base tracer, variance reduction."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.models import megakernel, wavefront
from opencl_path_tracer_tpu.ops import bsdf, intersect, nee
from opencl_path_tracer_tpu.scene import library


def _isect(scene):
    return functools.partial(intersect.first_intersect,
                             tris=scene.tris)


def test_emitter_table_cornell():
    scene = library.cornell_box(with_spheres=True)
    tab = nee.build_emitter_table(scene.tris, scene.mats,
                                  scene.spheres)
    assert tab.count >= 1
    assert float(tab.total_area) > 0.0
    assert float(tab.cum[-1]) == 1.0
    # Sampled points lie inside the union of the emitter triangles'
    # planes: for each sample, distance to its triangle plane ~ 0.
    k = jax.random.key(0)
    u = jax.random.uniform(k, (3, 512))
    y, m, em, p_area = nee.sample_emitters(tab, u[0], u[1], u[2])
    # every sampled emission is one of the table's emission rows
    assert np.all(np.asarray(em[0]) >= 0.0)
    # plane check: dot(y - v0_of_some_emitter, m) == 0 for the right
    # triangle; cheapest robust check = y is inside the overall
    # emitter AABB (the cornell lamp is axis-aligned)
    v0 = np.stack([np.asarray(c) for c in tab.v0], -1)
    e1 = np.stack([np.asarray(c) for c in tab.e1], -1)
    e2 = np.stack([np.asarray(c) for c in tab.e2], -1)
    corners = np.concatenate([v0, v0 + e1, v0 + e2])
    lo, hi = corners.min(0) - 1e-3, corners.max(0) + 1e-3
    ys = np.stack([np.asarray(c) for c in y], -1)
    assert np.all(ys >= lo) and np.all(ys <= hi)


def test_emitter_table_sphere_and_kind_unique_materials():
    """Emissive analytic spheres join the table (power = 4 pi R^2 x
    lum); an emissive material shared between a triangle and a sphere
    raises (the pickup's kind discriminator is hit.mati)."""
    from opencl_path_tracer_tpu.scene.builder import SceneBuilder
    b = SceneBuilder()
    b.add_material((0.5, 0.5, 0.5), (0, 0, 0), (0, 0, 0),
                   (1, 1, 1), (0, 0, 0), 50.0, 0)
    b.add_material((0, 0, 0), (0, 0, 0), (5.0, 5.0, 5.0),
                   (1, 1, 1), (0, 0, 0), 50.0, 3)
    b.add_triangle((0, 0, 0), (1, 0, 0), (0, 1, 0), 0)
    b.add_analytic_sphere((0.0, 5.0, 0.0), 1.0, 1)
    scene = b.build()
    tab = nee.build_emitter_table(scene.tris, scene.mats, scene.spheres)
    assert (tab.tri_count, tab.sphere_count, tab.count) == (0, 1, 1)
    assert float(tab.s_sel[0]) == 1.0
    np.testing.assert_allclose(
        float(tab.power_lum), 4 * np.pi * 1.0 * 5.0, rtol=1e-5)

    # Same emissive material on BOTH kinds -> loud error.
    b2 = SceneBuilder()
    b2.add_material((0, 0, 0), (0, 0, 0), (5.0, 5.0, 5.0),
                    (1, 1, 1), (0, 0, 0), 50.0, 3)
    b2.add_triangle((0, 0, 0), (1, 0, 0), (0, 1, 0), 0)
    b2.add_analytic_sphere((0.0, 5.0, 0.0), 1.0, 0)
    s2 = b2.build()
    with pytest.raises(ValueError, match="kind"):
        nee.build_emitter_table(s2.tris, s2.mats, s2.spheres)


def test_sphere_cone_sampler_geometry():
    """Solid-angle cone sampler: every sample lies on the sphere with
    a unit outward normal, and E[1/p_area] reproduces the VISIBLE cap
    area 2 pi R^2 (1 - R/d) — the pdf normalization identity."""
    scene = library.cornell_box(with_spheres=False, sphere_lamp=True)
    tab = nee.build_emitter_table(scene.tris, scene.mats,
                                  scene.spheres)
    N = 100_000
    x = (jnp.full((N,), 500.0), jnp.full((N,), 1.0),
         jnp.full((N,), 500.0))
    u = jax.random.uniform(jax.random.key(0), (3, N))
    y, m, em, p_area = nee.sample_emitters(tab, u[0], u[1], u[2],
                                           origin=x)
    ys = np.stack([np.asarray(c) for c in y], -1)
    c0 = np.array([500.0, 840.0, 500.0])
    r = np.linalg.norm(ys - c0, axis=-1)
    assert np.abs(r - 120.0).max() < 5e-3
    ms = np.stack([np.asarray(k) for k in m], -1)
    assert np.abs(np.linalg.norm(ms, axis=-1) - 1.0).max() < 1e-5
    # outward normal: m parallel to (y - c)
    assert np.abs((ms * (ys - c0)).sum(-1) / r - 1.0).max() < 1e-4
    d = float(np.linalg.norm(np.array([500.0, 1.0, 500.0]) - c0))
    cap = 2 * np.pi * 120.0 ** 2 * (1.0 - 120.0 / d)
    est = float(jnp.mean(1.0 / p_area))
    assert abs(est - cap) / cap < 0.05, (est, cap)


def test_sphere_gather_matches_brute_cosine():
    """The MIS identity on a SPHERE emitter: weighted gather +
    MIS-weighted BSDF pickup == full brute-force pickup term at a
    fixed diffuse vertex (same protocol as the triangle-lamp
    cross-check above)."""
    import dataclasses
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn

    scene = library.cornell_box(with_spheres=False, sphere_lamp=True)
    isect = make_intersect_fn(scene, "bruteforce")
    tab = nee.build_emitter_table(scene.tris, scene.mats,
                                  scene.spheres)
    mats = scene.mats
    N = 300_000
    x = (jnp.full((N,), 400.0), jnp.full((N,), 50.0),
         jnp.full((N,), 400.0))
    nv = (jnp.zeros(N), jnp.ones(N), jnp.zeros(N))
    u = jax.random.uniform(jax.random.key(1), (5, N))

    p, d = bsdf.diffuse_ray(x, nv, u[0], u[1])
    hit = isect(Rays(p=p, d=d))
    mat = mats.take_select(hit.mati)
    is_emit = hit.valid & (mat.type == 3)
    flip = (d[0] * hit.n[0] + d[1] * hit.n[1] + d[2] * hit.n[2]) > 0
    nf = tuple(jnp.where(flip, -c, c) for c in hit.n)
    emit_cos = jnp.maximum(
        0.0, -(d[0] * nf[0] + d[1] * nf[1] + d[2] * nf[2]))
    cos_t = jnp.maximum(0.0, d[1])
    pick = [jnp.where(is_emit, mat.emission[k] * cos_t * emit_cos, 0.0)
            for k in range(3)]
    full = [float(jnp.mean(c)) for c in pick]
    w_pick = nee.pickup_mis_weight(
        tab, cos_t / np.float32(np.pi), emit_cos, hit.t, mat.emission,
        mati=hit.mati, hit_p=hit.p, ray_p=p)
    picked = [float(jnp.mean(c * w_pick)) for c in pick]

    m1 = mats.take_select(jnp.zeros((N,), jnp.int32))
    m1 = dataclasses.replace(
        m1, kd=(jnp.ones(N),) * 3, ks=(jnp.zeros(N),) * 3)
    cam = library.cornell_camera(8, 8)
    c = nee.direct_light(
        tab, intersect_fn=isect, cam_eye=cam.eye,
        hit_p=x, n_vec=nv, mat=m1,
        f_l=(jnp.ones(N),) * 3, f_b=(jnp.zeros(N),) * 3,
        f_s=(jnp.ones(N),) * 3, f_r=(jnp.ones(N),) * 3,
        is_diff=jnp.ones((N,), bool), u1=u[2], u2=u[3], u3=u[4])
    gathered = [float(jnp.mean(k)) for k in c]
    total = [g + pk for g, pk in zip(gathered, picked)]
    np.testing.assert_allclose(total, full, rtol=0.04)
    # Both strategies genuinely contribute.
    assert all(g > 0.05 * f for g, f in zip(gathered, full))
    assert all(pk > 0.01 * f for pk, f in zip(picked, full))


def test_mixed_tri_and_sphere_emitters_identity():
    """Triangle lamp + emissive sphere in ONE scene: selection shares
    match the power fractions and the single-vertex MIS identity holds
    across the mixed table."""
    import dataclasses
    from opencl_path_tracer_tpu.scene.builder import SceneBuilder
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn

    b = SceneBuilder()
    b.add_material((0.7, 0.7, 0.7), (0, 0, 0), (0, 0, 0),
                   (1, 1, 1), (0, 0, 0), 50.0, 0)          # floor
    b.add_material((0, 0, 0), (0, 0, 0), (8.0, 8.0, 8.0),
                   (1, 1, 1), (0, 0, 0), 50.0, 3)          # tri lamp
    b.add_material((0, 0, 0), (0, 0, 0), (4.0, 4.0, 4.0),
                   (1, 1, 1), (0, 0, 0), 50.0, 3)          # sphere lamp
    b.add_triangle((-600, 0, -600), (600, 0, -600), (-600, 0, 600), 0)
    b.add_triangle((600, 0, -600), (600, 0, 600), (-600, 0, 600), 0)
    b.add_triangle((-200, 500, -100), (0, 500, -100), (-200, 500, 100),
                   1)
    b.add_triangle((0, 500, -100), (0, 500, 100), (-200, 500, 100), 1)
    b.add_analytic_sphere((250.0, 350.0, 0.0), 60.0, 2)
    scene = b.build()
    tab = nee.build_emitter_table(scene.tris, scene.mats, scene.spheres)
    assert (tab.tri_count, tab.sphere_count) == (2, 1)
    # power: tri lamp 200*200*8 = 3.2e5; sphere 4 pi 60^2 * 4 ~ 1.81e5
    p_tri = 200 * 200 * 8.0
    p_sph = 4 * np.pi * 60.0 ** 2 * 4.0
    u = jax.random.uniform(jax.random.key(2), (3, 40_000))
    x0 = (jnp.zeros(40_000), jnp.full((40_000,), 1.0),
          jnp.zeros(40_000))
    y, m, em, p_area = nee.sample_emitters(tab, u[0], u[1], u[2],
                                           origin=x0)
    sph_share = float(jnp.mean((em[0] < 6.0).astype(jnp.float32)))
    assert abs(sph_share - p_sph / (p_tri + p_sph)) < 0.02, sph_share

    isect = make_intersect_fn(scene, "bruteforce")
    N = 300_000
    x = (jnp.zeros(N), jnp.full((N,), 1.0), jnp.zeros(N))
    nv = (jnp.zeros(N), jnp.ones(N), jnp.zeros(N))
    uu = jax.random.uniform(jax.random.key(3), (5, N))
    p, d = bsdf.diffuse_ray(x, nv, uu[0], uu[1])
    hit = isect(Rays(p=p, d=d))
    mat = scene.mats.take_select(hit.mati)
    is_emit = hit.valid & (mat.type == 3)
    flip = (d[0] * hit.n[0] + d[1] * hit.n[1] + d[2] * hit.n[2]) > 0
    nf = tuple(jnp.where(flip, -c, c) for c in hit.n)
    emit_cos = jnp.maximum(
        0.0, -(d[0] * nf[0] + d[1] * nf[1] + d[2] * nf[2]))
    cos_t = jnp.maximum(0.0, d[1])
    pick = [jnp.where(is_emit, mat.emission[k] * cos_t * emit_cos, 0.0)
            for k in range(3)]
    full = [float(jnp.mean(c)) for c in pick]
    w_pick = nee.pickup_mis_weight(
        tab, cos_t / np.float32(np.pi), emit_cos, hit.t, mat.emission,
        mati=hit.mati, hit_p=hit.p, ray_p=p)
    picked = [float(jnp.mean(c * w_pick)) for c in pick]
    m1 = scene.mats.take_select(jnp.zeros((N,), jnp.int32))
    m1 = dataclasses.replace(
        m1, kd=(jnp.ones(N),) * 3, ks=(jnp.zeros(N),) * 3)
    cam = library.cornell_camera(8, 8)
    c = nee.direct_light(
        tab, intersect_fn=isect, cam_eye=cam.eye,
        hit_p=x, n_vec=nv, mat=m1,
        f_l=(jnp.ones(N),) * 3, f_b=(jnp.zeros(N),) * 3,
        f_s=(jnp.ones(N),) * 3, f_r=(jnp.ones(N),) * 3,
        is_diff=jnp.ones((N,), bool), u1=uu[2], u2=uu[3], u3=uu[4])
    gathered = [float(jnp.mean(k)) for k in c]
    total = [g + pk for g, pk in zip(gathered, picked)]
    np.testing.assert_allclose(total, full, rtol=0.04)


def test_reference_scene_analytic_spheres():
    """reference_scene(analytic=True): the two unit-sphere models
    become quadrics (emissive lamp + gold ball) at the add_Obj
    translate/scale, the other five stay meshes, and the emitter
    table picks up the sphere lamp for cone-sampled NEE."""
    import os
    here = os.path.dirname(__file__)
    mdir = os.path.join(here, "assets", "models")
    base = library.reference_scene(mdir)
    ana = library.reference_scene(mdir, analytic=True)
    assert ana.spheres is not None and ana.spheres.count == 2
    assert ana.num_triangles < base.num_triangles
    c = np.stack([np.asarray(k) for k in ana.spheres.c], -1)
    np.testing.assert_allclose(
        c, [[0.0, 1000.0, -50.0], [-490.0, 377.0, -400.0]])
    np.testing.assert_allclose(np.asarray(ana.spheres.rad),
                               [200.0, 100.0])
    tab = nee.build_emitter_table(ana.tris, ana.mats, ana.spheres)
    assert (tab.tri_count, tab.sphere_count) == (0, 1)
    # Emission is the LAMP archetype's (the gold ball is not emissive).
    np.testing.assert_allclose(
        [float(k[0]) for k in tab.s_emission], [120.0, 100.0, 80.0])


def test_reference_analytic_primary_hit_parity():
    """Mesh vs analytic reference builds agree on primary visibility:
    deterministic center-pixel rays hit the same material (up to the
    tessellation silhouette band) on >=97% of pixels."""
    import os
    from opencl_path_tracer_tpu.ops import raygen
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn
    here = os.path.dirname(__file__)
    mdir = os.path.join(here, "assets", "models")
    w, h = 96, 54
    cam = library.reference_camera(w, h)
    ids = raygen.pixel_ids_like(w * h)
    half = jnp.full((w * h,), 0.5)
    rays = raygen.camera_rays(cam, ids, half, half)

    def mat_key_img(scene):
        """Per-pixel MATERIAL CONTENT key (kd+emission+type), not the
        raw index: skipping an OBJ load shifts every later MTL
        material's index, so equal surfaces legitimately differ in
        mati across the two builds."""
        hits = make_intersect_fn(scene, "bruteforce")(rays)
        mi = np.asarray(hits.mati)
        key = sum(
            np.round(np.asarray(comp) * 1000).astype(np.int64)[mi]
            * (10 ** (3 * k))
            for k, comp in enumerate(
                list(scene.mats.kd) + list(scene.mats.emission))
        ) * 4 + np.asarray(scene.mats.type)[mi]
        return np.where(np.asarray(hits.valid), key, -1)

    a = mat_key_img(library.reference_scene(mdir))
    b = mat_key_img(library.reference_scene(mdir, analytic=True))
    agree = (a == b).mean()
    assert agree >= 0.95, agree
    # Both sphere models are actually seen by the analytic build
    # (emissive lamp pixels + gold-type pixels present).
    ana = library.reference_scene(mdir, analytic=True)
    hits = make_intersect_fn(ana, "bruteforce")(rays)
    mi = np.asarray(hits.mati)
    t = np.asarray(ana.mats.type)[mi]
    em = np.asarray(ana.mats.emission[0])[mi]
    assert ((t == 3) & (em > 0) & np.asarray(hits.valid)).sum() > 0
    assert ((mi == library.GOLD) & np.asarray(hits.valid)).sum() > 0


@pytest.mark.slow
def test_estimator_equality_sphere_lamp():
    """Renderer-level: NEE with the sphere-emitter cone sampler
    converges to the base tracer's image on the sphere-lamp cornell
    (the same protocol as the triangle-lamp equality test)."""
    w = h = 16
    scene = library.cornell_box(with_spheres=False, sphere_lamp=True)
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn
    cam = library.cornell_camera(w, h)
    isect = make_intersect_fn(scene, "bruteforce")
    tab = nee.build_emitter_table(scene.tris, scene.mats,
                                  scene.spheres)
    kw = dict(intersect_fn=isect, num_pixels=w * h, iterations=2,
              mode="fast")

    def img(spp, seed, **k):
        st = megakernel.render(cam, scene.mats, spp=spp, seed=seed,
                               **kw, **k)
        return np.asarray(megakernel.colors_array(st)).reshape(-1, 3)

    b1, b2 = img(1200, 3), img(1200, 11)
    n1, n2 = img(400, 7, nee=tab), img(400, 23, nee=tab)
    bm, nm = 0.5 * (b1 + b2), 0.5 * (n1 + n2)
    dim = bm.max(-1) < 1.0
    assert dim.sum() > w * h // 2
    bd, nd = bm[dim].mean(), nm[dim].mean()
    assert abs(bd - nd) < 0.04 * bd + 0.005, (bd, nd)
    base_dev = np.abs(b1 - b2)[dim].mean()
    nee_dev = np.abs(n1 - n2)[dim].mean()
    assert nee_dev < 0.6 * base_dev, (nee_dev, base_dev)


def test_gather_matches_brute_cosine():
    """The MIS identity at a fixed diffuse vertex: E[weighted gather]
    + E[MIS-weighted BSDF pickup] equals the FULL brute-force pickup
    term (the sharp, fast correctness anchor for the NEE math), and
    the two weighted halves are each strictly smaller."""
    import dataclasses
    scene = library.cornell_box(with_spheres=False)
    isect = _isect(scene)
    tab = nee.build_emitter_table(scene.tris, scene.mats,
                                  scene.spheres)
    mats = scene.mats
    N = 200_000
    x = (jnp.full((N,), 300.0), jnp.full((N,), 50.0),
         jnp.full((N,), 300.0))
    nv = (jnp.zeros(N), jnp.ones(N), jnp.zeros(N))
    u = jax.random.uniform(jax.random.key(0), (5, N))

    # Brute arm: cosine-sample a bounce direction, pickup if emitter
    # (kd=1, ks=0 so the weight is just cos * emit_cos * emission).
    p, d = bsdf.diffuse_ray(x, nv, u[0], u[1])
    hit = isect(Rays(p=p, d=d))
    mat = mats.take_select(hit.mati)
    is_emit = hit.valid & (mat.type == 3)
    flip = (d[0] * hit.n[0] + d[1] * hit.n[1] + d[2] * hit.n[2]) > 0
    nf = tuple(jnp.where(flip, -c, c) for c in hit.n)
    emit_cos = jnp.maximum(
        0.0, -(d[0] * nf[0] + d[1] * nf[1] + d[2] * nf[2]))
    cos_t = jnp.maximum(0.0, d[1])
    pick = [jnp.where(is_emit, mat.emission[k] * cos_t * emit_cos, 0.0)
            for k in range(3)]
    full = [float(jnp.mean(c)) for c in pick]
    # MIS-weighted pickup: the sampled direction's pdf is cos/pi.
    w_pick = nee.pickup_mis_weight(tab, cos_t / np.float32(np.pi),
                                   emit_cos, hit.t, mat.emission)
    picked = [float(jnp.mean(c * w_pick)) for c in pick]

    m1 = mats.take_select(jnp.zeros((N,), jnp.int32))
    m1 = dataclasses.replace(
        m1, kd=(jnp.ones(N),) * 3, ks=(jnp.zeros(N),) * 3)
    cam = library.cornell_camera(8, 8)
    c = nee.direct_light(
        tab, intersect_fn=isect, cam_eye=cam.eye,
        hit_p=x, n_vec=nv, mat=m1,
        f_l=(jnp.ones(N),) * 3, f_b=(jnp.zeros(N),) * 3,
        f_s=(jnp.ones(N),) * 3, f_r=(jnp.ones(N),) * 3,
        is_diff=jnp.ones((N,), bool), u1=u[2], u2=u[3], u3=u[4])
    gathered = [float(jnp.mean(k)) for k in c]
    total = [g + pk for g, pk in zip(gathered, picked)]
    np.testing.assert_allclose(total, full, rtol=0.03)
    # Both strategies genuinely contribute (the split is ~95/5 at
    # this floor-center vertex — area sampling dominates when the
    # lamp subtends a modest solid angle).
    assert all(g > 0.05 * f for g, f in zip(gathered, full))
    assert all(pk > 0.02 * f for pk, f in zip(picked, full))


@pytest.mark.slow
def test_estimator_equality_and_variance_reduction():
    """Renderer-level: NEE converges to the base image and slashes
    per-pixel variance on the pixels direct light dominates.

    Statistics are taken over DIM pixels (running mean < 1): the
    lamp-facing pixels' noise is primary-jitter edge noise NEE cannot
    touch, and their large absolute values (emission ~10) would
    otherwise swamp both assertions. Measured calibration (seeds as
    below): equal-spp deviation ratio 0.071, dim-mean agreement well
    under 1% — thresholds carry >2x margin."""
    w = h = 16
    scene = library.cornell_box(with_spheres=False)
    cam = library.cornell_camera(w, h)
    isect = _isect(scene)
    tab = nee.build_emitter_table(scene.tris, scene.mats,
                                  scene.spheres)
    kw = dict(intersect_fn=isect, num_pixels=w * h, iterations=2,
              mode="fast")

    def img(spp, seed, **k):
        st = megakernel.render(cam, scene.mats, spp=spp, seed=seed,
                               **kw, **k)
        return np.asarray(megakernel.colors_array(st)).reshape(-1, 3)

    b1, b2 = img(1000, 3), img(1000, 11)
    n1, n2 = img(400, 7, nee=tab), img(400, 23, nee=tab)
    bm, nm = 0.5 * (b1 + b2), 0.5 * (n1 + n2)
    dim = bm.max(-1) < 1.0
    assert dim.sum() > w * h // 2  # the mask actually selects walls
    # Same converged image on the direct-lit surfaces.
    bd, nd = bm[dim].mean(), nm[dim].mean()
    assert abs(bd - nd) < 0.03 * bd + 0.005, (bd, nd)
    # Variance reduction: seed-to-seed deviation at 2.5x FEWER
    # samples still far below the base's (measured 14x at equal spp).
    base_dev = np.abs(b1 - b2)[dim].mean()
    nee_dev = np.abs(n1 - n2)[dim].mean()
    assert nee_dev < 0.3 * base_dev, (nee_dev, base_dev)


@pytest.mark.slow
def test_wavefront_nee_matches_megakernel_nee():
    """wavefront_step's NEE wiring (gather + prev_diff suppression
    across regenerated samples, multi-bounce) agrees with the
    megakernel's on the converged dim-pixel mean — NEE makes those
    pixels low-variance, so a tight tolerance is meaningful at
    modest spp."""
    w = h = 8
    scene = library.cornell_box(with_spheres=False)
    cam = library.cornell_camera(w, h)
    isect = _isect(scene)
    tab = nee.build_emitter_table(scene.tris, scene.mats,
                                  scene.spheres)
    mk = megakernel.render(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=3, mode="fast", spp=400, seed=5, nee=tab)
    wf = wavefront.render_wavefront(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=3, mode="fast", exact_spp=True, min_spp=400,
        seed=9, nee=tab)
    cm = np.asarray(megakernel.colors_array(mk)).reshape(-1, 3)
    cw = np.asarray(wavefront.colors_by_pixel(wf, w * h))
    dim = cm.max(-1) < 1.0
    assert dim.sum() > w * h // 2
    a, b = cm[dim].mean(), cw[dim].mean()
    assert abs(a - b) < 0.05 * a + 0.005, (a, b)


def test_cli_nee_render(tmp_path, monkeypatch):
    import sys, os
    from opencl_path_tracer_tpu import cli
    png = str(tmp_path / "n.png")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-empty", "--size", "16x12",
        "--spp", "4", "--iters", "3", "--nee", "--out", png,
    ])
    assert cli.main() == 0
    assert os.path.exists(png)


def test_cli_nee_sphere_lamp_render(tmp_path, monkeypatch):
    """End-to-end: the sphere-emitter scene renders through the engine
    with --nee (cone sampler + pickup weights wired through the
    wavefront model and the merged sphere intersector)."""
    import sys, os
    from opencl_path_tracer_tpu import cli
    png = str(tmp_path / "sl.png")
    monkeypatch.setattr(sys, "argv", [
        "ptx", "render", "--scene", "cornell-sphere-lamp",
        "--size", "16x12", "--spp", "4", "--iters", "3", "--nee",
        "--out", png,
    ])
    assert cli.main() == 0
    assert os.path.exists(png)


def test_power_proportional_sampling_mixed_emitters():
    """Two emitters, one 50x brighter: samples land power- (not
    area-) proportionally, and the single-vertex MIS identity still
    holds on the mixed set (the per-emitter p_area does its job)."""
    import dataclasses
    from opencl_path_tracer_tpu.scene.builder import SceneBuilder
    b = SceneBuilder()
    b.add_material((0.7, 0.7, 0.7), (0, 0, 0), (0, 0, 0),
                   (1, 1, 1), (0, 0, 0), 50.0, 0)          # floor
    b.add_material((0, 0, 0), (0, 0, 0), (50.0, 50.0, 50.0),
                   (1, 1, 1), (0, 0, 0), 50.0, 3)          # bright
    b.add_material((0, 0, 0), (0, 0, 0), (1.0, 1.0, 1.0),
                   (1, 1, 1), (0, 0, 0), 50.0, 3)          # dim
    # floor quad
    b.add_triangle((-600, 0, -600), (600, 0, -600), (-600, 0, 600), 0)
    b.add_triangle((600, 0, -600), (600, 0, 600), (-600, 0, 600), 0)
    # SMALL bright panel + LARGE dim panel on the ceiling (y=500),
    # both 1x..: bright 100x100, dim 400x400 -> powers 50e4 vs 16e4.
    b.add_triangle((-150, 500, -50), (-50, 500, -50), (-150, 500, 50), 1)
    b.add_triangle((-50, 500, -50), (-50, 500, 50), (-150, 500, 50), 1)
    b.add_triangle((100, 500, -200), (500, 500, -200), (100, 500, 200), 2)
    b.add_triangle((500, 500, -200), (500, 500, 200), (100, 500, 200), 2)
    scene = b.build()
    tab = nee.build_emitter_table(scene.tris, scene.mats, None)
    assert tab.count == 4
    # Sampling density: bright panel power = 100*100*50 = 5e5, dim =
    # 400*400*1 = 1.6e5 -> bright share ~75.8%.
    u = jax.random.uniform(jax.random.key(2), (3, 40_000))
    y, m, em, p_area = nee.sample_emitters(tab, u[0], u[1], u[2])
    bright = np.asarray(em[0]) > 10.0
    share = bright.mean()
    assert abs(share - 5e5 / 6.6e5) < 0.02, share
    # MIS identity at a floor vertex (same protocol as the cornell
    # cross-check).
    isect = functools.partial(intersect.first_intersect,
                              tris=scene.tris)
    N = 200_000
    x = (jnp.zeros(N), jnp.full((N,), 1.0), jnp.zeros(N))
    nv = (jnp.zeros(N), jnp.ones(N), jnp.zeros(N))
    uu = jax.random.uniform(jax.random.key(3), (5, N))
    p, d = bsdf.diffuse_ray(x, nv, uu[0], uu[1])
    hit = isect(Rays(p=p, d=d))
    mat = scene.mats.take_select(hit.mati)
    is_emit = hit.valid & (mat.type == 3)
    flip = (d[0] * hit.n[0] + d[1] * hit.n[1] + d[2] * hit.n[2]) > 0
    nf = tuple(jnp.where(flip, -c, c) for c in hit.n)
    emit_cos = jnp.maximum(
        0.0, -(d[0] * nf[0] + d[1] * nf[1] + d[2] * nf[2]))
    cos_t = jnp.maximum(0.0, d[1])
    pick = [jnp.where(is_emit, mat.emission[k] * cos_t * emit_cos, 0.0)
            for k in range(3)]
    full = [float(jnp.mean(c)) for c in pick]
    w_pick = nee.pickup_mis_weight(tab, cos_t / np.float32(np.pi),
                                   emit_cos, hit.t, mat.emission)
    picked = [float(jnp.mean(c * w_pick)) for c in pick]
    m1 = scene.mats.take_select(jnp.zeros((N,), jnp.int32))
    m1 = dataclasses.replace(
        m1, kd=(jnp.ones(N),) * 3, ks=(jnp.zeros(N),) * 3)
    cam = library.cornell_camera(8, 8)
    c = nee.direct_light(
        tab, intersect_fn=isect, cam_eye=cam.eye,
        hit_p=x, n_vec=nv, mat=m1,
        f_l=(jnp.ones(N),) * 3, f_b=(jnp.zeros(N),) * 3,
        f_s=(jnp.ones(N),) * 3, f_r=(jnp.ones(N),) * 3,
        is_diff=jnp.ones((N,), bool), u1=uu[2], u2=uu[3], u3=uu[4])
    gathered = [float(jnp.mean(k)) for k in c]
    total = [g + pk for g, pk in zip(gathered, picked)]
    np.testing.assert_allclose(total, full, rtol=0.04)
