"""Tile-culling grouped intersector + any-hit visibility kernel
(interpret mode): t must equal the dense fused kernel bit for bit (the
group AABB cull may never drop a winner), and the any-hit predicate
must reproduce the nearest-hit visibility decision exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.ops.pallas import make_pallas_intersect
from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
    make_anyhit_occluded, make_tilecull_intersect,
)

pytestmark = pytest.mark.slow


def _rand_scene(t, seed=0, spread=10.0):
    rs = np.random.default_rng(seed)
    centers = rs.uniform(-spread, spread, size=(t, 1, 3))
    v = (centers + rs.normal(size=(t, 3, 3)) * 0.6).astype(np.float32)
    return TrianglesSoA.build(
        v[:, 0], v[:, 1], v[:, 2], np.arange(t, dtype=np.int32) % 7
    )


def _rand_rays(n, seed=1, spread=12.0, axis_aligned_frac=0.1):
    rs = np.random.default_rng(seed)
    p = rs.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    # A slice of exactly axis-aligned directions: the slab test's
    # zero-component path (_safe_inv) must stay conservative.
    k = int(n * axis_aligned_frac)
    if k:
        ax = rs.integers(0, 3, size=k)
        sg = rs.choice([-1.0, 1.0], size=k)
        d[:k] = 0.0
        d[np.arange(k), ax] = sg
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Rays(
        p=tuple(jnp.asarray(p[:, k]) for k in range(3)),
        d=tuple(jnp.asarray(d[:, k]) for k in range(3)),
    )


@pytest.mark.parametrize("t,n,gs", [(60, 300, 16), (700, 500, 128)])
def test_tilecull_bitexact_vs_fused_kernel(t, n, gs):
    tris = _rand_scene(t)
    rays = _rand_rays(n)
    ref = make_pallas_intersect(tris, interpret=True)(rays)
    hits = make_tilecull_intersect(tris, gs=gs, interpret=True)(rays)

    np.testing.assert_array_equal(np.asarray(hits.t), np.asarray(ref.t))
    hit = np.asarray(ref.t) >= 0.0
    np.testing.assert_array_equal(
        np.asarray(hits.mati)[hit], np.asarray(ref.mati)[hit]
    )
    for k in range(3):
        np.testing.assert_array_equal(
            np.asarray(hits.n[k])[hit], np.asarray(ref.n[k])[hit]
        )
        np.testing.assert_array_equal(
            np.asarray(hits.p[k])[hit], np.asarray(ref.p[k])[hit]
        )


def test_tilecull_cornell_scene_bitexact():
    from opencl_path_tracer_tpu.ops import raygen
    from opencl_path_tracer_tpu.scene import library

    w = h = 48
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    ids = raygen.pixel_ids_like(w * h)
    r1 = jnp.full((w * h,), 0.3, jnp.float32)
    r2 = jnp.full((w * h,), 0.7, jnp.float32)
    rays = raygen.camera_rays(cam, ids, r1, r2)

    ref = make_pallas_intersect(scene.tris, interpret=True)(rays)
    hits = make_tilecull_intersect(scene.tris, interpret=True)(rays)
    np.testing.assert_array_equal(np.asarray(hits.t), np.asarray(ref.t))
    hit = np.asarray(ref.t) >= 0.0
    np.testing.assert_array_equal(
        np.asarray(hits.mati)[hit], np.asarray(ref.mati)[hit]
    )


def test_tilecull_with_ids_original_order():
    from opencl_path_tracer_tpu.ops import intersect

    tris = _rand_scene(90, seed=3)
    rays = _rand_rays(200, seed=4)
    hits, ids = make_tilecull_intersect(
        tris, gs=16, with_ids=True, interpret=True
    )(rays)
    ref_hits, ref_ids = intersect.first_intersect_ids(rays, tris)
    np.testing.assert_array_equal(np.asarray(hits.t),
                                  np.asarray(ref_hits.t))
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


@pytest.mark.parametrize("seed", [0, 5])
def test_anyhit_matches_nearest_hit_predicate(seed):
    tris = _rand_scene(200, seed=seed)
    rays = _rand_rays(400, seed=seed + 1)
    rs = np.random.default_rng(seed + 2)
    rmax = jnp.asarray(
        rs.uniform(0.5, 25.0, size=(400,)).astype(np.float32)
    )
    ref = make_pallas_intersect(tris, interpret=True)(rays)
    occ = make_anyhit_occluded(tris, gs=32, interpret=True)(rays, rmax)
    expect = (np.asarray(ref.t) >= 0.0) & (np.asarray(ref.t)
                                           < np.asarray(rmax))
    np.testing.assert_array_equal(np.asarray(occ), expect)


def test_anyhit_escape_is_miss_predicate():
    # rmax = BIG: occluded iff the ray hits ANYTHING — the envmap
    # shadow-ray contract (direct_light_env: visible = ~hit).
    tris = _rand_scene(150, seed=7)
    rays = _rand_rays(300, seed=8)
    rmax = jnp.full((300,), 3.0e38, jnp.float32)
    ref = make_pallas_intersect(tris, interpret=True)(rays)
    occ = make_anyhit_occluded(tris, gs=32, interpret=True)(rays, rmax)
    np.testing.assert_array_equal(np.asarray(occ),
                                  np.asarray(ref.t) >= 0.0)


def test_group_count_guard():
    tris = _rand_scene(600)
    with pytest.raises(ValueError):
        make_tilecull_intersect(tris, gs=8, interpret=True)


def test_wavefront_nee_bitidentical_with_anyhit_shadow():
    """Routing NEE shadow rays through the any-hit kernel must not
    change a single bit of the render: the occlusion predicate is the
    nearest-hit one, answered cheaper."""
    import functools

    import jax

    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.ops import intersect
    from opencl_path_tracer_tpu.ops.nee import build_emitter_table
    from opencl_path_tracer_tpu.scene import library

    w = h = 32
    scene = library.cornell_box(with_spheres=True)
    cam = library.cornell_camera(w, h)
    key = jax.random.key(5)
    isect = functools.partial(intersect.first_intersect,
                              tris=scene.tris)
    table = build_emitter_table(scene.tris, scene.mats, None)
    occ = make_anyhit_occluded(scene.tris, interpret=True)

    def run(occluded_fn):
        st = wavefront.init_wavefront(cam, w * h, mode="fast", key=key)
        for _ in range(6):
            st = wavefront.wavefront_step(
                cam, scene.mats, st, intersect_fn=isect, iterations=4,
                mode="fast", key=key, nee=table,
                occluded_fn=occluded_fn,
            )
        return st

    a = run(None)
    b = run(occ)
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(a.colors[k]),
                                      np.asarray(b.colors[k]))


def test_wavefront_nee_bitidentical_anyhit_with_spheres():
    """Analytic-sphere scenes: the composed occlusion test
    (make_scene_occluded = tri any-hit | sphere nearest < rmax) must
    reproduce the merged nearest-hit visibility bits — spheres
    occlude shadow rays exactly as in the baseline."""
    import functools

    import jax

    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.ops import intersect
    from opencl_path_tracer_tpu.ops.nee import build_emitter_table
    from opencl_path_tracer_tpu.ops.pallas.sphere_kernel import (
        make_sphere_intersect,
    )
    from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
        make_scene_occluded,
    )
    from opencl_path_tracer_tpu.scene import library

    w = h = 32
    scene = library.cornell_box(with_spheres=True,
                                analytic_spheres=True)
    cam = library.cornell_camera(w, h)
    key = jax.random.key(9)
    tri_fn = functools.partial(intersect.first_intersect,
                               tris=scene.tris)
    sph_fn = make_sphere_intersect(scene.spheres, interpret=True)

    def isect(rays):
        return intersect.merge_hits(tri_fn(rays), sph_fn(rays))

    table = build_emitter_table(scene.tris, scene.mats, scene.spheres)
    occ = make_scene_occluded(scene, interpret=True)

    def run(occluded_fn):
        st = wavefront.init_wavefront(cam, w * h, mode="fast", key=key)
        for _ in range(6):
            st = wavefront.wavefront_step(
                cam, scene.mats, st, intersect_fn=isect, iterations=4,
                mode="fast", key=key, nee=table,
                occluded_fn=occluded_fn,
            )
        return st

    a = run(None)
    b = run(occ)
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(a.colors[k]),
                                      np.asarray(b.colors[k]))


def test_engine_accel_tilecull_smooth_render():
    """accel='tilecull' through the engine surface (SMOOTH_ACCELS
    member): smooth-shaded render is finite and matches the minarg
    engine bit-for-bit (same winners, same one-ids fetch contract)."""
    from opencl_path_tracer_tpu.config import CameraConfig, RenderConfig
    from opencl_path_tracer_tpu.runtime.engine import RenderEngine
    from opencl_path_tracer_tpu.scene import library

    scene = library.cornell_box(with_spheres=True, smooth_spheres=True)

    def render(accel):
        cfg = RenderConfig(
            width=24, height=24, iterations=3, mode="parity",
            accel=accel, smooth=True,
            camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                                shift=(0.0, 0.0, 0.0)),
        )
        eng = RenderEngine(scene, cfg)
        eng.render(spp=2, progress=False)
        return eng.image()

    a = render("minarg")
    b = render("tilecull")
    assert np.isfinite(b).all()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_predictor_separates_anchor_scenes():
    """The workload-sampling predictor must keep reproducing the
    measured round-4 anchors: enclosed deep-bounce cornell -> minarg,
    the reference's spread scene and the iterations=1 preview ->
    tilecull (docs/BENCHMARKS.md round 4)."""
    import os

    from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
        auto_small_accel, estimate_tile_need_fraction,
    )
    from opencl_path_tracer_tpu.scene import library

    cam = library.cornell_camera(1920, 1080)
    cornell = library.cornell_box(with_spheres=True)
    assert auto_small_accel(cornell.tris, cam, iterations=5) \
        == "minarg"
    assert auto_small_accel(cornell.tris, cam, iterations=1) \
        == "tilecull"

    models = os.path.join(os.path.dirname(__file__), "assets",
                          "models")
    ref = library.reference_scene(models)
    cam_ref = library.cornell_camera(1536, 864)
    assert auto_small_accel(ref.tris, cam_ref, iterations=5) \
        == "tilecull"

    # Round-5 anchor in the formerly blind enclosed 4k-8k region:
    # dense-tessellated cornell, 5012 tris, measured minarg 12.49 >
    # tilecull 10.52 > pairwin 8.17 Mrays/s — must fall back to
    # minarg (round 4's threshold 0.7 misclassified it at frac 0.69).
    dense = library.cornell_box(with_spheres=True,
                                sphere_res=(26, 50))
    assert auto_small_accel(dense.tris, cam, iterations=5) == "minarg"

    # The enclosed deep-bounce boxes sit clearly above the tilecull
    # winners' estimates.
    f_box = estimate_tile_need_fraction(cornell.tris, cam,
                                        iterations=5)
    f_dense = estimate_tile_need_fraction(dense.tris, cam,
                                          iterations=5)
    f_ref = estimate_tile_need_fraction(ref.tris, cam_ref,
                                        iterations=5)
    f_prev = estimate_tile_need_fraction(cornell.tris, cam,
                                         iterations=1)
    assert max(f_ref, f_prev) < 0.55 < min(f_box, f_dense)


@pytest.mark.parametrize("presort", ["octant", "morton"])
def test_tilecull_presort_bitexact(presort):
    """Internal coherence presort (thin-key permute + inverse
    unpermute) must be invisible: bit-identical t/mati/n/p and ids to
    presort='none' — per-lane math is lane-order independent, and the
    per-tile pl.when skips only drop groups no lane in the tile
    needs."""
    tris = _rand_scene(300, seed=3)
    rays = _rand_rays(700, seed=4)
    base, ids0 = make_tilecull_intersect(
        tris, gs=64, with_ids=True, interpret=True)(rays)
    hits, ids1 = make_tilecull_intersect(
        tris, gs=64, with_ids=True, presort=presort,
        interpret=True)(rays)
    np.testing.assert_array_equal(np.asarray(hits.t),
                                  np.asarray(base.t))
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids0))
    np.testing.assert_array_equal(np.asarray(hits.mati),
                                  np.asarray(base.mati))
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(hits.n[k]),
                                      np.asarray(base.n[k]))
        np.testing.assert_array_equal(np.asarray(hits.p[k]),
                                      np.asarray(base.p[k]))


def test_tilecull_front_to_back_order_bitexact():
    """origin= group ordering (front-to-back early-out) must not
    change any winner: min over all groups is order-independent off
    ties, and ids fold back through the reordered perm."""
    tris = _rand_scene(500, seed=7)
    rays = _rand_rays(600, seed=8)
    base, ids0 = make_tilecull_intersect(
        tris, gs=64, with_ids=True, interpret=True)(rays)
    hits, ids1 = make_tilecull_intersect(
        tris, gs=64, with_ids=True, origin=(0.0, 0.0, -30.0),
        interpret=True)(rays)
    np.testing.assert_array_equal(np.asarray(hits.t),
                                  np.asarray(base.t))
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids0))
    np.testing.assert_array_equal(np.asarray(hits.mati),
                                  np.asarray(base.mati))
