"""Plucker-MXU candidates + exact-refine intersector (interpret mode):
wherever a lane is not PENDING, hits must equal the fused f32 kernel
bit for bit (the module's central guarantee); pending lanes must be
rare and only ever of the both-candidates-spurious kind."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.ops.pallas import make_pallas_intersect
from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
    make_plucker_intersect,
)

pytestmark = pytest.mark.slow


def _rand_scene(t, seed=0, spread=10.0):
    rs = np.random.default_rng(seed)
    centers = rs.uniform(-spread, spread, size=(t, 1, 3))
    v = (centers + rs.normal(size=(t, 3, 3)) * 0.6).astype(np.float32)
    return TrianglesSoA.build(
        v[:, 0], v[:, 1], v[:, 2], np.arange(t, dtype=np.int32) % 7
    )


def _rand_rays(n, seed=1, spread=12.0):
    rs = np.random.default_rng(seed)
    p = rs.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Rays(
        p=tuple(jnp.asarray(p[:, k]) for k in range(3)),
        d=tuple(jnp.asarray(d[:, k]) for k in range(3)),
    )


@pytest.mark.parametrize("t,n", [(60, 300), (700, 500)])
def test_plucker_bitexact_vs_fused_kernel(t, n):
    tris = _rand_scene(t)
    rays = _rand_rays(n)
    ref = make_pallas_intersect(tris, interpret=True)(rays)
    hits, pending = make_plucker_intersect(tris, interpret=True)(rays)

    pend = np.asarray(pending)
    ok = ~pend
    # Central guarantee: non-pending lanes are bit-identical.
    np.testing.assert_array_equal(
        np.asarray(hits.t)[ok], np.asarray(ref.t)[ok]
    )
    np.testing.assert_array_equal(
        np.asarray(hits.mati)[ok], np.asarray(ref.mati)[ok]
    )
    # Normals/points are unspecified on miss lanes in BOTH kernels
    # (whatever the argmin machinery last latched) — compare on hits.
    okh = ok & (np.asarray(ref.t) >= 0.0)
    for k in range(3):
        np.testing.assert_array_equal(
            np.asarray(hits.n[k])[okh], np.asarray(ref.n[k])[okh]
        )
        np.testing.assert_array_equal(
            np.asarray(hits.p[k])[okh], np.asarray(ref.p[k])[okh]
        )
    # Pending is the rare escape hatch, not a crutch.
    assert pend.mean() < 0.02, f"pending fraction {pend.mean():.3f}"


def test_plucker_cornell_scene_bitexact():
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
    hits, pending = make_plucker_intersect(
        scene.tris, interpret=True
    )(rays)
    ok = ~np.asarray(pending)
    # Pending rate scales with pixel size (the eps band is fixed in
    # world units): ~0.5% at this coarse 48x48; ~0.02% at 1080p.
    assert ok.mean() > 0.98
    np.testing.assert_array_equal(
        np.asarray(hits.t)[ok], np.asarray(ref.t)[ok]
    )
    np.testing.assert_array_equal(
        np.asarray(hits.mati)[ok], np.asarray(ref.mati)[ok]
    )


def test_plucker_miss_rays_confirmed():
    """Rays pointing away from every triangle must be CONFIRMED misses
    (t = -1), not pending."""
    tris = _rand_scene(40, spread=5.0)
    n = 128
    p = np.full((n, 3), 100.0, np.float32)
    d = np.zeros((n, 3), np.float32)
    d[:, 0] = 1.0  # heading +x away from the cloud at origin
    rays = Rays(
        p=tuple(jnp.asarray(p[:, k]) for k in range(3)),
        d=tuple(jnp.asarray(d[:, k]) for k in range(3)),
    )
    hits, pending = make_plucker_intersect(tris, interpret=True)(rays)
    assert not np.asarray(pending).any()
    assert (np.asarray(hits.t) == -1.0).all()


def test_minarg_bitexact_vs_fused_kernel():
    """min+argmin + attribute refine must equal the fused kernel on
    EVERY lane (no pending — the winner passed the exact test)."""
    from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
        make_minarg_intersect,
    )

    tris = _rand_scene(700)
    rays = _rand_rays(500)
    ref = make_pallas_intersect(tris, interpret=True)(rays)
    got = make_minarg_intersect(tris, interpret=True)(rays)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(
        np.asarray(got.mati), np.asarray(ref.mati)
    )
    hit = np.asarray(ref.t) > 0
    for k in range(3):
        np.testing.assert_array_equal(
            np.asarray(got.n[k])[hit], np.asarray(ref.n[k])[hit]
        )
