"""Intersection math vs analytic cases (triangle test prog.cl:94-112,
slab test prog.cl:123-143)."""

import numpy as np
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.ops import intersect


def _tri_xy():
    """Unit right triangle in the z=0 plane."""
    return TrianglesSoA.build(
        [[0.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]], [[0.0, 1.0, 0.0]], [5]
    )


def _rays(p, d):
    p = jnp.asarray(p, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(d, jnp.float32).reshape(-1, 3)
    return Rays.make(p, d)


def test_hit_center():
    tris = _tri_xy()
    hits = intersect.first_intersect(
        _rays([0.25, 0.25, -2.0], [0.0, 0.0, 1.0]), tris
    )
    assert float(hits.t[0]) == 2.0
    pt = [float(hits.p[k][0]) for k in range(3)]
    np.testing.assert_allclose(pt, [0.25, 0.25, 0.0], atol=1e-6)
    nrm = [float(hits.n[k][0]) for k in range(3)]
    np.testing.assert_allclose(nrm, [0, 0, 1], atol=1e-6)
    assert int(hits.mati[0]) == 5


def test_miss_outside_edges():
    tris = _tri_xy()
    hits = intersect.first_intersect(
        _rays([0.9, 0.9, -1.0], [0.0, 0.0, 1.0]), tris
    )
    assert float(hits.t[0]) <= 0.0


def test_behind_ray_is_miss():
    tris = _tri_xy()
    hits = intersect.first_intersect(
        _rays([0.25, 0.25, 1.0], [0.0, 0.0, 1.0]), tris
    )
    assert float(hits.t[0]) <= 0.0


def test_parallel_ray_is_miss():
    tris = _tri_xy()
    hits = intersect.first_intersect(
        _rays([0.25, 0.25, -1.0], [1.0, 0.0, 0.0]), tris
    )
    assert float(hits.t[0]) <= 0.0


def test_backface_still_hits():
    # The reference test has no backface culling (normal sign only flips
    # the edge-test orientation consistently).
    tris = _tri_xy()
    hits = intersect.first_intersect(
        _rays([0.25, 0.25, 2.0], [0.0, 0.0, -1.0]), tris
    )
    assert float(hits.t[0]) == 2.0


def test_closest_of_two():
    tris = TrianglesSoA.build(
        [[0, 0, 0], [0, 0, 5]],
        [[1, 0, 0], [1, 0, 5]],
        [[0, 1, 0], [0, 1, 5]],
        [1, 2],
    )
    hits = intersect.first_intersect(
        _rays([0.2, 0.2, -1.0], [0.0, 0.0, 1.0]), tris
    )
    assert float(hits.t[0]) == 1.0
    assert int(hits.mati[0]) == 1
    # From the other side the far triangle is nearer.
    hits = intersect.first_intersect(
        _rays([0.2, 0.2, 7.0], [0.0, 0.0, -1.0]), tris
    )
    assert float(hits.t[0]) == 2.0
    assert int(hits.mati[0]) == 2


def test_matches_literal_reference_order():
    """The matmul-form edge tests must agree with the literal
    cross-product formulation (prog.cl:104-106) on random scenes."""
    rs = np.random.default_rng(3)
    T, R = 64, 128
    v = rs.normal(size=(T, 3, 3)).astype(np.float32) * 2.0
    tris = TrianglesSoA.build(v[:, 0], v[:, 1], v[:, 2],
                              np.arange(T, dtype=np.int32))
    p = rs.normal(size=(R, 3)).astype(np.float32) * 3.0
    d = rs.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t, valid = intersect.ray_tri_t(jnp.asarray(p), jnp.asarray(d), tris)
    t = np.asarray(t)
    valid = np.asarray(valid)

    # Literal reference math in numpy float64 (ground truth).
    r1, r2, r3 = v[:, 0], v[:, 1], v[:, 2]
    n = np.cross(r2 - r1, r3 - r1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    num = np.einsum("td,td->t", r1, n)[None] - p @ n.T
    den = d @ n.T
    t_ref = num / den
    pt = p[:, None, :] + d[:, None, :] * t_ref[..., None]
    e1 = np.einsum(
        "rtd,td->rt", np.cross(r2 - r1, pt - r1[None]), n
    )
    e2 = np.einsum(
        "rtd,td->rt", np.cross(r3 - r2, pt - r2[None]), n
    )
    e3 = np.einsum(
        "rtd,td->rt", np.cross(r1 - r3, pt - r3[None]), n
    )
    valid_ref = (t_ref > 0) & (e1 >= 0) & (e2 >= 0) & (e3 >= 0)

    # Tolerate disagreement only within a *relative* band of the
    # edge/plane boundaries (f32 vs f64 rounding; edge terms scale with t,
    # which explodes for near-parallel rays).
    disagree = valid != valid_ref

    def rel_near(e):
        return np.abs(e) < 1e-4 * (1.0 + np.abs(t_ref)) * 10.0

    near_edge = (
        rel_near(e1) | rel_near(e2) | rel_near(e3)
        | (np.abs(t_ref) < 1e-3)
        | ~np.isfinite(t_ref)
        | (np.abs(den) < 1e-3)
    )
    assert np.all(~disagree | near_edge)
    both = valid & valid_ref & (np.abs(den) > 1e-3)
    np.testing.assert_allclose(t[both], t_ref[both], rtol=1e-3)


def test_aabb_slab():
    p = jnp.asarray([[0.0, 0.0, -5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    lo = jnp.asarray([[-1.0, -1.0, -1.0]])
    hi = jnp.asarray([[1.0, 1.0, 1.0]])
    hit, tmin, tmax = intersect.intersect_aabb(p, d, lo, hi)
    assert bool(hit[0])
    assert float(tmin[0]) == 4.0
    assert float(tmax[0]) == 6.0
    # Miss sideways.
    p2 = jnp.asarray([[5.0, 0.0, -5.0]])
    hit, _, _ = intersect.intersect_aabb(p2, d, lo, hi)
    assert not bool(hit[0])
    # Axis-parallel ray inside the slab (division by zero -> inf): hits.
    p3 = jnp.asarray([[0.5, 0.5, -5.0]])
    hit, _, _ = intersect.intersect_aabb(p3, d, lo, hi)
    assert bool(hit[0])
