"""BVH builders + traversal: must agree with brute-force intersection
(the reference's correctness property — kd_intersect vs the commented-out
first_intersect full scan, prog.cl:318-319)."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.accel import (
    build_lbvh, build_median_tree, make_bvh_intersect,
)
from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.ops import intersect
from opencl_path_tracer_tpu.scene import library


def _random_tris(t, seed=0, spread=10.0):
    rs = np.random.default_rng(seed)
    centers = rs.uniform(-spread, spread, size=(t, 1, 3))
    verts = centers + rs.normal(size=(t, 3, 3)) * 0.6
    v = verts.astype(np.float32)
    return TrianglesSoA.build(
        v[:, 0], v[:, 1], v[:, 2], np.arange(t, dtype=np.int32) % 7
    )


def _random_rays(r, seed=1, spread=14.0):
    rs = np.random.default_rng(seed)
    p = rs.uniform(-spread, spread, size=(r, 3)).astype(np.float32)
    d = rs.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays.make(jnp.asarray(p), jnp.asarray(d))


def _check_matches_bruteforce(bvh, tris, rays, rtol=1e-4):
    brute = intersect.first_intersect(rays, tris)
    fast = make_bvh_intersect(bvh)(rays)
    bt = np.asarray(brute.t)
    ft = np.asarray(fast.t)
    hit_b = bt > 0
    hit_f = ft > 0
    # Same hit/miss classification everywhere.
    np.testing.assert_array_equal(hit_b, hit_f)
    # Same distances (modulo f32 roundoff; ties may pick either triangle).
    np.testing.assert_allclose(ft[hit_f], bt[hit_b], rtol=rtol)
    same_mat = np.asarray(brute.mati) == np.asarray(fast.mati)
    close_t = np.isclose(bt, ft, rtol=rtol)
    assert np.all(~hit_b | same_mat | close_t)


def test_median_tree_matches_bruteforce():
    tris = _random_tris(300)
    bvh = build_median_tree(tris, leaf_size=4)
    _check_matches_bruteforce(bvh, tris, _random_rays(500))


def test_midpoint_mean_split_matches_bruteforce():
    tris = _random_tris(200, seed=5)
    bvh = build_median_tree(tris, split="midpoint_mean")
    assert bvh.leaf_size == 6
    _check_matches_bruteforce(bvh, tris, _random_rays(300, seed=6))


def test_lbvh_matches_bruteforce():
    tris = _random_tris(777, seed=2)
    bvh = build_lbvh(tris, leaf_size=4)
    _check_matches_bruteforce(bvh, tris, _random_rays(500, seed=3))


@pytest.mark.slow
def test_lbvh_on_cornell():
    scene = library.cornell_box(with_spheres=True)
    bvh = build_lbvh(scene.tris)
    rs = np.random.default_rng(7)
    p = (rs.uniform(-450, 450, size=(400, 3))
         + np.asarray([500.0, 500.0, 0.0])).astype(np.float32)
    d = rs.normal(size=(400, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays.make(jnp.asarray(p), jnp.asarray(d))
    _check_matches_bruteforce(bvh, scene.tris, rays)


@pytest.mark.slow
def test_lbvh_tiny_scene():
    tris = _random_tris(3, seed=9)
    bvh = build_lbvh(tris, leaf_size=4)
    assert bvh.depth == 0  # single leaf, root == leaf
    _check_matches_bruteforce(bvh, tris, _random_rays(100, seed=10))


@pytest.mark.slow
def test_median_tree_single_triangle():
    tris = _random_tris(1, seed=11)
    bvh = build_median_tree(tris)
    _check_matches_bruteforce(bvh, tris, _random_rays(64, seed=12))


@pytest.mark.slow
def test_lbvh_shapes_and_format():
    tris = _random_tris(100, seed=13)
    bvh = build_lbvh(tris, leaf_size=4)
    n = np.asarray(bvh.nodes)
    num_leaves = 1 << bvh.depth
    assert n.shape == (2 * num_leaves - 1, 8)
    # Internal nodes: a < 0 and child slots in range.
    internal = n[: num_leaves - 1]
    assert np.all(internal[:, 6] < 0)
    left = -internal[:, 6]
    assert np.all(left < n.shape[0])
    # Leaves: a >= 0, multiples of leaf_size.
    leaves = n[num_leaves - 1:]
    assert np.all(leaves[:, 6] >= 0)
    assert np.all(np.asarray(leaves[:, 6]) % 4 == 0)
    # Parent boxes contain child boxes.
    for s in range(num_leaves - 1):
        l = int(-n[s, 6])
        for c in (l, l + 1):
            assert np.all(n[s, 0:3] <= n[c, 0:3] + 1e-5)
            assert np.all(n[s, 3:6] >= n[c, 3:6] - 1e-5)


@pytest.mark.slow
def test_degenerate_identical_midpoints():
    # 20 coincident triangles: reference builder would loop forever
    # (main.cpp:246-257); ours must terminate and still intersect.
    v = np.tile(
        np.asarray(
            [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32
        ),
        (20, 1, 1),
    )
    tris = TrianglesSoA.build(
        v[:, 0], v[:, 1], v[:, 2], np.zeros(20, np.int32)
    )
    for builder in (
        lambda: build_median_tree(tris, split="midpoint_mean"),
        lambda: build_median_tree(tris),
        lambda: build_lbvh(tris),
    ):
        bvh = builder()
        rays = Rays.make(
            jnp.asarray([[0.2, 0.2, -1.0]], jnp.float32),
            jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
        )
        hits = make_bvh_intersect(bvh)(rays)
        assert float(hits.t[0]) > 0


@pytest.mark.slow
def test_per_object_forest_matches_bruteforce():
    """object_ranges builds one subtree per object (the reference's
    per-shape trees + shift table, main.cpp:536-551) — identical hits."""
    tris = _random_tris(240, seed=9)
    ranges = np.asarray([[0, 50], [50, 51], [51, 180], [180, 240]])
    bvh = build_median_tree(
        tris, split="midpoint_mean", object_ranges=ranges
    )
    _check_matches_bruteforce(bvh, tris, _random_rays(400, seed=10))


@pytest.mark.slow
def test_per_object_forest_on_scene_ranges():
    scene = library.cornell_box(with_spheres=True)
    assert scene.num_objects >= 2  # walls + spheres closed separately
    bvh = build_median_tree(
        scene.tris, split="midpoint_mean",
        object_ranges=scene.object_ranges,
    )
    _check_matches_bruteforce(
        bvh, scene.tris, _random_rays(300, seed=11, spread=500.0)
    )
