"""Pallas kernels (interpret mode on CPU) vs the XLA brute-force
reference implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.ops import intersect
from opencl_path_tracer_tpu.ops.pallas import make_pallas_intersect
from opencl_path_tracer_tpu.ops.pallas.cluster_kernel import (
    build_clusters, make_cluster_intersect,
)

pytestmark = pytest.mark.slow


def _scene(t, seed=0):
    rs = np.random.default_rng(seed)
    centers = rs.uniform(-10, 10, size=(t, 1, 3))
    v = (centers + rs.normal(size=(t, 3, 3)) * 0.6).astype(np.float32)
    return TrianglesSoA.build(
        v[:, 0], v[:, 1], v[:, 2], np.arange(t, dtype=np.int32) % 7
    )


def _rays(r, seed=1):
    rs = np.random.default_rng(seed)
    p = rs.uniform(-12, 12, size=(r, 3)).astype(np.float32)
    d = rs.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays.make(jnp.asarray(p), jnp.asarray(d))


def _assert_matches(fast, brute, rtol=1e-3):
    bt, ft = np.asarray(brute.t), np.asarray(fast.t)
    np.testing.assert_array_equal(bt > 0, ft > 0)
    hit = bt > 0
    np.testing.assert_allclose(ft[hit], bt[hit], rtol=rtol)
    same = np.asarray(brute.mati) == np.asarray(fast.mati)
    assert np.all(~hit | same | np.isclose(bt, ft, rtol=rtol))


@pytest.mark.parametrize("t,r", [(50, 100), (700, 1000), (1024, 513)])
def test_bruteforce_kernel_matches(t, r):
    tris = _scene(t, seed=t)
    rays = _rays(r, seed=r)
    fast = make_pallas_intersect(tris, interpret=True)(rays)
    brute = intersect.first_intersect(rays, tris)
    _assert_matches(fast, brute)


@pytest.mark.parametrize("t,k", [(100, 64), (900, 64), (900, 128)])
def test_cluster_kernel_matches(t, k):
    tris = _scene(t, seed=t + 1)
    rays = _rays(800, seed=3)
    fast = make_cluster_intersect(
        tris, cluster_size=k, interpret=True
    )(rays)
    brute = intersect.first_intersect(rays, tris)
    _assert_matches(fast, brute)


def test_cluster_build_structure():
    tris = _scene(500, seed=9)
    scene, c, k = build_clusters(tris, 64)
    assert c == -(-500 // 64)
    # (C, 24, K): 16 constants + mati row + pad, triangles on lanes.
    assert scene.tri_pack.shape == (c, 24, k)
    boxes = np.asarray(scene.boxes)
    # Non-pad clusters have lo <= hi on every axis.
    real = boxes[:, 0] <= boxes[:, 3]
    assert real.sum() >= 500 // 64
    # Padding rows are degenerate (n = 0 -> never hit).
    pack_n = np.asarray(
        scene.tri_pack.transpose(0, 2, 1).reshape(c * k, 24)[:, 0:3]
    )
    nonpad = (np.abs(pack_n).sum(1) > 0)
    assert nonpad.sum() == 500


def test_cluster_kernel_on_cornell():
    from opencl_path_tracer_tpu.scene import library
    scene = library.cornell_box(with_spheres=True)
    rs = np.random.default_rng(11)
    p = (rs.uniform(-12, 12, size=(600, 3)) * 40
         + np.asarray([500.0, 500.0, 100.0])).astype(np.float32)
    d = rs.normal(size=(600, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays.make(jnp.asarray(p), jnp.asarray(d))
    fast = make_cluster_intersect(scene.tris, interpret=True)(rays)
    brute = intersect.first_intersect(rays, scene.tris)
    _assert_matches(fast, brute)


def test_mxu_kernel_matches():
    from opencl_path_tracer_tpu.ops.pallas import make_mxu_intersect
    tris = _scene(300, seed=21)
    rays = _rays(500, seed=22)
    fast = make_mxu_intersect(tris, interpret=True)(rays)
    brute = intersect.first_intersect(rays, tris)
    _assert_matches(fast, brute)
