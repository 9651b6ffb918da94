"""Block-march intersector (interpret mode): hits must equal the fused
f32 kernel over the canonical (cluster-ordered) triangle array bit for
bit — every lane, no pending escape hatch (the march's in-visit exact
refine + dense tail make it unconditional)."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.ops.pallas import make_pallas_intersect
from opencl_path_tracer_tpu.ops.pallas.march_kernel import (
    make_march_intersect,
)

pytestmark = pytest.mark.slow


def _scene(t, seed=0, spread=40.0):
    rs = np.random.default_rng(seed)
    centers = rs.uniform(-spread, spread, size=(t, 1, 3))
    v = (centers + rs.normal(size=(t, 3, 3)) * 1.2).astype(np.float32)
    return TrianglesSoA.build(
        v[:, 0], v[:, 1], v[:, 2], np.arange(t, dtype=np.int32) % 7
    )


def _rays(n, seed=1, spread=45.0):
    rs = np.random.default_rng(seed)
    p = rs.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Rays(
        p=tuple(jnp.asarray(p[:, k]) for k in range(3)),
        d=tuple(jnp.asarray(d[:, k]) for k in range(3)),
    )


@pytest.mark.parametrize("t,n,k1", [(1500, 512, 3), (3000, 768, 6)])
def test_march_bitexact_vs_dense(t, n, k1):
    tris = _scene(t)
    rays = _rays(n)
    isect, rt = make_march_intersect(
        tris, cs=256, tr=256, K1=k1, K2=12, tail=256, interpret=True,
    )
    ref = make_pallas_intersect(rt, interpret=True)(rays)
    got = isect(rays)

    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(
        np.asarray(got.mati), np.asarray(ref.mati)
    )
    hit = np.asarray(ref.t) > 0
    assert hit.any()
    for k in range(3):
        np.testing.assert_array_equal(
            np.asarray(got.n[k])[hit], np.asarray(ref.n[k])[hit]
        )
        np.testing.assert_array_equal(
            np.asarray(got.p[k])[hit], np.asarray(ref.p[k])[hit]
        )


def test_march_all_miss_rays():
    tris = _scene(800, spread=10.0)
    n = 256
    p = np.full((n, 3), 500.0, np.float32)
    d = np.zeros((n, 3), np.float32)
    d[:, 1] = 1.0
    rays = Rays(
        p=tuple(jnp.asarray(p[:, k]) for k in range(3)),
        d=tuple(jnp.asarray(d[:, k]) for k in range(3)),
    )
    isect, rt = make_march_intersect(
        tris, cs=256, tr=256, K1=2, K2=4, tail=256, interpret=True,
    )
    got = isect(rays)
    assert (np.asarray(got.t) == -1.0).all()
