"""Flat work-list march (march v2, interpret mode): hits must equal
the fused f32 kernel over the canonical (cluster-ordered) triangle
array bit for bit — every lane, presorted or not, including under a
deliberately starved visit-list capacity (overflow lanes must fall to
the dense tail, never to a wrong answer)."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.ops.pallas import make_pallas_intersect
from opencl_path_tracer_tpu.ops.pallas.flat_march import (
    make_flat_march_intersect,
)
from tests.test_march import _rays, _scene

pytestmark = pytest.mark.slow


def _assert_bitexact(got, ref):
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


@pytest.mark.parametrize("t,n,k0", [(1500, 512, 2), (3000, 768, 4)])
def test_flat_march_bitexact_vs_dense(t, n, k0):
    tris = _scene(t)
    rays = _rays(n)
    isect, rt = make_flat_march_intersect(
        tris, cs=256, tr=256, K0=k0, tail=256, interpret=True,
    )
    ref = make_pallas_intersect(rt, interpret=True)(rays)
    _assert_bitexact(isect(rays), ref)


def test_flat_march_presorted_bitexact():
    tris = _scene(1500)
    rays = _rays(512)
    isect, rt = make_flat_march_intersect(
        tris, cs=256, tr=256, K0=2, tail=256, presorted=True,
        interpret=True,
    )
    ref = make_pallas_intersect(rt, interpret=True)(rays)
    _assert_bitexact(isect(rays), ref)


def test_flat_march_overflow_goes_to_tail():
    """Starve Vcap so real visits and flush dummies drop: every lane
    must still come back exact via the overflow/cert tail route."""
    tris = _scene(2000)
    rays = _rays(512)
    isect, rt = make_flat_march_intersect(
        tris, cs=128, tr=128, K0=1, vcap_frac=0.01, tail=128,
        interpret=True,
    )
    ref = make_pallas_intersect(rt, interpret=True)(rays)
    _assert_bitexact(isect(rays), ref)


def test_flat_march_all_miss_rays():
    tris = _scene(800, spread=10.0)
    n = 256
    p = np.full((n, 3), 500.0, np.float32)
    d = np.zeros((n, 3), np.float32)
    d[:, 1] = 1.0
    rays = Rays(
        p=tuple(jnp.asarray(p[:, k]) for k in range(3)),
        d=tuple(jnp.asarray(d[:, k]) for k in range(3)),
    )
    isect, rt = make_flat_march_intersect(
        tris, cs=256, tr=256, K0=2, tail=256, interpret=True,
    )
    got = isect(rays)
    assert (np.asarray(got.t) == -1.0).all()
