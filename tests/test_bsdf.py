"""BSDF sampling properties and hand-checked values (prog.cl:186-245).
BSDF functions operate on V3 tuples of (N,) component arrays."""

import numpy as np
import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.types import v3_from_array, v3_stack
from opencl_path_tracer_tpu.ops import bsdf


def _v3(a):
    return v3_from_array(jnp.asarray(a, jnp.float32))


def _np(v):
    return np.asarray(v3_stack(v))


def test_orthonormal_base_general():
    rs = np.random.default_rng(1)
    v = rs.normal(size=(256, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v2, v3_ = bsdf.orthonormal_base(_v3(v))
    v2, v3_ = _np(v2), _np(v3_)
    assert np.max(np.abs(np.sum(v * v2, -1))) < 1e-5
    assert np.max(np.abs(np.sum(v * v3_, -1))) < 1e-5
    assert np.max(np.abs(np.sum(v2 * v3_, -1))) < 1e-5
    assert np.max(np.abs(np.linalg.norm(v2, axis=-1) - 1)) < 1e-5


def test_orthonormal_base_y_axis_branch():
    v2, v3_ = bsdf.orthonormal_base(_v3([[0.0, 1.0, 0.0]]))
    np.testing.assert_allclose(_np(v2), [[0, 0, 1]], atol=1e-6)
    np.testing.assert_allclose(_np(v3_), [[1, 0, 0]], atol=1e-6)


def test_diffuse_ray_hemisphere_and_cosine_weight():
    n = _v3(np.broadcast_to([0.0, 0.0, 1.0], (4096, 3)))
    p = _v3(np.zeros((4096, 3)))
    key = jax.random.key(0)
    r = jax.random.uniform(key, (4096, 2))
    o, d = bsdf.diffuse_ray(p, n, r[:, 0], r[:, 1])
    d = _np(d)
    # All in the upper hemisphere.
    assert np.all(d[:, 2] > 0)
    # Origin offset along the normal by 1e-3 (prog.cl:217).
    np.testing.assert_allclose(_np(o)[:, 2], 1e-3, rtol=1e-4)
    # Cosine-weighted: E[cos theta] = 2/3.
    assert abs(d[:, 2].mean() - 2 / 3) < 0.02
    # z = sqrt(1-rnd1) exactly (prog.cl:215).
    np.testing.assert_allclose(
        d[:, 2], np.sqrt(1 - np.asarray(r[:, 0])), rtol=1e-4
    )


def test_fresnel_schlick():
    f0 = _v3([[0.5, 0.5, 0.5]])
    n = _v3([[0.0, 0.0, 1.0]])
    # Normal incidence: F = F0.
    f = bsdf.fresnel(f0, n, _v3([[0.0, 0.0, -1.0]]))
    np.testing.assert_allclose(_np(f), [[0.5] * 3], atol=1e-6)
    # Grazing: F -> 1.
    f = bsdf.fresnel(f0, n, _v3([[1.0, 0.0, -1e-4]]))
    assert np.all(_np(f) > 0.99)


def test_specular_reflect():
    n = _v3([[0.0, 0.0, 1.0]])
    p = _v3(np.zeros((1, 3)))
    d = _v3(np.asarray([[1.0, 0.0, -1.0]]) / np.sqrt(2))
    o, nd = bsdf.specular_ray(p, n, d)
    np.testing.assert_allclose(
        _np(nd), np.asarray([[1.0, 0.0, 1.0]]) / np.sqrt(2), atol=1e-6
    )
    np.testing.assert_allclose(_np(o), [[0, 0, 1e-3]], atol=1e-7)


def test_refractive_snell_straight_through():
    # Normal incidence, rnd forces refraction (rnd > prob).
    n = _v3([[0.0, 0.0, 1.0]])
    p = _v3(np.zeros((1, 3)))
    d = _v3([[0.0, 0.0, -1.0]])
    f0 = _v3([[0.04, 0.04, 0.04]])
    o, nd, inside, fac = bsdf.refractive_ray(
        p, n, d, jnp.asarray([1.5]), f0, jnp.asarray([False]),
        jnp.asarray([0.99]),
    )
    np.testing.assert_allclose(_np(nd), [[0, 0, -1]], atol=1e-6)
    assert bool(inside[0])
    # factor = (1-F)/(1-prob) with F = prob = 0.04 -> 1.
    np.testing.assert_allclose(_np(fac), [[1.0] * 3], rtol=1e-5)
    # Origin pushed through the surface (prog.cl:239).
    np.testing.assert_allclose(_np(o), [[0, 0, -1e-3]], atol=1e-7)


def test_refractive_snell_angle():
    # 45 degrees into n=1.5 glass: sin(theta_t) = sin(45)/1.5.
    n = _v3([[0.0, 0.0, 1.0]])
    p = _v3(np.zeros((1, 3)))
    d = _v3(np.asarray([[1.0, 0.0, -1.0]]) / np.sqrt(2))
    f0 = _v3([[0.04, 0.04, 0.04]])
    o, nd, inside, fac = bsdf.refractive_ray(
        p, n, d, jnp.asarray([1.5]), f0, jnp.asarray([False]),
        jnp.asarray([0.999]),
    )
    ndv = _np(nd)[0]
    sin_t = np.linalg.norm(np.cross(ndv, [0, 0, 1.0]))
    np.testing.assert_allclose(sin_t, np.sin(np.pi / 4) / 1.5, rtol=1e-5)


def test_refractive_tir_reflects():
    # Total internal reflection: inside glass at grazing angle -> disc<0
    # -> mirror reflection, inside unchanged, factor = F/prob.
    n = _v3([[0.0, 0.0, 1.0]])
    p = _v3(np.zeros((1, 3)))
    d_in = _v3([[0.9, 0.0, -np.sqrt(1 - 0.81)]])
    f0 = _v3([[0.04, 0.04, 0.04]])
    o, nd, inside, fac = bsdf.refractive_ray(
        p, n, d_in, jnp.asarray([1.5]), f0, jnp.asarray([True]),
        jnp.asarray([0.999]),
    )
    assert bool(inside[0])  # unchanged
    np.testing.assert_allclose(
        _np(nd)[0, 2], np.sqrt(1 - 0.81), rtol=1e-5
    )


def test_refractive_roulette_reflects_on_low_rnd():
    n = _v3([[0.0, 0.0, 1.0]])
    p = _v3(np.zeros((1, 3)))
    d = _v3([[0.0, 0.0, -1.0]])
    f0 = _v3([[0.5, 0.5, 0.5]])
    o, nd, inside, fac = bsdf.refractive_ray(
        p, n, d, jnp.asarray([1.5]), f0, jnp.asarray([False]),
        jnp.asarray([0.1]),  # rnd < prob=0.5 -> reflect
    )
    assert not bool(inside[0])
    np.testing.assert_allclose(_np(nd), [[0, 0, 1]], atol=1e-6)
    # factor = F/prob = 0.5/0.5 = 1.
    np.testing.assert_allclose(_np(fac), [[1.0] * 3], rtol=1e-5)
