"""Distance-aware emitter selection (ops/nee.py select='distance') —
the many-light mode, beyond the reference's scope (the reference
samples no lights at all; paths stumble into the lamp,
prog.cl:367-376).

Correctness contract tested here:
  * the per-lane selection histogram matches the weight function,
  * the gather estimator's MEAN equals power-proportional selection
    (same integral, different importance) while its variance is lower
    on the many-light scene,
  * gather and pickup compute the SAME per-lane pdf for the same
    geometry (MIS balance weights stay a partition of unity),
  * build-time validation: emissive triangles are refused.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.ops import nee as nee_mod
from opencl_path_tracer_tpu.scene import library

pytestmark = pytest.mark.slow


def _table(select, count=12):
    sc = library.many_light_scene(count)
    return sc, nee_mod.build_emitter_table(
        sc.tris, sc.mats, sc.spheres, select=select)


def test_distance_select_histogram_matches_weights():
    sc, table = _table("distance", count=9)
    origin = tuple(jnp.full((40_000,), v, jnp.float32)
                   for v in (500.0, 30.0, 200.0))
    u1 = jax.random.uniform(jax.random.key(0), (40_000,))
    idx, sel = nee_mod._distance_select(table, origin, u1)
    idx = np.asarray(idx)
    # Host-side expected weights at that point.
    c = np.stack([np.asarray(x) for x in table.s_c], -1)
    rad = np.asarray(table.s_rad)
    p = np.asarray(table.s_sel)
    d2 = ((c - np.array([500.0, 30.0, 200.0])) ** 2).sum(-1)
    w = p / np.maximum(d2, rad * rad)
    w /= w.sum()
    freq = np.bincount(idx, minlength=w.size) / idx.size
    np.testing.assert_allclose(freq, w, atol=0.01)
    # The per-lane reported selection probability is the weight.
    np.testing.assert_allclose(np.asarray(sel), w[idx], rtol=1e-5)


def test_distance_select_same_mean_lower_variance():
    """Equal expectation (unbiasedness), lower variance on the
    many-light scene — the reason the mode exists."""
    from opencl_path_tracer_tpu.ops import intersect

    sc, t_pow = _table("power", count=12)
    _, t_dst = _table("distance", count=12)
    n = 60_000
    # A diffuse vertex on the floor, normal up.
    hit_p = tuple(jnp.full((n,), v, jnp.float32)
                  for v in (420.0, 0.0, 300.0))
    n_vec = (jnp.zeros((n,)), jnp.ones((n,)), jnp.zeros((n,)))
    mat = sc.mats.take_select(jnp.full((n,), 2, jnp.int32))  # white
    ones = tuple(jnp.ones((n,), jnp.float32) for _ in range(3))
    import functools
    tri_fn = functools.partial(intersect.first_intersect,
                               tris=sc.tris)

    def isect(rays):
        return intersect.merge_hits(
            tri_fn(rays), intersect.sphere_intersect(rays, sc.spheres))

    u = jax.random.uniform(jax.random.key(3), (3, n))

    def run(table):
        contrib = nee_mod.direct_light(
            table, intersect_fn=isect, cam_eye=(500.0, 500.0, -1299.0),
            hit_p=hit_p, n_vec=n_vec, mat=mat,
            f_l=ones, f_b=ones, f_s=ones, f_r=ones,
            is_diff=jnp.ones((n,), bool), u1=u[0], u2=u[1], u3=u[2],
        )
        lum = np.asarray(0.2126 * contrib[0] + 0.7152 * contrib[1]
                         + 0.0722 * contrib[2], np.float64)
        return lum.mean(), lum.var()

    m_pow, v_pow = run(t_pow)
    m_dst, v_dst = run(t_dst)
    # Same integral: means agree within MC noise (~4 sigma).
    sem = np.sqrt(v_pow / n + v_dst / n)
    assert abs(m_pow - m_dst) < 4.0 * sem + 1e-9
    # The win: distance weighting cuts the estimator variance.
    assert v_dst < 0.7 * v_pow


def test_pickup_pdf_matches_gather_pdf():
    """MIS partition of unity: the pickup side must reconstruct the
    gather's per-lane area pdf exactly (same weight function, same
    vertex) — extracted from the balance weight by algebra."""
    sc, table = _table("distance", count=8)
    n = 4096
    origin = tuple(jnp.full((n,), v, jnp.float32)
                   for v in (300.0, 50.0, 100.0))
    u = jax.random.uniform(jax.random.key(7), (3, n))
    y, m, emission, p_area = nee_mod.sample_emitters(
        table, u[0], u[1], u[2], origin=origin)
    delta = tuple(y[k] - origin[k] for k in range(3))
    t = jnp.sqrt(sum(d * d for d in delta))
    d = tuple(dk / jnp.maximum(t, 1e-12) for dk in delta)
    emit_cos = jnp.abs(sum(d[k] * m[k] for k in range(3)))
    # Which sphere was hit: nearest-surface match, same as pickup.
    c = np.stack([np.asarray(x) for x in table.s_c], -1)
    rad = np.asarray(table.s_rad)
    yh = np.stack([np.asarray(v) for v in y], -1)
    score = np.abs(((yh[:, None, :] - c[None, :, :]) ** 2).sum(-1)
                   - (rad * rad)[None, :])
    j = score.argmin(1)
    mati = jnp.asarray(np.asarray(table.s_mati)[j])
    prev_pdf = jnp.full((n,), 0.3, jnp.float32)
    w = nee_mod.pickup_mis_weight(
        table, prev_pdf, emit_cos, t, emission,
        mati=mati, hit_p=y, ray_p=origin)
    p_bsdf = prev_pdf * emit_cos / jnp.maximum(t * t, 1e-12)
    # w = p_bsdf / (p_bsdf + p_pickup)  =>  p_pickup = p_bsdf (1-w)/w
    wn = np.asarray(w, np.float64)
    pb = np.asarray(p_bsdf, np.float64)
    ok = (wn > 1e-6) & (wn < 1.0 - 1e-6)
    p_pickup = pb[ok] * (1.0 - wn[ok]) / wn[ok]
    # atol floor: silhouette lanes have p_area -> 0 (the cone pdf's
    # ecos factor) where f32 rounding dominates the ratio.
    np.testing.assert_allclose(
        p_pickup, np.asarray(p_area, np.float64)[ok], rtol=2e-4,
        atol=1e-9)
    assert ok.mean() > 0.9


def test_distance_refuses_triangle_emitters():
    sc = library.cornell_box(with_spheres=True, analytic_spheres=True)
    with pytest.raises(ValueError, match="SPHERE emitters only"):
        nee_mod.build_emitter_table(sc.tris, sc.mats, sc.spheres,
                                    select="distance")
    with pytest.raises(ValueError, match="unknown emitter select"):
        nee_mod.build_emitter_table(sc.tris, sc.mats, sc.spheres,
                                    select="nearest")


@pytest.mark.parametrize("model", ["wavefront", "megakernel"])
def test_engine_many_lights_distance_render(model, tmp_path):
    """End-to-end: the many-light scene renders finite, lit images
    through both models with nee_select='distance'."""
    from opencl_path_tracer_tpu.config import CameraConfig, RenderConfig
    from opencl_path_tracer_tpu.runtime.engine import RenderEngine

    sc = library.many_light_scene(10)
    cfg = RenderConfig(
        width=24, height=16, iterations=3, mode="fast", model=model,
        nee=True, nee_select="distance", spp=4,
        camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                            shift=(0.0, 0.0, 0.0)),
    )
    eng = RenderEngine(sc, cfg)
    eng.render(4, progress=False)
    img = eng.image(apply_tonemap=False)
    assert np.isfinite(img).all()
    assert img.max() > 0.0
