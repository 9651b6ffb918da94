"""Next-event estimation (explicit light sampling) — a framework
EXTENSION with no reference counterpart.

The reference is a pure path tracer: light reaches a pixel only when a
bounce ray happens to hit an emitter (prog.cl:358-366), so a small lamp
(cornell's is ~2% of the ceiling) makes most diffuse samples worthless.
NEE gathers direct light explicitly at every diffuse vertex by sampling
a point on an emitter and tracing one shadow ray, and MIS-weights the
NEXT bounce's emitter pickup so the term is shared, not
double-counted. The estimator is constructed to converge to the SAME image as
the base tracer (tests/test_nee.py proves estimator equality):

The base estimator's expected direct-light term at a diffuse vertex x
with flipped normal n and pre-bounce throughput (f_l, f_b, f_s, f_r)
is, over cosine-sampled continuation directions d ~ p(d) = cos(theta)/pi
(bsdf.diffuse_ray, prog.cl:205-218), collected iff the FIRST hit along d
is an emitter (prog.cl:358-366 pickup with the camera-halfway Blinn term
of prog.cl:330-338):

    E = Int p(d) * (f_l kd cos + f_b ks blinn(d)) f_s f_r
              * emission * ecos(d) * V(d) dd

Changing variables to emitter area (dd = ecos / r^2 dA) and sampling y
with area density p_area(y) (power-proportional: p_area = lum_i /
total_power, which is 1/A_total when every emitter has the same
luminance) gives the equal-expectation per-sample NEE term used here:

    c = (1 / p_area(y)) * (cos_l / pi)
        * (f_l kd cos_l + f_b ks blinn(d_l))
        * f_s * f_r * emission_y * ecos_l^2 / r^2 * V

with d_l the unit direction x->y, cos_l = max(0, d_l . n),
ecos_l = |d_l . m_y| (the reference flips the emitter normal toward the
ray, prog.cl:326-328, so its emit_cos is the absolute cosine), and V the
visibility test "y is the first hit along d_l" (nearest-hit distance
>= r within tolerance — which also correctly rejects emitter back-faces
occluded by their own front, keeping the area<->direction map 1:1).

Both strategies that can find the lamp — the explicit area sample and
the BSDF's cosine-sampled continuation ray — are combined with
MULTIPLE IMPORTANCE SAMPLING (balance heuristic, Veach 95): the gather
is weighted by p_area/(p_area + p_cos->area) and the next bounce's
emitter pickup by the complement (computed from the PREVIOUS bounce's
direction pdf, carried per lane as `prev_pdf`; models/*.py own that
bookkeeping). The weighted terms still sum to the base estimator's
expectation, and each strategy dominates exactly where its pdf is
sharpest (area sampling for small/far lamps, BSDF sampling for
large/near ones — cornell's lamp is large, so pure suppression
measurably underperforms MIS there). prev_pdf == 0 means "previous
bounce was not diffuse": the pickup keeps full weight, matching the
reference for specular chains and emitter-continuations.

This module owns the emitter table, the gather, and the two MIS
weights, for BOTH emitter kinds:

* **Triangle emitters**: area sampling (sqrt-warped barycentrics),
  densities in area measure as derived above.
* **Analytic-sphere emitters** (core/spheres.py): solid-angle CONE
  sampling — from a shading point x outside the sphere, directions
  are drawn uniformly inside the cone subtended by the sphere
  (cos_theta_max = sqrt(1 - R^2/|c-x|^2)), pdf_sa = sel_i /
  (2 pi (1 - cos_theta_max)); from INSIDE an emissive sphere the cone
  degenerates to the full 4 pi sphere of directions (cos_theta_max =
  -1). The sample point y is the forward ray-sphere hit, and the
  sampler reports the EQUIVALENT area density p_area = pdf_sa *
  ecos / r^2 (the direction->area Jacobian), so the gather formula
  and both MIS weights are measure-uniform across emitter kinds.
  Selection is power-proportional with sphere power = 4 pi R^2 * lum
  (its full surface area — only relative weights matter for
  correctness). The pickup side recovers the sphere's cone pdf from
  the hit: emissive spheres must not SHARE a material id with
  emissive triangles (build_emitter_table raises), so hit.mati
  identifies the kind exactly and |hit - c_j| disambiguates spheres
  sharing one material.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.materials import MaterialsSoA
from opencl_path_tracer_tpu.core.types import (
    Rays, V3, vadd, vdot, vmul, vnormalize, vscale, vsub, vwhere,
)
from opencl_path_tracer_tpu.ops import bsdf

_INV_PI = np.float32(1.0 / np.pi)
_LUM = (0.2126, 0.7152, 0.0722)  # Reinhard's weights (prog.cl:249)


def _register(cls, meta_fields=()):
    fields = [f.name for f in dataclasses.fields(cls)
              if f.name not in meta_fields]
    jax.tree_util.register_dataclass(
        cls, data_fields=fields, meta_fields=list(meta_fields)
    )
    return cls


@functools.partial(_register, meta_fields=("select",))
@dataclasses.dataclass(frozen=True)
class EmitterTable:
    """SoA of the scene's emissive triangles (E entries, E small).

    v0/e1/e2: V3 of (E,) — first vertex and the two edges.
    m: V3 of (E,) unit geometric normals.
    emission: V3 of (E,) per-emitter radiance (material emission).
    cum: (E,) float32 inclusive cumulative POWER fractions
        (power = area x emission luminance; cum[-1] = 1) — sampling is
        power-proportional, so a dim skylight panel doesn't starve a
        bright bulb of samples. Uniform-emission scenes degenerate to
        area-proportional exactly.
    p_area: (E,) float32 per-emitter area DENSITY of that sampling
        (lum_i / total_power) — the pdf at any point of emitter i.
    total_area: (,) float32 summed emitter area.
    power_lum: (,) float32 total power (sum area_i * lum_i), the
        pickup side's pdf normalizer (pickup_mis_weight).
    """

    v0: V3
    e1: V3
    e2: V3
    m: V3
    emission: V3
    cum: jnp.ndarray
    p_area: jnp.ndarray
    total_area: jnp.ndarray
    power_lum: jnp.ndarray
    # (E, 16) row-packed copy of [v0, e1, e2, m, emission, p_area]:
    # the per-lane fetch is ONE row gather instead of 16 column
    # gathers — the same trick that took the smooth-shading attribute
    # fetch 173.4 -> 37.3 ms (docs/BENCHMARKS.md); TPU gathers cost
    # ~10 ms per 2M-element fetch regardless of the table's size.
    packed: jnp.ndarray
    # --- analytic-sphere emitters (Es entries, may be 0) ---
    # s_c/s_rad/s_emission: center, radius, radiance per sphere.
    # s_sel: (Es,) selection probability (power fraction of total).
    # s_mati: (Es,) int32 material index — the pickup side's exact
    #   kind discriminator (emissive mats are kind-unique by build
    #   check).
    # s_packed: (Es, 8) row pack of [c, rad, emission, sel].
    s_c: V3
    s_rad: jnp.ndarray
    s_emission: V3
    s_sel: jnp.ndarray
    s_mati: jnp.ndarray
    s_packed: jnp.ndarray
    # Selection strategy (STATIC pytree metadata — a mode change
    # retraces, exactly like an accel swap):
    #   'power'    — global power-proportional CDF (the default; the
    #                strategy every term above describes).
    #   'distance' — per-lane weights w_j = P_j / max(d^2, r_j^2)
    #                from the shading point: nearby lights get the
    #                samples (the MANY-LIGHT mode; sphere emitters
    #                only — their pickup identity is exact, see
    #                build_emitter_table).
    select: str = "power"

    @property
    def count(self) -> int:
        """Total emitter count (triangles + spheres; cum's length)."""
        return int(self.cum.shape[0])

    @property
    def tri_count(self) -> int:
        return int(self.p_area.shape[0])

    @property
    def sphere_count(self) -> int:
        return int(self.s_rad.shape[0])


def build_emitter_table(tris, mats: MaterialsSoA,
                        spheres=None,
                        select: str = "power") -> EmitterTable:
    """Collect the emissive triangles AND analytic spheres (host-side,
    once per scene).

    Raises if the scene has no emitter at all, or if an emissive
    material id is used by BOTH a triangle and an analytic sphere —
    the pickup MIS weight identifies the emitter KIND by hit.mati
    (exact, unlike any position-epsilon test), so emissive materials
    must be kind-unique. Non-emissive materials may be shared freely.

    select='distance' switches the emitter SELECTION to per-lane
    distance-aware weights w_j = P_j / max(|x - c_j|^2, r_j^2) — the
    MANY-LIGHT mode (beyond the reference's scope entirely; the
    reference has no light sampling at all, prog.cl:292-381). With
    hundreds of lamps, power-proportional selection wastes almost
    every shadow ray on far-away lights; distance weighting puts them
    where the contribution is. Restricted to analytic-SPHERE emitters
    (no emissive triangles): the pickup MIS side must recompute the
    gather's selection probability for the emitter actually hit, and
    only spheres carry an exact per-lane identity there
    (pickup_mis_weight's nearest-surface match). Both strategies
    converge to the same image — MIS weights stay a partition of
    unity because gather and pickup evaluate the SAME weight function
    from the same vertex (to the one EPS-offset approximation the
    sphere cone pdf already makes)."""
    if select not in ("power", "distance"):
        raise ValueError(f"unknown emitter select mode {select!r}")
    mati = np.asarray(tris.mati)
    em = np.stack([np.asarray(c)[mati] for c in mats.emission], axis=-1)
    is_em = np.any(em != 0.0, axis=-1)
    r1 = np.asarray(tris.r1)[is_em]
    r2 = np.asarray(tris.r2)[is_em]
    r3 = np.asarray(tris.r3)[is_em]
    e1 = r2 - r1
    e2 = r3 - r1
    cr = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(cr, axis=-1)
    keep = area > 0.0  # degenerate OBJ faces are never-hit (n=0)
    r1, e1, e2, cr, area = (a[keep] for a in (r1, e1, e2, cr, area))
    em = em[is_em][keep]
    tri_mati_em = mati[is_em][keep]
    m = cr / np.maximum(np.linalg.norm(cr, axis=-1, keepdims=True),
                        1e-30)
    total = float(area.sum())
    lum = em @ np.asarray(_LUM, np.float32)
    power = area * lum

    # Emissive analytic spheres: power = full surface area x luminance.
    if spheres is not None and spheres.count:
        s_mati = np.asarray(spheres.mati)
        s_em_all = np.stack(
            [np.asarray(c)[s_mati] for c in mats.emission], axis=-1
        )
        s_is_em = np.any(s_em_all != 0.0, axis=-1)
        s_c = np.stack([np.asarray(c) for c in spheres.c],
                       axis=-1)[s_is_em]
        s_rad = np.asarray(spheres.rad)[s_is_em]
        s_em = s_em_all[s_is_em]
        s_mati = s_mati[s_is_em]
        shared = np.intersect1d(np.unique(tri_mati_em),
                                np.unique(s_mati))
        if shared.size:
            raise ValueError(
                "NEE pickup identifies the emitter kind by material "
                f"id, but material(s) {shared.tolist()} are emissive "
                "on both a triangle and an analytic sphere — give the "
                "sphere emitters their own material"
            )
    else:
        s_c = np.zeros((0, 3), np.float32)
        s_rad = np.zeros((0,), np.float32)
        s_em = np.zeros((0, 3), np.float32)
        s_mati = np.zeros((0,), np.int32)
    s_lum = s_em @ np.asarray(_LUM, np.float32)
    s_power = 4.0 * np.pi * s_rad * s_rad * s_lum

    if power.size + s_power.size == 0 or not (
            float(power.sum()) + float(s_power.sum()) > 0.0):
        raise ValueError(
            "NEE needs at least one emitter (emissive triangle or "
            "analytic sphere)"
        )
    if select == "distance" and power.size:
        raise ValueError(
            "select='distance' needs analytic-SPHERE emitters only "
            f"(found {power.size} emissive triangles): the pickup "
            "MIS side can only identify sphere emitters exactly. "
            "Model the lamps as add_analytic_sphere(..) or use "
            "select='power'."
        )
    w_total = float(power.sum()) + float(s_power.sum())
    cum = np.cumsum(
        np.concatenate([power, s_power]) / w_total
    ).astype(np.float32)
    cum[-1] = 1.0
    p_area = (lum / w_total).astype(np.float32)
    s_sel = (s_power / w_total).astype(np.float32)

    def _v3(a):
        return tuple(jnp.asarray(a[:, k], jnp.float32) for k in range(3))

    packed = np.concatenate(
        [r1, e1, e2, m, em, p_area[:, None]], axis=-1
    ).astype(np.float32)
    s_packed = np.concatenate(
        [s_c, s_rad[:, None], s_em, s_sel[:, None]], axis=-1
    ).astype(np.float32)

    return EmitterTable(
        v0=_v3(r1), e1=_v3(e1), e2=_v3(e2), m=_v3(m),
        emission=_v3(em),
        cum=jnp.asarray(cum),
        p_area=jnp.asarray(p_area),
        total_area=jnp.float32(total),
        power_lum=jnp.float32(w_total),
        packed=jnp.asarray(packed),
        s_c=_v3(s_c),
        s_rad=jnp.asarray(s_rad),
        s_emission=_v3(s_em),
        s_sel=jnp.asarray(s_sel),
        s_mati=jnp.asarray(s_mati, dtype=jnp.int32),
        s_packed=jnp.asarray(s_packed),
        select=select,
    )


def _fetch_rows(packed, idx, ncols: int):
    """Per-lane row fetch from a small host table, following the
    materials take_select size rule: <= 64 rows are where-chains of
    scalar rows (~free — a real gather on cornell's 2-emitter table
    measured 41 -> 11 spp/s on the rrnee bench leg); larger tables
    are ONE row gather (16 column gathers cost ~10 ms EACH per 2M
    lanes on v5e; the row-pack gather ~20 ms total)."""
    e = int(packed.shape[0])
    if e <= 64:
        cols = []
        for c in range(ncols):
            out = jnp.full(idx.shape, packed[0, c])
            for j in range(1, e):
                out = jnp.where(idx == j, packed[j, c], out)
            cols.append(out)
        return cols
    row = jnp.take(packed, idx, axis=0)  # (N, ncols)
    return [row[:, c] for c in range(ncols)]


def _sample_tri(table: EmitterTable, idx, u2, u3):
    """Point on emissive triangle idx: sqrt-warped barycentrics.
    Returns (y, m, emission, p_area) per-lane."""
    cols = _fetch_rows(table.packed, idx, 16)

    def col3(base):
        return (cols[base], cols[base + 1], cols[base + 2])

    s = jnp.sqrt(u2)
    b1 = s * (1.0 - u3)
    b2 = s * u3
    v0, e1, e2 = col3(0), col3(3), col3(6)
    y = vadd(v0, vadd(vscale(e1, b1), vscale(e2, b2)))
    return y, col3(9), col3(12), cols[15]


def _distance_select(table: EmitterTable, origin: V3, u1):
    """Per-lane distance-aware emitter pick over the sphere set:
    weights w_j = P_j / max(|x - c_j|^2, r_j^2) (the r^2 clamp keeps
    a light containing/touching the shading point finite and makes
    every weight strictly positive — unbiasedness needs full
    support). Returns (idx, sel): the chosen sphere index and its
    per-lane selection PROBABILITY w_idx / sum_j w_j.

    Streaming three-pass python loop over the Es spheres (~10 VPU ops
    per sphere per pass) — no (Es, N) array is ever materialized, the
    materials-fetch where-chain economics (docs/BENCHMARKS.md gather
    ledger). P_j rides s_sel (the power FRACTION — only relative
    weights matter)."""

    def weight(j):
        c = (table.s_c[0][j], table.s_c[1][j], table.s_c[2][j])
        dv = vsub(c, origin)
        d2 = vdot(dv, dv)
        r2 = table.s_rad[j] * table.s_rad[j]
        return table.s_sel[j] / jnp.maximum(d2, r2)

    es = table.sphere_count
    total = weight(0)
    for j in range(1, es):
        total = total + weight(j)
    target = u1 * total
    acc = jnp.zeros_like(u1)
    idx = jnp.zeros(u1.shape, jnp.int32)
    for j in range(es - 1):
        acc = acc + weight(j)
        idx = idx + (acc < target).astype(jnp.int32)
    sel = weight(0)
    for j in range(1, es):
        sel = jnp.where(idx == j, weight(j), sel)
    return idx, sel / jnp.maximum(total, 1e-30)


def _sample_sphere(table: EmitterTable, idx, origin: V3, u2, u3,
                   sel=None):
    """Cone-sample emissive sphere idx as seen from `origin`.

    Uniform direction in the subtended cone (uniform 4-pi sphere when
    origin is inside), forward ray-sphere hit as the sample point y,
    outward unit normal m, and the EQUIVALENT AREA density p_area =
    pdf_sa * ecos / r^2 so downstream math is measure-uniform with the
    triangle sampler. ecos -> 0 at the silhouette makes p_area -> 0
    there; direct_light's combined-denominator form (ecos^2 /
    (p_area + p_bsdf)) keeps the contribution finite (it tends to the
    correct 0/q_sa limit)."""
    cols = _fetch_rows(table.s_packed, idx, 8)
    c = (cols[0], cols[1], cols[2])
    rad, emission = cols[3], (cols[4], cols[5], cols[6])
    if sel is None:  # power mode: the static power fraction
        sel = cols[7]

    dcv = vsub(c, origin)
    dc2 = vdot(dcv, dcv)
    safe_dc2 = jnp.maximum(dc2, 1e-12)
    outside = dc2 > rad * rad
    cosmax = jnp.where(
        outside,
        jnp.sqrt(jnp.maximum(0.0, 1.0 - rad * rad / safe_dc2)),
        jnp.float32(-1.0),
    )
    one_minus = 1.0 - cosmax  # in (0, 1] outside, 2 inside
    cos_t = 1.0 - u2 * one_minus
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = jnp.float32(2.0 * np.pi) * u3
    w_axis = vscale(dcv, 1.0 / jnp.sqrt(safe_dc2))
    t1v, t2v = bsdf.orthonormal_base(w_axis)
    d = vadd(
        vscale(w_axis, cos_t),
        vadd(vscale(t1v, sin_t * jnp.cos(phi)),
             vscale(t2v, sin_t * jnp.sin(phi))),
    )
    # Forward ray-sphere hit along d: nearest root outside, far root
    # inside. Cone directions always intersect; disc is clamped so
    # silhouette-edge rounding degrades to the tangent point.
    b = vdot(d, dcv)
    disc = jnp.maximum(0.0, b * b - (dc2 - rad * rad))
    sq = jnp.sqrt(disc)
    t = jnp.where(outside, b - sq, b + sq)
    y = vadd(origin, vscale(d, t))
    m = vnormalize(vsub(y, c))
    q_sa = sel / (jnp.float32(2.0 * np.pi) * one_minus)
    ecos = jnp.abs(vdot(d, m))
    p_area = q_sa * ecos / jnp.maximum(t * t, 1e-12)
    return y, m, emission, p_area


def sample_emitters(table: EmitterTable, u1, u2, u3, origin: V3 = None):
    """Power-proportional sample on the emitter set (triangles AND
    analytic spheres).

    u1 picks the emitter (POWER-proportional via the cumulative
    table); (u2, u3) warp to sqrt-barycentrics (triangles) or a cone
    direction (spheres; requires `origin`, the shading point — cone
    geometry is per-lane). Returns (y: V3, m: V3, emission: V3,
    p_area), each per-lane — p_area is the sampling pdf in AREA
    measure at y for both kinds.

    The CDF inversion is a branchless compare-count
    (jnp.searchsorted's scan lowering measured 88.9 ms at 1.33M lanes
    x 288 emitters on v5e — 2x a full minarg intersect — vs ~1 ms for
    the fused broadcast-compare reduce).

    table.select == 'distance' (many-light mode, sphere emitters
    only): u1 instead picks through the per-lane distance-aware
    weights (_distance_select); p_area carries the per-lane selection
    probability."""
    if table.select == "distance":
        if origin is None:
            raise ValueError(
                "sample_emitters needs `origin` for select='distance'"
            )
        idx, sel = _distance_select(table, origin, u1)
        return _sample_sphere(table, idx, origin, u2, u3, sel=sel)
    idx = jnp.sum(
        (table.cum[None, :] < u1[:, None]).astype(jnp.int32), axis=1
    )
    idx = jnp.minimum(idx, table.count - 1).astype(jnp.int32)
    et, es = table.tri_count, table.sphere_count
    if es == 0:
        return _sample_tri(table, idx, u2, u3)
    if origin is None:
        raise ValueError(
            "sample_emitters needs `origin` (the shading point) when "
            "the table has analytic-sphere emitters"
        )
    if et == 0:
        return _sample_sphere(table, idx, origin, u2, u3)
    is_sph = idx >= et
    yt, mt, emt, pt = _sample_tri(
        table, jnp.minimum(idx, et - 1), u2, u3
    )
    ys, ms, ems, ps = _sample_sphere(
        table, jnp.clip(idx - et, 0, es - 1), origin, u2, u3
    )
    return (
        vwhere(is_sph, ys, yt),
        vwhere(is_sph, ms, mt),
        vwhere(is_sph, ems, emt),
        jnp.where(is_sph, ps, pt),
    )


def direct_light(table: EmitterTable, *, intersect_fn, cam_eye,
                 hit_p: V3, n_vec: V3, mat, f_l: V3, f_b: V3,
                 f_s: V3, f_r: V3, is_diff, u1, u2, u3,
                 occluded_fn=None) -> V3:
    """Per-lane NEE contribution (zeros on non-diffuse lanes).

    mat is the per-lane material fetch (kd, ks, shininess consumed).
    cam_eye: camera eye point — the Blinn term uses the CAMERA halfway
    vector (prog.cl:79-81, used at :335), so the gathered term matches
    the base estimator's pickup exactly.
    One shadow ray per lane (intersect_fn), so a NEE step costs ~2x a
    plain step in intersection — the variance win at small emitters is
    far larger (docs/BENCHMARKS.md "Next-event estimation").

    occluded_fn: optional any-hit visibility kernel
    (tilecull_kernel.make_anyhit_occluded contract:
    occluded(rays, rmax) -> bool). Visibility only needs "is there
    ANY hit with t < dist" — strictly less than the nearest-hit
    intersect computes (reference anchor prog.cl:113-122), and the
    any-hit kernel answers the SAME predicate bit-identically with
    segment culling, no argmin and no attribute fetch. When None the
    shadow ray reuses intersect_fn (the reference-shaped path)."""
    n = u1.shape[0]
    origin = vadd(hit_p, vscale(n_vec, bsdf.EPS))
    y, m_y, emission, p_area = sample_emitters(table, u1, u2, u3,
                                               origin=origin)

    delta = vsub(y, origin)
    dist2 = vdot(delta, delta)
    dist = jnp.sqrt(dist2)
    d_l = vscale(delta, 1.0 / jnp.maximum(dist, 1e-12))

    cos_l = jnp.maximum(0.0, vdot(d_l, n_vec))
    ecos = jnp.abs(vdot(d_l, m_y))

    if occluded_fn is not None:
        visible = ~occluded_fn(Rays(p=origin, d=d_l),
                               dist * (1.0 - 1e-3))
    else:
        sh = intersect_fn(Rays(p=origin, d=d_l))
        if isinstance(sh, tuple):  # textured fn -> (Hits, kd_mod)
            sh = sh[0]
        visible = (~sh.valid) | (sh.t >= dist * (1.0 - 1e-3))

    eye_dir = vnormalize(
        tuple(cam_eye[k] - hit_p[k] for k in range(3))
    )
    halfway = vnormalize(vadd(eye_dir, d_l))
    blinn = jnp.power(
        jnp.maximum(0.0, vdot(n_vec, halfway)), mat.shininess
    )

    w = vadd(
        vscale(vmul(f_l, mat.kd), cos_l),
        vscale(vmul(f_b, mat.ks), blinn),
    )
    # MIS (balance heuristic) against the BSDF's cosine-sampled
    # continuation, both pdfs in AREA measure at y:
    #   p_area: triangle = lum_i / total_power (power-proportional
    #     sampler); sphere = cone pdf_sa * ecos / r^2,
    #   p_cos->area = (cos_l/pi) * ecos / r^2.
    # The algebra (1/p_area) * w_mis folds into one guarded combined
    # denominator — identical for triangles, and finite at the sphere
    # silhouette where p_area -> 0 with ecos.
    p_bsdf = _INV_PI * cos_l * ecos / jnp.maximum(dist2, 1e-12)
    scale_mis = (_INV_PI * cos_l * ecos * ecos
                 / jnp.maximum(dist2, 1e-12)
                 / jnp.maximum(p_area + p_bsdf, 1e-30))
    contrib = vscale(vmul(vmul(vmul(w, f_s), f_r), emission),
                     scale_mis)

    take_it = is_diff & visible & (cos_l > 0.0)
    zeros = tuple(jnp.zeros((n,), jnp.float32) for _ in range(3))
    return vwhere(take_it, contrib, zeros)


def pickup_mis_weight(table: EmitterTable, prev_pdf, emit_cos, t,
                      emission: V3, *, mati=None, hit_p: V3 = None,
                      ray_p: V3 = None):
    """Balance-heuristic weight for the EMITTER PICKUP at a vertex
    reached by the previous bounce's cosine-sampled continuation.

    prev_pdf: (N,) the previous bounce's direction pdf (cos/pi) if it
    was diffuse, 0 otherwise — 0 keeps FULL pickup weight (specular
    chains, emitter-continuations, primaries: NEE never gathered for
    those, so there is nothing to share with).
    emit_cos / t: the pickup hit's |cos| at the emitter and distance
    (the area-measure Jacobian of the direction pdf).
    emission: the hit MATERIAL's emission — the power-proportional
    sampler's area density at a TRIANGLE hit is
    lum(emission)/total_power.
    mati / hit_p / ray_p: required when the table has analytic-sphere
    emitters — a hit whose material id belongs to an emissive sphere
    (kind-unique by build check) instead gets the CONE sampler's
    equivalent area density sel_j * ecos / (2 pi (1 - cos_theta_max)
    * t^2), with cos_theta_max recomputed from the previous vertex
    ray_p exactly as the gather would have; spheres sharing one
    material are disambiguated by |hit_p - c_j| (disjoint surfaces,
    so the nearest-surface match is the generating sphere)."""
    p_bsdf = prev_pdf * emit_cos / jnp.maximum(t * t, 1e-12)
    lum = (_LUM[0] * emission[0] + _LUM[1] * emission[1]
           + _LUM[2] * emission[2])
    p_area = lum / table.power_lum
    es = table.sphere_count
    if es:
        if mati is None or hit_p is None or ray_p is None:
            raise ValueError(
                "pickup_mis_weight needs mati/hit_p/ray_p when the "
                "emitter table has analytic-sphere emitters"
            )
        # Host loop over the (few) emissive spheres: where-chains are
        # ~20 VPU ops each per lane — fine into the hundreds of
        # emissive spheres (the gather ledger's crossover).
        sc = np.stack([np.asarray(c) for c in table.s_c], axis=-1)
        srad = np.asarray(table.s_rad)
        ssel = np.asarray(table.s_sel)
        smati = np.asarray(table.s_mati)

        if table.select == "distance":
            # Recompute the gather's per-lane selection weights from
            # the previous vertex (ray_p stands in for the gather
            # origin, same EPS-level approximation as the cone
            # cosmax recompute below) so both MIS sides use the SAME
            # weight function — the balance weights stay a partition
            # of unity.
            def w_of(j):
                cj = tuple(jnp.float32(sc[j, k]) for k in range(3))
                dv = vsub(cj, ray_p)
                d2 = vdot(dv, dv)
                r2j = jnp.float32(srad[j] * srad[j])
                return jnp.float32(ssel[j]) / jnp.maximum(d2, r2j)

            total_w = w_of(0)
            for j in range(1, es):
                total_w = total_w + w_of(j)

        best = jnp.full(t.shape, jnp.float32(np.inf))
        for j in range(es):
            cj = tuple(jnp.float32(sc[j, k]) for k in range(3))
            r2j = jnp.float32(srad[j] * srad[j])
            dy = vsub(hit_p, cj)
            score = jnp.abs(vdot(dy, dy) - r2j)
            dcv = vsub(cj, ray_p)
            dc2 = vdot(dcv, dcv)
            outside = dc2 > r2j
            cosmax = jnp.where(
                outside,
                jnp.sqrt(jnp.maximum(
                    0.0, 1.0 - r2j / jnp.maximum(dc2, 1e-12))),
                jnp.float32(-1.0),
            )
            if table.select == "distance":
                sel_j = w_of(j) / jnp.maximum(total_w, 1e-30)
            else:
                sel_j = jnp.float32(ssel[j])
            q_sa = sel_j / (
                jnp.float32(2.0 * np.pi) * (1.0 - cosmax)
            )
            p_j = q_sa * emit_cos / jnp.maximum(t * t, 1e-12)
            match = (mati == int(smati[j])) & (score < best)
            p_area = jnp.where(match, p_j, p_area)
            best = jnp.where(match, score, best)
    # The guarded denominator keeps non-emitter lanes (lum = 0 AND
    # grazing p_bsdf = 0) NaN-free — their weight is discarded by the
    # is_emit gate, but NaN x 0 would not be.
    return jnp.where(prev_pdf > 0.0,
                     p_bsdf / jnp.maximum(p_bsdf + p_area, 1e-30),
                     jnp.float32(1.0))
