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
weights. Triangle emitters only — analytic-sphere emitters would need
a solid-angle sampler (no scene in the library has one;
build_emitter_table raises if given one so the gap is loud).
"""

from __future__ import annotations

import dataclasses

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


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(
        cls, data_fields=fields, meta_fields=[]
    )
    return cls


@_register
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

    @property
    def count(self) -> int:
        return int(self.cum.shape[0])


def build_emitter_table(tris, mats: MaterialsSoA,
                        spheres=None) -> EmitterTable:
    """Collect the emissive triangles (host-side, once per scene).

    Raises if the scene has no triangle emitter, or any SPHERE emitter
    (unsupported — would silently lose its direct light)."""
    if spheres is not None and spheres.count:
        s_em = np.stack(
            [np.asarray(c)[np.asarray(spheres.mati)]
             for c in mats.emission]
        )
        if np.any(s_em != 0.0):
            raise ValueError(
                "NEE supports triangle emitters only, but the scene "
                "has an emissive analytic sphere (no solid-angle "
                "sphere sampler); use the tessellated scene variant"
            )
    mati = np.asarray(tris.mati)
    em = np.stack([np.asarray(c)[mati] for c in mats.emission], axis=-1)
    is_em = np.any(em != 0.0, axis=-1)
    if not np.any(is_em):
        raise ValueError("NEE needs at least one emissive triangle")
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
    m = cr / np.linalg.norm(cr, axis=-1, keepdims=True)
    total = float(area.sum())
    lum = em @ np.asarray(_LUM, np.float32)
    power = area * lum
    w_total = float(power.sum())
    cum = np.cumsum(power / w_total).astype(np.float32)
    cum[-1] = 1.0
    p_area = (lum / w_total).astype(np.float32)

    def _v3(a):
        return tuple(jnp.asarray(a[:, k], jnp.float32) for k in range(3))

    packed = np.concatenate(
        [r1, e1, e2, m, em, p_area[:, None]], axis=-1
    ).astype(np.float32)

    return EmitterTable(
        v0=_v3(r1), e1=_v3(e1), e2=_v3(e2), m=_v3(m),
        emission=_v3(em),
        cum=jnp.asarray(cum),
        p_area=jnp.asarray(p_area),
        total_area=jnp.float32(total),
        power_lum=jnp.float32(w_total),
        packed=jnp.asarray(packed),
    )


def sample_emitters(table: EmitterTable, u1, u2, u3):
    """Power-proportional point on the emitter set.

    u1 picks the triangle (POWER-proportional via the cumulative
    table); (u2, u3) pick the square-root-warped barycentrics. Returns
    (y: V3, m: V3, emission: V3, p_area), each per-lane — p_area is
    the sampling pdf (area measure) at y.

    The CDF inversion is a branchless compare-count
    (jnp.searchsorted's scan lowering measured 88.9 ms at 1.33M lanes
    x 288 emitters on v5e — 2x a full minarg intersect — vs ~1 ms for
    the fused broadcast-compare reduce). The per-lane fetch follows
    the materials take_select rule: small tables (<= 64 emitters,
    e.g. cornell's 2) are where-chains of scalar rows (~free — a real
    gather here measured 41 -> 11 spp/s on the rrnee bench leg);
    large ones are ONE (N, 16) row gather of table.packed (16 column
    gathers cost ~10 ms EACH per 2M lanes)."""
    idx = jnp.sum(
        (table.cum[None, :] < u1[:, None]).astype(jnp.int32), axis=1
    )
    idx = jnp.minimum(idx, table.count - 1).astype(jnp.int32)
    e = table.count
    if e <= 64:
        cols = []
        for c in range(16):
            out = jnp.full(idx.shape, table.packed[0, c])
            for j in range(1, e):
                out = jnp.where(idx == j, table.packed[j, c], out)
            cols.append(out)

        def col3(base):
            return (cols[base], cols[base + 1], cols[base + 2])

        s = jnp.sqrt(u2)
        b1 = s * (1.0 - u3)
        b2 = s * u3
        v0, e1, e2 = col3(0), col3(3), col3(6)
        y = vadd(v0, vadd(vscale(e1, b1), vscale(e2, b2)))
        return y, col3(9), col3(12), cols[15]

    row = jnp.take(table.packed, idx, axis=0)  # (N, 16)

    def col3(base):
        return (row[:, base], row[:, base + 1], row[:, base + 2])

    v0, e1, e2 = col3(0), col3(3), col3(6)
    s = jnp.sqrt(u2)
    b1 = s * (1.0 - u3)
    b2 = s * u3
    y = vadd(v0, vadd(vscale(e1, b1), vscale(e2, b2)))
    return y, col3(9), col3(12), row[:, 15]


def direct_light(table: EmitterTable, *, intersect_fn, cam_eye,
                 hit_p: V3, n_vec: V3, mat, f_l: V3, f_b: V3,
                 f_s: V3, f_r: V3, is_diff, u1, u2, u3) -> V3:
    """Per-lane NEE contribution (zeros on non-diffuse lanes).

    mat is the per-lane material fetch (kd, ks, shininess consumed).
    cam_eye: camera eye point — the Blinn term uses the CAMERA halfway
    vector (prog.cl:79-81, used at :335), so the gathered term matches
    the base estimator's pickup exactly.
    One shadow ray per lane (intersect_fn), so a NEE step costs ~2x a
    plain step in intersection — the variance win at small emitters is
    far larger (docs/BENCHMARKS.md "Next-event estimation")."""
    n = u1.shape[0]
    y, m_y, emission, p_area = sample_emitters(table, u1, u2, u3)

    origin = vadd(hit_p, vscale(n_vec, bsdf.EPS))
    delta = vsub(y, origin)
    dist2 = vdot(delta, delta)
    dist = jnp.sqrt(dist2)
    d_l = vscale(delta, 1.0 / jnp.maximum(dist, 1e-12))

    cos_l = jnp.maximum(0.0, vdot(d_l, n_vec))
    ecos = jnp.abs(vdot(d_l, m_y))

    sh = intersect_fn(Rays(p=origin, d=d_l))
    if isinstance(sh, tuple):  # textured intersect_fn -> (Hits, kd_mod)
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
    scale = (_INV_PI * cos_l * ecos * ecos
             / jnp.maximum(dist2, 1e-12) / p_area)
    # MIS (balance heuristic) against the BSDF's cosine-sampled
    # continuation, both pdfs in AREA measure at y:
    #   p_area = lum_i / total_power (power-proportional sampler),
    #   p_cos->area = (cos_l/pi) * ecos / r^2.
    p_bsdf = _INV_PI * cos_l * ecos / jnp.maximum(dist2, 1e-12)
    w_mis = p_area / (p_area + p_bsdf)
    contrib = vscale(vmul(vmul(vmul(w, f_s), f_r), emission),
                     scale * w_mis)

    take_it = is_diff & visible & (cos_l > 0.0)
    zeros = tuple(jnp.zeros((n,), jnp.float32) for _ in range(3))
    return vwhere(take_it, contrib, zeros)


def pickup_mis_weight(table: EmitterTable, prev_pdf, emit_cos, t,
                      emission: V3):
    """Balance-heuristic weight for the EMITTER PICKUP at a vertex
    reached by the previous bounce's cosine-sampled continuation.

    prev_pdf: (N,) the previous bounce's direction pdf (cos/pi) if it
    was diffuse, 0 otherwise — 0 keeps FULL pickup weight (specular
    chains, emitter-continuations, primaries: NEE never gathered for
    those, so there is nothing to share with).
    emit_cos / t: the pickup hit's |cos| at the emitter and distance
    (the area-measure Jacobian of the direction pdf).
    emission: the hit MATERIAL's emission — the power-proportional
    sampler's area density there is lum(emission)/total_power."""
    p_bsdf = prev_pdf * emit_cos / jnp.maximum(t * t, 1e-12)
    lum = (_LUM[0] * emission[0] + _LUM[1] * emission[1]
           + _LUM[2] * emission[2])
    p_area = lum / table.power_lum
    # The guarded denominator keeps non-emitter lanes (lum = 0 AND
    # grazing p_bsdf = 0) NaN-free — their weight is discarded by the
    # is_emit gate, but NaN x 0 would not be.
    return jnp.where(prev_pdf > 0.0,
                     p_bsdf / jnp.maximum(p_bsdf + p_area, 1e-30),
                     jnp.float32(1.0))
