"""Fused wavefront step: everything but the intersect in ONE Pallas pass.

Why. The wavefront step's non-intersect work (material fetch, RNG,
BSDF sampling, factor updates, termination, progressive fold, path
regeneration) is all elementwise per lane, yet as ~40 separate XLA
fusions it costs 5.6 ms per 2M-lane step on v5e (docs/BENCHMARKS.md
"Non-intersection cost") — nearly a third of the cornell step budget —
because every fusion re-streams ~30 state arrays through HBM. This
module keeps the whole lane state in TWO packed row-major arrays
((32, N) f32 + (8, N) i32: rows on sublanes, lanes on the lane axis —
the (8, N) orientation rule from round 2) and runs the entire
shade/terminate/regenerate pipeline as one kernel: one HBM read pass,
one write pass, ~0.7 GB instead of ~10.

Semantics are bit-identical to models/wavefront.py's wavefront_step in
mode='fast' (test_fused_step.py asserts equality of every state field
over multi-step runs): same murmur3-finalizer draws (ops/rng.py
fast_uniforms), same BSDF expressions (ops/bsdf.py <- prog.cl:186-245),
same factor/termination/fold logic (prog.cl:329-379), same camera ray
regeneration (prog.cl:82-92, 384-389). Camera vectors and the material
archetype table are baked as kernel constants (camera motion means a
re-make; the offline/bench path holds the camera fixed, and the
reference also re-uploads camera args per frame, main.cpp:648-660).

PENDING support (plucker_kernel.py): a lane whose hit row is flagged
pending is frozen — no draws consumed, no factor updates, no bounce
increment, ray unchanged — until a later step's exact slice resolves
it. Stateless-RNG correctness: draws are keyed by (step, lane), so a
frozen lane simply uses a later step's draws when it finally bounces;
the estimator remains unbiased (draw values are i.i.d. across keys).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_path_tracer_tpu.core.camera import Camera
from opencl_path_tracer_tpu.core.materials import MaterialsSoA
from opencl_path_tracer_tpu.models.wavefront import WavefrontState

# f32 pack rows.
_COL = 0      # 0-2 colors
_RAYP = 3     # 3-5 ray_p
_RAYD = 6     # 6-8 ray_d
_FL = 9       # 9-11
_FB = 12      # 12-14
_FS = 15      # 15-17
_FR = 18      # 18-20
_CUR = 21     # 21-23 cur_color
_CX = 24      # pixel x as float (per lane, constant)
_CY = 25      # pixel y as float
F_ROWS = 32
# i32 pack rows.
_SAMP = 0
_PIX = 1
_RNG = 2      # uint32 Lehmer state, bitcast (parity mode unused here)
_INSIDE = 3
_BOUNCE = 4
I_ROWS = 8

_M1 = np.uint32(0x85EB_CA6B)
_M2 = np.uint32(0xC2B2_AE35)
_GOLD = np.uint32(0x9E37_79B9)
EPS = np.float32(0.001)
TWO_PI = np.float32(2.0 * np.pi)


def pack_state(st: WavefrontState, width: int, height: int):
    """WavefrontState -> (F (32, N) f32, I (8, N) i32, step scalar)."""
    n = st.samples.shape[0]
    F = jnp.zeros((F_ROWS, n), jnp.float32)
    rows = {
        _COL: st.colors, _RAYP: st.ray_p, _RAYD: st.ray_d,
        _FL: st.f_l, _FB: st.f_b, _FS: st.f_s, _FR: st.f_r,
        _CUR: st.cur_color,
    }
    for base, v3 in rows.items():
        for k in range(3):
            F = F.at[base + k].set(v3[k])
    # Raw float pixel coordinates: the kernel reproduces camera_rays'
    # exact expression 2*(x + jitter)/W - 1 from these.
    F = F.at[_CX].set((st.pixel % width).astype(jnp.float32))
    F = F.at[_CY].set((st.pixel // width).astype(jnp.float32))
    I = jnp.zeros((I_ROWS, n), jnp.int32)
    I = I.at[_SAMP].set(st.samples)
    I = I.at[_PIX].set(st.pixel)
    I = I.at[_RNG].set(
        jax.lax.bitcast_convert_type(st.rng_state, jnp.int32)
    )
    I = I.at[_INSIDE].set(st.inside.astype(jnp.int32))
    I = I.at[_BOUNCE].set(st.bounce)
    return F, I, st.step


def unpack_state(F, I, step) -> WavefrontState:
    def v3(base):
        return (F[base], F[base + 1], F[base + 2])

    return WavefrontState(
        colors=v3(_COL), samples=I[_SAMP], pixel=I[_PIX],
        rng_state=jax.lax.bitcast_convert_type(I[_RNG], jnp.uint32),
        ray_p=v3(_RAYP), ray_d=v3(_RAYD),
        f_l=v3(_FL), f_b=v3(_FB), f_s=v3(_FS), f_r=v3(_FR),
        cur_color=v3(_CUR),
        inside=I[_INSIDE].astype(bool), bounce=I[_BOUNCE],
        # The fused kernel has no EnvLight/NEE/adaptive support, so
        # the diffuse-bounce flags and luminance M2 are not packed;
        # unpack resets them (correct for env=None nee=None fixed-
        # budget renders, which is all this model supports).
        had_diffuse=jnp.zeros(I.shape[1:], bool),
        prev_pdf=jnp.zeros(I.shape[1:], jnp.float32),
        lum_m2=jnp.zeros(I.shape[1:], jnp.float32),
        step=jnp.asarray(step, jnp.uint32),
    )


def _fmix32(h):
    h = h ^ (h >> np.uint32(16))
    h = h * _M1
    h = h ^ (h >> np.uint32(13))
    h = h * _M2
    h = h ^ (h >> np.uint32(16))
    return h


def _mat_select(mati, values):
    """Select per-lane material constants from baked python scalars via
    a where-chain (10 archetypes — cheap, exact)."""
    out = jnp.full(mati.shape, np.float32(values[0]), jnp.float32)
    for j in range(1, len(values)):
        out = jnp.where(mati == j, np.float32(values[j]), out)
    return out


def _norm3(x, y, z):
    # core/types.vnormalize bit-equal form: 1/sqrt, then scale.
    r = 1.0 / jnp.sqrt(x * x + y * y + z * z)
    return x * r, y * r, z * r


def _step_kernel(F_ref, I_ref, H_ref, step_ref, Fo_ref, Io_ref, *,
                 mats_tab, cam_c, iters, k0, k1, tr):
    """One fused wavefront step for a (rows, TR) lane block.

    H rows: [t, nx, ny, nz, mati_f, pending]; t < 0 = miss.
    mats_tab: dict of field -> tuple of 10 python floats.
    cam_c: dict of camera constants (python floats)."""
    blk = pl.program_id(0)
    step = step_ref[0]
    F = F_ref[:]
    I = I_ref[:]
    H = H_ref[:]

    def f(r):
        return F[r:r + 1, :]

    def i(r):
        return I[r:r + 1, :]

    def h(r):
        return H[r:r + 1, :]

    t = h(0)
    nx0, ny0, nz0 = h(1), h(2), h(3)
    mati = h(4).astype(jnp.int32)
    pending = h(5) > 0.0

    px, py, pz = f(_RAYP), f(_RAYP + 1), f(_RAYP + 2)
    dx, dy, dz = f(_RAYD), f(_RAYD + 1), f(_RAYD + 2)
    has_hit = (t > 0.0) & ~pending  # Hits.valid is strict >
    safe_t = jnp.where(has_hit, t, 0.0)
    hx = px + dx * safe_t
    hy = py + dy * safe_t
    hz = pz + dz * safe_t

    # --- fast RNG draws, keyed by (step, lane) like rng.fast_uniforms.
    lane = (jax.lax.broadcasted_iota(jnp.uint32, (1, tr), 1)
            + jnp.uint32(blk * tr))
    stepu = step.astype(jnp.uint32)

    def draws(bounce_slot):
        base = lane * _GOLD + jnp.uint32(k0)
        base = base ^ (stepu * _M1)
        base = base + (jnp.uint32(bounce_slot) * _M2)
        us = []
        for draw in range(2):
            hh = base ^ (jnp.uint32(draw) * _GOLD) ^ jnp.uint32(k1)
            hh = _fmix32(_fmix32(hh))
            # Mosaic has no u32->f32 cast; >>8 leaves 24 bits, which
            # are non-negative in i32, so bitcast-then-convert is exact.
            h24 = jax.lax.bitcast_convert_type(
                hh >> np.uint32(8), jnp.int32
            )
            us.append(
                h24.astype(jnp.float32) * np.float32(1.0 / (1 << 24))
            )
        return us[0], us[1]

    r1, r2 = draws(0)

    # --- material fetch (prog.cl dispatch :329-366).
    def mat(field, comp=None):
        vals = mats_tab[field] if comp is None else [
            v[comp] for v in mats_tab[field]
        ]
        return _mat_select(mati, vals)

    mtype = mat("type").astype(jnp.int32)
    is_diff = has_hit & (mtype == 0)
    is_spec = has_hit & (mtype == 1)
    is_refr = has_hit & (mtype == 2)
    is_emit = has_hit & (mtype == 3)

    # Normal flipped toward the ray (prog.cl:326-328).
    dn = dx * nx0 + dy * ny0 + dz * nz0
    flip = dn > 0.0
    nx = jnp.where(flip, -nx0, nx0)
    ny = jnp.where(flip, -ny0, ny0)
    nz = jnp.where(flip, -nz0, nz0)

    # --- diffuse bounce (prog.cl:186-218).
    near_y = (jnp.abs(nx) <= EPS) & (jnp.abs(nz) <= EPS)
    rl_a = 1.0 / jnp.sqrt(ny * ny + nz * nz)
    z2ax, z2ay, z2az = jnp.zeros_like(nx), -nz * rl_a, ny * rl_a
    rl_b = 1.0 / jnp.sqrt(nx * nx + nz * nz)
    z2bx, z2by, z2bz = -nz * rl_b, jnp.zeros_like(nx), nx * rl_b
    zx = jnp.where(near_y, z2ax, z2bx)
    zy = jnp.where(near_y, z2ay, z2by)
    zz = jnp.where(near_y, z2az, z2bz)
    # x_axis = cross(n, z_axis)
    xx = ny * zz - nz * zy
    xy = nz * zx - nx * zz
    xz = nx * zy - ny * zx
    rr = jnp.sqrt(r1)
    theta = TWO_PI * r2
    sx_ = rr * jnp.cos(theta)
    sy_ = rr * jnp.sin(theta)
    sz_ = jnp.sqrt(1.0 - r1)
    ddx, ddy, ddz = _norm3(
        xx * sx_ + nx * sz_ + zx * sy_,
        xy * sx_ + ny * sz_ + zy * sy_,
        xz * sx_ + nz * sz_ + zz * sy_,
    )
    dpx, dpy, dpz = hx + nx * EPS, hy + ny * EPS, hz + nz * EPS

    # --- specular bounce (prog.cl:223-227).
    cosa_s = nx * dx + ny * dy + nz * dz
    sdx, sdy, sdz = _norm3(
        dx - nx * cosa_s * 2.0, dy - ny * cosa_s * 2.0,
        dz - nz * cosa_s * 2.0,
    )
    spx, spy, spz = hx + nx * EPS, hy + ny * EPS, hz + nz * EPS

    # --- Fresnel (prog.cl:219-222).
    f0x, f0y, f0z = mat("f0", 0), mat("f0", 1), mat("f0", 2)
    cosa_f = jnp.abs(nx * dx + ny * dy + nz * dz)
    om = 1.0 - cosa_f
    p2 = om * om
    p5 = p2 * p2 * om
    frx = f0x + (1.0 - f0x) * p5
    fry = f0y + (1.0 - f0y) * p5
    frz = f0z + (1.0 - f0z) * p5

    # --- refractive bounce (prog.cl:228-245, 346-357).
    inside_i = i(_INSIDE)
    inside = inside_i != 0
    mat_n = mat("n")
    n_eff = jnp.where(inside, 1.0 / mat_n, mat_n)
    cosa_r = -(dx * nx + dy * ny + dz * nz)
    disc = 1.0 - (1.0 - cosa_r * cosa_r) / n_eff / n_eff
    prob = (frx + fry + frz) / 3.0
    refracted = (disc > 0.0) & (r1 > prob)
    inv_n = 1.0 / n_eff
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    rdx, rdy, rdz = _norm3(
        dx * inv_n + nx * (cosa_r * inv_n - sq),
        dy * inv_n + ny * (cosa_r * inv_n - sq),
        dz * inv_n + nz * (cosa_r * inv_n - sq),
    )
    rpx, rpy, rpz = hx - nx * EPS, hy - ny * EPS, hz - nz * EPS
    refr_px = jnp.where(refracted, rpx, spx)
    refr_py = jnp.where(refracted, rpy, spy)
    refr_pz = jnp.where(refracted, rpz, spz)
    refr_dx = jnp.where(refracted, rdx, sdx)
    refr_dy = jnp.where(refracted, rdy, sdy)
    refr_dz = jnp.where(refracted, rdz, sdz)
    # int32 select (Mosaic rejects i1-valued select_n lowering).
    new_inside_i = jnp.where(is_refr & refracted, 1 - inside_i,
                             inside_i)
    inv_1mp = 1.0 / (1.0 - prob)
    inv_p = 1.0 / prob
    rfx = jnp.where(refracted, (1.0 - frx) * inv_1mp, frx * inv_p)
    rfy = jnp.where(refracted, (1.0 - fry) * inv_1mp, fry * inv_p)
    rfz = jnp.where(refracted, (1.0 - frz) * inv_1mp, frz * inv_p)

    # --- Blinn term with the CAMERA view dir (prog.cl:329-340).
    ex, ey, ez = _norm3(
        np.float32(cam_c["eye"][0]) - hx,
        np.float32(cam_c["eye"][1]) - hy,
        np.float32(cam_c["eye"][2]) - hz,
    )
    hwx, hwy, hwz = _norm3(ex + ddx, ey + ddy, ez + ddz)
    ndh = jnp.maximum(0.0, nx * hwx + ny * hwy + nz * hwz)
    shin = mat("shininess")
    intens_s = jnp.power(ndh, shin)
    intens_d = jnp.maximum(0.0, ddx * nx + ddy * ny + ddz * nz)

    # --- select the new ray (diffuse shared by emitter).
    use_diff = is_diff | is_emit
    new_px = jnp.where(use_diff, dpx, jnp.where(is_refr, refr_px, spx))
    new_py = jnp.where(use_diff, dpy, jnp.where(is_refr, refr_py, spy))
    new_pz = jnp.where(use_diff, dpz, jnp.where(is_refr, refr_pz, spz))
    new_dx = jnp.where(use_diff, ddx, jnp.where(is_refr, refr_dx, sdx))
    new_dy = jnp.where(use_diff, ddy, jnp.where(is_refr, refr_dy, sdy))
    new_dz = jnp.where(use_diff, ddz, jnp.where(is_refr, refr_dz, sdz))
    new_px = jnp.where(has_hit, new_px, px)
    new_py = jnp.where(has_hit, new_py, py)
    new_pz = jnp.where(has_hit, new_pz, pz)
    new_dx = jnp.where(has_hit, new_dx, dx)
    new_dy = jnp.where(has_hit, new_dy, dy)
    new_dz = jnp.where(has_hit, new_dz, dz)

    # --- factor updates + emitter fold (prog.cl:329-366).
    flx, fly, flz = f(_FL), f(_FL + 1), f(_FL + 2)
    fbx, fby, fbz = f(_FB), f(_FB + 1), f(_FB + 2)
    fsx, fsy, fsz = f(_FS), f(_FS + 1), f(_FS + 2)
    frx_, fry_, frz_ = f(_FR), f(_FR + 1), f(_FR + 2)
    kdx, kdy, kdz = mat("kd", 0), mat("kd", 1), mat("kd", 2)
    ksx, ksy, ksz = mat("ks", 0), mat("ks", 1), mat("ks", 2)
    emx, emy, emz = (mat("emission", 0), mat("emission", 1),
                     mat("emission", 2))
    flx = jnp.where(is_diff, flx * kdx * intens_d, flx)
    fly = jnp.where(is_diff, fly * kdy * intens_d, fly)
    flz = jnp.where(is_diff, flz * kdz * intens_d, flz)
    fbx = jnp.where(is_diff, fbx * ksx * intens_s, fbx)
    fby = jnp.where(is_diff, fby * ksy * intens_s, fby)
    fbz = jnp.where(is_diff, fbz * ksz * intens_s, fbz)
    fsx = jnp.where(is_spec, fsx * frx, fsx)
    fsy = jnp.where(is_spec, fsy * fry, fsy)
    fsz = jnp.where(is_spec, fsz * frz, fsz)
    frx_ = jnp.where(is_refr, frx_ * rfx, frx_)
    fry_ = jnp.where(is_refr, fry_ * rfy, fry_)
    frz_ = jnp.where(is_refr, frz_ * rfz, frz_)

    emit_cos = jnp.maximum(0.0, -(dx * nx + dy * ny + dz * nz))
    cx_, cy_, cz_ = f(_CUR), f(_CUR + 1), f(_CUR + 2)
    if iters == 1:  # preview (prog.cl:323-325)
        cx_ = jnp.where(has_hit, kdx + emx, cx_)
        cy_ = jnp.where(has_hit, kdy + emy, cy_)
        cz_ = jnp.where(has_hit, kdz + emz, cz_)
    conx = emx * (flx + fbx) * fsx * frx_ * emit_cos
    cony = emy * (fly + fby) * fsy * fry_ * emit_cos
    conz = emz * (flz + fbz) * fsz * frz_ * emit_cos
    cx_ = jnp.where(is_emit, cx_ + conx, cx_)
    cy_ = jnp.where(is_emit, cy_ + cony, cy_)
    cz_ = jnp.where(is_emit, cz_ + conz, cz_)

    # --- terminate / fold / regenerate (models/wavefront.py).
    active = ~pending
    bounce = jnp.where(active, i(_BOUNCE) + 1, i(_BOUNCE))
    terminated = active & (~(t > 0.0) | (bounce >= iters))
    s_f = i(_SAMP).astype(jnp.float32)
    inv = 1.0 / (s_f + 1.0)
    colx = jnp.where(terminated,
                     (f(_COL) * s_f + cx_) * inv, f(_COL))
    coly = jnp.where(terminated,
                     (f(_COL + 1) * s_f + cy_) * inv, f(_COL + 1))
    colz = jnp.where(terminated,
                     (f(_COL + 2) * s_f + cz_) * inv, f(_COL + 2))
    samples = jnp.where(terminated, i(_SAMP) + 1, i(_SAMP))

    g1, g2 = draws(1)
    # camera_rays bit-equal jitter: x = float(px_int) + g1, then
    # sx = 2*x / W - 1 with a true division.
    ndcx = (2.0 * (f(_CX) + g1)) / np.float32(cam_c["w"]) - 1.0
    ndcy = (2.0 * (f(_CY) + g2)) / np.float32(cam_c["h"]) - 1.0
    # ops/raygen.camera_rays bit-equal form:
    # ((lookat + right*sx) + up*sy) - eye, then vnormalize.
    def cam_d(k):
        return (np.float32(cam_c["la"][k])
                + np.float32(cam_c["right"][k]) * ndcx
                + np.float32(cam_c["up"][k]) * ndcy
                - np.float32(cam_c["eye"][k]))
    gdx, gdy, gdz = _norm3(cam_d(0), cam_d(1), cam_d(2))

    one = jnp.ones_like(colx)
    zero = jnp.zeros_like(colx)

    def sel(term_val, cont_val):
        return jnp.where(terminated, term_val, cont_val)

    Fo = jnp.concatenate([
        colx, coly, colz,
        sel(jnp.full_like(colx, np.float32(cam_c["eye"][0])), new_px),
        sel(jnp.full_like(colx, np.float32(cam_c["eye"][1])), new_py),
        sel(jnp.full_like(colx, np.float32(cam_c["eye"][2])), new_pz),
        sel(gdx, new_dx), sel(gdy, new_dy), sel(gdz, new_dz),
        sel(one, flx), sel(one, fly), sel(one, flz),
        sel(one, fbx), sel(one, fby), sel(one, fbz),
        sel(one, fsx), sel(one, fsy), sel(one, fsz),
        sel(one, frx_), sel(one, fry_), sel(one, frz_),
        sel(zero, cx_), sel(zero, cy_), sel(zero, cz_),
        f(_CX), f(_CY),
        F[26:32, :],
    ], axis=0)
    Io = jnp.concatenate([
        samples, i(_PIX), i(_RNG),
        jnp.where(terminated, 0, new_inside_i),
        jnp.where(terminated, 0, bounce),
        I[5:8, :],
    ], axis=0)
    Fo_ref[:] = Fo
    Io_ref[:] = Io


def make_fused_step(cam: Camera, mats: MaterialsSoA, *, width: int,
                    height: int, iterations: int, key,
                    tr: int = 2048, interpret: bool = False):
    """Returns step(F, I, step_idx, hits_pack) -> (F', I').

    hits_pack: (8, N) f32 rows [t, nx, ny, nz, mati, pending, 0, 0]
    (use hits_to_pack). mode='fast' only — parity keeps the unfused
    path (its sequential Lehmer draws are inherently per-event)."""
    kd = np.asarray(jax.random.key_data(key)).ravel().astype(np.uint32)
    cam_c = dict(
        eye=[float(x) for x in np.asarray(cam.eye)],
        la=[float(x) for x in np.asarray(cam.lookat)],
        right=[float(x) for x in np.asarray(cam.right)],
        up=[float(x) for x in np.asarray(cam.up)],
        w=float(width), h=float(height),
    )
    def v3_rows(v3):
        # MaterialsSoA V3 fields are channel tuples of (M,) arrays;
        # re-pack as per-MATERIAL (x, y, z) triples.
        chans = [np.asarray(c) for c in v3]
        return [tuple(float(c[m]) for c in chans)
                for m in range(chans[0].shape[0])]

    mats_tab = dict(
        type=[float(x) for x in np.asarray(mats.type)],
        n=[float(x) for x in np.asarray(mats.n)],
        shininess=[float(x) for x in np.asarray(mats.shininess)],
        kd=v3_rows(mats.kd),
        ks=v3_rows(mats.ks),
        emission=v3_rows(mats.emission),
        f0=v3_rows(mats.f0),
    )

    @functools.partial(jax.jit, static_argnames=())
    def step(F, I, step_idx, H):
        n = F.shape[1]
        assert n % tr == 0, f"lane count {n} not a multiple of tr={tr}"
        grid = (n // tr,)
        Fo, Io = pl.pallas_call(
            functools.partial(
                _step_kernel, mats_tab=mats_tab, cam_c=cam_c,
                iters=iterations, k0=int(kd[0]), k1=int(kd[-1]),
                tr=tr,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((F_ROWS, tr), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((I_ROWS, tr), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, tr), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((F_ROWS, tr), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((I_ROWS, tr), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((F_ROWS, n), jnp.float32),
                jax.ShapeDtypeStruct((I_ROWS, n), jnp.int32),
            ],
            interpret=interpret,
        )(F, I, H, jnp.asarray(step_idx, jnp.int32).reshape(1))
        return Fo, Io

    return step


def hits_to_pack(hits, pending=None) -> jnp.ndarray:
    """Hits (+ optional pending mask) -> (8, N) f32 rows for the fused
    step: [t, nx, ny, nz, mati, pending, 0, 0]."""
    n = hits.t.shape[0]
    z = jnp.zeros((1, n), jnp.float32)
    pend = (z if pending is None
            else pending.astype(jnp.float32)[None, :])
    return jnp.concatenate([
        hits.t[None, :],
        hits.n[0][None, :], hits.n[1][None, :], hits.n[2][None, :],
        hits.mati.astype(jnp.float32)[None, :],
        pend, z, z,
    ], axis=0)
