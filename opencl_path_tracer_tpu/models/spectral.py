"""Spectral dispersion rendering — a beyond-reference capability.

The reference's dielectric carries ONE scalar refraction index for all
light: main.cpp:103 collapses the per-channel IOR vector to
``n = mean(N)`` and prog.cl's Snell path (new_ray_refractive,
prog.cl:339-356) bends every wavelength identically, so reference glass
can never split white light into a spectrum. This module renders the
same scenes with wavelength-dependent refraction:

 * The visible spectrum is partitioned into B bands (band_centers).
 * Each band renders an ordinary wavefront pass whose materials table
   replaces every REFRACTIVE row's ``n`` (and its dielectric Fresnel
   F0) with n(lambda) from the standard Abbe-number Cauchy model
   (abbe_ior) — crown glass V_d ~ 60 disperses gently, flint V_d ~ 30
   throws visible rainbows.
 * Band images combine into RGB with per-channel partition-of-unity
   weights (band_weights), so a scene with NO refractive material (or
   ``v_d=None``) reproduces the non-spectral image exactly — the
   correctness anchor test_spectral leans on.

TPU-first composition, not a new renderer: each band is a standard
``wavefront_step`` pass, so the whole sampling layer (NEE, RR, QMC,
DoF) and the sharding layer compose untouched. The materials table
rides as a RUNTIME argument of one jitted step — all B bands share a
single compiled program (a closure-constant table would recompile per
band), and all bands share one RNG stream (common random numbers: the
combined image's band-to-band noise is correlated away everywhere the
scene is not dispersive).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.materials import MaterialsSoA, MaterialType

# Fraunhofer lines the Abbe number is defined over (nm).
_LAMBDA_F = 486.13
_LAMBDA_D = 589.29
_LAMBDA_C = 656.27

# Dominant wavelengths of the sRGB primaries (nm) — the 3-band centers.
_RGB_CENTERS = (612.0, 549.0, 465.0)

# Gaussian stand-ins for the sRGB channel spectral responses, used only
# to SPLIT each display channel's weight across bands (normalized per
# channel, so their absolute scale and tails never matter).
_CHANNEL_MU = (612.0, 549.0, 465.0)
_CHANNEL_SIGMA = (45.0, 40.0, 35.0)


def abbe_ior(n_d: float, wavelength_nm, v_d: float):
    """n(lambda) by the two-term Cauchy model fitted to (n_d, V_d).

    Cauchy: n(l) = A + B / l^2 with B chosen so the F-to-C spread
    matches the Abbe number V_d = (n_d - 1) / (n_F - n_C) and
    A anchored at the d line: n(589.29) == n_d exactly.

    Works on scalars or arrays (broadcasts); v_d=None or inf returns
    n_d unchanged (no dispersion)."""
    if v_d is None or not np.isfinite(v_d):
        return n_d
    lam = jnp.asarray(wavelength_nm, jnp.float32)
    spread = 1.0 / _LAMBDA_F**2 - 1.0 / _LAMBDA_C**2
    b = (n_d - 1.0) / (v_d * spread)
    a = n_d - b / _LAMBDA_D**2
    return a + b / (lam * lam)


def band_centers(bands: int) -> np.ndarray:
    """(B,) band center wavelengths in nm. bands=3 uses the sRGB
    primary wavelengths (each band IS a display channel); larger B
    spans 440-660 nm evenly."""
    if bands < 1:
        raise ValueError(f"bands must be >= 1, got {bands}")
    if bands == 1:
        return np.array([_LAMBDA_D], np.float64)
    if bands == 3:
        return np.array(_RGB_CENTERS, np.float64)
    return np.linspace(660.0, 440.0, bands)


def band_weights(bands: int) -> np.ndarray:
    """(B, 3) combination weights: result[c] = sum_b w[b, c] * img_b[c].

    Each display channel's weight is a partition of unity across bands
    (columns sum to 1), so B identical band images combine to the
    single-pass image bit-for-bit — dispersion only ever REDISTRIBUTES
    a channel across bands, never rescales it. bands=3 is the identity
    (band b carries channel b alone); larger B splits each channel by
    a Gaussian response at the band center."""
    lam = band_centers(bands)
    if bands == 1:
        return np.ones((1, 3), np.float32)
    if bands == 3:
        return np.eye(3, dtype=np.float32)
    w = np.zeros((bands, 3), np.float64)
    for c in range(3):
        w[:, c] = np.exp(
            -0.5 * ((lam - _CHANNEL_MU[c]) / _CHANNEL_SIGMA[c]) ** 2
        )
    w /= w.sum(axis=0, keepdims=True)
    return w.astype(np.float32)


def dispersive_materials(mats: MaterialsSoA, wavelength_nm: float,
                         v_d: float | None = 55.0) -> MaterialsSoA:
    """The band's materials table: every REFRACTIVE row's scalar ``n``
    becomes n(lambda) (abbe_ior of that row's own n_d), and its
    Fresnel F0 is re-derived from the monochromatic dielectric
    formula ((n-1)/(n+1))^2 on all three channels (the per-band
    Schlick base prog.cl:219-222 needs). Non-refractive rows are
    untouched — conductors and diffuse shading have no Snell path.

    v_d=None (or inf) returns `mats` unchanged."""
    if v_d is None or not np.isfinite(v_d):
        return mats
    refr = mats.type == int(MaterialType.REFRACTIVE)
    n_l = abbe_ior(mats.n, float(wavelength_nm), float(v_d))
    n_new = jnp.where(refr, n_l, mats.n).astype(mats.n.dtype)
    f0_diel = ((n_l - 1.0) / (n_l + 1.0)) ** 2
    f0_new = tuple(
        jnp.where(refr, f0_diel, c).astype(c.dtype) for c in mats.f0
    )
    return MaterialsSoA(
        kd=mats.kd, ks=mats.ks, emission=mats.emission, f0=f0_new,
        n=n_new, shininess=mats.shininess, type=mats.type,
    )


def make_dispersive_renderer(mats: MaterialsSoA, *, intersect_fn,
                             num_pixels: int, iterations: int,
                             min_spp: int, bands: int = 3,
                             v_d: float | None = 55.0,
                             mode: str = "fast", seed: int = 1,
                             key=None, ids=None, nee=None, rr=None,
                             qmc: bool = False, dof=None,
                             occluded_fn=None, exact_spp: bool = True,
                             max_extra_steps: int = 1_000_000):
    """render(cam) -> (num_pixels, 3) dispersive image, camera as a
    RUNTIME argument of the one jitted program — a pose sequence
    (`ptx anim --dispersion`) compiles once and pays pure render time
    per frame, exactly like the engine's turntable path
    (runtime/anim.py). Band tables are prebuilt in this factory."""
    from opencl_path_tracer_tpu.models import wavefront

    if mode == "fast" and key is None:
        key = jax.random.key(seed)
    centers = band_centers(bands)
    weights = band_weights(bands)
    cap = min_spp if exact_spp else None

    @jax.jit
    def run(cam, band_mats, st, k):
        # k steps per device program: one dispatch (and one host
        # round-trip) per convergence check instead of per step — the
        # same chunking every other render loop here uses, and the
        # difference between usable and tunnel-RTT-bound on a remote
        # TPU.
        def body(_, s):
            return wavefront.wavefront_step(
                cam, band_mats, s, intersect_fn=intersect_fn,
                iterations=iterations, mode=mode, key=key,
                max_samples=cap, ids=ids, nee=nee, rr=rr, qmc=qmc,
                dof=dof, occluded_fn=occluded_fn,
            )
        return jax.lax.fori_loop(0, k, body, st)

    tables = [dispersive_materials(mats, c, v_d) for c in centers]
    chunk = max(iterations * 2, 8)

    def render(cam) -> np.ndarray:
        out = np.zeros((num_pixels, 3), np.float64)
        for b in range(bands):
            state = wavefront.init_wavefront(
                cam, num_pixels, seed=seed, mode=mode, key=key,
                ids=ids, qmc=qmc, dof=dof,
            )
            for _ in range(max_extra_steps):
                state = run(cam, tables[b], state, chunk)
                done = int(jax.device_get(jnp.min(state.samples)))
                if done >= min_spp:
                    break
            img = wavefront.colors_by_pixel(state, num_pixels)
            out += weights[b][None, :].astype(np.float64) * img
        return out.astype(np.float32)

    return render


def render_dispersive(cam, mats: MaterialsSoA, *, intersect_fn,
                      num_pixels: int, iterations: int, min_spp: int,
                      bands: int = 3, v_d: float | None = 55.0,
                      mode: str = "fast", seed: int = 1, key=None,
                      ids=None, nee=None, rr=None, qmc: bool = False,
                      dof=None, occluded_fn=None,
                      exact_spp: bool = True,
                      max_extra_steps: int = 1_000_000) -> np.ndarray:
    """(num_pixels, 3) linear-radiance image with spectral dispersion.

    Runs one wavefront render per band (render_wavefront semantics:
    steps until every pixel holds >= min_spp samples; exact_spp caps
    at exactly min_spp so band images are sample-aligned) and
    combines them with band_weights. All bands share one compiled
    step — the dispersed MaterialsSoA and the camera are runtime
    arguments — and one RNG configuration (common random numbers
    across bands).

    nee/rr/qmc/dof compose exactly as in wavefront_step; the emitter
    table (built on the undispersed scene) is shared by every band —
    emission does not disperse in this model, only refraction."""
    return make_dispersive_renderer(
        mats, intersect_fn=intersect_fn, num_pixels=num_pixels,
        iterations=iterations, min_spp=min_spp, bands=bands, v_d=v_d,
        mode=mode, seed=seed, key=key, ids=ids, nee=nee, rr=rr,
        qmc=qmc, dof=dof, occluded_fn=occluded_fn,
        exact_spp=exact_spp, max_extra_steps=max_extra_steps,
    )(cam)
