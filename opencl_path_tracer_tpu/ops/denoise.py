"""Edge-aware à-trous wavelet denoiser + primary-ray AOV guides.

The reference's only post-process is the dormant 3x3 luminance median
(`filt_im`, prog.cl:391-427 — ported in ops/median_filter.py). This
module goes beyond it with the standard real-time path-tracing
denoiser: the à-trous wavelet filter of Dammertz et al. 2010 ("Edge-
Avoiding À-Trous Wavelet Transform for Fast Global Illumination
Filtering"), with color/normal/depth edge-stopping functions — the
same family SVGF builds on.

TPU shape: each iteration is 25 statically-shifted reads of padded
(H, W, 3) buffers combined by per-pixel weights — pure fused
elementwise VPU work over raster-ordered arrays, no gathers, no
data-dependent shapes; XLA fuses each iteration into a couple of HBM
passes. Dilation doubles per iteration (the "holes" of à trous), so
5 iterations cover a 63-pixel footprint at 5x5 cost each.

Guides come from one deterministic primary-ray pass (`primary_aovs`):
pixel-center rays (no jitter, no RNG) through the SAME injected
intersector the render used, so every accel backend and the textured/
smooth paths produce consistent normals/albedo.
"""

from __future__ import annotations

import jax.numpy as jnp

# B3-spline 5-tap kernel (Dammertz et al. §3): outer product gives the
# 5x5 à-trous stencil.
_H5 = (1.0 / 16.0, 1.0 / 4.0, 3.0 / 8.0, 1.0 / 4.0, 1.0 / 16.0)


def primary_aovs(cam, mats, intersect_fn, width: int, height: int):
    """Deterministic first-hit guides: (normal (H,W,3), depth (H,W)).
    Pixel-center rays (jitter = 0.5, the expectation of the
    reference's rand() jitter, prog.cl:388); misses get normal 0 /
    depth -1 — they cluster with each other and repel hit pixels in
    the edge-stopping weights. Rows follow the framebuffer's
    bottom-up pixel-id order (flip only at display, like
    RenderEngine.image())."""
    from opencl_path_tracer_tpu.models.megakernel import fetch_material
    from opencl_path_tracer_tpu.ops import raygen
    from opencl_path_tracer_tpu.core.types import (
        vdot, vneg, vwhere,
    )

    n = width * height
    ids = raygen.pixel_ids_like(n)
    half = jnp.full((n,), 0.5, jnp.float32)
    rays = raygen.camera_rays(cam, ids, half, half)
    # fetch_material normalizes the intersector's return shape (the
    # textured path returns (Hits, kd_mod) tuples).
    hit, _ = fetch_material(mats, intersect_fn, rays)
    n_vec = vwhere(vdot(rays.d, hit.n) > 0.0, vneg(hit.n), hit.n)
    valid = hit.valid

    a = jnp.stack(n_vec, -1).reshape(height, width, 3)
    normal = jnp.where(
        valid.reshape(height, width, 1), a, jnp.zeros_like(a)
    )
    depth = jnp.where(valid, hit.t, -1.0).reshape(height, width)
    return normal, depth


def atrous_denoise(colors, normal, depth, *, iterations: int = 5,
                   sigma_color: float = 3.0, sigma_normal: float = 0.2,
                   sigma_depth: float = 0.05,
                   clamp_percentile: float | None = 99.0):
    """Edge-aware à-trous filter of a linear radiance image.

    colors: (H, W, 3) float32 (UNtonemapped — filter in linear light,
    tonemap after). normal: (H, W, 3) unit first-hit normals (0 on
    miss). depth: (H, W) first-hit t (-1 on miss).

    clamp_percentile: firefly suppression — scale each pixel's RGB so
    its luminance caps at this percentile of the frame before
    filtering (None disables). At 2 spp the lamp's direct-hit
    outliers run ~10x the converged max and dominate both the MSE and
    the edge-stopping distances; the clamp is biased but bounded, and
    is what makes the filter effective at very low spp (swept on
    cornell: clamp@99 + the defaults take 2-spp linear MSE vs a
    128-spp reference from 1.067 to 0.042, tonemapped 0.096 -> 0.029).

    Per Dammertz et al.: iteration i uses the 5x5 B3 stencil with taps
    spread 2**i apart; weights are products of edge-stopping terms
      w_c = exp(-||log1p(c_p) - log1p(c_q)||^2 / sigma_c^2)
            (color distance is measured in log(1+c) space — linear
            radiance spans orders of magnitude at low spp and a
            linear-space sigma either kills all filtering around
            bright outliers or flattens dark regions)
      w_n = exp(-||n_p - n_q||^2 / sigma_n^2)
      w_d = exp(-|d_p - d_q| / (sigma_d * (|d_p| + eps)))  (relative:
            depth in this scene spans ~1e3 units)
    Averaging still happens in LINEAR radiance; only the distances are
    compressed. Returns the filtered (H, W, 3) image."""
    c = jnp.asarray(colors, jnp.float32)
    nrm = jnp.asarray(normal, jnp.float32)
    dep = jnp.asarray(depth, jnp.float32)

    if clamp_percentile is not None:
        lum = (0.2126 * c[..., 0] + 0.7152 * c[..., 1]
               + 0.0722 * c[..., 2])
        cap = jnp.percentile(lum, clamp_percentile)
        c = c * jnp.minimum(
            1.0, cap / jnp.maximum(lum, 1e-9)
        )[..., None]

    inv_sn2 = 1.0 / (sigma_normal * sigma_normal)
    eps = 1e-3

    for i in range(iterations):
        step = 1 << i
        lc = jnp.log1p(c)
        inv_sc2 = 1.0 / (sigma_color * sigma_color)
        pc = jnp.pad(c, ((2 * step, 2 * step),) * 2 + ((0, 0),),
                     mode="edge")
        pl = jnp.pad(lc, ((2 * step, 2 * step),) * 2 + ((0, 0),),
                     mode="edge")
        pn = jnp.pad(nrm, ((2 * step, 2 * step),) * 2 + ((0, 0),),
                     mode="edge")
        pd = jnp.pad(dep, ((2 * step, 2 * step),) * 2, mode="edge")
        h, w = dep.shape
        acc = jnp.zeros_like(c)
        wacc = jnp.zeros(dep.shape, jnp.float32)
        for ky in range(5):
            for kx in range(5):
                oy = (ky - 2) * step + 2 * step
                ox = (kx - 2) * step + 2 * step
                qc = pc[oy:oy + h, ox:ox + w]
                ql = pl[oy:oy + h, ox:ox + w]
                qn = pn[oy:oy + h, ox:ox + w]
                qd = pd[oy:oy + h, ox:ox + w]
                w_c = jnp.exp(-jnp.sum((lc - ql) ** 2, -1) * inv_sc2)
                w_n = jnp.exp(-jnp.sum((nrm - qn) ** 2, -1) * inv_sn2)
                w_d = jnp.exp(
                    -jnp.abs(dep - qd)
                    / (sigma_depth * (jnp.abs(dep) + eps))
                )
                wgt = _H5[ky] * _H5[kx] * w_c * w_n * w_d
                acc = acc + qc * wgt[..., None]
                wacc = wacc + wgt
        c = acc / wacc[..., None]
    return c
