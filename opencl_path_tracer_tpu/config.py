"""Render configuration.

The reference has no config system: everything is compile-time globals
(resolution 1536x864 at main.cpp:20-21, max_iterations=50 at :26, camera
pose globals at :30-43, scene content hardcoded in onInitialization).
Here the same knobs are a first-class dataclass, JSON round-trippable,
so renders are reproducible and scriptable.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

# Reference defaults (main.cpp:19-43).
REF_WIDTH = 192 * 8  # 1536
REF_HEIGHT = 108 * 8  # 864
REF_MAX_ITERATIONS = 50


@dataclasses.dataclass
class CameraConfig:
    """Camera pose. Mirrors the reference globals main.cpp:30-43."""

    fov: float = 75.0
    yaw: float = -13.800002 - 50
    pitch: float = 5.599997 + 10
    # global_shift (main.cpp:39); base eye is (500, 500, -1299.037842)+shift
    # (main.cpp:343).
    shift: tuple[float, float, float] = (265.055481, 162.305969, 360.414001)


@dataclasses.dataclass
class RenderConfig:
    width: int = REF_WIDTH
    height: int = REF_HEIGHT
    # Bounce depth per sample ('iterations', main.cpp:26-27; user tunable
    # with +/- in [1, max_iterations]).
    iterations: int = 4
    max_iterations: int = REF_MAX_ITERATIONS
    # Samples per pixel to accumulate (progressive; reference runs forever).
    spp: int = 16
    # 'parity' = bit-faithful reference math (Lehmer LCG RNG, exact tonemap
    # quirks); 'fast' = counter-hash RNG + numerically-safe tonemap.
    mode: str = "fast"
    # RNG seed for the host-side std::minstd_rand0-equivalent seeder
    # (main.cpp:45,522-527). The C++ default ctor seed is 1.
    seed: int = 1
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    # Tone mapping: 'reinhard' (active in reference, prog.cl:380) or 'filmic'
    # (used only by the dormant filt_im kernel, prog.cl:259-263) or 'none'.
    tonemap: str = "reinhard"
    # Acceleration structure backend:
    #   'auto' (brute Pallas kernel for small scenes / cluster kernel
    #   for large on TPU; bruteforce/BVH on CPU), or force one of
    #   'bruteforce' | 'bvh' | 'pallas' | 'cluster'.
    accel: str = "auto"
    # Override the TPU footgun gate (engine.make_intersect_fn): run
    # measured-dominated or device-unsafe backends anyway.
    accel_force: bool = False
    # Smooth shading: interpolate vertex normals at hit points
    # (ops/shading.py). Requires a scene built with vertex normals
    # (add_obj(smooth_normals=True) / add_sphere(smooth=True)) and an
    # ids-reporting accel (engine.SMOOTH_ACCELS). False = reference
    # face-normal shading (prog.cl:11-16).
    smooth: bool = False
    # Image textures: modulate kd by the material's map_Kd sample at
    # the hit UV (core/textures.py). Requires a scene with bound
    # textures (OBJ map_Kd auto-load or add_texture +
    # set_material_texture) and the same ids-reporting accels as
    # smooth. The reference parses map_Kd via tinyobj and never
    # samples it (tiny_obj_loader.h:124-182).
    textured: bool = False
    # Render model: 'megakernel' (reference frame semantics — one full
    # sample per step, required for the interactive loop) or
    # 'wavefront' (path regeneration, the flagship throughput model —
    # offline renders only; bit-identical to megakernel at equal
    # per-pixel spp in parity mode).
    model: str = "megakernel"
    # Environment light: the reference kernel's dormant miss-branch sky
    # code (prog.cl:367-376, commented out in the shipped build — the
    # shipped kernel breaks on miss with no contribution). False =
    # shipped parity. True = resurrect it with env_sky / env_deep
    # (defaults are the dormant code's literals); see
    # models.megakernel.EnvLight for the three miss tiers.
    env_light: bool = False
    env_sky: tuple[float, float, float] = (0.0, 0.75, 2.0)
    env_deep: tuple[float, float, float] = (1.0, 1.0, 1.0)
    # Image-based environment lighting (framework extension,
    # ops/envmap.py): an equirect radiance map lights the scene —
    # 'gradient' / 'sunsky' (procedural) or a .pfm/.png path. With
    # env_nee=True (default) one luminance-importance-sampled gather
    # runs at each diffuse vertex, MIS-split against the miss pickup.
    # Mutually exclusive with env_light (one environment at a time).
    env_map: str | None = None
    env_scale: float = 1.0
    env_nee: bool = True
    env_sample_res: tuple[int, int] = (64, 32)
    # Thin-lens depth of field (framework extension; the reference
    # camera is a pure pinhole, prog.cl:82-92): lens radius in world
    # units and focal-plane distance along the view axis. aperture 0
    # = pinhole (exact reference rays).
    dof_aperture: float = 0.0
    dof_focus: float = 0.0
    # Low-discrepancy camera jitter (framework extension, fast mode):
    # each pixel's sample sequence walks a Cranley-Patterson-rotated
    # R2 point set (ops.rng.r2_jitter) instead of hash draws —
    # QMC-class footprint coverage for anti-aliasing. Same converged
    # image; parity mode refuses it (the Lehmer stream IS the spec).
    qmc: bool = False
    # Russian-roulette path termination (framework extension,
    # wavefront model only): after this many bounces, continuing paths
    # survive with probability max-channel-throughput (floored at
    # rr_pmin) and survivors compensate by 1/p — same depth-capped
    # converged image, but dim paths die early and their lanes
    # regenerate fresh samples immediately (samples/sec win on a
    # lockstep machine). None = reference behavior (fixed depth).
    rr_start: int | None = None
    rr_pmin: float = 0.05
    # Next-event estimation with MIS (framework extension,
    # ops/nee.py): gather direct light at every diffuse vertex via one
    # shadow ray, combined with the BSDF-sampled emitter pickup by
    # balance-heuristic weights. Same converged image as the base
    # tracer at far lower variance; ~2x intersect cost per bounce.
    # False = reference estimator.
    nee: bool = False
    # Emitter SELECTION strategy for nee gathers (ops/nee.py):
    # 'power' = global power-proportional (default); 'distance' =
    # per-lane distance-aware weights — the many-light mode, analytic-
    # sphere emitters only (library.many_light_scene is the demo).
    nee_select: str = "power"
    # Shadow rays through the any-hit kernel instead of the full
    # nearest-hit intersect (tilecull_kernel.make_scene_occluded) —
    # visibility bits identical (test_tilecull), measured +39% NEE
    # throughput on the spread reference-analytic scene and -3% on
    # the enclosed cornell (docs/BENCHMARKS.md round 4). Applies to
    # nee and env_nee gathers on scenes small enough for the grouped
    # kernel; silently falls back to the nearest-hit form otherwise.
    nee_anyhit: bool = True
    # Offline multi-chip rendering: shard the framebuffer (megakernel)
    # or the lane axis (wavefront) over this many devices (0 = all
    # visible devices; 1 = single device, the default). Tile sharding
    # is bit-exact vs single device; checkpoints save gathered and
    # re-shard on load, so renders resume across device counts.
    devices: int = 1

    def validate(self) -> "RenderConfig":
        if self.width <= 0 or self.height <= 0:
            raise ValueError("width/height must be positive")
        if not (1 <= self.iterations <= self.max_iterations):
            raise ValueError(
                f"iterations must be in [1, {self.max_iterations}]"
            )
        if self.mode not in ("parity", "fast"):
            raise ValueError(f"unknown mode {self.mode!r}")
        if self.tonemap not in ("reinhard", "filmic", "none"):
            raise ValueError(f"unknown tonemap {self.tonemap!r}")
        if self.accel not in ("auto", "bruteforce", "bvh", "median",
                              "pallas", "cluster", "group", "pair",
                              "pairmx", "pairwin", "minarg",
                              "tilecull", "march", "flat"):
            raise ValueError(f"unknown accel {self.accel!r}")
        if self.model not in ("megakernel", "wavefront"):
            raise ValueError(f"unknown model {self.model!r}")
        if self.nee_select not in ("power", "distance"):
            raise ValueError(
                f"unknown nee_select {self.nee_select!r} "
                "('power' or 'distance')"
            )
        if self.devices < 0:
            raise ValueError("devices must be >= 0 (0 = all)")
        if len(self.env_sky) != 3 or len(self.env_deep) != 3:
            raise ValueError("env_sky/env_deep must be RGB 3-tuples")
        if self.env_map is not None:
            if self.env_light:
                raise ValueError(
                    "env_map and env_light are mutually exclusive "
                    "(one environment at a time)"
                )
            if self.env_scale <= 0.0:
                raise ValueError("env_scale must be > 0")
            if len(self.env_sample_res) != 2 or \
                    min(self.env_sample_res) < 1:
                raise ValueError(
                    "env_sample_res must be (Ws, Hs) positive ints"
                )
        if self.dof_aperture < 0.0:
            raise ValueError("dof_aperture must be >= 0")
        if self.dof_aperture > 0.0 and self.dof_focus <= 0.0:
            raise ValueError(
                "dof_aperture > 0 needs dof_focus > 0 (the "
                "focal-plane distance in world units)"
            )
        if self.qmc and self.mode != "fast":
            raise ValueError(
                "qmc needs mode='fast' (parity mode's per-pixel "
                "Lehmer draws are the reference spec)"
            )
        if self.rr_start is not None:
            if self.model != "wavefront":
                raise ValueError(
                    "rr_start needs model='wavefront' (the megakernel "
                    "runs its fixed bounce loop in lockstep — roulette "
                    "there adds variance and saves nothing)"
                )
            if self.rr_start < 1:
                raise ValueError("rr_start must be >= 1")
            if not (0.0 < self.rr_pmin <= 1.0):
                raise ValueError("rr_pmin must be in (0, 1]")
        return self

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "RenderConfig":
        raw: dict[str, Any] = json.loads(text)
        cam = raw.pop("camera", None)
        # JSON lists -> tuples
        for key in ("env_sky", "env_deep", "env_sample_res"):
            if key in raw:
                raw[key] = tuple(raw[key])
        cfg = cls(**raw)
        if cam is not None:
            cam["shift"] = tuple(cam.get("shift", CameraConfig().shift))
            cfg.camera = CameraConfig(**cam)
        return cfg.validate()
