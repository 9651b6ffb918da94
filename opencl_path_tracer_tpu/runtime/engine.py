"""Progressive render engine.

The TPU-native replacement for the reference's frame loop + dispatch
plumbing (Scene::render main.cpp:683-687, onIdle main.cpp:1171-1241):
owns the progressive TraceState, rebuilds the camera from the
controller each frame (Camera() per frame, main.cpp:636), resets
accumulation on input (current_sample=0 semantics — colors restart,
RNG streams continue, exactly like the reference where rnds[] is never
reseeded), and exposes realtime/offline pacing:

  * realtime: block on every frame (the glFinish-per-frame path,
    main.cpp:671-675),
  * offline: let the device queue run ahead, synchronizing every 3rd
    sample (main.cpp:677-681).

Backends ('bruteforce' | 'bvh' | 'pallas') pick the intersector; the
jitted step takes the camera as an argument so camera motion never
recompiles (only bounce-depth changes do, like the reference's
iterations kernel arg).
"""

from __future__ import annotations

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.config import RenderConfig
from opencl_path_tracer_tpu.core.camera import Camera
from opencl_path_tracer_tpu.io.checkpoint import (
    load_checkpoint, save_checkpoint,
)
from opencl_path_tracer_tpu.io.image import write_png
from opencl_path_tracer_tpu.models import megakernel
from opencl_path_tracer_tpu.ops import tonemap as tonemap_ops
from opencl_path_tracer_tpu.runtime.controller import CameraController
from opencl_path_tracer_tpu.runtime.meter import PerfMeter
from opencl_path_tracer_tpu.scene.builder import Scene


SMOOTH_ACCELS = ("bruteforce", "minarg", "tilecull", "pairwin")

# render_adaptive_auto's decision bars (calibrated on the measured
# anchor scenes, tests/test_engine.py::test_adaptive_auto_separates):
#  * SPEEDUP: predicted fixed/adaptive cost ratio from the min_spp
#    probe's per-pixel SEMs (the x3.04-measured sphere-lamp + NEE win
#    predicts 3.5; the bar keeps marginal cases on the simpler fixed
#    path). 1.15 models the checks/compaction overhead (x0.91-0.93
#    measured on scenes with nothing to harvest).
#  * ZERO_VAR: fraction of pixels whose probe variance is exactly
#    zero. Without NEE, emitter hits are rare discrete spikes — a
#    pixel that has not sampled one yet looks converged but is lying
#    (measured 0.64-0.65 liar fraction on the no-NEE cornell/lamp
#    anchors vs 0.000 with NEE), so adaptive would stop it early and
#    keep the noise. SEMs are only trusted when this is small.
ADAPTIVE_MIN_PREDICTED_SPEEDUP = 1.2
ADAPTIVE_MAX_ZERO_VAR_FRAC = 0.25
ADAPTIVE_OVERHEAD_FACTOR = 1.15


def make_intersect_fn(scene: Scene, accel: str, *, force: bool = False,
                      smooth: bool = False, textured: bool = False,
                      cam=None, iterations: int = 5):
    """Build the intersector for `accel`, min-merging the analytic
    sphere stream when the scene carries one (scene.spheres).

    smooth=True interpolates vertex shading normals at hit points
    (ops/shading.py; scene.attribs must be present — built when any
    triangle carried vn data). Needs an ids-reporting triangle
    intersector: supported accels are SMOOTH_ACCELS ('auto' resolves
    within them). Analytic spheres already have exact normals and are
    unaffected.

    textured=True returns (Hits, kd_scale) instead of Hits: per-lane
    diffuse multipliers sampled from the scene's texture atlas at the
    hit UV (core/textures.py; scene.textures + UV-bearing
    scene.attribs required). The models multiply the fetched kd
    lane-wise (models.megakernel.fetch_material). Same ids-accel
    requirement as smooth; composes with smooth=True. Sphere-stream
    winners get a multiplier of 1 (quadrics carry no UVs)."""
    if (accel == "auto" and cam is not None
            and jax.default_backend() != "cpu"
            and scene.num_triangles <= 8192):
        # Workload-sampling predictor (round 4, recalibrated round 5
        # on the enclosed dense-cornell anchor): choose the
        # tile-culling grouped kernel when the camera's actual ray
        # mix would skip enough groups (+98% on ref-workload, +90%
        # on iterations=1 previews, +85% on an open 5.9k-tri field
        # over pairwin), else minarg — which beats pairwin at every
        # measured anchor in the whole <= 8192 range
        # (tilecull_kernel.auto_small_accel's anchor table).
        from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
            auto_small_accel,
        )
        accel = auto_small_accel(scene.tris, cam,
                                 iterations=iterations)
    origin = (tuple(float(v) for v in cam.eye)
              if cam is not None else None)
    if textured:
        return _make_textured_fn(scene, accel, force=force,
                                 smooth=smooth)
    if smooth:
        # attribs alone is not enough: UV-only scenes build attribs
        # too (all-zero corner normals), and smooth shading over those
        # would silently no-op into the face-normal fallback.
        if scene.attribs is None or not _has_vertex_normals(
                scene.attribs):
            raise ValueError(
                "smooth=True but the scene has no vertex normals — "
                "build it with add_obj(smooth_normals=True), "
                "add_sphere(smooth=True), or add_triangle(vn=...)"
            )
        tri_fn = _make_smooth_tri_fn(scene, accel, force=force)
    else:
        tri_fn = _make_tri_intersect_fn(scene, accel, force=force,
                                        origin=origin)
    sphere_fn = _make_sphere_fn(scene)
    if sphere_fn is None:
        return tri_fn
    from opencl_path_tracer_tpu.ops import intersect as _isect

    def with_spheres(rays):
        # Triangle stream first: merge_hits keeps `a` on exact-t ties,
        # making the combined contract deterministic.
        return _isect.merge_hits(tri_fn(rays), sphere_fn(rays))

    return with_spheres


def _make_sphere_fn(scene: Scene):
    """Analytic-sphere intersector, or None for triangle-only scenes."""
    if scene.spheres is None:
        return None
    from opencl_path_tracer_tpu.ops import intersect as _isect
    spheres = scene.spheres
    if jax.default_backend() != "cpu":
        # The XLA (R,S)-outer-product form round-trips HBM: measured
        # 37.5 ms for 2 spheres x 2.07M rays on v5e vs ~1.3 ms for the
        # baked-constant Pallas kernel (docs/BENCHMARKS.md).
        from opencl_path_tracer_tpu.ops.pallas.sphere_kernel import (
            make_sphere_intersect,
        )
        return make_sphere_intersect(spheres)

    def sphere_fn(rays):
        return _isect.sphere_intersect(rays, spheres)

    return sphere_fn


def _make_textured_fn(scene: Scene, accel: str, *, force: bool,
                      smooth: bool):
    """(Hits, kd_scale) intersector: ids-reporting triangle stream
    (smooth-interpolated when asked), sphere merge, hit-point UVs,
    bilinear atlas sample (core/textures.py)."""
    if scene.textures is None:
        raise ValueError(
            "textured=True but the scene has no textures — bind one "
            "with add_texture + set_material_texture, or load an OBJ "
            "whose MTL has map_Kd entries (PNG)"
        )
    if scene.attribs is None:
        raise ValueError(
            "textured=True needs per-corner UVs — add_triangle(uv=...) "
            "or an OBJ with vt data"
        )
    from opencl_path_tracer_tpu.core.textures import kd_scale
    from opencl_path_tracer_tpu.ops import intersect as _isect
    from opencl_path_tracer_tpu.ops.shading import interpolate_uvs

    ids_fn = _make_ids_tri_fn(scene, accel, force=force, smooth=smooth)
    sphere_fn = _make_sphere_fn(scene)
    attribs, textures = scene.attribs, scene.textures

    def textured_fn(rays):
        tri_hits, ids = ids_fn(rays)
        if sphere_fn is None:
            hits = tri_hits
            tri_won = tri_hits.valid
        else:
            hits = _isect.merge_hits(tri_hits, sphere_fn(rays))
            # merge_hits keeps the triangle stream on exact-t ties.
            tri_won = tri_hits.valid & hits.valid & (hits.t
                                                     == tri_hits.t)
        ids2 = jnp.where(tri_won, ids, -1)
        s, t = interpolate_uvs(hits, ids2, attribs)
        ok = hits.valid & (ids2 >= 0)
        return hits, kd_scale(textures, hits.mati, s, t, ok)

    return textured_fn


def _make_ids_tri_fn(scene: Scene, accel: str, *, force: bool,
                     smooth: bool):
    """fn(rays) -> (Hits, ids): triangle intersector that reports the
    winner's original triangle index (-1 on miss), smooth-normal
    interpolated when smooth=True. Used by the textured path, which
    needs ids alive at the top level for the UV fetch (the smooth-only
    path instead folds ids away inside _make_smooth_tri_fn)."""
    on_tpu = jax.default_backend() != "cpu"
    if accel == "auto":
        if not on_tpu:
            accel = "bruteforce"
        else:
            accel = ("minarg" if scene.num_triangles <= 4096
                     else "pairwin")
    if smooth and (scene.attribs is None or not _has_vertex_normals(
            scene.attribs)):
        raise ValueError(
            "smooth=True but the scene has no vertex normals — "
            "build it with add_obj(smooth_normals=True), "
            "add_sphere(smooth=True), or add_triangle(vn=...)"
        )
    if accel == "bruteforce":
        from opencl_path_tracer_tpu.ops import intersect
        tris = scene.tris

        def ids_fn(rays):
            return intersect.first_intersect_ids(rays, tris)
    elif accel == "minarg":
        from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
            make_minarg_intersect,
        )
        ids_fn = make_minarg_intersect(
            scene.tris, with_ids=True, interpret=not on_tpu
        )
    elif accel == "tilecull":
        from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
            make_tilecull_intersect,
        )
        ids_fn = make_tilecull_intersect(
            scene.tris, with_ids=True, interpret=not on_tpu
        )
    elif accel == "pairwin":
        from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
            PAIR_TPU_WINNER, make_pair_intersect,
        )
        ids_fn = make_pair_intersect(
            scene.tris, with_ids=True, interpret=not on_tpu,
            **PAIR_TPU_WINNER,
        )
    else:
        raise ValueError(
            f"textured rendering needs an ids-reporting intersector: "
            f"accel must be one of {SMOOTH_ACCELS} (or 'auto'), "
            f"got {accel!r}"
        )
    if not smooth:
        return ids_fn
    from opencl_path_tracer_tpu.ops.shading import smooth_hit_normals
    attribs = scene.attribs

    def smooth_ids_fn(rays):
        hits, ids = ids_fn(rays)
        return smooth_hit_normals(hits, ids, attribs), ids

    return smooth_ids_fn


def _has_vertex_normals(attribs) -> bool:
    """True when any corner normal is nonzero (host-side check; the
    arrays are tiny relative to a render)."""
    import numpy as np
    return any(
        bool(np.any(np.asarray(comp)))
        for corner in (attribs.n1, attribs.n2, attribs.n3)
        for comp in corner
    )


def _make_smooth_tri_fn(scene: Scene, accel: str, *, force: bool):
    """Smooth-shading triangle intersector.

    'minarg' (and 'auto' on TPU) uses the fused Pallas kernel
    (ops/pallas/shading_kernel.py) — the XLA gather form costs ~9x a
    flat step on TPU (257 ms of gathers at 2.07M rays, job
    zr_shading_check), the fused one-hot fetch ~none. 'bruteforce'
    composes first_intersect_ids with ops.shading.smooth_hit_normals
    (gathers are cheap on CPU hosts)."""
    on_tpu = jax.default_backend() != "cpu"
    if accel == "auto":
        if not on_tpu:
            accel = "bruteforce"
        else:
            accel = ("minarg" if scene.num_triangles <= 4096
                     else "pairwin")
    if accel == "bruteforce":
        from opencl_path_tracer_tpu.ops import intersect
        from opencl_path_tracer_tpu.ops.shading import (
            smooth_hit_normals,
        )
        tris, attribs = scene.tris, scene.attribs

        def smooth_fn(rays):
            hits, ids = intersect.first_intersect_ids(rays, tris)
            return smooth_hit_normals(hits, ids, attribs)

        return smooth_fn
    if accel == "minarg":
        if scene.num_triangles > 4096:
            raise ValueError(
                f"accel='minarg' smooth tops out at 4096 triangles "
                f"(the smooth-refine kernel holds the whole one-hot "
                f"table in VMEM; ops/pallas/shading_kernel.py) — "
                f"scene has {scene.num_triangles}; use "
                "accel='pairwin' (or 'auto')."
            )
        from opencl_path_tracer_tpu.ops.pallas.shading_kernel import (
            make_smooth_minarg_intersect,
        )
        return make_smooth_minarg_intersect(
            scene.tris, scene.attribs, interpret=not on_tpu
        )
    if accel == "tilecull":
        from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
            make_tilecull_intersect,
        )
        from opencl_path_tracer_tpu.ops.shading import (
            smooth_hit_normals,
        )
        ids_fn = make_tilecull_intersect(
            scene.tris, with_ids=True, interpret=not on_tpu
        )
        attribs = scene.attribs

        def smooth_fn(rays):
            hits, ids = ids_fn(rays)
            return smooth_hit_normals(hits, ids, attribs)

        return smooth_fn
    if accel == "pairwin":
        # Large scenes: the pair intersector's with_ids surface + the
        # XLA interpolation. smooth_hit_normals gathers one (R, 17)
        # packed row per hit (~37 ms/1.33M rays on v5e, job zs8) —
        # small next to a large-scene step (~250 ms at 100k tris);
        # the fused fetch kernel cannot hold a >4096-tri table in
        # VMEM, which is why it is not used here.
        from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
            PAIR_TPU_WINNER, make_pair_intersect,
        )
        from opencl_path_tracer_tpu.ops.shading import (
            smooth_hit_normals,
        )
        ids_fn = make_pair_intersect(
            scene.tris, with_ids=True, interpret=not on_tpu,
            **PAIR_TPU_WINNER,
        )
        attribs = scene.attribs

        def smooth_fn(rays):
            hits, ids = ids_fn(rays)
            return smooth_hit_normals(hits, ids, attribs)

        return smooth_fn
    raise ValueError(
        f"smooth shading needs an ids-reporting intersector: "
        f"accel must be one of {SMOOTH_ACCELS} (or 'auto'), "
        f"got {accel!r}"
    )


def _make_tri_intersect_fn(scene: Scene, accel: str, *,
                           force: bool = False, origin=None):
    """Build the triangle intersector for `accel`.

    Footgun gating (measured, docs/BENCHMARKS.md): on TPU some backends
    are strictly dominated ('group', 'cluster'), device-unsafe ('bvh',
    'median' — the gather-per-iteration walker faulted the device
    session on the 100k-tri scene), or carry a surprising compile cost
    ('pair': ~2 min warmup at 2M rays). `force=True` (CLI
    --accel-force) overrides the dominated/unsafe refusals for
    measurement work; 'auto' never selects a gated backend.
    """
    on_tpu = jax.default_backend() != "cpu"
    if accel == "auto":
        if not on_tpu:
            accel = "bvh" if scene.num_triangles > 4096 else "bruteforce"
        else:
            # minarg up to the tilecull range bound: it beats pairwin
            # at every measured anchor <= 8192 tris (dense-cornell 5k:
            # 12.5 vs 8.2 Mrays/s, round 5; the camera-aware predictor
            # in make_intersect_fn may still upgrade to tilecull).
            accel = (
                "minarg" if scene.num_triangles <= 8192 else "pairwin"
            )
            if accel == "pairwin":
                print(
                    f"# accel auto -> pair/winner ({scene.num_triangles}"
                    " tris): expect a ~3 min first-use compile on TPU"
                    " (cached across runs via the persistent"
                    " compilation cache; docs/BENCHMARKS.md)",
                    file=sys.stderr,
                )
    if on_tpu and not force:
        dominated = {
            "group": "measured slower than 'pallas'/'pair' on every "
                     "target scene (sorted_intersect.py docstring)",
            "cluster": "strictly dominated by 'pair' "
                       "(docs/BENCHMARKS.md)",
        }
        unsafe = {
            "bvh": "gather-per-iteration walker faulted the TPU device "
                   "session on large scenes (accel/traverse.py)",
            "median": "same device-session risk as 'bvh' on TPU",
        }
        if accel in unsafe:
            raise ValueError(
                f"accel={accel!r} is refused on TPU: {unsafe[accel]}. "
                "Pass force=True (CLI: --accel-force) to override."
            )
        if accel in dominated:
            print(
                f"# WARNING: accel={accel!r} on TPU is {dominated[accel]}"
                " — use 'pair' or 'pallas'; --accel-force silences this",
                file=sys.stderr,
            )
    if accel == "minarg":
        from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
            make_minarg_intersect,
        )
        return make_minarg_intersect(
            scene.tris, interpret=jax.default_backend() == "cpu"
        )
    if accel == "tilecull":
        from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
            make_tilecull_intersect,
        )
        return make_tilecull_intersect(
            scene.tris, origin=origin,
            interpret=jax.default_backend() == "cpu"
        )
    if accel == "march":
        from opencl_path_tracer_tpu.ops.pallas.march_kernel import (
            make_march_intersect,
        )
        isect, _rt = make_march_intersect(
            scene.tris, interpret=jax.default_backend() == "cpu"
        )
        return isect
    if accel == "flat":
        from opencl_path_tracer_tpu.ops.pallas.flat_march import (
            make_flat_march_intersect,
        )
        isect, _rt = make_flat_march_intersect(
            scene.tris, interpret=jax.default_backend() == "cpu"
        )
        return isect
    if accel == "group":
        from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
            make_group_intersect,
        )
        return make_group_intersect(
            scene.tris, interpret=jax.default_backend() == "cpu"
        )
    if accel in ("pair", "pairmx", "pairwin"):
        from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
            PAIR_TPU_WINNER, make_pair_intersect,
        )
        kw = {}
        if accel == "pairmx":
            # MXU pairs round (pair v5): trp=512 keeps the per-visit
            # VMEM footprint (dots + temporaries) inside the scoped
            # budget at cs=512.
            kw = dict(mxu=True, trp=512)
        elif accel == "pairwin":
            # Round-3 TPU-swept production config (4.53 Mrays/s e2e
            # vs v4's 3.24 on the official stress workload, 0 hit
            # flips; see PAIR_TPU_WINNER).
            kw = dict(PAIR_TPU_WINNER)
        return make_pair_intersect(
            scene.tris, interpret=jax.default_backend() == "cpu", **kw
        )
    if accel == "cluster":
        from opencl_path_tracer_tpu.ops.pallas.cluster_kernel import (
            make_cluster_intersect,
        )
        return make_cluster_intersect(
            scene.tris, interpret=jax.default_backend() == "cpu"
        )
    if accel == "bruteforce":
        from opencl_path_tracer_tpu.ops import intersect
        return functools.partial(
            intersect.first_intersect, tris=scene.tris
        )
    if accel == "bvh":
        from opencl_path_tracer_tpu.accel import (
            build_lbvh, make_bvh_intersect,
        )
        return make_bvh_intersect(build_lbvh(scene.tris, leaf_size=4))
    if accel == "median":
        # The reference's own structure: one midpoint-mean tree per
        # object (main.cpp:536-551) under an object hierarchy.
        from opencl_path_tracer_tpu.accel import (
            build_median_tree, make_bvh_intersect,
        )
        return make_bvh_intersect(build_median_tree(
            scene.tris, split="midpoint_mean",
            object_ranges=scene.object_ranges,
        ))
    if accel == "pallas":
        from opencl_path_tracer_tpu.ops.pallas import make_pallas_intersect
        interpret = jax.default_backend() == "cpu"
        return make_pallas_intersect(scene.tris, interpret=interpret)
    raise ValueError(f"unknown accel {accel!r}")


class RenderEngine:
    def __init__(self, scene: Scene, config: RenderConfig,
                 intersect_fn=None) -> None:
        self.scene = scene
        self.cfg = config.validate()
        self.controller = CameraController(config)
        self.meter = PerfMeter()
        self.intersect_fn = intersect_fn or make_intersect_fn(
            scene, config.accel, force=config.accel_force,
            smooth=config.smooth, textured=config.textured,
            cam=self.controller.camera(config.width, config.height),
            iterations=config.iterations,
        )
        # Dynamic accel re-selection context (VERDICT r4 #4): the
        # workload-sampling predictor's choice depends on bounce depth
        # (iterations==1 previews measured +90% on tilecull; deep
        # bounces are scene-dependent), and the reference changes
        # iterations LIVE ('+'/'-', main.cpp:1043-1054) — so when the
        # controller's depth changes, auto re-picks before building
        # the new step. Only for auto on a non-CPU backend within the
        # predictor's scene range; a caller-injected intersect_fn is
        # never replaced.
        self._accel_auto = (
            intersect_fn is None and config.accel == "auto"
            and jax.default_backend() != "cpu"
            and scene.num_triangles <= 8192
        )
        self._accel_iters = config.iterations
        self._accel_by_iters = {config.iterations: self.intersect_fn}
        self.num_pixels = config.width * config.height
        self._key = jax.random.key(config.seed)
        # Optional environment light (the dormant prog.cl:367-376 sky
        # code); None keeps shipped-kernel parity in every model.
        if config.env_map is not None:
            # Image-based environment (ops/envmap.py): host-built
            # once; env_nee wires the importance-sampled gather + MIS.
            from opencl_path_tracer_tpu.ops.envmap import load_envmap
            self.env = load_envmap(
                config.env_map, scale=config.env_scale,
                sample_res=tuple(config.env_sample_res),
                nee=config.env_nee,
            )
        else:
            self.env = (
                megakernel.EnvLight(sky=tuple(config.env_sky),
                                    deep=tuple(config.env_deep))
                if config.env_light else None
            )
        # Optional next-event estimation (ops/nee.py): the emitter
        # table is host-built once per scene; None = reference
        # estimator (emitter pickup only).
        if config.nee:
            from opencl_path_tracer_tpu.ops.nee import (
                build_emitter_table,
            )
            self.nee = build_emitter_table(
                scene.tris, scene.mats, scene.spheres,
                select=config.nee_select,
            )
        else:
            self.nee = None
        # Shadow rays through the any-hit kernel (bit-identical
        # visibility, measured +39% NEE on reference-analytic): built
        # only when some gather will actually trace shadow rays.
        self.occluded = None
        wants_shadow = (self.nee is not None
                        or (config.env_map is not None
                            and config.env_nee))
        if wants_shadow and config.nee_anyhit:
            from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel \
                import make_scene_occluded
            self.occluded = make_scene_occluded(
                scene, interpret=jax.default_backend() == "cpu"
            )  # None when the scene exceeds the grouped kernel
        # Russian-roulette config (wavefront only; config.validate
        # enforces the model).
        self.rr = ((config.rr_start, config.rr_pmin)
                   if config.rr_start is not None else None)
        # Thin-lens depth of field (aperture 0 = exact pinhole).
        self.dof = ((config.dof_aperture, config.dof_focus)
                    if config.dof_aperture > 0.0 else None)
        if config.devices != 1:
            from opencl_path_tracer_tpu.parallel.mesh import (
                make_render_mesh,
            )
            self.mesh = make_render_mesh(config.devices or None)
            nd = self.mesh.devices.size
            if self.num_pixels % nd:
                raise ValueError(
                    f"{config.width}x{config.height} = "
                    f"{self.num_pixels} pixels must divide evenly "
                    f"over {nd} devices"
                )
        else:
            self.mesh = None
        if config.model == "wavefront":
            from opencl_path_tracer_tpu.models import wavefront
            cam0 = self.controller.camera(config.width, config.height)
            self.state = wavefront.init_wavefront(
                cam0, self.num_pixels,
                seed=config.seed, mode=config.mode, key=self._key,
                qmc=config.qmc,
                dof=((config.dof_aperture, config.dof_focus)
                     if config.dof_aperture > 0.0 else None),
            )
            self._wf_pose = self.controller._cam_key
        else:
            self.state = megakernel.init_state(
                self.num_pixels, config.seed)
        if self.mesh is not None:
            self.state = self._shard(self.state)
        self._steps: dict[int, object] = {}
        self._rays_traced = 0.0
        self._rays_per_sample = None
        # Host mirror of state.sample (trace_sample adds exactly 1 per
        # step): reading the device counter every frame costs a full
        # backend round-trip BEFORE the frame's blocking sync — through
        # a tunneled backend that serialized every frame on two RTTs.
        self._sample_host = 0

    def _shard(self, state):
        """Place a (mega/wavefront) state sharded over self.mesh."""
        from opencl_path_tracer_tpu.parallel.shard import (
            shard_state, shard_wavefront_state,
        )
        if self.cfg.model == "wavefront":
            return shard_wavefront_state(state, self.mesh)
        return shard_state(state, self.mesh)

    def _maybe_repick_accel(self, iterations: int) -> None:
        """Re-run the auto accel choice when the live bounce depth
        changes (the reference's '+'/'-' keys, main.cpp:1043-1054).
        Decisions are cached per depth; steps already built at other
        depths keep the intersector they were built with."""
        if not self._accel_auto or iterations == self._accel_iters:
            return
        fn = self._accel_by_iters.get(iterations)
        if fn is None:
            fn = make_intersect_fn(
                self.scene, "auto", force=self.cfg.accel_force,
                smooth=self.cfg.smooth, textured=self.cfg.textured,
                cam=self.controller.camera(self.cfg.width,
                                           self.cfg.height),
                iterations=iterations,
            )
            self._accel_by_iters[iterations] = fn
        self.intersect_fn = fn
        self._accel_iters = iterations

    # --- jitted steps ---------------------------------------------------
    def _step(self, iterations: int):
        self._maybe_repick_accel(iterations)
        if iterations not in self._steps:
            mode = self.cfg.mode
            key = self._key

            def step_raw(state, cam: Camera):
                return megakernel.trace_sample(
                    cam, self.scene.mats, state,
                    intersect_fn=self.intersect_fn,
                    iterations=iterations, mode=mode, key=key,
                    env=self.env, nee=self.nee, qmc=self.cfg.qmc,
                    dof=self.dof, occluded_fn=self.occluded,
                )

            # Lift scene packs to runtime args: closure-captured packs
            # lower to dense literals and the module grows with the
            # scene (~100 MB at 100k tris; >=300k fails the remote
            # compile service on size). utils/constlift.py.
            from opencl_path_tracer_tpu.utils.constlift import (
                lift_consts,
            )
            example_cam = self.controller.camera(
                self.cfg.width, self.cfg.height
            )
            lifted, consts = lift_consts(
                step_raw, self.state, example_cam
            )
            jitted = jax.jit(lifted)

            def step(state, cam):
                return jitted(consts, state, cam)

            self._steps[iterations] = step
        return self._steps[iterations]

    def _wf_step(self, iterations: int, variance=None):
        """Jitted wavefront k-step runner (model='wavefront'). The
        per-pixel sample cap AND the step count ride as runtime args
        (fori_loop with a traced trip count), so successive render()
        calls never recompile and each macro-step is ONE dispatch.
        variance: optional (tol, min_samples) enabling the adaptive
        stop rule inside the step (render_adaptive)."""
        self._maybe_repick_accel(iterations)
        ck = ("wf", iterations, variance)
        if ck not in self._steps:
            from opencl_path_tracer_tpu.models import wavefront
            from opencl_path_tracer_tpu.utils.constlift import (
                lift_consts,
            )
            mode = self.cfg.mode
            key = self._key
            vkw = ({} if variance is None else
                   dict(variance_tol=variance[0],
                        min_samples=variance[1]))

            def run_raw(state, cam: Camera, cap, k):
                def body(_, st):
                    return wavefront.wavefront_step(
                        cam, self.scene.mats, st,
                        intersect_fn=self.intersect_fn,
                        iterations=iterations, mode=mode, key=key,
                        max_samples=cap, env=self.env,
                        nee=self.nee, rr=self.rr, qmc=self.cfg.qmc,
                        dof=self.dof, occluded_fn=self.occluded,
                        **vkw,
                    )
                return jax.lax.fori_loop(0, k, body, state)

            example_cam = self.controller.camera(
                self.cfg.width, self.cfg.height
            )

            # The lifted jaxpr is shape-specialized to the state's
            # lane count, and render_adaptive's compaction ladder
            # HALVES that count as pixels converge — replaying the
            # full-size jaxpr on a halved state is an MLIR verifier
            # error (found on TPU 2026-08-20; CPU tests never halve:
            # min_bucket=4096 exceeds their lane counts). Re-lift per
            # lane count: tracing is abstract (host-only), and the
            # per-size XLA retrace is the ladder's documented cost.
            by_size: dict[int, tuple] = {}

            def run(state, cam, cap, k):
                nlanes = state.samples.shape[0]
                if nlanes not in by_size:
                    lifted, consts = lift_consts(
                        run_raw, state, example_cam,
                        jax.numpy.int32(1), jax.numpy.int32(1),
                    )
                    by_size[nlanes] = (jax.jit(lifted), consts)
                jitted, consts = by_size[nlanes]
                return jitted(consts, state, cam, cap,
                              jax.numpy.int32(k))

            self._steps[ck] = run
        return self._steps[ck]

    def _tiled_step(self, iterations: int):
        """Framebuffer-tiled megakernel step over self.mesh (the
        camera is baked per pose — offline renders hold it fixed)."""
        ck = ("tiled", iterations, self.controller._cam_key)
        if ck not in self._steps:
            from opencl_path_tracer_tpu.parallel.shard import (
                make_tiled_step,
            )
            cam = self.controller.camera(self.cfg.width,
                                         self.cfg.height)
            self._steps[ck] = make_tiled_step(
                cam, self.scene.mats, self.mesh,
                intersect_fn=self.intersect_fn, iterations=iterations,
                mode=self.cfg.mode, key=self._key, env=self.env,
                nee=self.nee, qmc=self.cfg.qmc, dof=self.dof,
                occluded_fn=self.occluded,
            )
        return self._steps[ck]

    def _tiled_wf_step(self, iterations: int, target: int,
                       variance=None):
        ck = ("wft", iterations, self.controller._cam_key, target,
              variance)
        if ck not in self._steps:
            from opencl_path_tracer_tpu.parallel.shard import (
                make_tiled_wavefront_step,
            )
            cam = self.controller.camera(self.cfg.width,
                                         self.cfg.height)
            vkw = ({} if variance is None else
                   dict(variance_tol=variance[0],
                        min_samples=variance[1]))
            self._steps[ck] = make_tiled_wavefront_step(
                cam, self.scene.mats, self.mesh,
                intersect_fn=self.intersect_fn, iterations=iterations,
                mode=self.cfg.mode, key=self._key, max_samples=target,
                env=self.env, nee=self.nee, rr=self.rr,
                qmc=self.cfg.qmc, dof=self.dof,
                occluded_fn=self.occluded, **vkw,
            )
        return self._steps[ck]

    # --- frame API (the onIdle loop) -------------------------------------
    def frame(self, dt: float = 0.0, sync: bool = True) -> None:
        """One interactive frame: integrate input, maybe reset
        accumulation, trace one sample."""
        if self.cfg.model == "wavefront":
            raise ValueError(
                "the interactive loop needs model='megakernel' (the "
                "reference's one-sample-per-frame semantics); "
                "model='wavefront' is for offline render()"
            )
        if self.mesh is not None:
            raise ValueError(
                "the interactive loop is single-device; devices>1 is "
                "for offline render()"
            )
        ctl = self.controller
        ctl.update(dt)
        if ctl.consume_reset():
            self.reset_accumulation()
        cam = ctl.camera(self.cfg.width, self.cfg.height)
        st = ctl.state
        step = self._step(st.iterations)
        self.state = step(self.state, cam)
        self._sample_host += 1
        sample = self._sample_host
        if sync and (st.real_time or sample % 3 == 0):
            # realtime blocks per frame; offline syncs every 3rd sample
            # (main.cpp:670-681). sync=False callers (the viewer's
            # double-buffered loop) provide their own backpressure —
            # the previous frame's pixel download.
            jax.block_until_ready(self.state.colors[0])
        self.meter.tick(
            sample, iterations=st.iterations, real_time=st.real_time,
            rays_traced=self.estimated_rays(sample),
        )

    def render(self, spp: int, progress: bool = True,
               autosave_every: int = 0,
               autosave_path: str | None = None) -> None:
        """Offline render: accumulate spp samples from the current
        state.

        autosave_every > 0 checkpoints the progressive state every that
        many samples (crash-safe long renders — the recovery mechanism
        the reference lacks entirely, SURVEY.md §5). Writes to a temp
        file and renames, so a checkpoint is never half-written.

        model='wavefront': path-regeneration steps run until EVERY
        pixel has accumulated spp more samples (capped there exactly,
        so parity-mode results stay bit-comparable to the megakernel);
        autosave cadence is per convergence check, not per sample."""
        if self.cfg.model == "wavefront":
            return self._render_wavefront(
                spp, progress=progress, autosave_every=autosave_every,
                autosave_path=autosave_path,
            )
        cam = self.controller.camera(self.cfg.width, self.cfg.height)
        if self.mesh is not None:
            tstep = self._tiled_step(self.controller.state.iterations)

            def step(state, _cam):
                new, _lum = tstep(state)
                return new
        else:
            step = self._step(self.controller.state.iterations)
        for i in range(spp):
            self.state = step(self.state, cam)
            self._sample_host += 1
            if (i + 1) % 3 == 0 or i == spp - 1:
                jax.block_until_ready(self.state.colors[0])
            if autosave_every and autosave_path and (
                (i + 1) % autosave_every == 0
            ):
                import os
                tmp = autosave_path + ".tmp.npz"
                save_checkpoint(tmp, self.state, meta={
                    "width": self.cfg.width, "height": self.cfg.height,
                    "mode": self.cfg.mode, "seed": self.cfg.seed,
                })
                os.replace(tmp, autosave_path)
            if progress:
                self.meter.tick(
                    self._sample_host,
                    iterations=self.controller.state.iterations,
                    real_time=False,
                    rays_traced=self.estimated_rays(self._sample_host),
                )
        jax.block_until_ready(self.state.colors)

    def _render_wavefront(self, spp: int, progress: bool,
                          autosave_every: int,
                          autosave_path: str | None) -> None:
        import jax.numpy as jnp

        if self.controller._cam_key != self._wf_pose:
            # The in-flight rays belong to the old pose; reference
            # semantics reset accumulation on any camera change anyway.
            self.reset_accumulation()
        cam = self.controller.camera(self.cfg.width, self.cfg.height)
        iters = self.controller.state.iterations
        target = self._sample_host + spp
        if self.mesh is not None:
            tstep = self._tiled_wf_step(iters, target)

            def run(state, _cam, _cap, k):
                for _ in range(int(k)):
                    state, _lum = tstep(state)
                return state
        else:
            run = self._wf_step(iters)
        cap = jax.numpy.int32(target)
        # A lane finishes a sample in [1, iters] steps (terminate +
        # regenerate happen in one step), so (target - floor) steps
        # are always useful and spp * iters bounds the whole render:
        # geometric convergence with ONE host round-trip per check.
        max_steps = spp * iters + 16
        done = 0
        # Per-DISPATCH step cap, time-calibrated: the k-step runner is
        # ONE device program, and the remote runtime kills programs
        # that run too long (measured: a 256-step NEE dispatch at
        # 1536x864 ~ 40-65 s of device time crashed the TPU worker
        # process; ~19 s dispatches survive). Start small, measure the
        # per-step rate at the floor-fetch sync, then target ~8 s per
        # dispatch — the ~50 ms dispatch RTT stays <1% overhead.
        k_cap = 16
        import time as _time
        t_last = _time.time()
        k_prev = 0
        while done < max_steps:
            floor = int(jax.device_get(jnp.min(self.state.samples)))
            if k_prev:
                dt = max(_time.time() - t_last, 1e-3)
                rate = k_prev / dt  # steps/sec incl. queue drain
                k_cap = int(min(max(8.0 * rate, 8), 512))
            t_last = _time.time()
            if autosave_every and autosave_path and done:
                import os
                tmp = autosave_path + ".tmp.npz"
                save_checkpoint(tmp, self.state, meta={
                    "width": self.cfg.width, "height": self.cfg.height,
                    "mode": self.cfg.mode, "seed": self.cfg.seed,
                })
                os.replace(tmp, autosave_path)
            if progress and done:
                self.meter.tick(
                    floor, iterations=iters, real_time=False,
                    rays_traced=self._rays_traced,
                )
            if floor >= target:
                break
            k = min(max(target - floor, 1), max_steps - done, k_cap)
            self.state = run(self.state, cam, cap, k)
            k_prev = k
            done += k
            self._rays_traced += float(k * self.num_pixels)
        else:
            floor = int(jax.device_get(jnp.min(self.state.samples)))
            if floor < target:
                raise RuntimeError(
                    f"wavefront render stuck at {floor}/{target} spp "
                    f"after {done} steps"
                )
        self._sample_host = target
        jax.block_until_ready(self.state.colors)

    def render_adaptive(self, tol: float, max_spp: int,
                        min_spp: int = 8, progress: bool = True) -> None:
        """Adaptive offline render (model='wavefront'): every pixel
        gets min_spp..max_spp samples, idling once its relative
        luminance SEM is within `tol`
        (models.wavefront.converged_mask). The reference has no
        adaptivity (every pixel gets every sample, prog.cl:379).

        Works single-device and mesh-sharded (cfg.devices > 1): the
        stop rule is per-lane local; over a mesh, compaction sorts and
        parks lanes PER SHARD (uniform shapes keep shard_map legal),
        halving when even the busiest shard's open count allows. Lane
        order is semantically free, so per-shard vs global parking
        changes no lane's result — parity mode stays bit-identical to
        the single-device adaptive render."""
        import jax.numpy as jnp
        from opencl_path_tracer_tpu.models import wavefront

        if self.cfg.model != "wavefront":
            raise ValueError(
                "adaptive rendering needs model='wavefront' (per-"
                "pixel sample counts; the megakernel steps every "
                "pixel in lockstep)"
            )
        if self.controller._cam_key != self._wf_pose:
            self.reset_accumulation()
        cam = self.controller.camera(self.cfg.width, self.cfg.height)
        iters = self.controller.state.iterations
        variance = (float(tol), int(min_spp))
        n_dev = 1 if self.mesh is None else self.mesh.devices.size
        if self.mesh is None:
            run_k = self._wf_step(iters, variance=variance)
            cap = jax.numpy.int32(max_spp)
        else:
            from opencl_path_tracer_tpu.parallel.shard import (
                make_shard_sort_open_first, make_shard_split,
            )
            tiled = self._tiled_wf_step(iters, max_spp,
                                        variance=variance)
            if ("shard_sort",) not in self._steps:
                self._steps[("shard_sort",)] = (
                    make_shard_sort_open_first(self.mesh))
            shard_sort = self._steps[("shard_sort",)]
        # Convergence-check cadence: every check costs a host
        # round-trip (per-shard open counts) — through a tunneled TPU
        # backend that RTT dominates small-frame adaptive renders
        # (measured, docs/BENCHMARKS.md session 10). ~6 samples'
        # worth of steps between checks keeps the sync count ~40 for
        # a 256-spp render; parking a handful of steps later than
        # optimal is negligible next to that.
        chunk = max(iters * 6, 24)
        max_steps = max_spp * iters + chunk
        # Same per-dispatch watchdog cap as _render_wavefront: the
        # single-device run_k is one fori_loop program; keep each
        # dispatch ~8 s (measured: ~40 s device programs get killed
        # by the remote runtime).
        k_cap = 16
        import time as _time
        t_last = _time.time()
        k_prev = 0
        # Compaction: when few lanes are open, permute them to the
        # front and halve the live bucket (jit retraces once per
        # power-of-two size); the converged tail parks untouched.
        # Idle lanes otherwise still pay full-width intersection on a
        # lockstep machine — this is where adaptivity actually saves.
        live = self.state
        parked = []
        bucket = live.samples.shape[0] // n_dev  # per-shard lanes
        done = 0
        while done < max_steps:
            mask = wavefront.converged_mask(
                live.samples, live.colors, live.lum_m2, tol, min_spp,
            ) | (live.samples >= max_spp)
            # Halving decisions key on the BUSIEST shard (uniform
            # per-shard shapes); single device = one "shard".
            per_shard_open = jnp.sum(
                (~mask).reshape(n_dev, -1), axis=1)
            n_open = int(jax.device_get(jnp.max(per_shard_open)))
            if k_prev and self.mesh is None:
                dt = max(_time.time() - t_last, 1e-3)
                k_cap = int(min(max(8.0 * (k_prev / dt), 8), 512))
            t_last = _time.time()
            if progress and done:
                self.meter.tick(
                    int(jax.device_get(jnp.min(live.samples))),
                    iterations=iters, real_time=False,
                    rays_traced=self._rays_traced,
                )
            if n_open == 0:
                break
            target = bucket
            while (target // 2 >= max(n_open, 4096)
                   and target % 2 == 0):
                target //= 2
            if target < bucket:
                if self.mesh is None:
                    live = wavefront.sort_open_first(live, ~mask)
                    live, tail = wavefront.state_split(live, target)
                else:
                    live = shard_sort(live, ~mask)
                    sk = ("shard_split", target)
                    if sk not in self._steps:
                        self._steps[sk] = make_shard_split(
                            self.mesh, target)
                    live, tail = self._steps[sk](live)
                parked.append(tail)
                bucket = target
            # Check cadence: start at `chunk` steps between
            # convergence checks; once a dispatch has been timed,
            # the time-targeted k_cap OWNS the cadence — it can grow
            # past chunk when steps are cheap (small buckets step in
            # ~ms; holding the fixed 24-step cadence there spent
            # ~33 s of a 55 s adaptive render on host round-trips —
            # measured 2026-08-20, v5e through the tunnel) AND shrink
            # below it when steps are expensive, keeping each
            # dispatch ~8 s under the ~40 s remote-runtime watchdog
            # (same bound as _render_wavefront; flooring at chunk
            # here would let expensive-step scenes blow through it).
            k = min(max_steps - done,
                    (k_cap if k_prev else chunk)
                    if self.mesh is None else chunk)
            if self.mesh is None:
                live = run_k(live, cam, cap, k)
            else:
                # Each tiled call is its own dispatch — no watchdog
                # exposure.
                for _ in range(k):
                    live, _lum = tiled(live)
            k_prev = k
            done += k
            self._rays_traced += float(k * bucket * n_dev)
        self.state = (wavefront.state_concat([live] + parked)
                      if parked else live)
        self._sample_host = int(
            jax.device_get(jnp.min(self.state.samples)))
        jax.block_until_ready(self.state.colors)

    def adaptive_prediction(self, tol: float, max_spp: int,
                            min_spp: int = 8) -> tuple[float, float]:
        """(predicted_speedup, zero_var_frac) of adaptive-vs-fixed on
        the CURRENT state's per-pixel SEMs. Meaningful after a
        variance-tracked probe (render_adaptive to the min_spp
        floor). predicted_speedup = fixed cost (max_spp everywhere) /
        modeled adaptive cost (each pixel runs to tol or the cap,
        x1.15 check/compaction overhead). zero_var_frac = pixels
        whose probe variance is exactly zero — without NEE these are
        unsampled-spike liars, not converged pixels, and make the
        prediction untrustworthy (see the module constants)."""
        st = self.state
        n = np.asarray(jax.device_get(st.samples), np.float64)
        lum = (0.2126 * np.asarray(jax.device_get(st.colors[0]),
                                   np.float64)
               + 0.7152 * np.asarray(jax.device_get(st.colors[1]),
                                     np.float64)
               + 0.0722 * np.asarray(jax.device_get(st.colors[2]),
                                     np.float64))
        m2 = np.asarray(jax.device_get(st.lum_m2), np.float64)
        sem = np.sqrt(np.maximum(m2, 0.0)
                      / np.maximum(n * (n - 1.0), 1.0))
        rel = sem / (lum + 0.05)  # converged_mask's black floor
        zero_var_frac = float(np.mean(m2 <= 1e-12))
        # sem^2 ~ 1/n: samples needed to bring rel SEM to tol.
        need = np.clip(n * (rel / tol) ** 2, float(min_spp),
                       float(max_spp))
        speedup = float(max_spp
                        / (ADAPTIVE_OVERHEAD_FACTOR * need.mean()))
        return speedup, zero_var_frac

    def render_adaptive_auto(self, max_spp: int, tol: float = 0.05,
                             min_spp: int = 8, progress: bool = True,
                             ) -> tuple[str, float, float]:
        """Adaptive sampling only where it measurably pays (VERDICT
        r4 #8): render the min_spp floor with variance tracking,
        predict the adaptive win from the probe's SEMs, then continue
        adaptively when the prediction clears the calibrated bars and
        with the fixed-budget renderer otherwise. Returns (decision,
        predicted_speedup, zero_var_frac); decision is 'adaptive' or
        'fixed'.

        The reference spends samples uniformly (progressive average,
        prog.cl:379); spending them where variance lives is this
        rebuild's advantage — but ONLY where the probe's SEMs are
        trustworthy AND heterogeneous (the x3.04-measured win case is
        NEE + a small emitter): on uniform scenes the checks and
        compaction cost x0.91-0.93 of fixed throughput, and without
        NEE the spiky emitter-hit variance makes early SEMs lie."""
        self.render_adaptive(tol, max_spp=min_spp, min_spp=min_spp,
                             progress=progress)
        speedup, zero_var = self.adaptive_prediction(
            tol, max_spp, min_spp)
        if (speedup >= ADAPTIVE_MIN_PREDICTED_SPEEDUP
                and zero_var <= ADAPTIVE_MAX_ZERO_VAR_FRAC):
            self.render_adaptive(tol, max_spp=max_spp,
                                 min_spp=min_spp, progress=progress)
            return "adaptive", speedup, zero_var
        self.render(max_spp - min_spp, progress=progress)
        return "fixed", speedup, zero_var

    def reset_accumulation(self) -> None:
        """current_sample = 0 (main.cpp:1100-1148): restart averaging,
        keep the RNG streams running (rnds[] is never reseeded)."""
        if self.cfg.model == "wavefront":
            from opencl_path_tracer_tpu.models import wavefront
            cam = self.controller.camera(self.cfg.width,
                                         self.cfg.height)
            self.state = wavefront.init_wavefront(
                cam, self.num_pixels, seed=self.cfg.seed,
                mode=self.cfg.mode, key=self._key, qmc=self.cfg.qmc,
                dof=self.dof,
            )
            self._wf_pose = self.controller._cam_key
            self._sample_host = 0
            if self.mesh is not None:
                self.state = self._shard(self.state)
            return
        self.state = megakernel.TraceState(
            colors=self.state.colors,
            rng_state=self.state.rng_state,
            sample=jax.numpy.int32(0),
        )
        self._sample_host = 0
        if self.mesh is not None:
            self.state = self._shard(self.state)

    @property
    def _colors_np(self) -> np.ndarray:
        if self.cfg.model == "wavefront":
            from opencl_path_tracer_tpu.models import wavefront
            return np.asarray(
                wavefront.colors_by_pixel(self.state, self.num_pixels)
            )
        return np.asarray(megakernel.colors_array(self.state))

    def estimated_rays(self, samples: int) -> float:
        """Rays traced so far, using a one-off instrumented calibration."""
        if self.cfg.model == "wavefront":
            # Exact, not estimated: every wavefront step traces one
            # ray per lane (path regeneration keeps lanes live).
            return self._rays_traced
        if self._rays_per_sample is None:
            cam = self.controller.camera(self.cfg.width, self.cfg.height)
            instrumented = jax.jit(functools.partial(
                megakernel.trace_sample,
                intersect_fn=self.intersect_fn,
                iterations=self.controller.state.iterations,
                mode=self.cfg.mode, key=self._key, with_stats=True,
                env=self.env, nee=self.nee,
            ))
            _, stats = instrumented(cam, self.scene.mats, self.state)
            self._rays_per_sample = float(stats["rays_traced"])
        return self._rays_per_sample * samples

    # --- output / persistence --------------------------------------------
    def display_u8(self) -> np.ndarray:
        """(H, W, 3) uint8 display frame: tonemap + quantize ON
        DEVICE, one small host fetch — the viewer's hot path. The
        f32 image() path moves ~3 full-precision copies of the frame
        across the host link per display (download, re-upload for the
        tonemap, download again; ~33 MB at 720p) — measured round 4,
        it capped the tunneled viewer at ~1 fps. This path fetches
        4x less in ONE transfer. Mesh-sharded states fall back to
        image() (the gather path owns their layout)."""
        dev = self.display_u8_device()
        if dev is None:
            from opencl_path_tracer_tpu.io.image import to_uint8
            return to_uint8(self.image())
        return np.asarray(dev)[::-1]

    def display_u8_device(self) -> "jax.Array | None":
        """Enqueue the device-side tonemap+quantize for the CURRENT
        state and return the bottom-up (H, W, 3) uint8 DEVICE array
        without fetching. The viewer's double-buffered loop starts the
        host copy asynchronously (copy_to_host_async) and only blocks
        on it one frame later, overlapping frame N's compute with
        frame N-1's download — through a tunneled backend that turns
        2 RTTs/frame into 1 (VERDICT r4 #7). np.asarray(dev)[::-1]
        yields exactly display_u8()'s frame. Returns None for
        mesh-sharded states (the gather path owns their layout)."""
        if self.mesh is not None:
            return None
        ck = ("disp_u8", self.cfg.model)
        if ck not in self._steps:
            kind = self.cfg.tonemap
            h, w = self.cfg.height, self.cfg.width
            def quantize(img):
                # Mirror io.image.to_uint8 bit-for-bit: NaNs (the
                # reference's 0/0 tonemap quirk) clamp to 0, +inf
                # to 255.
                img = jnp.nan_to_num(img, nan=0.0, posinf=1.0,
                                     neginf=0.0)
                return (jnp.clip(img, 0.0, 1.0) * 255.0
                        + 0.5).astype(jnp.uint8)

            if self.cfg.model == "wavefront":
                n_px = self.num_pixels
                # The lanes == n_px fast path scatters with .set,
                # which is underspecified under duplicate pixel ids —
                # verify ONCE here (cache-build time) that the
                # current state's binding really is a permutation;
                # engine-built states always are, but a caller-
                # injected state might not be.
                one_to_one = (
                    self.state.samples.shape[0] == n_px
                    and int(np.unique(
                        np.asarray(self.state.pixel)).size) == n_px
                )

                @jax.jit
                def to_u8(state):
                    # Jittable twin of wavefront.colors_by_pixel.
                    # Engine states bind lanes to pixels 1:1 (a
                    # permutation, verified above), so the unsort is
                    # a set-scatter — bit-exact to the host fast
                    # path. The weighted multi-lane form accumulates
                    # in f32 (display-precision; the host path's f64
                    # matters only for file output, not u8 frames).
                    if one_to_one and state.samples.shape[0] == n_px:
                        chans = [
                            jnp.zeros((n_px,), jnp.float32).at[
                                state.pixel].set(state.colors[k])
                            for k in range(3)
                        ]
                    else:
                        wgt = state.samples.astype(jnp.float32)
                        den = jnp.zeros((n_px,), jnp.float32).at[
                            state.pixel].add(wgt)
                        chans = [
                            jnp.zeros((n_px,), jnp.float32).at[
                                state.pixel].add(wgt
                                                 * state.colors[k])
                            / jnp.maximum(den, 1.0)
                            for k in range(3)
                        ]
                    img = jnp.stack(chans, -1).reshape(h, w, 3)
                    return quantize(tonemap_ops.apply(img, kind))
            else:
                @jax.jit
                def to_u8(state):
                    img = jnp.stack(state.colors, -1).reshape(h, w, 3)
                    return quantize(tonemap_ops.apply(img, kind))

            self._steps[ck] = to_u8
        return self._steps[ck](self.state)

    def image(self, apply_tonemap: bool | str = True) -> np.ndarray:
        """(H, W, 3) display image, y flipped to top-down raster order
        (the reference framebuffer is GL bottom-up)."""
        colors = self._colors_np.reshape(
            self.cfg.height, self.cfg.width, 3
        )
        if apply_tonemap:
            kind = (
                self.cfg.tonemap if apply_tonemap is True
                else apply_tonemap
            )
            colors = np.asarray(
                tonemap_ops.apply(jax.numpy.asarray(colors), kind)
            )
        return colors[::-1]

    def save_png(self, path: str) -> None:
        write_png(path, self.image())

    def denoised_image(self, apply_tonemap: bool | str = True,
                       **denoise_kw) -> np.ndarray:
        """(H, W, 3) display image through the edge-aware à-trous
        denoiser (ops/denoise.py): filter in linear light guided by
        deterministic first-hit normals/depth from this engine's own
        intersector, then tonemap. denoise_kw: iterations /
        sigma_color / sigma_normal / sigma_depth overrides."""
        from opencl_path_tracer_tpu.ops.denoise import (
            atrous_denoise, primary_aovs,
        )
        cam = self.controller.camera(self.cfg.width, self.cfg.height)

        # Framebuffer stays on device when it already lives there in
        # raster-indexable form (single-device megakernel); the
        # sharded / wavefront layouts go through the gathering
        # _colors_np path.
        if self.cfg.model == "megakernel" and self.mesh is None:
            colors = jax.numpy.stack(self.state.colors, -1).reshape(
                self.cfg.height, self.cfg.width, 3
            )
        else:
            colors = jax.numpy.asarray(self._colors_np).reshape(
                self.cfg.height, self.cfg.width, 3
            )

        # One jitted program for AOVs + the full wavelet stack (eager
        # dispatch of the ~600 constituent ops through a tunneled
        # backend costs tens of seconds), cached on the engine so
        # repeated calls reuse the compile. Scene packs ride as
        # runtime args (lift_consts) like every other engine step —
        # closure-captured packs would bake the scene into the module
        # (engine._step's ~100 MB-at-100k-tris failure mode).
        ck = ("denoise", tuple(sorted(denoise_kw.items())))
        if ck not in self._steps:
            from opencl_path_tracer_tpu.utils.constlift import (
                lift_consts,
            )

            def run(colors, cam):
                normal, depth = primary_aovs(
                    cam, self.scene.mats, self.intersect_fn,
                    self.cfg.width, self.cfg.height,
                )
                return atrous_denoise(colors, normal, depth,
                                      **denoise_kw)

            lifted, consts = lift_consts(run, colors, cam)
            jitted = jax.jit(lifted)
            self._steps[ck] = lambda c, cm: jitted(consts, c, cm)

        out = np.asarray(self._steps[ck](colors, cam))
        if apply_tonemap:
            kind = (self.cfg.tonemap if apply_tonemap is True
                    else apply_tonemap)
            out = np.asarray(
                tonemap_ops.apply(jax.numpy.asarray(out), kind)
            )
        return out[::-1]

    def save_hdr(self, path: str) -> None:
        """Linear untonemapped radiance: .pfm (portable FloatMap) or
        .npy. The reference has no image export at all; HDR output
        feeds external tonemappers/denoisers."""
        img = self.image(apply_tonemap=False)
        if path.endswith(".npy"):
            np.save(path, img)
            return
        from opencl_path_tracer_tpu.io.image import write_pfm
        write_pfm(path, img)

    def save(self, path: str) -> None:
        save_checkpoint(path, self.state, meta={
            "width": self.cfg.width, "height": self.cfg.height,
            "mode": self.cfg.mode, "seed": self.cfg.seed,
        })

    def load(self, path: str) -> None:
        state, meta = load_checkpoint(path)
        if meta.get("width") != self.cfg.width or (
            meta.get("height") != self.cfg.height
        ):
            raise ValueError(
                "checkpoint resolution mismatch: "
                f"{meta.get('width')}x{meta.get('height')} vs "
                f"{self.cfg.width}x{self.cfg.height}"
            )
        ck_model = meta.get("model", "megakernel")
        if ck_model != self.cfg.model:
            raise ValueError(
                f"checkpoint model {ck_model!r} != engine model "
                f"{self.cfg.model!r}"
            )
        self.state = state
        if self.mesh is not None:
            # Checkpoints save gathered; re-shard onto this engine's
            # mesh — renders resume across device counts.
            self.state = self._shard(self.state)
        if self.cfg.model == "wavefront":
            import jax.numpy as jnp
            self._sample_host = int(
                jax.device_get(jnp.min(state.samples)))
            self._wf_pose = self.controller._cam_key
        else:
            self._sample_host = int(state.sample)
