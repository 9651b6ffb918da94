"""`ptx` command-line interface.

The reference's only entry point is a GLUT window with hardcoded
settings (main, main.cpp:1243-1268). The TPU-native entry points:

  ptx render  — offline progressive render to PNG (+ checkpoint)
  ptx anim    — offline turntable animation (PNG frames / looping GIF;
                the reference cannot export a single frame —
                download_image is commented out, main.cpp:727-741)
  ptx info    — device table (the list_info dump, main.cpp:389-455)
  ptx bench   — Mrays/sec measurement (wraps bench.py's harness)
  ptx view    — interactive-loop smoke mode (headless frames with the
                camera controller; useful over SSH: renders N frames,
                writes the final image)
  ptx serve   — live browser viewer (keys/mouse forwarded)
"""

from __future__ import annotations

import argparse
import sys
import time


def _build_scene(name: str, models_dir: str | None,
                 smooth: bool = False):
    from opencl_path_tracer_tpu.scene import library
    if name == "cornell":
        return library.cornell_box(with_spheres=True,
                                   smooth_spheres=smooth)
    if name == "cornell-analytic":
        # Native representation: 12 box tris + 2 exact quadrics (the
        # 347 Mrays/s headline scene; quadrics need no smoothing).
        return library.cornell_box(with_spheres=True,
                                   analytic_spheres=True)
    if name == "stress-analytic":
        if smooth:
            raise SystemExit("--smooth is pointless here: quadric "
                             "normals are exact already")
        return library.stress_scene(100_000, analytic=True)
    if name == "cornell-empty":
        return library.cornell_box(with_spheres=False)
    if name == "cornell-sphere-lamp":
        # Emissive ANALYTIC sphere as the lamp (the sphere-emitter
        # scene: --nee exercises the solid-angle cone sampler).
        return library.cornell_box(with_spheres=True,
                                   analytic_spheres=True,
                                   sphere_lamp=True)
    if name == "many-lights" or name.startswith("many-lights-"):
        # 'many-lights' or 'many-lights-N': cornell walls + N small
        # emissive analytic spheres (default 64) — the demo scene for
        # --nee --nee-select distance (beyond-reference capability).
        count = (int(name[len("many-lights-"):])
                 if name != "many-lights" else 64)
        return library.many_light_scene(count)
    if name == "reference":
        return library.reference_scene(models_dir, smooth=smooth)
    if name == "reference-analytic":
        # Native representation: the two sphere models (emissive lamp
        # + gold ball) as exact quadrics, other models as meshes.
        return library.reference_scene(models_dir, smooth=smooth,
                                       analytic=True)
    if name == "stress":
        # smooth: 100k-tri smooth shading rides the pair
        # intersector's with_ids surface (engine SMOOTH_ACCELS).
        return library.stress_scene(100_000, smooth=smooth)
    if name.endswith(".obj"):
        from opencl_path_tracer_tpu.scene.builder import SceneBuilder
        b = SceneBuilder()
        b.add_obj(name, pos=(0, 0, 0), scale=(1, 1, 1),
                  smooth_normals=smooth)
        return b.build()
    raise SystemExit(f"unknown scene {name!r}")


def _camera_preset(scene_name: str, w: int, h: int, args):
    from opencl_path_tracer_tpu.config import CameraConfig, RenderConfig
    if (scene_name.startswith("cornell") or scene_name == "stress"
            or scene_name.startswith("many-lights")):
        cam = CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                           shift=(0.0, 0.0, 0.0))
    else:
        cam = CameraConfig()
    if args.fov is not None:
        cam.fov = args.fov
    if args.yaw is not None:
        cam.yaw = args.yaw
    if args.pitch is not None:
        cam.pitch = args.pitch
    return cam


def cmd_render(args) -> int:
    from opencl_path_tracer_tpu.config import RenderConfig
    from opencl_path_tracer_tpu.runtime.engine import RenderEngine

    w, h = (int(x) for x in args.size.split("x"))
    scene = _build_scene(args.scene, args.models_dir,
                         smooth=args.smooth)
    if args.config:
        cfg = RenderConfig.from_json(open(args.config).read())
    else:
        cfg = RenderConfig(
            width=w, height=h, iterations=args.iters, spp=args.spp,
            mode=args.mode, seed=args.seed, tonemap=args.tonemap,
            accel=args.accel, accel_force=args.accel_force,
            smooth=args.smooth, textured=args.textured,
            model=args.model, devices=args.devices,
            nee=args.nee, rr_start=args.rr, qmc=args.qmc,
            nee_select=args.nee_select,
            nee_anyhit=not args.no_nee_anyhit,
            dof_aperture=(args.dof[0] if args.dof else 0.0),
            dof_focus=(args.dof[1] if args.dof else 0.0),
            env_light=args.env, env_sky=tuple(args.env_sky),
            env_deep=tuple(args.env_deep),
            env_map=args.envmap, env_scale=args.env_scale,
            env_nee=not args.no_env_nee,
            camera=_camera_preset(args.scene, w, h, args),
        )
    if args.median and args.denoise:
        raise SystemExit("--median and --denoise are exclusive "
                         "filters; pick one")
    if args.dispersion is not None:
        return _render_dispersive(args, cfg, scene)
    eng = RenderEngine(scene, cfg)
    if args.resume:
        eng.load(args.resume)
        # Wavefront state counts per-pixel 'samples'; megakernel one
        # global 'sample' (engine.load mirrors the former into
        # _sample_host).
        at = (eng._sample_host if cfg.model == "wavefront"
              else int(eng.state.sample))
        print(f"resumed at sample {at}", file=sys.stderr)
    t0 = time.time()
    if args.adaptive is not None:
        if cfg.model != "wavefront":
            raise SystemExit("--adaptive needs --model wavefront "
                             "(per-pixel sample counts)")
        if args.adaptive == "auto":
            tol = args.adaptive_tol
            decision, speedup, zero_var = eng.render_adaptive_auto(
                max_spp=cfg.spp, tol=tol, min_spp=args.min_spp)
            print(f"\nadaptive auto -> {decision} (predicted "
                  f"speedup x{speedup:.2f}, zero-variance frac "
                  f"{zero_var:.2f}, tol {tol})", file=sys.stderr)
        else:
            try:
                tol = float(args.adaptive)
            except ValueError:
                raise SystemExit(
                    f"--adaptive takes a tolerance or 'auto', got "
                    f"{args.adaptive!r}")
            eng.render_adaptive(tol, max_spp=cfg.spp,
                                min_spp=args.min_spp)
        import numpy as _np
        import jax as _jax
        smp = _np.asarray(_jax.device_get(eng.state.samples))
        dt = time.time() - t0
        print(f"\nadaptive: spp min {int(smp.min())} / mean "
              f"{smp.mean():.1f} / max {int(smp.max())} "
              f"(cap {cfg.spp}, tol {tol}) in {dt:.2f}s",
              file=sys.stderr)
    else:
        eng.render(cfg.spp, autosave_every=args.autosave_every,
                   autosave_path=args.checkpoint)
        dt = time.time() - t0
        print(f"\n{cfg.spp} spp in {dt:.2f}s "
              f"({cfg.spp/dt:.2f} samples/s)", file=sys.stderr)
    if args.median:
        import jax.numpy as jnp
        from opencl_path_tracer_tpu.io.image import write_png
        from opencl_path_tracer_tpu.ops.median_filter import median3x3
        img = eng.image(apply_tonemap=False)
        write_png(args.out, __import__("numpy").asarray(
            median3x3(jnp.asarray(img.copy()))
        ))
    elif args.out.endswith((".pfm", ".npy")):
        # Linear HDR by extension: untonemapped radiance (denoised in
        # linear light when --denoise is also given).
        if args.denoise:
            import numpy as _np
            from opencl_path_tracer_tpu.io.image import write_pfm
            img = eng.denoised_image(apply_tonemap=False)
            if args.out.endswith(".npy"):
                _np.save(args.out, img)
            else:
                write_pfm(args.out, img)
        else:
            eng.save_hdr(args.out)
    elif args.denoise:
        from opencl_path_tracer_tpu.io.image import write_png
        write_png(args.out, eng.denoised_image())
    else:
        eng.save_png(args.out)
    print(f"wrote {args.out}", file=sys.stderr)
    if args.checkpoint:
        eng.save(args.checkpoint)
        print(f"wrote {args.checkpoint}", file=sys.stderr)
    return 0


def _render_dispersive(args, cfg, scene) -> int:
    """`ptx render --dispersion V_D [--bands B]`: the spectral
    dispersion path (models/spectral.py) — per-band wavefront renders
    with Abbe-model glass, combined to RGB. Composes with
    --nee/--rr/--qmc/--dof/--smooth/--textured; the engine-level
    extras (--adaptive/--median/--denoise/--env*/checkpointing) are
    single-image machinery and do not apply."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from opencl_path_tracer_tpu.io.image import write_pfm, write_png
    from opencl_path_tracer_tpu.models import spectral
    from opencl_path_tracer_tpu.ops import tonemap as tonemap_ops
    from opencl_path_tracer_tpu.runtime.controller import (
        CameraController,
    )
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn

    if cfg.model != "wavefront":
        raise SystemExit("--dispersion needs --model wavefront")
    for bad, flag in ((args.adaptive is not None, "--adaptive"),
                      (args.median, "--median"),
                      (args.denoise, "--denoise"),
                      (args.env, "--env"),
                      (args.envmap is not None, "--envmap"),
                      (args.resume is not None, "--resume"),
                      (args.checkpoint is not None, "--checkpoint")):
        if bad:
            raise SystemExit(
                f"--dispersion does not compose with {flag}")
    if args.bands < 1:
        raise SystemExit("--bands must be >= 1")
    cam = CameraController(cfg).camera(cfg.width, cfg.height)
    isect = make_intersect_fn(
        scene, cfg.accel, force=cfg.accel_force, smooth=cfg.smooth,
        textured=cfg.textured, cam=cam, iterations=cfg.iterations,
    )
    nee_tab, occ = _spectral_nee(cfg, scene)
    t0 = time.time()
    img = spectral.render_dispersive(
        cam, scene.mats, intersect_fn=isect,
        num_pixels=cfg.width * cfg.height,
        iterations=cfg.iterations, min_spp=cfg.spp,
        bands=args.bands, v_d=args.dispersion, mode=cfg.mode,
        seed=cfg.seed, qmc=cfg.qmc, nee=nee_tab, occluded_fn=occ,
        rr=((cfg.rr_start, cfg.rr_pmin)
            if cfg.rr_start is not None else None),
        dof=((cfg.dof_aperture, cfg.dof_focus)
             if cfg.dof_aperture > 0.0 else None),
    )
    dt = time.time() - t0
    print(f"\n{args.bands}-band dispersive render "
          f"(V_d={args.dispersion:g}) at {cfg.spp} spp in {dt:.2f}s",
          file=sys.stderr)
    img3 = img.reshape(cfg.height, cfg.width, 3)[::-1]
    if args.out.endswith(".npy"):
        np.save(args.out, img3)
    elif args.out.endswith(".pfm"):
        write_pfm(args.out, img3)
    else:
        write_png(args.out, np.asarray(
            tonemap_ops.apply(jnp.asarray(img3), cfg.tonemap)))
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


def _spectral_nee(cfg, scene):
    """(emitter table, any-hit occluder) for the dispersion paths —
    the same construction the engine performs (both built on the
    UNDISPERSED scene: emission does not disperse, only refraction)."""
    import jax

    nee_tab = occ = None
    if cfg.nee:
        from opencl_path_tracer_tpu.ops.nee import build_emitter_table
        nee_tab = build_emitter_table(
            scene.tris, scene.mats, scene.spheres,
            select=cfg.nee_select,
        )
        if cfg.nee_anyhit:
            from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel \
                import make_scene_occluded
            occ = make_scene_occluded(
                scene, interpret=jax.default_backend() == "cpu")
    return nee_tab, occ


def _anim_dispersive(args, cfg, scene, poses) -> int:
    """`ptx anim --dispersion V_D`: dispersive turntable. The camera
    is a runtime argument of the one jitted spectral program
    (spectral.make_dispersive_renderer), so the whole orbit compiles
    once — the same property the engine's turntable path has
    (runtime/anim.py)."""
    import os

    import numpy as np
    import jax.numpy as jnp

    from opencl_path_tracer_tpu.io.image import to_uint8, write_png
    from opencl_path_tracer_tpu.models import spectral
    from opencl_path_tracer_tpu.ops import tonemap as tonemap_ops
    from opencl_path_tracer_tpu.runtime.anim import write_gif
    from opencl_path_tracer_tpu.runtime.controller import (
        CameraController,
    )
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn

    for bad, flag in ((args.denoise, "--denoise"),
                      (args.env, "--env"),
                      (args.envmap is not None, "--envmap")):
        if bad:
            raise SystemExit(
                f"--dispersion does not compose with {flag}")
    if args.bands < 1:
        raise SystemExit("--bands must be >= 1")
    w, h = cfg.width, cfg.height
    ctrl = CameraController(cfg)
    isect = make_intersect_fn(
        scene, cfg.accel, force=cfg.accel_force, smooth=cfg.smooth,
        textured=cfg.textured, cam=ctrl.camera(w, h),
        iterations=cfg.iterations,
    )
    nee_tab, occ = _spectral_nee(cfg, scene)
    render = spectral.make_dispersive_renderer(
        scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=cfg.iterations, min_spp=args.spp,
        bands=args.bands, v_d=args.dispersion, mode=cfg.mode,
        seed=cfg.seed, qmc=cfg.qmc, nee=nee_tab, occluded_fn=occ,
        rr=((cfg.rr_start, cfg.rr_pmin)
            if cfg.rr_start is not None else None),
        dof=((cfg.dof_aperture, cfg.dof_focus)
             if cfg.dof_aperture > 0.0 else None),
    )
    frames = []
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    for i, (yaw, pitch, shift) in enumerate(poses):
        st = ctrl.state
        st.yaw = float(yaw)
        st.pitch = float(pitch)
        st.shift = np.asarray(shift, np.float64)
        img = render(ctrl.camera(w, h)).reshape(h, w, 3)[::-1]
        img = to_uint8(np.asarray(
            tonemap_ops.apply(jnp.asarray(img), cfg.tonemap)))
        frames.append(img)
        if args.out_dir:
            write_png(os.path.join(args.out_dir,
                                   f"frame_{i:04d}.png"), img)
        print(f"\rframe {i + 1}/{len(poses)} (yaw {yaw:.1f})",
              end="", flush=True, file=sys.stderr)
    print(file=sys.stderr)
    if args.gif:
        write_gif(args.gif, frames, fps=args.fps)
    return 0


def cmd_info(args) -> int:
    from opencl_path_tracer_tpu.parallel.mesh import describe_devices
    import jax
    print(f"jax backend: {jax.default_backend()}")
    describe_devices(verbose=True)
    return 0


def cmd_view(args) -> int:
    """Headless interactive-loop exercise: run N frames with scripted
    input, print the 1 Hz meter, save the final frame."""
    from opencl_path_tracer_tpu.config import RenderConfig
    from opencl_path_tracer_tpu.runtime.engine import RenderEngine

    w, h = (int(x) for x in args.size.split("x"))
    scene = _build_scene(args.scene, args.models_dir,
                         smooth=args.smooth)
    cfg = RenderConfig(
        width=w, height=h, iterations=args.iters, mode=args.mode,
        accel=args.accel, accel_force=args.accel_force,
        smooth=args.smooth, textured=args.textured,
        nee=args.nee, qmc=args.qmc, nee_select=args.nee_select,
        nee_anyhit=not args.no_nee_anyhit,
        dof_aperture=(args.dof[0] if args.dof else 0.0),
        dof_focus=(args.dof[1] if args.dof else 0.0),
        env_light=args.env, env_sky=tuple(args.env_sky),
        env_deep=tuple(args.env_deep),
        env_map=args.envmap, env_scale=args.env_scale,
        env_nee=not args.no_env_nee,
        camera=_camera_preset(args.scene, w, h, args),
    )
    eng = RenderEngine(scene, cfg)
    last = time.time()
    for i in range(args.frames):
        now = time.time()
        eng.frame(dt=now - last)
        last = now
    print(file=sys.stderr)
    eng.save_png(args.out)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


def cmd_serve(args) -> int:
    from opencl_path_tracer_tpu.config import RenderConfig
    from opencl_path_tracer_tpu.runtime.engine import RenderEngine
    from opencl_path_tracer_tpu.runtime.viewer import ViewerServer

    w, h = (int(x) for x in args.size.split("x"))
    scene = _build_scene(args.scene, args.models_dir,
                         smooth=args.smooth)
    cfg = RenderConfig(
        width=w, height=h, iterations=args.iters, mode=args.mode,
        accel=args.accel, accel_force=args.accel_force,
        smooth=args.smooth, textured=args.textured,
        nee=args.nee, qmc=args.qmc, nee_select=args.nee_select,
        nee_anyhit=not args.no_nee_anyhit,
        dof_aperture=(args.dof[0] if args.dof else 0.0),
        dof_focus=(args.dof[1] if args.dof else 0.0),
        env_light=args.env, env_sky=tuple(args.env_sky),
        env_deep=tuple(args.env_deep),
        env_map=args.envmap, env_scale=args.env_scale,
        env_nee=not args.no_env_nee,
        camera=_camera_preset(args.scene, w, h, args),
    )
    ViewerServer(RenderEngine(scene, cfg), port=args.port).serve()
    return 0


def _scene_bounds(scene):
    import numpy as np
    pts = np.concatenate([
        np.asarray(c).reshape(-1, 3)
        for c in (scene.tris.r1, scene.tris.r2, scene.tris.r3)
    ], 0)
    return pts.min(0), pts.max(0)


def cmd_anim(args) -> int:
    """Offline turntable: orbit the camera around the scene and write
    a PNG frame sequence / looping GIF. The reference has no export at
    all (download_image is commented out, main.cpp:727-741)."""
    import numpy as np
    from opencl_path_tracer_tpu.config import RenderConfig
    from opencl_path_tracer_tpu.runtime import anim
    from opencl_path_tracer_tpu.runtime.engine import RenderEngine

    w, h = (int(x) for x in args.size.split("x"))
    scene = _build_scene(args.scene, args.models_dir,
                         smooth=args.smooth)
    lo, hi = _scene_bounds(scene)
    center = (tuple(args.center) if args.center is not None
              else tuple((lo + hi) / 2.0))
    radius = (args.radius if args.radius is not None
              else 1.6 * float(np.linalg.norm(hi - lo)) / 2.0)
    cfg = RenderConfig(
        width=w, height=h, iterations=args.iters, mode=args.mode,
        seed=args.seed, accel=args.accel,
        accel_force=args.accel_force,
        smooth=args.smooth, textured=args.textured,
        nee=args.nee, qmc=args.qmc, nee_select=args.nee_select,
        nee_anyhit=not args.no_nee_anyhit,
        dof_aperture=(args.dof[0] if args.dof else 0.0),
        dof_focus=(args.dof[1] if args.dof else 0.0),
        env_light=args.env, env_sky=tuple(args.env_sky),
        env_deep=tuple(args.env_deep),
        env_map=args.envmap, env_scale=args.env_scale,
        env_nee=not args.no_env_nee,
        camera=_camera_preset(args.scene, w, h, args),
    )
    orbit_pitch = args.pitch if args.pitch is not None else 12.0
    poses = anim.turntable_poses(
        frames=args.frames, center=center, radius=radius,
        pitch=orbit_pitch, sweep=args.sweep,
    )
    print(f"turntable: {args.frames} poses around {center}, "
          f"radius {radius:.0f}, {args.spp} spp each",
          file=sys.stderr)
    if getattr(args, "dispersion", None) is not None:
        t0 = time.time()
        _anim_dispersive(args, cfg, scene, poses)
        dt = time.time() - t0
        print(f"{args.frames} frames in {dt:.1f}s "
              f"({args.frames / dt:.2f} fps offline)", file=sys.stderr)
        if args.out_dir:
            print(f"wrote {args.out_dir}/frame_*.png", file=sys.stderr)
        if args.gif:
            print(f"wrote {args.gif}", file=sys.stderr)
        return 0
    eng = RenderEngine(scene, cfg)
    t0 = time.time()
    anim.render_animation(
        eng, poses, spp=args.spp, out_dir=args.out_dir,
        gif_path=args.gif or None, fps=args.fps,
        denoise=args.denoise,
    )
    dt = time.time() - t0
    print(f"{args.frames} frames in {dt:.1f}s "
          f"({args.frames / dt:.2f} fps offline)", file=sys.stderr)
    if args.out_dir:
        print(f"wrote {args.out_dir}/frame_*.png", file=sys.stderr)
    if args.gif:
        print(f"wrote {args.gif}", file=sys.stderr)
    return 0


def cmd_bench(args) -> int:
    import subprocess
    import os
    cmd = [sys.executable,
           os.path.join(os.path.dirname(__file__), "..", "bench.py")]
    if args.size:
        cmd += ["--size", args.size]
    if args.scene:
        cmd += ["--scene", args.scene]
    if args.model:
        cmd += ["--model", args.model]
    return subprocess.call(cmd)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="ptx")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--scene", default="cornell")
        p.add_argument("--models-dir", default=None)
        p.add_argument("--size", default="512x512")
        p.add_argument("--iters", type=int, default=5,
                       help="bounce depth (1..50)")
        p.add_argument("--mode", default="fast",
                       choices=["fast", "parity"])
        p.add_argument("--accel", default="auto",
                       choices=["auto", "bvh", "median", "bruteforce",
                                "pallas", "cluster", "group", "pair",
                                "pairmx", "pairwin", "minarg",
                                "tilecull", "march", "flat"])
        p.add_argument("--accel-force", action="store_true",
                       help="override the TPU backend gate (run "
                            "measured-dominated or device-unsafe "
                            "backends anyway)")
        p.add_argument("--seed", type=int, default=1)
        p.add_argument("--smooth", action="store_true",
                       help="smooth shading: build the scene with "
                            "vertex normals (OBJ vn or computed) and "
                            "interpolate them at hit points "
                            "(ops/shading.py; needs accel auto/"
                            "bruteforce/minarg/pairwin)")
        p.add_argument("--textured", action="store_true",
                       help="image textures: modulate kd by each "
                            "material's map_Kd sample at the hit UV "
                            "(core/textures.py; needs a scene with "
                            "bound textures — e.g. an OBJ whose MTL "
                            "has PNG map_Kd entries — and the same "
                            "ids-reporting accels as --smooth)")
        p.add_argument("--dof", type=float, nargs=2, default=None,
                       metavar=("APERTURE", "FOCUS"),
                       help="thin-lens depth of field: lens radius "
                            "and focal-plane distance (world units; "
                            "the reference camera is a pure pinhole)")
        p.add_argument("--qmc", action="store_true",
                       help="low-discrepancy camera jitter (R2 "
                            "sequence per pixel; fast mode only) — "
                            "QMC-class anti-aliasing convergence")
        p.add_argument("--nee", action="store_true",
                       help="next-event estimation: gather direct "
                            "light at diffuse vertices via shadow "
                            "rays (ops/nee.py; same converged image, "
                            "far less noise at small emitters, ~2x "
                            "intersect cost per bounce)")
        p.add_argument("--nee-select", default="power",
                       choices=["power", "distance"],
                       help="emitter selection for --nee: 'power' = "
                            "global power-proportional; 'distance' = "
                            "per-lane distance-aware weights (the "
                            "many-light mode — analytic-sphere "
                            "emitters only, e.g. --scene many-lights; "
                            "both converge to the same image, "
                            "distance puts the shadow rays where the "
                            "contribution is)")
        p.add_argument("--no-nee-anyhit", action="store_true",
                       help="route NEE/env shadow rays through the "
                            "full nearest-hit intersect instead of "
                            "the any-hit kernel (bit-identical "
                            "either way; anyhit measured +39% NEE "
                            "throughput on spread scenes)")
        p.add_argument("--env", action="store_true",
                       help="environment light: resurrect the "
                            "reference kernel's dormant miss-branch "
                            "sky code (prog.cl:367-376; off = shipped "
                            "parity, miss contributes nothing)")
        p.add_argument("--envmap", default=None, metavar="SRC",
                       help="image-based environment light "
                            "(ops/envmap.py): 'gradient', 'sunsky', "
                            "or a .pfm/.png equirect path; adds an "
                            "importance-sampled gather + MIS unless "
                            "--no-env-nee")
        p.add_argument("--env-scale", type=float, default=1.0,
                       help="radiance multiplier for --envmap")
        p.add_argument("--no-env-nee", action="store_true",
                       help="light misses only (no environment "
                            "shadow rays / MIS) for --envmap")
        p.add_argument("--env-sky", type=float, nargs=3,
                       default=(0.0, 0.75, 2.0), metavar=("R", "G", "B"),
                       help="sky color for --env (dormant-code "
                            "literal 0 0.75 2)")
        p.add_argument("--env-deep", type=float, nargs=3,
                       default=(1.0, 1.0, 1.0), metavar=("R", "G", "B"),
                       help="post-diffuse-miss fill color for --env "
                            "(dormant-code literal 1 1 1)")
        p.add_argument("--fov", type=float, default=None)
        p.add_argument("--yaw", type=float, default=None)
        p.add_argument("--pitch", type=float, default=None)

    p = sub.add_parser("render", help="offline render to PNG")
    common(p)
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--model", default="megakernel",
                   choices=["megakernel", "wavefront"],
                   help="wavefront = path regeneration (the flagship "
                        "throughput model; every pixel still gets "
                        "exactly --spp samples)")
    p.add_argument("--devices", type=int, default=1,
                   help="shard the render over N devices "
                        "(0 = all visible; tile sharding is bit-exact "
                        "vs single device)")
    p.add_argument("--config", default=None,
                   help="JSON RenderConfig (overrides other flags)")
    p.add_argument("--autosave-every", type=int, default=0)
    p.add_argument("--tonemap", default="reinhard",
                   choices=["reinhard", "filmic", "none"])
    p.add_argument("--median", action="store_true",
                   help="3x3 median filter + filmic tonemap (the "
                        "reference's dormant filt_im kernel)")
    p.add_argument("--denoise", action="store_true",
                   help="edge-aware a-trous wavelet denoiser "
                        "(Dammertz 2010) guided by first-hit "
                        "normals/depth — far stronger than --median "
                        "at low spp (ops/denoise.py)")
    p.add_argument("--out", default="render.png")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--adaptive", default=None, metavar="TOL|auto",
                   help="adaptive sampling (needs --model wavefront): "
                        "stop each pixel once its relative luminance "
                        "standard error is within TOL (e.g. 0.02); "
                        "--spp becomes the per-pixel cap. Converged "
                        "lanes are compacted away, so flat regions "
                        "stop costing rays. 'auto' probes --min-spp "
                        "samples and enables adaptivity only in its "
                        "measured win regime — heterogeneous "
                        "convergence with trustworthy variance "
                        "estimates (typically --nee + small "
                        "emitters, x3.04 measured); uniform or "
                        "spiky-variance scenes run the faster fixed "
                        "path (see --adaptive-tol)")
    p.add_argument("--adaptive-tol", type=float, default=0.05,
                   metavar="TOL",
                   help="tolerance used by --adaptive auto "
                        "(default 0.05, the measured-win setting)")
    p.add_argument("--min-spp", type=int, default=8,
                   help="adaptive floor: samples every pixel must "
                        "take before it may stop")
    p.add_argument("--rr", type=int, default=None, metavar="START",
                   help="Russian-roulette path termination (needs "
                        "--model wavefront): after START bounces, "
                        "paths survive with probability = their "
                        "throughput (floored at 0.05), survivors "
                        "compensate 1/p — same converged image, dim "
                        "paths die early and lanes regenerate fresh "
                        "samples immediately")
    p.add_argument("--dispersion", type=float, default=None,
                   metavar="V_D",
                   help="spectral dispersion: render --bands "
                        "wavelength bands whose glass IOR follows "
                        "the Abbe/Cauchy model at this Abbe number "
                        "(crown ~60, flint ~30; lower = stronger "
                        "rainbows) and combine to RGB "
                        "(models/spectral.py; wavefront model only)")
    p.add_argument("--bands", type=int, default=3,
                   help="band count for --dispersion (3 = sRGB "
                        "primaries; more bands = smoother spectra at "
                        "proportional cost)")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("view", help="headless interactive loop")
    common(p)
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--out", default="view.png")
    p.set_defaults(fn=cmd_view)

    p = sub.add_parser(
        "anim", help="offline turntable animation (PNG frames / GIF)")
    common(p)
    p.add_argument("--frames", type=int, default=36)
    p.add_argument("--spp", type=int, default=16,
                   help="samples per pixel per frame")
    p.add_argument("--center", type=float, nargs=3, default=None,
                   metavar=("X", "Y", "Z"),
                   help="orbit center (default: scene bbox center)")
    p.add_argument("--radius", type=float, default=None,
                   help="orbit radius (default: 1.6x bbox half-"
                        "diagonal; --pitch sets the look-down angle, "
                        "default 12)")
    p.add_argument("--sweep", type=float, default=360.0,
                   help="total orbit degrees across --frames")
    p.add_argument("--fps", type=float, default=12.0)
    p.add_argument("--denoise", action="store_true",
                   help="a-trous denoise every frame (the jitted "
                        "pass compiles once for the whole orbit)")
    p.add_argument("--out-dir", default=None,
                   help="write frame_%%04d.png here")
    p.add_argument("--gif", default="turntable.gif",
                   help="looping GIF path ('' to skip)")
    p.add_argument("--dispersion", type=float, default=None,
                   metavar="V_D",
                   help="spectral-dispersion turntable: render every "
                        "frame through the --bands-band Abbe-model "
                        "glass path (one compiled program for the "
                        "whole orbit; see ptx render --dispersion)")
    p.add_argument("--bands", type=int, default=3,
                   help="band count for --dispersion")
    p.set_defaults(fn=cmd_anim)

    p = sub.add_parser("serve", help="live browser viewer")
    common(p)
    p.add_argument("--port", type=int, default=8642)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("info", help="device table")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("bench", help="throughput benchmark")
    p.add_argument("--size", default=None)
    p.add_argument("--scene", default=None)
    p.add_argument("--model", default=None)
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
