"""Benchmark: Mrays/sec on the default JAX device.

Workload (BASELINE.md): progressive path tracing at 1080p, bounce depth
5. Three scenes so the headline can't flatter the easy case (VERDICT r1):
  * cornell-analytic — Cornell+spheres in the framework's NATIVE
               representation: 12 box tris + 2 analytic quadrics
               (core/spheres.py). Same scene content as 'cornell';
               the reference tessellates only because prog.cl has no
               sphere primitive (main.cpp:1002,1009).
  * cornell  — the reference-parity representation: the spheres
               tessellated to 792 tris (804 total, the small-scene
               triangle path).
  * stress   — 100k-tri enclosed sphere field (the acceleration path,
               incoherent bounce rays).
Flagship model: wavefront path regeneration — every lane is a live ray
every step, so rays/sec is exact, not estimated.

Default (no --scene): runs all four (the three above plus
stress-analytic, the stress content as ~138 quadrics) and prints ONE
JSON line whose headline value is the cornell-analytic number, with
the other three in "extra". --scene picks a single scene.

vs_baseline: the driver-set north star is >= 1 Grays/sec aggregate on a
v5e-8, i.e. 125 Mrays/sec/chip; vs_baseline = value / 125.

Usage: python bench.py [--scene cornell|stress|ref-workload]
       [--size WxH] [--steps N] [--iters N]
       [--model wavefront|megakernel] [--accel ...] [--chunk N]
"""

from __future__ import annotations

import argparse
import contextlib
import functools
import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp

PER_CHIP_TARGET_MRAYS = 125.0  # 1 Grays/s / 8 chips (BASELINE.md)

# Aggregate projection factor for the v5e-8 estimate: tile sharding is
# chip-local (zero per-step collectives; test_parallel proves
# bit-equality) and the virtual 8-device mesh measured <=4.2%
# partition overhead (docs/BENCHMARKS.md "Aggregate-throughput
# estimate"). The ICI hop itself has never been timed on real
# multi-chip hardware (one chip here) — 0.96 is an ASSUMPTION and is
# published as its own field so the projection explains itself.
ICI_EFFICIENCY_ASSUMED = 0.96

_T_START = time.time()
_WARMUP_S = {}  # scene name -> first-dispatch warmup+compile seconds
_PROVENANCE = {}  # jax/libtpu versions + cache state (filled in main)


class LegTimeout(Exception):
    pass


@contextlib.contextmanager
def _alarm(seconds: int):
    """Bound one bench leg with SIGALRM so a hung remote compile can't
    eat the whole run (round 3's official artifact was rc=124 with the
    first warmup never finishing — BENCH_r03.json)."""
    if seconds <= 0 or not hasattr(signal, "SIGALRM"):
        yield
        return

    def _raise(signum, frame):
        raise LegTimeout(f"leg exceeded {seconds}s")

    prev = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(int(seconds))
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, prev)


def make_isect(scene, accel: str, on_cpu: bool, cam=None,
               iters: int = 5):
    tri_fn = _make_tri_isect(scene, accel, on_cpu, cam, iters)
    if getattr(scene, "spheres", None) is None:
        return tri_fn
    from opencl_path_tracer_tpu.ops import intersect
    from opencl_path_tracer_tpu.ops.pallas.sphere_kernel import (
        make_sphere_intersect,
    )
    sphere_fn = make_sphere_intersect(scene.spheres, interpret=on_cpu)

    def merged(rays):
        return intersect.merge_hits(tri_fn(rays), sphere_fn(rays))

    return merged


def _make_tri_isect(scene, accel: str, on_cpu: bool, cam=None,
                    iters: int = 5):
    if accel == "auto":
        # Small scenes: the workload-sampling predictor picks between
        # the dense min+argmin kernel and the tile-culling grouped
        # kernel (tilecull_kernel.auto_small_accel — measured round 4:
        # tilecull +98% on ref-workload and +90% on iterations=1
        # previews, -12% on the enclosed deep-bounce cornell, which
        # the predictor keeps on minarg). Large scenes: the pair
        # intersector at the TPU-swept winner config (pair v6 thin —
        # 5.32 Mrays/s official, 0 hit flips;
        # sorted_intersect.PAIR_TPU_WINNER).
        if cam is not None and scene.num_triangles <= 8192:
            from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel \
                import auto_small_accel
            accel = auto_small_accel(scene.tris, cam,
                                     iterations=iters)
        elif scene.num_triangles > 8192:
            accel = "pairwin"
        else:
            accel = "minarg"
        print(f"# accel auto -> {accel}", file=sys.stderr)
    if accel == "minarg":
        from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
            make_minarg_intersect,
        )
        return make_minarg_intersect(scene.tris, interpret=on_cpu)
    if accel == "tilecull":
        from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel import (
            make_tilecull_intersect,
        )
        origin = (tuple(float(v) for v in cam.eye)
                  if cam is not None else None)
        return make_tilecull_intersect(scene.tris, origin=origin,
                                       interpret=on_cpu)
    if accel == "march":
        from opencl_path_tracer_tpu.ops.pallas.march_kernel import (
            make_march_intersect,
        )
        isect, _rt = make_march_intersect(scene.tris, interpret=on_cpu)
        return isect
    if accel == "flat":
        from opencl_path_tracer_tpu.ops.pallas.flat_march import (
            make_flat_march_intersect,
        )
        isect, _rt = make_flat_march_intersect(scene.tris,
                                               interpret=on_cpu)
        return isect
    if accel == "pair":
        from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
            make_pair_intersect,
        )
        return make_pair_intersect(scene.tris, interpret=on_cpu)
    if accel == "pairmx":
        from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
            make_pair_intersect,
        )
        return make_pair_intersect(scene.tris, interpret=on_cpu,
                                   mxu=True, trp=512)
    if accel == "pairwin":
        from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
            PAIR_TPU_WINNER, make_pair_intersect,
        )
        return make_pair_intersect(scene.tris, interpret=on_cpu,
                                   **PAIR_TPU_WINNER)
    if accel == "group":
        from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
            make_group_intersect,
        )
        return make_group_intersect(scene.tris, interpret=on_cpu)
    if accel == "cluster":
        from opencl_path_tracer_tpu.ops.pallas.cluster_kernel import (
            make_cluster_intersect,
        )
        return make_cluster_intersect(
            scene.tris, cluster_size=128, tr=256, early_exit=True,
            interpret=on_cpu,
        )
    if accel == "pallas":
        from opencl_path_tracer_tpu.ops.pallas import make_pallas_intersect
        return make_pallas_intersect(scene.tris, interpret=on_cpu)
    if accel == "bvh":
        from opencl_path_tracer_tpu.accel import (
            build_lbvh, make_bvh_intersect,
        )
        return make_bvh_intersect(build_lbvh(scene.tris, leaf_size=4))
    from opencl_path_tracer_tpu.ops import intersect
    return functools.partial(intersect.first_intersect, tris=scene.tris)


def scene_sort_bounds(scene):
    """(lo, inv_extent) 3-vectors for wavefront.sort_state."""
    import numpy as np
    r1 = np.asarray(scene.tris.r1)
    r2 = np.asarray(scene.tris.r2)
    r3 = np.asarray(scene.tris.r3)
    lo = np.minimum(np.minimum(r1.min(0), r2.min(0)), r3.min(0))
    hi = np.maximum(np.maximum(r1.max(0), r2.max(0)), r3.max(0))
    inv = 1.0 / np.maximum(hi - lo, 1e-12)
    return tuple(float(v) for v in lo), tuple(float(v) for v in inv)


def run_wavefront(scene, cam, n, isect, *, iters, steps, chunk,
                  lanes: int = 1, rr=None, nee=None,
                  sort_every: int = 0, occluded_fn=None):
    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.ops import raygen

    w = int(cam.xm)
    h = int(cam.ym)
    key = jax.random.key(1)
    if w % 16 == 0 and h % 16 == 0:
        ids = raygen.tile_major_ids(w, h, 16, 16)
    elif w % 16 == 0 and h % 8 == 0:
        ids = raygen.tile_major_ids(w, h, 16, 8)
    else:
        ids = raygen.pixel_ids_like(n)
    if lanes > 1:
        # Several samples in flight per pixel: amortizes the step's
        # fixed costs (colors_by_pixel merges lanes sample-weighted).
        ids = jnp.tile(ids, lanes)
        n = n * lanes
    state = wavefront.init_wavefront(cam, n, mode="fast", key=key,
                                     ids=ids)

    bounds = scene_sort_bounds(scene) if sort_every else None

    def run_raw(state, k):
        def body(_, st):
            return wavefront.wavefront_step(
                cam, scene.mats, st, intersect_fn=isect,
                iterations=iters, mode="fast", key=key, ids=ids,
                rr=rr, nee=nee, sort_every=sort_every,
                scene_bounds=bounds, occluded_fn=occluded_fn,
            )
        st = jax.lax.fori_loop(0, k, body, state)
        return st, jnp.sum(st.colors[0][:8])

    # Lift the scene packs out of the program: as closure constants
    # they lower to dense MLIR literals (100k-tri step: ~100 MB module,
    # 51 MB constants; 300k+/1M scenes fail the remote compile service
    # on size alone). Lifted, the module is O(code) and the packs ride
    # as device-resident runtime args — bit-exact (test_constlift).
    from opencl_path_tracer_tpu.utils.constlift import lift_consts
    lifted, consts = lift_consts(run_raw, state, 2)
    run_j = jax.jit(lifted)

    def run(state, k):
        return run_j(consts, state, k)

    t0 = time.time()
    # The remote TPU compile service occasionally returns transient
    # HTTP 500s — retry the first compile a couple of times.
    for attempt in range(3):
        try:
            state, _ = run(state, 2)
            float(jnp.sum(state.samples[:8]))
            break
        except Exception:
            if attempt == 2:
                raise
            print(f"# warmup attempt {attempt + 1} failed, retrying",
                  file=sys.stderr)
            time.sleep(10)
    warm_s = time.time() - t0
    _WARMUP_S.setdefault("_first", round(warm_s, 1))
    print(f"# warmup+compile {warm_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    done = 0
    while done < steps:
        k = min(chunk, steps - done)
        state, chk = run(state, k)
        done += k
    float(chk)  # dependent fetch = real sync
    dt = time.time() - t0
    # Per-PIXEL spp: with lanes > 1 each pixel accumulates across
    # `lanes` lanes, so the per-lane mean understates it by that factor.
    return (float(n) * steps / dt / 1e6, dt,
            float(jnp.mean(state.samples)) * lanes)


def run_fused(scene, cam, n, *, iters, steps, chunk, lanes: int = 1):
    """Flagship fast pipeline: Plucker-MXU intersect + rotating exact
    slice + one-kernel shade (models/pipeline.py). Small scenes only
    (refine needs the tri table VMEM-resident)."""
    from opencl_path_tracer_tpu.models import pipeline

    w, h = int(cam.xm), int(cam.ym)
    key = jax.random.key(1)
    interpret = jax.devices()[0].platform == "cpu"
    state, dt = pipeline.render_fast(
        scene, cam, width=w, height=h, iterations=iters, steps=steps,
        key=key, lanes=lanes, interpret=interpret, chunk=chunk,
    )
    n_lanes = state.samples.shape[0]
    spp = float(jnp.sum(state.samples)) / float(n)
    return float(n_lanes) * steps / dt / 1e6, dt, spp


def run_lazy(scene, cam, n, *, iters, steps, chunk):
    """Lazy-certification wavefront (models/lazy.py): bounded coherent
    march work per step, stalled lanes carry their search. Throughput
    is SEGMENTS COMPLETED per second (a stalled lane traces no ray
    that step) — the honest analog of rays/sec."""
    from opencl_path_tracer_tpu.models import lazy

    key = jax.random.key(1)
    on_cpu = jax.devices()[0].platform == "cpu"
    step, init, _rt = lazy.make_lazy_pipeline(
        scene.tris, cs=512, tr=256, K=4, tail=4096, interpret=on_cpu,
    )
    state = init(cam, n, mode="fast", key=key)

    @jax.jit
    def run(state, k):
        def body(_, st):
            return step(cam, scene.mats, st, iterations=iters,
                        mode="fast", key=key)
        st = jax.lax.fori_loop(0, k, body, state)
        return st, jnp.sum(st.colors[0][:8])

    t0 = time.time()
    for attempt in range(3):
        try:
            state, _ = run(state, 2)
            float(jnp.sum(state.samples[:8]))
            break
        except Exception:
            if attempt == 2:
                raise
            print(f"# warmup attempt {attempt + 1} failed, retrying",
                  file=sys.stderr)
            time.sleep(10)
    print(f"# warmup+compile {time.time()-t0:.1f}s", file=sys.stderr)

    c0 = int(state.completions)
    t0 = time.time()
    done = 0
    while done < steps:
        k = min(chunk, steps - done)
        state, chk = run(state, k)
        done += k
    float(chk)
    dt = time.time() - t0
    segs = int(state.completions) - c0
    return segs / dt / 1e6, dt, float(jnp.mean(state.samples))


def run_megakernel(scene, cam, n, isect, *, iters, steps):
    from opencl_path_tracer_tpu.models import megakernel

    key = jax.random.key(1)
    state = megakernel.init_state(n, seed=1)

    @jax.jit
    def step(st):
        return megakernel.trace_sample(
            cam, scene.mats, st, intersect_fn=isect,
            iterations=iters, mode="fast", key=key,
        )

    @jax.jit
    def step_stats(st):
        return megakernel.trace_sample(
            cam, scene.mats, st, intersect_fn=isect,
            iterations=iters, mode="fast", key=key, with_stats=True,
        )

    t0 = time.time()
    state, stats = step_stats(state)
    rays_per_sample = float(stats["rays_traced"])
    state = step(state)
    float(jnp.sum(state.colors[0][:4]))
    print(f"# warmup+compile {time.time()-t0:.1f}s; "
          f"avg path len {rays_per_sample/n:.2f}", file=sys.stderr)
    t0 = time.time()
    for _ in range(steps):
        state = step(state)
    float(jnp.sum(state.colors[0][:4]))
    dt = time.time() - t0
    return rays_per_sample * steps / dt / 1e6, dt, float(state.sample)


def bench_scene(scene_name: str, args) -> dict:
    from opencl_path_tracer_tpu.scene import library

    if scene_name == "ref-workload":
        # The reference's own headline workload: its default scene
        # (ground plane + 7 OBJ models, main.cpp:745-1017; committed
        # stand-ins for the model files the reference repo also does
        # not ship) at its self-meter geometry 1536x864 (192*8 x
        # 108*8, main.cpp:20-21).
        w, h = 1536, 864
        models = os.path.join(os.path.dirname(os.path.abspath(
            __file__)), "tests", "assets", "models")
        scene = library.reference_scene(
            models if os.path.isdir(models) else None)
    elif scene_name == "ref-analytic-nee":
        # The reference's default scene, analytic spheres, with NEE
        # shadow rays through the any-hit kernel — the round-4
        # measured win (14.9 -> 20.7 Mrays/s vs nearest-hit shadow
        # rays; each sample carries far less variance than the base
        # estimator's).
        w, h = 1536, 864
        models = os.path.join(os.path.dirname(os.path.abspath(
            __file__)), "tests", "assets", "models")
        scene = library.reference_scene(
            models if os.path.isdir(models) else None, analytic=True)
    elif scene_name == "cornell-analytic":
        # The SAME cornell content as 'cornell', represented the
        # TPU-native way: 12 box triangles + 2 analytic quadrics
        # instead of 12 + 792 tessellation triangles (the reference
        # tessellates only because OpenCL prog.cl has no sphere
        # primitive). ~67x fewer triangle tests/ray; exact silhouettes.
        w, h = (int(x) for x in args.size.split("x"))
        scene = library.cornell_box(with_spheres=True,
                                    analytic_spheres=True)
    elif scene_name == "cornell-analytic-rrnee":
        # The measured best equal-time config of the sampling layer
        # (docs/BENCHMARKS.md session 10: rr+nee = 1.34x global MSE
        # over base at equal time): Russian roulette (2.7x samples/
        # sec via path regeneration) + next-event estimation. Same
        # scene as the headline; the spp/sec column is the comparable
        # number (a sample here carries far less variance per spp).
        w, h = (int(x) for x in args.size.split("x"))
        scene = library.cornell_box(with_spheres=True,
                                    analytic_spheres=True)
    elif scene_name == "stress-analytic":
        # The stress CONTENT (identical shell + sphere grid) as ~20
        # triangles + ~138 analytic quadrics (table-driven sphere
        # kernel). NOT a replacement for 'stress' — config 4's purpose
        # is the 100k-TRIANGLE acceleration path — but the native
        # representation of the same scene.
        w, h = (int(x) for x in args.size.split("x"))
        scene = library.stress_scene(100_000, analytic=True)
    else:
        w, h = (int(x) for x in args.size.split("x"))
        scene = (library.cornell_box(with_spheres=True)
                 if scene_name == "cornell"
                 else library.stress_scene(100_000))
    n = w * h
    if getattr(scene, "spheres", None) is not None and args.model in (
            "fused", "lazy"):
        raise ValueError(
            f"--model {args.model} intersects triangles only and "
            f"would silently drop {scene_name!r}'s analytic spheres; "
            "use --model wavefront/megakernel, or a tessellated scene"
        )
    cam = library.cornell_camera(w, h)
    on_cpu = jax.devices()[0].platform == "cpu"
    print(f"# scene {scene_name}: {scene.num_triangles} tris @ {w}x{h}",
          file=sys.stderr)
    if args.model == "fused":
        mrays, dt, spp = run_fused(
            scene, cam, n, iters=args.iters, steps=args.steps,
            chunk=args.chunk, lanes=args.lanes,
        )
        print(
            f"# {scene_name}: {dt:.3f}s for {args.steps} steps @ "
            f"{w}x{h} iters={args.iters} (mean spp {spp:.1f}) -> "
            f"{mrays:.1f} Mrays/s", file=sys.stderr,
        )
        return {"scene": scene_name, "w": w, "h": h,
                "mrays": round(mrays, 2),
                "spp_per_sec": round(spp / dt, 2)}
    if args.model == "lazy":
        mrays, dt, spp = run_lazy(
            scene, cam, n, iters=args.iters, steps=args.steps,
            chunk=args.chunk,
        )
        print(
            f"# {scene_name}: {dt:.3f}s for {args.steps} steps @ "
            f"{w}x{h} iters={args.iters} (mean spp {spp:.1f}) -> "
            f"{mrays:.1f} Mrays/s (segment completions)",
            file=sys.stderr,
        )
        return {"scene": scene_name, "w": w, "h": h,
                "mrays": round(mrays, 2),
                "spp_per_sec": round(spp / dt, 2)}
    isect = make_isect(scene, args.accel, on_cpu, cam, args.iters)
    if args.model == "wavefront":
        kw = {}
        if scene_name == "cornell-analytic-rrnee":
            from opencl_path_tracer_tpu.ops.nee import (
                build_emitter_table,
            )
            kw = dict(rr=(2, 0.05),
                      nee=build_emitter_table(scene.tris, scene.mats,
                                              None))
        elif scene_name == "ref-analytic-nee":
            from opencl_path_tracer_tpu.ops.nee import (
                build_emitter_table,
            )
            from opencl_path_tracer_tpu.ops.pallas.tilecull_kernel \
                import make_scene_occluded
            kw = dict(
                nee=build_emitter_table(scene.tris, scene.mats,
                                        scene.spheres),
                occluded_fn=make_scene_occluded(scene,
                                                interpret=on_cpu),
            )
        mrays, dt, spp = run_wavefront(
            scene, cam, n, isect, iters=args.iters, steps=args.steps,
            chunk=args.chunk, lanes=args.lanes, **kw,
        )
    else:
        mrays, dt, spp = run_megakernel(
            scene, cam, n, isect, iters=args.iters, steps=args.steps,
        )
    print(
        f"# {scene_name}: {dt:.3f}s for {args.steps} steps @ {w}x{h} "
        f"iters={args.iters} (mean spp {spp:.1f}) -> "
        f"{mrays:.1f} Mrays/s",
        file=sys.stderr,
    )
    return {"scene": scene_name, "w": w, "h": h,
            "mrays": round(mrays, 2),
            "spp_per_sec": round(spp / dt, 2)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--steps", type=int, default=64,
                    help="wavefront steps (or samples for megakernel)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--scene", default=None,
                    choices=["cornell", "cornell-analytic", "stress",
                             "stress-analytic", "ref-workload",
                             "cornell-analytic-rrnee",
                             "ref-analytic-nee"],
                    help="default: cornell-analytic + cornell + "
                         "stress + stress-analytic in one run "
                         "(fused/lazy models: cornell + stress)")
    ap.add_argument("--model", default="wavefront",
                    choices=["wavefront", "megakernel", "fused",
                             "lazy"])
    ap.add_argument("--accel", default="auto",
                    choices=["auto", "pair", "pairmx", "pairwin",
                             "group", "cluster", "bvh", "bruteforce",
                             "pallas", "minarg", "march", "flat"])
    ap.add_argument("--chunk", type=int, default=8,
                    help="wavefront steps per device program")
    ap.add_argument("--lanes", type=int, default=1,
                    help="samples in flight per pixel (lane multiplier)")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET", 900)),
                    help="wall-clock budget (s): extra legs are skipped "
                         "once exceeded; the headline JSON always "
                         "prints as soon as the first leg lands")
    args = ap.parse_args()

    # Persistent compilation cache (TPU probe e0: entries persist
    # through the axon remote-compile backend). The stress pair path
    # carries ~100 s of variadic-sort compiles; with a warm repo-local
    # cache the official run skips them entirely. The cache directory
    # is COMMITTED to git (round 4): the driver benches a cleaned
    # checkout, so a gitignored cache is always cold there
    # (BENCH_r03.json died inside the first cold warmup).
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                          -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0)
    except Exception as exc:  # cache is an optimization, never fatal
        print(f"# compilation cache disabled: {exc}", file=sys.stderr)

    # Provenance (VERDICT r4 #5): a libtpu/jax bump silently cold-
    # starts the committed cache and the headline lands minutes later
    # — record enough in the artifact that a cold run explains itself.
    try:
        n_entries = len([f for f in os.listdir(cache_dir)
                         if not f.startswith(".")])
    except OSError:
        n_entries = 0
    _PROVENANCE["jax_version"] = jax.__version__
    try:
        import importlib.metadata as _md
        for pkg in ("libtpu", "libtpu-nightly"):
            try:
                _PROVENANCE["libtpu_version"] = _md.version(pkg)
                break
            except _md.PackageNotFoundError:
                continue
    except Exception:
        pass
    _PROVENANCE["cache_state"] = (
        f"{n_entries} committed entries"
        if n_entries else "cold (no committed cache entries)")

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform})",
          file=sys.stderr)

    if args.scene:
        results = [bench_scene(args.scene, args)]
        _emit(results, args)
        return 0
    if args.model in ("fused", "lazy"):
        # Triangle-only research models: the analytic scenes would be
        # rejected (spheres dropped), so default to the tessellated
        # pair, like the pre-analytic bench.
        results = [bench_scene("cornell", args)]
        _emit(results, args)
        try:
            results.append(bench_scene("stress", args))
        except Exception as exc:
            print(f"# stress bench failed: {exc}", file=sys.stderr)
        _emit(results, args)
        return 0

    # -- Default run: headline first, JSON out IMMEDIATELY, then extras
    # appended incrementally with a wall-clock budget (VERDICT r3 #1:
    # round 3's single end-of-run JSON print lost the whole artifact to
    # a timeout during the FIRST scene's warmup).
    #
    # Headline = cornell in the framework's NATIVE representation
    # (12 box tris + 2 analytic quadrics — same scene content, same
    # image up to tessellation error; the reference tessellates only
    # because prog.cl has no sphere primitive, main.cpp:1002,1009).
    # The reference-parity tessellated number and the stress numbers
    # ride in "extra" so none hides another.
    results = []
    for attempt, (name, cap) in enumerate([
        ("cornell-analytic", max(120, int(args.budget * 0.6))),
        ("cornell-analytic", 300),   # transient compile-service retry
        ("cornell", 300),            # tessellated minarg fallback
    ]):
        try:
            with _alarm(cap):
                results = [bench_scene(name, args)]
            break
        except Exception as exc:  # LegTimeout included
            print(f"# headline attempt {attempt + 1} ({name}) failed: "
                  f"{type(exc).__name__}: {exc}", file=sys.stderr)
    if not results:
        print(json.dumps({
            "metric": "Mrays/sec/chip (all headline attempts failed)",
            "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
        }), flush=True)
        return 1
    _emit(results, args)

    # Cheap legs first so a tight driver timeout banks the most:
    # ref-workload (~25 s warm) before stress (~150 s, its pair
    # compiles miss the persistent cache).
    extras = ["cornell", "ref-workload", "stress", "stress-analytic",
              "cornell-analytic-rrnee", "ref-analytic-nee"]
    if results[0]["scene"] == "cornell":  # headline fell back
        extras.remove("cornell")
    for name in extras:
        remaining = args.budget - (time.time() - _T_START)
        if remaining < 30:
            print(f"# budget {args.budget}s exhausted, skipping "
                  f"{name} onwards", file=sys.stderr)
            break
        try:
            with _alarm(int(min(remaining + 15, 300))):
                results.append(bench_scene(name, args))
        except Exception as exc:  # never lose what's already banked
            print(f"# {name} bench failed: {type(exc).__name__}: "
                  f"{exc}", file=sys.stderr)
            continue
        _emit(results, args)

    # HBM-DMA-branch exactness smoke (VERDICT r3 #7): CPU CI only ever
    # runs the VMEM-resident branch, so record a per-round TPU
    # exactness result for the pair kernel's DMA path in the artifact.
    remaining = args.budget - (time.time() - _T_START)
    if jax.devices()[0].platform != "cpu" and remaining > 60:
        try:
            with _alarm(int(min(remaining + 15, 300))):
                smoke = run_dma_smoke()
            results[0].setdefault("rider", {})["dma_smoke"] = smoke
            _emit(results, args)
        except Exception as exc:
            print(f"# dma smoke failed: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
    return 0


def _emit(results, args) -> None:
    """Print the one-line JSON artifact for the CURRENT result set and
    flush. Called after every completed leg: each line supersedes the
    previous (same headline value, strictly more extras), so whichever
    line a parser picks — first or last — carries the measured headline
    and vs_baseline even if the process is killed mid-leg."""
    head = results[0]
    # BASELINE.md per-chip metrics: Mrays/sec/chip AND spp/sec.
    extra = {f"{head['scene']}_spp_per_sec": head["spp_per_sec"]}
    for r in results[1:]:
        extra[f"{r['scene']}_mrays"] = r["mrays"]
        extra[f"{r['scene']}_spp_per_sec"] = r["spp_per_sec"]
    # BASELINE.md north star is AGGREGATE Grays/s on v5e-8; one chip
    # is available, so publish the documented projection alongside the
    # measured per-chip number: zero per-step collectives (tile
    # sharding is chip-local; test_parallel proves bit-equality) and a
    # measured <=4.2% partition overhead on the virtual 8-device mesh
    # (docs/BENCHMARKS.md "Aggregate-throughput estimate").
    extra["aggregate_grays_v5e8_projected"] = round(
        head["mrays"] * 8 * ICI_EFFICIENCY_ASSUMED / 1000.0, 3)
    extra["ici_efficiency_assumed"] = ICI_EFFICIENCY_ASSUMED
    # Parity-geometry bookkeeping (VERDICT r4 #2): the headline rides
    # the analytic-sphere representation, which the reference does not
    # have (its spheres are tessellated OBJ meshes,
    # main.cpp:1002,1009). Publish the reference-parity TESSELLATED
    # cornell ratio alongside, so the artifact carries both stories.
    parity = next((r["mrays"] for r in results
                   if r["scene"] == "cornell"), None)
    if parity is not None:
        extra["vs_baseline_parity"] = round(
            parity / PER_CHIP_TARGET_MRAYS, 4)
        extra["aggregate_grays_v5e8_projected_parity"] = round(
            parity * 8 * ICI_EFFICIENCY_ASSUMED / 1000.0, 3)
    extra.update(_PROVENANCE)
    if "_first" in _WARMUP_S:
        extra["headline_warmup_s"] = _WARMUP_S["_first"]
    extra.update(head.get("rider", {}))
    extra["elapsed_s"] = round(time.time() - _T_START, 1)
    print(json.dumps({
        "metric": (
            f"Mrays/sec/chip ({args.model}+{args.accel}, "
            f"{head['scene']} {head['w']}x{head['h']}, "
            f"iters={args.iters}"
            + (", + " + "/".join(r["scene"] for r in results[1:])
               + " in extra" if len(results) > 1 else "")
            + ")"
        ),
        "value": head["mrays"],
        "unit": "Mrays/s",
        "vs_baseline": round(head["mrays"] / PER_CHIP_TARGET_MRAYS, 4),
        **({"extra": extra} if extra else {}),
    }), flush=True)


def run_dma_smoke(warm_steps: int = 6) -> dict:
    """Pair-kernel HBM-DMA branch vs the dense brute-force kernel on a
    steady-state bounce-ray population: report hit flips (must be 0).

    Small edition of scripts/tpu_pair_exactness.py sized to ride the
    official bench run. The wavefront is advanced with the DENSE
    intersector so the rays under test are produced independently of
    the kernel under test. TPU-only (interpret mode has no DMA
    emulation — ops/pallas/sorted_intersect.py:15-19)."""
    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
        make_pallas_intersect,
    )
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        PAIR_TPU_WINNER, make_pair_intersect,
    )
    from opencl_path_tracer_tpu.scene import library

    w, h = 512, 512
    n = w * h
    scene = library.stress_scene(100_000)
    cam = library.cornell_camera(w, h)
    key = jax.random.key(3)
    dense = make_pallas_intersect(scene.tris)
    pair = make_pair_intersect(scene.tris, **PAIR_TPU_WINNER)

    state = wavefront.init_wavefront(cam, n, mode="fast", key=key)
    step = jax.jit(lambda st: wavefront.wavefront_step(
        cam, scene.mats, st, intersect_fn=dense, iterations=5,
        mode="fast", key=key))
    for _ in range(warm_steps):
        state = step(state)
    jax.block_until_ready(state.ray_p[0])
    from opencl_path_tracer_tpu.core.types import Rays
    rays = Rays(p=state.ray_p, d=state.ray_d)
    hd = jax.jit(dense)(rays)
    hp = jax.jit(pair)(rays)
    flips = int(jnp.sum(hd.t != hp.t)) + int(jnp.sum(hd.mati != hp.mati))
    print(f"# dma smoke: {n} steady-state rays, {flips} hit flips",
          file=sys.stderr)
    return {"rays": n, "flips": flips}


if __name__ == "__main__":
    sys.exit(main())
