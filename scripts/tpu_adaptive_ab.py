"""TPU: the adaptive-sampling win case (VERDICT r4 #8) — long render,
large frame, live engine (closure cache warm), min_bucket=4096 ladder.

A/B: fixed `max_spp` samples everywhere vs adaptive (stop each pixel
at relative luminance SEM <= tol, cap max_spp). The fixed run is what
the reference's progressive loop does (every pixel gets every sample
forever, prog.cl:379); adaptive's claim is reaching the same
convergence criterion in less wall-clock. Both runs repeat in-process:
run 1 pays compiles (the bucket ladder retraces once per power-of-two
size), run 2 is the steady-state number a live engine session sees.

Run standalone: python scripts/tpu_adaptive_ab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_probe_cache")  # probe cache: keep the committed .jax_cache official-pathway-only
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from opencl_path_tracer_tpu.config import CameraConfig, RenderConfig
from opencl_path_tracer_tpu.runtime.engine import RenderEngine
from opencl_path_tracer_tpu.scene import library


def make_engine(sphere_lamp: bool, nee: bool = False):
    scene = library.cornell_box(with_spheres=True,
                                analytic_spheres=True,
                                sphere_lamp=sphere_lamp)
    cfg = RenderConfig(
        width=1920, height=1080, iterations=5, mode="fast",
        model="wavefront", accel="auto", nee=nee,
        camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                            shift=(0.0, 0.0, 0.0)),
    )
    return RenderEngine(scene, cfg)


def main():
    print(f"# device {jax.devices()[0].device_kind}", file=sys.stderr)
    for name, sphere_lamp, nee, tol, max_spp, min_spp in [
        # NEE + small lamp: direct-lit pixels converge almost
        # immediately, dim GI pixels grind — maximum heterogeneity.
        ("sphere-lamp-nee", True, True, 0.05, 1024, 32),
        # Heterogeneous convergence without NEE.
        ("sphere-lamp", True, False, 0.05, 1024, 32),
        # Near-uniform variance (big quad lamp) — the hard case.
        ("quad-lamp", False, False, 0.03, 1024, 32),
    ]:
        if len(sys.argv) > 1 and name not in sys.argv[1:]:
            continue
        eng = make_engine(sphere_lamp, nee)
        for rep in (1, 2):
            eng.reset_accumulation()
            t0 = time.time()
            eng.render(spp=max_spp, progress=False)
            t_fixed = time.time() - t0
            print(f"RESULT {name}/fixed[{rep}]: {max_spp} spp in "
                  f"{t_fixed:.1f}s ({max_spp/t_fixed:.1f} spp/s)",
                  flush=True)

            eng.reset_accumulation()
            t0 = time.time()
            eng.render_adaptive(tol, max_spp, min_spp=min_spp,
                                progress=False)
            t_ad = time.time() - t0
            samples = np.asarray(eng.state.samples, np.float64)
            mean_spp = float(samples.mean())
            print(f"RESULT {name}/adaptive[{rep}]: tol={tol} "
                  f"max={max_spp} min={min_spp}: {t_ad:.1f}s "
                  f"(mean spp {mean_spp:.0f}, "
                  f"speedup x{t_fixed/t_ad:.2f})", flush=True)


if __name__ == "__main__":
    main()
