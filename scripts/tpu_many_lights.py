"""TPU: many-light NEE — distance-aware vs power-proportional
selection, e2e (round-5 capability extension; scripts/ probe).

Measures wavefront + NEE throughput (Mrays/s) AND per-pixel sample
variance (Welford lum_m2 at equal spp) for both selection modes at
64 and 256 lights. The figure of merit is equal-TIME efficiency:

    eff = (var_pow * t_pow) / (var_dst * t_dst)

(variance x time-per-sample; > 1 means distance mode reaches any
target noise level that factor faster).

Probe run: /tmp cache. One TPU process at a time.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_probe_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from opencl_path_tracer_tpu.config import CameraConfig, RenderConfig
from opencl_path_tracer_tpu.runtime.engine import RenderEngine
from opencl_path_tracer_tpu.scene import library

RESULTS = {}


def leg(count, select, w=960, h=540, spp=24, iters=5):
    tag = f"L{count}-{select}"
    t0 = time.time()
    try:
        sc = library.many_light_scene(count)
        cfg = RenderConfig(
            width=w, height=h, iterations=iters, mode="fast",
            model="wavefront", nee=True, nee_select=select, spp=spp,
            camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                                shift=(0.0, 0.0, 0.0)),
        )
        eng = RenderEngine(sc, cfg)
        # Variance-tracked fixed render to exactly spp (adaptive with
        # tol=0 never parks below the cap, cap == floor).
        t1 = time.time()
        eng.render_adaptive(1e-9, max_spp=spp, min_spp=spp,
                            progress=False)
        dt = time.time() - t1
        st = eng.state
        n = np.asarray(jax.device_get(st.samples), np.float64)
        m2 = np.asarray(jax.device_get(st.lum_m2), np.float64)
        var = float((m2 / np.maximum(n - 1.0, 1.0)).mean())
        rays = float(n.sum()) * 0  # placeholder; engine tracks below
        mrays = eng._rays_traced / dt / 1e6
        RESULTS[tag] = {
            "mrays": round(mrays, 2), "t_s": round(dt, 2),
            "mean_var": round(var, 5),
        }
        print(f"## {tag}: {mrays:.2f} Mrays/s, {dt:.1f}s, "
              f"var {var:.4f} ({time.time()-t0:.1f}s total)",
              file=sys.stderr)
    except Exception as exc:
        RESULTS[tag] = f"FAIL {type(exc).__name__}: {exc}"
        print(f"## {tag}: FAILED {type(exc).__name__}: {exc}",
              file=sys.stderr)
    print(json.dumps(RESULTS), flush=True)


def main():
    print(f"# device {jax.devices()[0].device_kind}", file=sys.stderr)
    for count in (64, 256):
        for select in ("power", "distance"):
            leg(count, select)
        a = RESULTS.get(f"L{count}-power")
        b = RESULTS.get(f"L{count}-distance")
        if isinstance(a, dict) and isinstance(b, dict):
            eff = (a["mean_var"] * a["t_s"]) / max(
                b["mean_var"] * b["t_s"], 1e-12)
            RESULTS[f"L{count}-equal_time_efficiency"] = round(eff, 2)
            print(f"## L{count}: equal-time efficiency x{eff:.2f}",
                  file=sys.stderr)
    print("FINAL " + json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
