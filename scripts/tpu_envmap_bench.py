"""TPU job: image-based environment lighting cost + hero render.

Measures on the open-horizon scene (examples/09) at 1536x864:
  1. constant EnvLight wavefront steps/s (pre-existing path),
  2. EnvMap nee=False (radiance lookup on miss only),
  3. EnvMap nee=True (gather + shadow rays + MIS),
and renders a sun-sky hero PNG with NEE on.
Also re-times the cornell-analytic headline step (env=None) to prove
the env wiring costs the hot path nothing.
"""
import importlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, state, iters=20):
    state = fn(state)
    jax.block_until_ready(state.ray_p[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state.ray_p[0])
    return (time.perf_counter() - t0) / iters, state


def main():
    from opencl_path_tracer_tpu.models import megakernel, wavefront
    from opencl_path_tracer_tpu.ops import envmap, tonemap
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn
    from opencl_path_tracer_tpu.scene import library
    from opencl_path_tracer_tpu.io.image import write_png
    sys.path.insert(0, "/root/repo/examples")
    spec = importlib.util.spec_from_file_location(
        "ex09", "/root/repo/examples/09_environment_light.py")
    ex09 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ex09)

    out = {"job": "envmap_bench"}
    w, h = 1536, 864
    n = w * h
    scene = ex09.open_horizon_scene()
    from opencl_path_tracer_tpu.core.camera import make_camera
    cam = make_camera(w, h, fov=60.0, yaw=0.0, pitch=14.0,
                      shift=(0.0, 0.0, 0.0))
    isect = make_intersect_fn(scene, "auto")
    key = jax.random.key(7)

    img = envmap.sun_sky(sun_dir=(0.35, 0.75, 0.3),
                         sun_radiance=(2500.0, 2300.0, 2100.0),
                         sun_angle_deg=2.0, sky=(0.10, 0.14, 0.25),
                         res=(256, 128))
    E0 = envmap.build_envmap(img, sample_res=(64, 32), nee=False)
    E1 = envmap.build_envmap(img, sample_res=(64, 32), nee=True)
    EL = megakernel.EnvLight(sky=(0.10, 0.14, 0.25))

    for name, env in (("envlight", EL), ("envmap", E0),
                      ("envmap_nee", E1)):
        st = wavefront.init_wavefront(cam, n, mode="fast", key=key)
        step = jax.jit(lambda s, e=env: wavefront.wavefront_step(
            cam, scene.mats, s, intersect_fn=isect, iterations=5,
            mode="fast", key=key, env=e))
        dt, st = timeit(step, st)
        out[name + "_ms"] = round(dt * 1e3, 2)
        out[name + "_msteps_s"] = round(n / dt / 1e6, 1)

    # hero render: sun-sky + NEE
    st = wavefront.init_wavefront(cam, n, mode="fast", key=key)
    step = jax.jit(lambda s: wavefront.wavefront_step(
        cam, scene.mats, s, intersect_fn=isect, iterations=5,
        mode="fast", key=key, env=E1))
    t0 = time.perf_counter()
    k = 0
    while float(jnp.min(st.samples)) < 32:
        for _ in range(16):
            st = step(st)
        k += 16
    jax.block_until_ready(st.ray_p[0])
    out["hero_steps"] = k
    out["hero_s"] = round(time.perf_counter() - t0, 1)
    img_out = wavefront.colors_by_pixel(st, n)
    arr = np.asarray(tonemap.reinhard(
        (jnp.asarray(img_out[:, 0]), jnp.asarray(img_out[:, 1]),
         jnp.asarray(img_out[:, 2])))).reshape(h, w, 3)
    write_png("/root/repo/docs/images/envmap_sunsky_tpu.png",
              arr[::-1])

    # cornell-analytic headline: env wiring must cost nothing
    sc = library.cornell_box(analytic_spheres=True)
    cam2 = library.cornell_camera(1920, 1080)
    is2 = make_intersect_fn(sc, "auto")
    st2 = wavefront.init_wavefront(cam2, 1920 * 1080, mode="fast",
                                   key=key)
    step2 = jax.jit(lambda s: wavefront.wavefront_step(
        cam2, sc.mats, s, intersect_fn=is2, iterations=5,
        mode="fast", key=key))
    dt2, _ = timeit(step2, st2)
    out["cornell_analytic_step_ms"] = round(dt2 * 1e3, 2)
    print(json.dumps(out))


main()
