"""Environment light (the dormant miss-branch sky code,
prog.cl:367-376) — parity vs the scalar oracle, model agreement, and
persistence/config plumbing.

The test scene is deliberately OPEN (a half-diffuse / half-mirror floor
under empty sky) so all three dormant-code miss tiers occur:
  * primary rays above the horizon miss at bounce 0 -> bare sky;
  * rays reflected off the mirror floor escape with cntr==0 -> sky
    tinted by the path factors;
  * rays diffusing off the matte floor escape with cntr>0 -> the deep
    (white) fill times the factors.
"""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.models import megakernel, wavefront
from opencl_path_tracer_tpu.models.megakernel import EnvLight
from opencl_path_tracer_tpu.ops import intersect
from opencl_path_tracer_tpu.scene import library
from opencl_path_tracer_tpu.scene.builder import SceneBuilder
from opencl_path_tracer_tpu.utils import oracle

ENV = EnvLight()


def open_floor_scene():
    """Half-diffuse / half-mirror floor at y=0 under open sky, in the
    cornell camera frame (eye (500,500,-1299) looking +z)."""
    b = SceneBuilder()
    matte = b.add_material((0.6, 0.5, 0.4), (1.0, 1.0, 1.0),
                           (0.0, 0.0, 0.0), (1.0, 1.0, 1.0),
                           (0.0, 0.0, 0.0), 50.0, 0)
    mirror = b.add_material((0.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                            (0.0, 0.0, 0.0), (0.2, 0.2, 0.2),
                            (3.0, 3.0, 3.0), 0.0, 1)
    for mat, x0, x1 in ((matte, -4000.0, 500.0),
                        (mirror, 500.0, 5000.0)):
        z0, z1 = -2000.0, 8000.0
        b.add_triangle((x0, 0, z0), (x1, 0, z0), (x1, 0, z1), mat)
        b.add_triangle((x0, 0, z0), (x1, 0, z1), (x0, 0, z1), mat)
    b.end_obj()
    return b.build()


def _miss_tiers_covered(scene, cam, w, h, iterations, spp):
    """Replay the oracle and classify each miss event by tier."""
    tiers = set()
    tris_np = oracle.scene_to_numpy(scene)
    mats_np = oracle.mats_to_numpy(scene.mats)
    from opencl_path_tracer_tpu.ops.rng import minstd_rand0_raw
    seeds = minstd_rand0_raw(w * h, 1).astype(np.int64)
    for _ in range(spp):
        for pid in range(w * h):
            tr = oracle.OracleTrace(events=[])
            oracle.trace_pixel(pid, seeds, cam, tris_np, mats_np,
                               iterations, trace=tr, env=ENV)
            diffuse = 0
            for ev in tr.events:
                if ev["ev"] == "diffuse":
                    diffuse += 1
                elif ev["ev"] == "miss_break":
                    if ev["bounce"] == 0:
                        tiers.add("primary")
                    elif diffuse == 0:
                        tiers.add("specular_only")
                    else:
                        tiers.add("after_diffuse")
    return tiers


@pytest.mark.slow
def test_env_megakernel_matches_scalar_oracle():
    w = h = 16
    iterations, spp = 3, 2
    scene = open_floor_scene()
    cam = library.cornell_camera(w, h)
    isect = functools.partial(intersect.first_intersect,
                              tris=scene.tris)
    st = megakernel.render(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=iterations, spp=spp, mode="parity", seed=1,
        env=ENV,
    )
    ours = np.asarray(megakernel.colors_array(st))
    ref_colors, ref_rng = oracle.render_oracle(
        scene, cam, width=w, height=h, iterations=iterations, spp=spp,
        seed=1, env=ENV,
    )
    np.testing.assert_array_equal(np.asarray(st.rng_state), ref_rng)
    np.testing.assert_allclose(ours, ref_colors, rtol=2e-5, atol=2e-6)
    # The scene must actually exercise all three dormant-code tiers —
    # otherwise the parity above proves less than it claims.
    assert _miss_tiers_covered(scene, cam, w, h, iterations, spp) == {
        "primary", "specular_only", "after_diffuse"
    }


def test_env_wavefront_matches_megakernel():
    """Path regeneration with the env light stays bit-identical to the
    megakernel at equal spp (parity mode)."""
    w = h = 8
    iterations, spp = 3, 2
    scene = open_floor_scene()
    cam = library.cornell_camera(w, h)
    isect = functools.partial(intersect.first_intersect,
                              tris=scene.tris)
    mk = megakernel.render(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=iterations, spp=spp, mode="parity", seed=1, env=ENV,
    )
    wf = wavefront.render_wavefront(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=iterations, min_spp=spp, mode="parity", seed=1,
        exact_spp=True, env=ENV,
    )
    np.testing.assert_array_equal(
        np.asarray(megakernel.colors_array(mk)),
        wavefront.colors_by_pixel(wf),
    )


def test_env_primary_miss_is_bare_sky():
    """A scene the camera never hits renders exactly the sky color."""
    w = h = 4
    scene = open_floor_scene()
    cam = library.cornell_camera(w, h)

    def never_hit(rays):
        n = rays.p[0].shape[0]
        from opencl_path_tracer_tpu.core.types import Hits
        z = jnp.zeros((n,), jnp.float32)
        return Hits(t=jnp.full((n,), -1.0, jnp.float32),
                    p=(z, z, z), n=(z, z, z),
                    mati=jnp.zeros((n,), jnp.int32))

    st = megakernel.render(
        cam, scene.mats, intersect_fn=never_hit, num_pixels=w * h,
        iterations=3, spp=2, mode="parity", seed=1, env=ENV,
    )
    img = np.asarray(megakernel.colors_array(st))
    np.testing.assert_array_equal(
        img, np.tile(np.float32(ENV.sky), (w * h, 1))
    )


def test_env_off_is_reference_parity():
    """env=None leaves the shipped break-on-miss behavior untouched
    (same colors as before this feature existed)."""
    w = h = 8
    scene = open_floor_scene()
    cam = library.cornell_camera(w, h)
    isect = functools.partial(intersect.first_intersect,
                              tris=scene.tris)
    st = megakernel.render(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=3, spp=1, mode="parity", seed=1,
    )
    ref_colors, ref_rng = oracle.render_oracle(
        scene, cam, width=w, height=h, iterations=3, spp=1, seed=1,
    )
    np.testing.assert_array_equal(np.asarray(st.rng_state), ref_rng)
    np.testing.assert_allclose(
        np.asarray(megakernel.colors_array(st)), ref_colors,
        rtol=2e-5, atol=2e-6,
    )


def test_env_tiled_step_matches_single_device():
    """Framebuffer-tiled env-lit megakernel step == single device."""
    from opencl_path_tracer_tpu.parallel.mesh import make_render_mesh
    from opencl_path_tracer_tpu.parallel.shard import (
        make_tiled_step, shard_state,
    )
    w, h = 16, 16
    scene = open_floor_scene()
    cam = library.cornell_camera(w, h)
    isect = functools.partial(intersect.first_intersect,
                              tris=scene.tris)
    mesh = make_render_mesh()
    st = megakernel.init_state(w * h, 1)
    tiled = make_tiled_step(
        cam, scene.mats, mesh, intersect_fn=isect, iterations=2,
        mode="parity", env=ENV,
    )
    sharded, _ = tiled(shard_state(st, mesh))
    single = megakernel.trace_sample(
        cam, scene.mats, st, intersect_fn=isect, iterations=2,
        mode="parity", env=ENV,
    )
    for k in range(3):
        # 1-ulp tolerance: XLA may contract the env miss-chain's
        # multiplies differently inside shard_map than in the plain jit
        # (observed: a single element off by 1.2e-7). Non-env tiled
        # renders stay bit-exact (test_parallel.py).
        np.testing.assert_allclose(
            np.asarray(sharded.colors[k]),
            np.asarray(single.colors[k]), rtol=0, atol=3e-7,
        )


def test_env_checkpoint_backcompat(tmp_path):
    """Wavefront checkpoints written before had_diffuse existed load
    with the flag defaulted to False."""
    from opencl_path_tracer_tpu.io import checkpoint
    w = h = 4
    cam = library.cornell_camera(w, h)
    st = wavefront.init_wavefront(cam, w * h, seed=1, mode="parity")
    new = tmp_path / "new.npz"
    checkpoint.save_checkpoint(str(new), st, meta={"spp": 0})
    with np.load(str(new), allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files
                  if k not in ("had_diffuse", "meta")}
        meta = z["meta"]
    old = tmp_path / "old.npz"
    np.savez(str(old), **arrays, meta=meta)
    loaded, _ = checkpoint.load_checkpoint(str(old))
    assert loaded.had_diffuse.dtype == bool
    assert not bool(np.any(np.asarray(loaded.had_diffuse)))
    # And a current-format roundtrip still restores it verbatim.
    loaded2, _ = checkpoint.load_checkpoint(str(new))
    np.testing.assert_array_equal(
        np.asarray(loaded2.had_diffuse), np.asarray(st.had_diffuse)
    )


def test_env_config_roundtrip():
    from opencl_path_tracer_tpu.config import RenderConfig
    cfg = RenderConfig(env_light=True, env_sky=(0.1, 0.2, 0.3))
    back = RenderConfig.from_json(cfg.to_json())
    assert back.env_light and back.env_sky == (0.1, 0.2, 0.3)
    assert back.env_deep == (1.0, 1.0, 1.0)
