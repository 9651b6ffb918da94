"""Image textures: atlas build, bilinear sampling, engine wiring.

Capability the reference parses but never uses: tinyobj fills
material_t.diffuse_texname from `map_Kd` (tiny_obj_loader.h:124-182)
and main.cpp reads only flat Kd/Ks/Ke (main.cpp:564-581). Here
core/textures.py samples the bound image at the hit UV and modulates
kd (runtime.engine.make_intersect_fn(textured=True))."""

import numpy as np
import jax.numpy as jnp
import pytest

from opencl_path_tracer_tpu.core.textures import TexturesSoA, kd_scale
from opencl_path_tracer_tpu.core.types import Rays, v3_from_array
from opencl_path_tracer_tpu.scene import library
from opencl_path_tracer_tpu.scene.builder import SceneBuilder


def _tex(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 1.0, (h, w, 3)).astype(np.float32)


def _bilinear_ref(img, s, t):
    """Numpy reference: repeat-wrap bilinear on a top-down image with
    OBJ vt orientation (t=0 is the bottom row)."""
    img = img[::-1]  # bottom-up, like TexturesSoA.build
    h, w = img.shape[:2]
    sf = s - np.floor(s)
    tf = t - np.floor(t)
    x = sf * w - 0.5
    y = tf * h - 0.5
    x0 = int(np.floor(x))
    y0 = int(np.floor(y))
    fx = x - x0
    fy = y - y0
    c = lambda yy, xx: img[yy % h, xx % w]
    return ((c(y0, x0) * (1 - fx) + c(y0, x0 + 1) * fx) * (1 - fy)
            + (c(y0 + 1, x0) * (1 - fx) + c(y0 + 1, x0 + 1) * fx) * fy)


def test_build_pads_flips_and_converts_uint8():
    a = (_tex(2, 3) * 255).astype(np.uint8)
    b = _tex(4, 2, seed=1)
    tex = TexturesSoA.build([a, b], [0, 1, -1])
    assert tex.count == 2 and tex.hm == 4 and tex.wm == 3
    assert list(np.asarray(tex.height)) == [2, 4]
    assert list(np.asarray(tex.width)) == [3, 2]
    # atlas row 0 of image 0 is the BOTTOM row of the source (vt
    # origin at lower-left), uint8 scaled to [0, 1].
    got = np.stack([np.asarray(tex.atlas[k])[:3] for k in range(3)], -1)
    np.testing.assert_allclose(got, a[-1].astype(np.float32) / 255.0)
    # image 1 starts at base hm*wm, its padded rows are wm wide.
    base = tex.hm * tex.wm
    got1 = np.stack(
        [np.asarray(tex.atlas[k])[base:base + 2] for k in range(3)], -1)
    np.testing.assert_allclose(got1, b[-1], atol=1e-7)


def test_kd_scale_texel_centers_and_bilinear():
    img = _tex(5, 7)
    tex = TexturesSoA.build([img], [0])
    h, w = 5, 7
    # Texel centers reproduce texel values exactly.
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    s = ((xs.ravel() + 0.5) / w).astype(np.float32)
    t = ((ys.ravel() + 0.5) / h).astype(np.float32)
    mati = jnp.zeros(s.size, jnp.int32)
    ok = jnp.ones(s.size, bool)
    out = kd_scale(tex, mati, jnp.asarray(s), jnp.asarray(t), ok)
    got = np.stack([np.asarray(out[k]) for k in range(3)], -1)
    np.testing.assert_allclose(got, img[::-1].reshape(-1, 3), atol=1e-6)
    # Arbitrary (incl. out-of-[0,1), wrap) coords match the numpy
    # reference bilinear.
    rng = np.random.default_rng(2)
    s2 = rng.uniform(-2.0, 3.0, 64).astype(np.float32)
    t2 = rng.uniform(-2.0, 3.0, 64).astype(np.float32)
    out2 = kd_scale(tex, jnp.zeros(64, jnp.int32), jnp.asarray(s2),
                    jnp.asarray(t2), jnp.ones(64, bool))
    got2 = np.stack([np.asarray(out2[k]) for k in range(3)], -1)
    ref = np.stack([_bilinear_ref(img, s2[i], t2[i]) for i in range(64)])
    np.testing.assert_allclose(got2, ref, atol=1e-5)


def test_kd_scale_untextured_and_not_ok_lanes_are_one():
    tex = TexturesSoA.build([_tex(4, 4) * 0.25], [-1, 0])
    s = jnp.full(4, 0.5, jnp.float32)
    mati = jnp.asarray([0, 1, 0, 1], jnp.int32)   # mat 0 unbound
    ok = jnp.asarray([True, True, True, False])   # lane 3 not ok
    out = kd_scale(tex, mati, s, s, ok)
    got = np.stack([np.asarray(out[k]) for k in range(3)], -1)
    np.testing.assert_allclose(got[0], 1.0)   # unbound material
    np.testing.assert_allclose(got[3], 1.0)   # ok=False
    assert got[1].max() <= 0.3                # bound lane sampled
    np.testing.assert_allclose(got[2], 1.0)


def _textured_quad_scene(img):
    """Unit quad at z=5, uv = ((x+1)/2 pre-flip, (y+1)/2), textured."""
    b = SceneBuilder()
    m = b.add_material((1, 1, 1), (0, 0, 0), (0, 0, 0),
                       (1, 1, 1), (0, 0, 0), 1.0, 0)
    # Corners in world space; builder applies no transform here so uv
    # maps world (x, y) directly.
    b.add_triangle((-1, -1, 5), (1, -1, 5), (-1, 1, 5), m,
                   uv=((0, 0), (1, 0), (0, 1)))
    b.add_triangle((1, -1, 5), (1, 1, 5), (-1, 1, 5), m,
                   uv=((1, 0), (1, 1), (0, 1)))
    ti = b.add_texture(img)
    b.set_material_texture(m, ti)
    return b.build()


def test_engine_textured_fn_samples_at_hit_uv():
    from opencl_path_tracer_tpu.runtime.engine import make_intersect_fn

    img = _tex(8, 8, seed=3)
    scene = _textured_quad_scene(img)
    fn = make_intersect_fn(scene, "bruteforce", textured=True)
    targets = np.float32([[-0.5, -0.5], [0.25, 0.75], [0.0, 0.0],
                          [50.0, 50.0]])  # last one misses
    p = np.concatenate([targets, np.zeros((4, 1), np.float32)], 1)
    rays = Rays(
        p=v3_from_array(jnp.asarray(p)),
        d=v3_from_array(jnp.asarray([[0, 0, 1]] * 4, jnp.float32)),
    )
    hits, scale = fn(rays)
    assert bool(np.asarray(hits.valid)[:3].all())
    assert not bool(np.asarray(hits.valid)[3])
    got = np.stack([np.asarray(scale[k]) for k in range(3)], -1)
    for i in range(3):
        u = (targets[i, 0] + 1.0) / 2.0
        v = (targets[i, 1] + 1.0) / 2.0
        np.testing.assert_allclose(got[i], _bilinear_ref(img, u, v),
                                   atol=1e-5)
    np.testing.assert_allclose(got[3], 1.0)  # miss lane


def test_engine_textured_render_differs_and_validates():
    """RenderConfig(textured=True) renders end-to-end; a dark texture
    lowers the image vs the untextured render (same scene/RNG).
    Validation: textureless scenes and non-ids accels are refused."""
    from opencl_path_tracer_tpu.config import CameraConfig, RenderConfig
    from opencl_path_tracer_tpu.runtime.engine import (
        RenderEngine, make_intersect_fn,
    )

    b = SceneBuilder()
    white = b.add_material((0.9, 0.9, 0.9), (0, 0, 0), (0, 0, 0),
                           (1, 1, 1), (0, 0, 0), 1.0, 0)
    b.add_material((0, 0, 0), (0, 0, 0), (20, 20, 20),
                   (1, 1, 1), (0, 0, 0), 1.0, 3)
    # Cornell-scale lit box slice: emitter ceiling, textured diffuse
    # floor (cornell_camera geometry, eye (500, 500, -1299)).
    b.add_triangle((0, 0, 0), (1000, 0, 0), (0, 0, 1000), white,
                   uv=((0, 0), (1, 0), (0, 1)))
    b.add_triangle((1000, 0, 0), (1000, 0, 1000), (0, 0, 1000), white,
                   uv=((1, 0), (1, 1), (0, 1)))
    b.add_triangle((0, 1000, 0), (0, 1000, 1000), (1000, 1000, 0), 1)
    b.add_triangle((1000, 1000, 0), (0, 1000, 1000), (1000, 1000, 1000),
                   1)
    ti = b.add_texture(np.full((4, 4, 3), 0.1, np.float32))
    b.set_material_texture(white, ti)
    scene = b.build()

    cam = CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                       shift=(0.0, 0.0, 0.0))
    imgs = {}
    for textured in (False, True):
        cfg = RenderConfig(width=16, height=16, iterations=4, spp=4,
                           mode="fast", accel="bruteforce",
                           textured=textured, camera=cam)
        eng = RenderEngine(scene, cfg)
        eng.render(cfg.spp, progress=False)
        imgs[textured] = eng.image(apply_tonemap=False)
        assert np.isfinite(imgs[textured]).all()
    assert imgs[True].mean() < imgs[False].mean()
    assert np.abs(imgs[True] - imgs[False]).max() > 1e-4

    plain = library.cornell_box(with_spheres=True)
    with pytest.raises(ValueError, match="no textures"):
        make_intersect_fn(plain, "bruteforce", textured=True)
    with pytest.raises(ValueError, match="ids-reporting"):
        make_intersect_fn(scene, "pallas", textured=True)


def test_builder_texture_binding_validates():
    b = SceneBuilder()
    m = b.add_material((1, 1, 1), (0, 0, 0), (0, 0, 0),
                       (1, 1, 1), (0, 0, 0), 1.0, 0)
    ti = b.add_texture(np.zeros((2, 2, 3), np.float32))
    with pytest.raises(ValueError, match="no material"):
        b.set_material_texture(m + 1, ti)
    with pytest.raises(ValueError, match="no texture"):
        b.set_material_texture(m, ti + 1)
    b.set_material_texture(m, ti)
    b.add_triangle((0, 0, 5), (1, 0, 5), (0, 1, 5), m,
                   uv=((0, 0), (1, 0), (0, 1)))
    scene = b.build()
    assert scene.textures is not None
    assert int(np.asarray(scene.textures.mat_texi)[m]) == ti


def test_obj_map_kd_autoload_and_missing_warns(tmp_path, capsys):
    """add_obj loads MTL map_Kd PNGs relative to the OBJ directory
    and binds them; missing files warn and leave the material
    untextured (the whole-scene load survives)."""
    from opencl_path_tracer_tpu.io.image import write_png

    img = (_tex(4, 4, seed=5) * 255).astype(np.uint8)
    write_png(str(tmp_path / "checker.png"), img)
    (tmp_path / "quad.mtl").write_text(
        "newmtl tex\nKd 1 1 1\nKs 0 0 0\nKe 0 0 0\nNs 1\n"
        "Kn 1 1 1\nKk 0 0 0\nTp 0\nmap_Kd checker.png\n"
        "newmtl missing\nKd 1 1 1\nKs 0 0 0\nKe 0 0 0\nNs 1\n"
        "Kn 1 1 1\nKk 0 0 0\nTp 0\nmap_Kd nope.png\n"
    )
    (tmp_path / "quad.obj").write_text(
        "mtllib quad.mtl\n"
        "v -1 -1 5\nv 1 -1 5\nv -1 1 5\nv 1 1 5\n"
        "vt 0 0\nvt 1 0\nvt 0 1\nvt 1 1\n"
        "usemtl tex\nf 1/1 2/2 3/3\n"
        "usemtl missing\nf 2/2 4/4 3/3\n"
    )
    b = SceneBuilder()
    b.add_obj(str(tmp_path / "quad.obj"), pos=(0, 0, 0),
              scale=(1, 1, 1))
    scene = b.build()
    err = capsys.readouterr().err
    assert "nope.png" in err and "untextured" in err
    assert scene.textures is not None
    mt = np.asarray(scene.textures.mat_texi)
    assert (mt >= 0).sum() == 1  # only the found texture bound
    # Bound atlas carries the PNG content (bottom-up, uint8/255).
    got = np.stack(
        [np.asarray(scene.textures.atlas[k])[:4] for k in range(3)], -1)
    np.testing.assert_allclose(
        got, img[::-1][0].astype(np.float32) / 255.0, atol=1e-7)
