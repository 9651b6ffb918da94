"""OBJ/MTL loader, scene builder transforms, PNG round-trip."""

import numpy as np
import pytest

from opencl_path_tracer_tpu.io.image import read_png, write_png
from opencl_path_tracer_tpu.io.obj import load_obj
from opencl_path_tracer_tpu.scene.builder import SceneBuilder
from opencl_path_tracer_tpu.scene import library


OBJ = """\
# comment
mtllib m.mtl
o first
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vn 0 0 1
vt 0.5 0.5
usemtl red
f 1/1/1 2/1/1 3/1/1
f 1 2 4 3
g second
v 2 0 0
f -1 -5 -4
"""

MTL = """\
newmtl red
Kd 0.8 0.1 0.1
Ks 0.2 0.2 0.2
Ke 0 0 0
Ns 25
Kn 1.5 1.5 1.5
Kk 0 0 0
Tp 2
newmtl plain
Kd 0.5 0.5 0.5
Kn 0 0 0
Kk 0 0 0
Tp 0
"""


@pytest.fixture
def obj_path(tmp_path):
    (tmp_path / "m.mtl").write_text(MTL)
    p = tmp_path / "a.obj"
    p.write_text(OBJ)
    return str(p)


def test_load_obj_shapes_and_indices(obj_path):
    attrib, shapes, mats = load_obj(obj_path)
    assert attrib.vertices.shape == (5, 3)
    assert len(shapes) == 2
    s0, s1 = shapes
    # Quad fan-triangulated: 1 + 2 = 3 tris in shape 0.
    assert len(s0.material_ids) == 3
    np.testing.assert_array_equal(s0.num_face_vertices, [3, 4])
    # All shape-0 faces use material 0 ('red').
    np.testing.assert_array_equal(s0.material_ids, [0, 0, 0])
    # Negative indices resolve relative to current vertex count.
    np.testing.assert_array_equal(s1.vertex_indices, [4, 0, 1])
    # usemtl persists across shapes (tinyobj semantics).
    np.testing.assert_array_equal(s1.material_ids, [0])


def test_load_mtl_fields_and_custom_keys(obj_path):
    _, _, mats = load_obj(obj_path)
    assert [m.name for m in mats] == ["red", "plain"]
    red = mats[0]
    assert red.diffuse == (0.8, 0.1, 0.1)
    assert red.shininess == 25
    assert red.unknown_parameter["Kn"] == "1.5 1.5 1.5"
    assert red.unknown_parameter["Tp"] == "2"
    assert mats[1].unknown_parameter["Tp"] == "0"


def test_builder_add_obj_transforms(obj_path):
    b = SceneBuilder()
    b.add_obj(obj_path, pos=(10.0, 20.0, 30.0), scale=(2.0, 2.0, 2.0),
              pitch=0.0, yaw=0.0)
    scene = b.build()
    # Vertex (1,0,0) -> X-flip (-1,0,0) -> *2+pos = (8,20,30).
    r2 = np.asarray(scene.tris.r2)
    np.testing.assert_allclose(r2[0], [8.0, 20.0, 30.0], atol=1e-5)
    # Materials got Tp=2 -> refractive with n=1.5.
    assert int(np.asarray(scene.mats.type)[0]) == 2
    assert float(np.asarray(scene.mats.n)[0]) == 1.5
    # Two shapes -> two object ranges.
    assert scene.num_objects == 2


def test_builder_missing_custom_key_raises(tmp_path):
    (tmp_path / "m.mtl").write_text("newmtl x\nKd 1 1 1\n")
    p = tmp_path / "b.obj"
    p.write_text("mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\n"
                 "usemtl x\nf 1 2 3\n")
    b = SceneBuilder()
    with pytest.raises(KeyError):
        b.add_obj(str(p), pos=(0, 0, 0), scale=(1, 1, 1))


def test_write_sphere_obj_roundtrip(tmp_path):
    p = tmp_path / "s.obj"
    library.write_sphere_obj(str(p), radius=2.0, lat=6, lon=8)
    b = SceneBuilder()
    b.add_obj(str(p), pos=(0, 0, 0), scale=(1, 1, 1))
    scene = b.build()
    assert scene.num_triangles > 50
    # All vertices on the sphere of radius 2.
    r = np.linalg.norm(np.asarray(scene.tris.r1), axis=1)
    np.testing.assert_allclose(r, 2.0, rtol=1e-4)
    # Gold conductor material.
    assert int(np.asarray(scene.mats.type)[0]) == 1


def test_png_roundtrip(tmp_path):
    img = (np.random.default_rng(0).uniform(
        0, 1, size=(17, 23, 3)) * 255).astype(np.uint8)
    p = tmp_path / "x.png"
    write_png(str(p), img)
    back = read_png(str(p))
    np.testing.assert_array_equal(back, img)


def test_png_nan_clamping(tmp_path):
    img = np.full((4, 4, 3), np.nan, np.float32)
    p = tmp_path / "n.png"
    write_png(str(p), img)
    back = read_png(str(p))
    assert back.max() == 0  # NaN -> black (tonemap quirk handling)


def test_reference_scene_builds():
    scene = library.reference_scene(models_dir=None)
    assert scene.num_triangles > 1000
    assert scene.num_objects >= 8
    assert int(scene.mats.count) == 10


def test_reference_scene_with_model_assets():
    """The seven generated model OBJs (tests/assets/models, from
    scripts/gen_models.py) drive the full add_Obj path: OBJ parse, MTL
    with Kn/Kk/Tp (main.cpp:564-581), X-flip + transform, per-shape
    end_obj (main.cpp:615)."""
    import os
    import numpy as np
    here = os.path.dirname(__file__)
    scene = library.reference_scene(os.path.join(here, "assets", "models"))
    assert scene.num_objects == 8  # ground + 7 models
    # 10 archetypes + 7 MTL materials.
    assert scene.mats.type.shape[0] == 17
    types = np.asarray(scene.mats.type)[10:]
    assert sorted(types.tolist()) == [0, 0, 1, 2, 2, 2, 3]
    # The gold MTL's Kn/Kk became a conductor F0 (main.cpp:104-110):
    # F0 = (k^2 + (n-1)^2) / (k^2 + (n+1)^2), per channel.
    gold = np.nonzero(types == 1)[0][0] + 10
    f0r = float(np.asarray(scene.mats.f0[0])[gold])
    n_, k_ = 0.17, 3.1
    expect = (k_**2 + (n_ - 1)**2) / (k_**2 + (n_ + 1)**2)
    np.testing.assert_allclose(f0r, expect, rtol=1e-6)
    # X-flip applied on load (main.cpp:598): the chair sits at +x=50
    # pre-flip... its vertices must lie in the transformed range.
    assert scene.num_triangles > 1800
