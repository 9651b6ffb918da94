"""Native C++ components must match their Python twins exactly."""

import numpy as np
import pytest

from opencl_path_tracer_tpu import native
from opencl_path_tracer_tpu.core.geometry import TrianglesSoA

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)

OBJ = """\
mtllib test.mtl
o tri_and_quad
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
usemtl gold
f 1 2 3
f 1 2 4 3
g second
v 2 0 0
f -1 1 2
"""

MTL = """\
newmtl gold
Kd 0.1 0.2 0.3
Ks 0.4 0.5 0.6
Ke 0 0 0
Ns 12.5
Kn 0.17 0.35 1.5
Kk 3.1 2.7 1.9
Tp 1
"""


@pytest.fixture
def obj_file(tmp_path):
    (tmp_path / "test.mtl").write_text(MTL)
    p = tmp_path / "test.obj"
    p.write_text(OBJ)
    return str(p)


def test_objloader_matches_python(obj_file):
    from opencl_path_tracer_tpu.io.obj import load_obj

    a_py, s_py, m_py = load_obj(obj_file)
    a_nat, s_nat, m_nat = native.load_obj_native(obj_file)

    np.testing.assert_allclose(a_nat.vertices, a_py.vertices)
    assert len(s_nat) == len(s_py) == 2
    for sp, sn in zip(s_py, s_nat):
        np.testing.assert_array_equal(sn.vertex_indices,
                                      sp.vertex_indices)
        np.testing.assert_array_equal(sn.material_ids, sp.material_ids)
    assert len(m_nat) == 1
    mp, mn = m_py[0], m_nat[0]
    assert mn.name == mp.name == "gold"
    np.testing.assert_allclose(mn.diffuse, mp.diffuse)
    assert float(mn.shininess) == float(mp.shininess)
    for key in ("Kn", "Kk", "Tp"):
        pv = [float(x) for x in mp.unknown_parameter[key].split()]
        nv = [float(x) for x in mn.unknown_parameter[key].split()]
        np.testing.assert_allclose(nv, pv)


def test_objloader_missing_file():
    with pytest.raises(FileNotFoundError):
        native.load_obj_native("/nonexistent/x.obj")


def _random_tris(t, seed=0):
    rs = np.random.default_rng(seed)
    centers = rs.uniform(-10, 10, size=(t, 1, 3))
    v = (centers + rs.normal(size=(t, 3, 3)) * 0.6).astype(np.float32)
    return TrianglesSoA.build(
        v[:, 0], v[:, 1], v[:, 2], np.arange(t, dtype=np.int32) % 7
    )


def test_native_bvh_matches_bruteforce():
    import jax.numpy as jnp
    from opencl_path_tracer_tpu.accel import make_bvh_intersect
    from opencl_path_tracer_tpu.core.types import Rays
    from opencl_path_tracer_tpu.ops import intersect

    tris = _random_tris(500, seed=4)
    bvh = native.build_median_tree_native(tris, leaf_size=4)

    rs = np.random.default_rng(5)
    p = rs.uniform(-12, 12, size=(300, 3)).astype(np.float32)
    d = rs.normal(size=(300, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Rays.make(jnp.asarray(p), jnp.asarray(d))

    brute = intersect.first_intersect(rays, tris)
    fast = make_bvh_intersect(bvh)(rays)
    bt, ft = np.asarray(brute.t), np.asarray(fast.t)
    np.testing.assert_array_equal(bt > 0, ft > 0)
    hit = bt > 0
    np.testing.assert_allclose(ft[hit], bt[hit], rtol=1e-4)


def test_native_bvh_structure_sane():
    tris = _random_tris(1000, seed=6)
    bvh = native.build_median_tree_native(tris, leaf_size=4)
    nodes = np.asarray(bvh.nodes)
    internal = nodes[nodes[:, 6] < 0]
    leaves = nodes[nodes[:, 6] >= 0]
    # Balanced median split: depth ~ ceil(log2(1000/4)) = 8.
    assert bvh.depth <= 10
    assert len(leaves) >= 1000 / 4
    # Leaf ranges cover exactly the (padded) triangle array.
    spans = leaves[:, 6].astype(int)
    assert sorted(spans) == list(
        range(0, bvh.tri_pack.shape[0], bvh.leaf_size)
    )
