"""Sort-grouped intersectors must agree with brute force exactly
(the same correctness property the reference's kd_intersect has vs its
commented-out first_intersect scan, prog.cl:318-319)."""

import functools

import numpy as np
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.ops import intersect
from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
    make_group_intersect,
)
from opencl_path_tracer_tpu.scene import library

import pytest

pytestmark = pytest.mark.slow


def _rand_rays(r, seed=1, lo=-90.0, hi=990.0):
    rs = np.random.default_rng(seed)
    p = rs.uniform(lo, hi, size=(r, 3)).astype(np.float32)
    d = rs.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays.make(jnp.asarray(p), jnp.asarray(d))


def _check(hits, brute):
    tb, tg = np.asarray(brute.t), np.asarray(hits.t)
    np.testing.assert_array_equal(tb > 0, tg > 0)
    both = (tb > 0) & (tg > 0)
    np.testing.assert_allclose(tg[both], tb[both], rtol=2e-5, atol=1e-3)
    assert np.all(
        ~both | (np.asarray(brute.mati) == np.asarray(hits.mati))
        | ~np.isclose(tb, tg, rtol=1e-6)
    )


def test_group_intersect_matches_bruteforce_cornell():
    scene = library.cornell_box(with_spheres=True)
    rays = _rand_rays(4096)
    gi = make_group_intersect(scene.tris, tr=256, subtiles=2,
                              interpret=True)
    _check(gi(rays), intersect.first_intersect(rays, scene.tris))


def test_group_intersect_axis_aligned_and_on_face_rays():
    """Rays lying exactly on cluster faces with d==0 components — the
    0*inf=NaN slab hazard the guard exists for."""
    scene = library.cornell_box(with_spheres=False)
    p = np.array([
        [-100.0, 500.0, 500.0],   # exactly on the left wall plane
        [500.0, 1000.0, 500.0],   # exactly on the ceiling
        [500.0, 500.0, -0.0],
        [500.0, 0.0, 500.0],
    ], np.float32)
    d = np.array([
        [1.0, 0.0, 0.0],
        [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 1.0, 0.0],
    ], np.float32)
    rays = Rays.make(jnp.asarray(p), jnp.asarray(d))
    gi = make_group_intersect(scene.tris, tr=256, subtiles=1,
                              interpret=True)
    _check(gi(rays), intersect.first_intersect(rays, scene.tris))


def test_group_intersect_odd_ray_count_padding():
    scene = library.cornell_box(with_spheres=True)
    rays = _rand_rays(777, seed=3)
    gi = make_group_intersect(scene.tris, tr=256, subtiles=4,
                              interpret=True)
    _check(gi(rays), intersect.first_intersect(rays, scene.tris))


def _rand_tris(t, seed=0, spread=50.0):
    from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
    rs = np.random.default_rng(seed)
    centers = rs.uniform(-spread, spread, size=(t, 1, 3))
    verts = (centers + rs.normal(size=(t, 3, 3)) * 1.2).astype(np.float32)
    return TrianglesSoA.build(
        verts[:, 0], verts[:, 1], verts[:, 2],
        np.arange(t, dtype=np.int32) % 7,
    )


@pytest.mark.parametrize("mxu,move,thin", [
    (False, "gather", False), (True, "gather", False),
    (False, "sort", False), (True, "sort", False),
    (True, "chain", True),
])
def test_pair_intersect_exact_with_full_capacity(mxu, move, thin):
    """Escalation to every rank with full prefix capacity == brute."""
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        make_pair_intersect,
    )
    tris = _rand_tris(3000)
    rays = _rand_rays(2048, seed=5, lo=-60.0, hi=60.0)
    pi = make_pair_intersect(tris, cluster_size=256, l1=4, l2=12,
                             trp=512, u2_frac=1, u3_frac=1, mxu=mxu,
                             move=move, thin=thin, interpret=True)
    _check(pi(rays), intersect.first_intersect(rays, tris))


@pytest.mark.parametrize("mxu,dop,infeat", [
    (False, False, False), (True, False, False), (True, True, False),
    (True, False, True),
])
def test_pair_intersect_enclosed_scene_default_capacity(mxu, dop,
                                                        infeat):
    """On an enclosed scene (every ray hits) the nearest-first
    certificate resolves almost everything in round 1, so the default
    prefix capacities suffice. dop=True additionally exercises the
    14-DOP candidate culling (tighter certificates, same hits);
    infeat=True the in-kernel Plucker feature computation."""
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        make_pair_intersect,
    )
    scene = library.stress_scene(6000)
    rays = _rand_rays(4096, seed=7, lo=-80.0, hi=1080.0)
    pi = make_pair_intersect(scene.tris, cluster_size=256, l1=4, l2=12,
                             trp=512, u2_frac=2, u3_frac=4, mxu=mxu,
                             dop=dop, infeat=infeat, interpret=True)
    _check(pi(rays), intersect.first_intersect(rays, scene.tris))


def test_pair_intersect_small_ray_count():
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        make_pair_intersect,
    )
    tris = _rand_tris(1500, seed=2)
    rays = _rand_rays(100, seed=9, lo=-60.0, hi=60.0)
    pi = make_pair_intersect(tris, cluster_size=128, l1=3, l2=8,
                             trp=256, u2_frac=1, u3_frac=1,
                             interpret=True)
    _check(pi(rays), intersect.first_intersect(rays, tris))


def test_pair_mxu_small_ray_count_and_tiny_tiles():
    """trp=128 forces many run-boundary tiles (extra-coverage path)
    and rpad >> r padding rays through the MXU kernel."""
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        make_pair_intersect,
    )
    tris = _rand_tris(1500, seed=2)
    rays = _rand_rays(100, seed=9, lo=-60.0, hi=60.0)
    pi = make_pair_intersect(tris, cluster_size=128, l1=3, l2=8,
                             trp=128, u2_frac=1, u3_frac=1, mxu=True,
                             interpret=True)
    _check(pi(rays), intersect.first_intersect(rays, tris))


@pytest.mark.parametrize("mxu", [False, True])
def test_pair_intersect_nondivisible_pair_tiles(mxu):
    """Round-3 windows often produce pair counts that are not a tile
    multiple; the dummy-key padding must keep results exact."""
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        make_pair_intersect,
    )
    scene = library.stress_scene(6000)
    rays = _rand_rays(512, seed=11, lo=50.0, hi=950.0)
    # c=23 here: round 3 tests 11 ranks over a 128-ray prefix = 1408
    # pairs, not a multiple of trp=512.
    pi = make_pair_intersect(scene.tris, cluster_size=256, l1=4, l2=12,
                             trp=512, u2_frac=2, u3_frac=32, mxu=mxu,
                             interpret=True)
    _check(pi(rays), intersect.first_intersect(rays, scene.tris))


@pytest.mark.parametrize("thin,move", [
    (False, "gather"), (True, "gather"), (True, "chain"),
])
def test_pair_mxu_forced_pend_funnels_through_tail(monkeypatch, thin,
                                                   move):
    """The pend contract: a ray whose pair test ends pend must stay
    unresolved until the dense tail certifies it. Force pend=True for
    EVERY ray (worst case — e.g. a pathological eps band) and require
    the result to still equal brute force; this exercises the sticky
    flag through every escalation round and the tail's capacity loop
    (tail=256 << the 2048 forced rays). thin=True additionally
    exercises the g*2+pend fold in the sort-free (gather) escalation
    and the final fetch on a workload where the TAIL supplies most
    winners (overlay path)."""
    from opencl_path_tracer_tpu.ops.pallas import pair_mxu
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        make_pair_intersect,
    )

    real = pair_mxu.pairs_round_mxu

    def all_pend(comps, ids, scene, c, cs, trp, interpret,
                 infeat=False, thin=False):
        best, pend = real(comps, ids, scene, c, cs, trp, interpret,
                          infeat, thin)
        return best, jnp.ones_like(pend)

    monkeypatch.setattr(pair_mxu, "pairs_round_mxu", all_pend)
    tris = _rand_tris(3000)
    rays = _rand_rays(2048, seed=5, lo=-60.0, hi=60.0)
    pi = make_pair_intersect(tris, cluster_size=256, l1=4, l2=12,
                             trp=512, u2_frac=2, u3_frac=4, tail=256,
                             mxu=True, thin=thin, move=move,
                             interpret=True)
    _check(pi(rays), intersect.first_intersect(rays, tris))


def test_pair_mxu_visit_list_properties():
    """build_visits must cover every (tile, cluster-with-pairs) and
    keep vb non-decreasing with every tile visited (flush guarantee),
    for adversarial run layouts (empty runs, tile-aligned starts,
    dummy-only tail tiles)."""
    from opencl_path_tracer_tpu.ops.pallas.pair_mxu import build_visits

    rs = np.random.default_rng(3)
    trp, c = 64, 11
    for trial in range(8):
        counts = rs.integers(0, 150, size=c + 1)
        counts[rs.integers(0, c + 1, size=3)] = 0   # empty runs
        if trial % 2 == 0:
            counts[0] = trp * 2                     # tile-aligned start
        keys = np.repeat(np.arange(c + 1), counts)
        ppad = -(-max(len(keys), 1) // trp) * trp
        keys = np.concatenate(
            [keys, np.full(ppad - len(keys), c)]
        ).astype(np.int32)
        vb, vc = (np.asarray(a)
                  for a in build_visits(jnp.asarray(keys), trp, c))
        assert (np.diff(vb) >= 0).all()
        b = ppad // trp
        visited = set(zip(vb.tolist(), vc.tolist()))
        for bi in range(b):
            tile_keys = set(keys[bi * trp:(bi + 1) * trp].tolist())
            for ci in tile_keys - {c}:
                assert (bi, ci) in visited, (trial, bi, ci)
        assert set(vb.tolist()) == set(range(b))    # every tile flushed


@pytest.mark.parametrize("mxu,dop,move,thin", [
    (False, False, "gather", False), (True, False, "gather", False),
    (True, True, "gather", False),
    (False, False, "sort", False), (True, True, "sort", False),
    (True, True, "sort", True), (True, False, "gather", True),
    (True, True, "chain", True),
])
def test_pair_intersect_corridor_rays_deep_march(mxu, dop, move, thin):
    """The adversarial workload that broke v3 on TPU: rays starting
    OUTSIDE the populated region marching a long corridor of cluster
    boxes before their (far) hit — most rays uncertified after round 1
    and far beyond any one prefix capacity. v4's progress march + dense
    tail must still match brute force exactly (the failure mode was
    SILENT wrong hits, measured on half the rays at 2M scale)."""
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        make_pair_intersect,
    )
    scene = library.stress_scene(6000)
    rs = np.random.default_rng(21)
    r = 1024
    # Camera-like corridor rays: origins on a plane outside the field,
    # directions funneled through it.
    p = np.stack([
        rs.uniform(-100, 1100, r),
        rs.uniform(-100, 1100, r),
        np.full(r, -1500.0),
    ], axis=1).astype(np.float32)
    target = np.stack([
        rs.uniform(100, 900, r),
        rs.uniform(100, 900, r),
        rs.uniform(200, 900, r),
    ], axis=1).astype(np.float32)
    d = target - p
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = Rays.make(jnp.asarray(p), jnp.asarray(d.astype(np.float32)))
    # Deliberately tiny capacities: everything must funnel through the
    # while-loops and the dense tail, still exactly.
    pi = make_pair_intersect(scene.tris, cluster_size=256, l1=1, l2=1,
                             trp=256, trb=256, u2_frac=64, u3_frac=64,
                             tail=256, mxu=mxu, dop=dop, move=move,
                             thin=thin, interpret=True)
    _check(pi(rays), intersect.first_intersect(rays, scene.tris))


def test_pair_tpu_winner_config_exact():
    """The production config (PAIR_TPU_WINNER — what accel='auto'
    builds on TPU for large scenes; swept on-device, 5.30 Mrays/s
    kernel-level) must be exact in interpret mode on both a random
    cloud and the enclosed stress scene. Pins the exact kwargs the TPU
    exactness record (docs/BENCHMARKS.md, thin sweeps at sha eac5d8f)
    was taken under, so a default change can't silently dodge CI."""
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        PAIR_TPU_WINNER, make_pair_intersect,
    )
    assert PAIR_TPU_WINNER == dict(mxu=True, dop=True, cluster_size=256,
                                   trp=1024, l1=2, l2=6, thin=True,
                                   move="sort")
    tris = _rand_tris(3000, seed=9)
    rays = _rand_rays(1024, seed=31, lo=-70.0, hi=70.0)
    pi = make_pair_intersect(tris, interpret=True, **PAIR_TPU_WINNER)
    _check(pi(rays), intersect.first_intersect(rays, tris))

    scene = library.stress_scene(6000)
    rays2 = _rand_rays(512, seed=7, lo=100.0, hi=900.0)
    pi2 = make_pair_intersect(scene.tris, interpret=True,
                              **PAIR_TPU_WINNER)
    _check(pi2(rays2), intersect.first_intersect(rays2, scene.tris))


def test_pair_thin_matches_nonthin_bitexact():
    """thin=True's deferred attribute fetch uses the SAME tab3 3-split
    one-hot dot the non-thin kernel's refine uses, and the merge/
    rank-reduce order is identical — so on every hit lane the two
    modes must agree BIT-FOR-BIT on t, normals, and material (not
    just to tolerance). Guards the 'attributes recovered exactly'
    claim that justifies the thin payload redesign."""
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        make_pair_intersect,
    )
    tris = _rand_tris(3000, seed=17)
    rays = _rand_rays(1024, seed=23, lo=-70.0, hi=70.0)
    kw = dict(cluster_size=256, trp=256, l1=2, l2=8, l3=24, tail=512,
              mxu=True, dop=True, move="sort", interpret=True)
    h0 = make_pair_intersect(tris, thin=False, **kw)(rays)
    h1 = make_pair_intersect(tris, thin=True, **kw)(rays)
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t))
    hit = np.asarray(h0.t) >= 0
    np.testing.assert_array_equal(np.asarray(h0.mati)[hit],
                                  np.asarray(h1.mati)[hit])
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(h0.n[k])[hit],
                                      np.asarray(h1.n[k])[hit])
    assert hit.sum() > 50  # the comparison must cover real hit lanes


def test_pair_intersect_random_config_gauntlet():
    """Randomized schedule/flag fuzz: any legal combination of
    (cluster_size, l1/l2/l3, trp/trb, prefix fracs, tail, mxu, dop,
    move, infeat) must be exact vs brute force — the escalation
    machinery's correctness argument (min-merge + monotone done +
    sticky pend + unconditional tail) is config-independent, so a
    single counterexample here is a real bug, not a tuning issue."""
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        make_pair_intersect,
    )
    rs = np.random.default_rng(123)
    tris = _rand_tris(2500, seed=4)
    rays = _rand_rays(768, seed=13, lo=-70.0, hi=70.0)
    brute = intersect.first_intersect(rays, tris)
    for trial in range(6):
        mxu = bool(rs.integers(0, 2))
        cfg = dict(
            cluster_size=int(rs.choice([64, 128, 256])),
            l1=int(rs.integers(1, 6)),
            l2=int(rs.integers(1, 14)),
            l3=int(rs.integers(2, 30)),
            trp=int(rs.choice([128, 256])),
            trb=int(rs.choice([128, 256])),
            u2_frac=int(rs.choice([1, 2, 64])),
            u3_frac=int(rs.choice([1, 4, 64])),
            tail=int(rs.choice([128, 1024])),
            mxu=mxu,
            dop=bool(rs.integers(0, 2)) and mxu,
            infeat=bool(rs.integers(0, 2)) and mxu,
            thin=bool(rs.integers(0, 2)) and mxu,
        )
        cfg["move"] = str(rs.choice(
            ["gather", "sort", "chain"] if cfg["thin"]
            else ["gather", "sort"]
        ))
        pi = make_pair_intersect(tris, interpret=True, **cfg)
        try:
            _check(pi(rays), brute)
        except AssertionError as e:
            raise AssertionError(f"config {cfg} failed: {e}") from e


def test_auto_cluster_size_bounds_candidate_vmem():
    """The candidates kernel's (CP, TRB) temporaries must fit Mosaic's
    16 MB scoped limit at the TRB=128 floor: cluster_size auto-doubles
    until the padded cluster count satisfies cp*128 <= 480k (measured
    OOM boundary: cp=3968 x trb=128 on a 1M-tri scene at cs=256)."""
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        _auto_cluster_size, _round_up,
    )
    assert _auto_cluster_size(100_000, 256) == 256   # untouched
    assert _auto_cluster_size(300_000, 256) == 256
    cs_1m = _auto_cluster_size(1_000_000, 256)
    assert cs_1m == 512
    for n in (1, 10_000, 1_000_000, 10_000_000):
        cs = _auto_cluster_size(n, 256)
        cp = _round_up(-(-n // cs), 128)
        assert cp * 128 <= 480_000, (n, cs, cp)


def test_pair_with_ids_matches_base_and_reports_original_ids():
    """with_ids=True: (t, mati) bitwise equal to the base pair
    intersector, and ids equal first_intersect_ids' original-scene
    winner indices wherever t agrees with the XLA oracle (tie order
    may differ only on exact-t ties; none occur here)."""
    import jax.numpy as jnp
    import numpy as np

    from opencl_path_tracer_tpu.ops import intersect, raygen
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        make_pair_intersect,
    )
    from opencl_path_tracer_tpu.scene import library

    scene = library.stress_scene(1200)
    cam = library.cornell_camera(24, 24)
    ids_px = raygen.pixel_ids(24, 24)
    half = jnp.full(ids_px.shape, 0.5, jnp.float32)
    rays = raygen.camera_rays(cam, ids_px, half, half)
    kw = dict(cluster_size=128, l1=2, l2=4, l3=8, trp=128, trb=128,
              tail=128, mxu=True, thin=True, move="sort",
              interpret=True)

    h0 = make_pair_intersect(scene.tris, **kw)(rays)
    h1, i1 = make_pair_intersect(scene.tris, with_ids=True, **kw)(rays)
    np.testing.assert_array_equal(np.asarray(h0.t), np.asarray(h1.t))
    np.testing.assert_array_equal(np.asarray(h0.mati),
                                  np.asarray(h1.mati))

    hb, ib = intersect.first_intersect_ids(rays, scene.tris)
    same_t = np.asarray(h1.t) == np.asarray(hb.t)
    ids_p = np.asarray(i1)
    np.testing.assert_array_equal(ids_p[same_t],
                                  np.asarray(ib)[same_t])
    # Misses report -1; hits report a valid index.
    valid = np.asarray(h1.valid)
    assert (ids_p[~valid] == -1).all()
    assert (ids_p[valid] >= 0).all()
    assert ids_p[valid].max() < scene.num_triangles
    # The reported id's triangle really is the winner (oracle re-test
    # on a sample of lanes).
    rng = np.random.default_rng(0)
    p3 = np.stack([np.asarray(rays.p[k]) for k in range(3)], -1)
    d3 = np.stack([np.asarray(rays.d[k]) for k in range(3)], -1)
    for i in rng.choice(np.nonzero(valid)[0], 16, replace=False):
        sub = scene.tris.take(jnp.asarray([int(ids_p[i])]))
        t2, v2 = intersect.ray_tri_t(
            jnp.asarray(p3[i:i + 1]), jnp.asarray(d3[i:i + 1]), sub)
        assert bool(v2[0, 0])
        assert abs(float(t2[0, 0]) - float(np.asarray(h1.t)[i])) < 1e-4


def test_pair_with_ids_validation():
    import pytest

    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        make_pair_intersect,
    )
    from opencl_path_tracer_tpu.scene import library

    tris = library.stress_scene(1200).tris
    with pytest.raises(ValueError, match="requires thin"):
        make_pair_intersect(tris, mxu=True, with_ids=True,
                            interpret=True)
    with pytest.raises(ValueError, match="chain"):
        make_pair_intersect(tris, mxu=True, thin=True, move="chain",
                            with_ids=True, interpret=True)


@pytest.mark.parametrize("thin", [False, True])
def test_pair_approx_certified_lanes_match_exact(thin):
    """approx=True (round-1-only, the two-phase stress probe): every
    RESOLVED lane's hit is bit-identical to the exact kernel (the
    certificate is the same one the full path trusts); unresolved
    lanes are a minority on an enclosed scene."""
    from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
        make_pair_intersect,
    )
    scene = library.stress_scene(6000)
    rays = _rand_rays(4096, seed=11, lo=-80.0, hi=1080.0)
    kw = dict(cluster_size=256, l1=4, l2=12, trp=512, u2_frac=2,
              u3_frac=4, mxu=thin, thin=thin, interpret=True)
    exact = make_pair_intersect(scene.tris, **kw)(rays)
    hits, resolved = make_pair_intersect(scene.tris, approx=True,
                                         **kw)(rays)
    res = np.asarray(resolved)
    assert res.mean() > 0.5, f"resolved fraction {res.mean():.2f}"
    np.testing.assert_array_equal(np.asarray(hits.t)[res],
                                  np.asarray(exact.t)[res])
    np.testing.assert_array_equal(np.asarray(hits.mati)[res],
                                  np.asarray(exact.mati)[res])
