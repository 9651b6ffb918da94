"""RNG parity tests: the uint32 Mersenne-fold modmul must reproduce the
Lehmer LCG (prog.cl:72-77) and std::minstd_rand0 seeding (main.cpp:522-527)
bit-exactly."""

import numpy as np
import jax.numpy as jnp

from opencl_path_tracer_tpu.ops import rng


def _py_lehmer(x, a=48271, n=1):
    out = []
    for _ in range(n):
        x = (x * a) % 2147483647
        out.append(x)
    return out


def test_modmul31_matches_bigint():
    rs = np.random.default_rng(42)
    a = rs.integers(0, 2**31 - 1, size=1000, dtype=np.uint32)
    b = rs.integers(0, 2**31 - 1, size=1000, dtype=np.uint32)
    got = np.asarray(rng.modmul31(jnp.asarray(a), jnp.asarray(b)))
    want = (a.astype(object) * b.astype(object)) % (2**31 - 1)
    np.testing.assert_array_equal(got.astype(object), want)


def test_modmul31_edge_cases():
    m = 2**31 - 1
    cases = [(0, 48271), (1, 48271), (m - 1, m - 1), (m - 1, 1),
             (123456789, 987654321 % m)]
    for a, b in cases:
        got = int(rng.modmul31(jnp.uint32(a), jnp.uint32(b)))
        assert got == (a * b) % m, (a, b)


def test_lehmer_step_sequence():
    state = jnp.asarray([1, 2, 2147483646], dtype=jnp.uint32)
    seq = [np.asarray(state)]
    for _ in range(100):
        state, u = rng.lehmer_step(state)
        seq.append(np.asarray(state))
    for lane, start in enumerate([1, 2, 2147483646]):
        want = _py_lehmer(start, n=100)
        got = [int(s[lane]) for s in seq[1:]]
        assert got == want


def test_lehmer_uniform_matches_float_division():
    state = jnp.asarray([12345], dtype=jnp.uint32)
    new, u = rng.lehmer_step(state)
    want = np.float32(int(new[0])) / np.float32(2147483647.0)
    assert np.float32(u[0]) == want


def test_minstd_rand0_known_values():
    # std::minstd_rand0 from seed 1: first output 16807; the C++ standard
    # documents the 10000th consecutive invocation == 1043618065.
    seq = rng.minstd_rand0_raw(10000, seed=1)
    assert seq[0] == 16807
    assert seq[1] == 282475249
    assert seq[9999] == 1043618065


def test_seed_pixel_streams_matches_host_loop():
    got = np.asarray(rng.seed_pixel_streams(16, seed=1))
    x = 1
    want = []
    for _ in range(16):
        x = (x * 16807) % 2147483647
        want.append(x)
    np.testing.assert_array_equal(got, np.asarray(want, np.uint32))


def test_lehmer_uniformity():
    state = rng.seed_pixel_streams(4096, seed=1)
    us = []
    for _ in range(8):
        state, u = rng.lehmer_step(state)
        us.append(np.asarray(u))
    u = np.concatenate(us)
    hist, _ = np.histogram(u, bins=10, range=(0, 1))
    assert np.all(np.abs(hist / len(u) - 0.1) < 0.01)


def test_fast_uniforms_deterministic_and_bounded():
    import jax
    key = jax.random.key(7)
    a = rng.fast_uniforms(key, 3, 1, (64,), 2)
    assert a.shape == (2, 64)
    b = rng.fast_uniforms(key, 3, 1, (64,), 2)
    c = rng.fast_uniforms(key, 4, 1, (64,), 2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    assert np.all((np.asarray(a) >= 0) & (np.asarray(a) < 1))


def test_fast_uniforms_statistical_quality():
    """The murmur3-finalizer fast engine must be statistically sound:
    uniform marginals and no lane/draw/step correlations (it replaced
    threefry for speed, not quality — chi2 and correlation bounds are
    generous but would catch a broken mixer)."""
    import jax
    key = jax.random.key(7)
    n = 1 << 18
    u = np.asarray(rng.fast_uniforms(key, 5, 1, (n,), 2))
    assert 0.49 < u.mean() < 0.51
    assert 0.080 < u.var() < 0.087          # 1/12 ~ 0.0833
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(np.corrcoef(u[0, :-1], u[0, 1:])[0, 1]) < 0.02
    assert abs(np.corrcoef(u[0], u[1])[0, 1]) < 0.02
    v = np.asarray(rng.fast_uniforms(key, 6, 1, (n,), 2))
    assert abs(np.corrcoef(u[0], v[0])[0, 1]) < 0.02
    h, _ = np.histogram(u, bins=256, range=(0.0, 1.0))
    e = u.size / 256
    chi2 = float(((h - e) ** 2 / e).sum())
    assert chi2 < 400.0                      # 255 dof; ~255 expected
