"""The repo-wide sort invariant: sorting by the compound key
(key, iota) with is_stable=False produces EXACTLY the stable-by-key
permutation. Every former is_stable=True sort site (march, flat
march, lazy, sort_state) relies on this — XLA:TPU's variadic-sort
compile time made the stable form unusable (docs/BENCHMARKS.md,
round-3 sort-compile cliff)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.quick
@pytest.mark.parametrize("n,vals", [(1 << 12, 7), (1 << 10, 2)])
def test_two_key_unstable_equals_stable(n, vals):
    rs = np.random.default_rng(0)
    key = jnp.asarray(rs.integers(0, vals, size=(n,)), jnp.uint32)
    iota = jnp.arange(n, dtype=jnp.int32)
    payload = jnp.asarray(rs.normal(size=(n,)), jnp.float32)

    stable = jax.lax.sort([key, iota, payload], num_keys=1,
                          is_stable=True)
    twokey = jax.lax.sort([key, iota, payload], num_keys=2,
                          is_stable=False)
    for a, b in zip(stable, twokey):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.quick
def test_chunked_sorts_share_permutation():
    """Chunked payload groups under the same (key, iota) compound key
    must all come back in the identical permutation (the lazy state
    sort splits ~40 payloads into groups of 13)."""
    rs = np.random.default_rng(1)
    n = 1 << 12
    key = jnp.asarray(rs.integers(0, 5, size=(n,)), jnp.uint32)
    iota = jnp.arange(n, dtype=jnp.int32)
    marker = jnp.asarray(rs.permutation(n), jnp.int32)

    s1 = jax.lax.sort([key, iota, marker], num_keys=2,
                      is_stable=False)
    s2 = jax.lax.sort([key, iota, marker.astype(jnp.float32)],
                      num_keys=2, is_stable=False)
    np.testing.assert_array_equal(
        np.asarray(s1[2]), np.asarray(s2[2]).astype(np.int32)
    )
