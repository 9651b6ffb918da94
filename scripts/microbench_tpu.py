"""TPU primitive microbenchmarks that drive the intersector design:
 1. dense ray x tri intersection throughput (pure XLA, chunked)
 2. lax.sort throughput at wavefront sizes
 3. row-gather throughput (cluster fetch pattern)
Run on the real TPU: python scripts/microbench_tpu.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


_OVERHEAD = [None]


def _call_overhead():
    """Per-call host<->device round-trip cost under the axon tunnel."""
    if _OVERHEAD[0] is None:
        f = jax.jit(lambda x: x + 1.0)
        float(f(jnp.float32(0)))
        t0 = time.time()
        for i in range(10):
            float(f(jnp.float32(i)))
        _OVERHEAD[0] = (time.time() - t0) / 10
        print(f"# per-call tunnel overhead {_OVERHEAD[0]*1e3:.1f}ms")
    return _OVERHEAD[0]


def timeit(fn, *args, n=3, reps=8):
    """Chains `reps` dependent invocations inside ONE jit (perturbing the
    first arg so XLA can't CSE) and syncs via a dependent scalar fetch;
    subtracts the measured per-call tunnel overhead."""
    def scalarize(out):
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves)

    def run(*a):
        acc = jnp.float32(0)
        for i in range(reps):
            # Every rep gets a DISTINCT perturbation: with a repeating
            # (i % 3) pattern XLA CSEs identical pure subgraphs (sorts,
            # elementwise chains) and the measurement comes out up to
            # reps/3 too fast (round-2 finding; end-to-end numbers
            # exposed it).
            a0 = a[0] + jnp.asarray(i + 1, a[0].dtype)
            acc = acc + scalarize(fn(a0, *a[1:]))
        return acc

    g = jax.jit(run)
    float(g(*args))  # warmup/compile
    t0 = time.time()
    for _ in range(n):
        float(g(*args))
    dt = (time.time() - t0) / n
    return max((dt - _call_overhead()) / reps, 1e-9)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")
    _call_overhead()
    rs = np.random.default_rng(0)

    # --- 1. dense intersection (R x T) ---
    for R, T in [(262144, 1024), (1048576, 1024), (262144, 4096)]:
        p = jnp.asarray(rs.normal(size=(R, 3)), jnp.float32)
        d = jnp.asarray(rs.normal(size=(R, 3)), jnp.float32)
        g = jnp.asarray(rs.normal(size=(T, 16)), jnp.float32)

        @jax.jit
        def dense(p, d, g):
            n, c0 = g[:, 0:3], g[:, 3]
            m1, d1 = g[:, 4:7], g[:, 7]
            m2, d2 = g[:, 8:11], g[:, 11]
            m3, d3 = g[:, 12:15], g[:, 15]
            pn = p @ n.T
            vn = d @ n.T
            t = (c0[None] - pn) / vn
            e1 = p @ m1.T + t * (d @ m1.T) - d1[None]
            e2 = p @ m2.T + t * (d @ m2.T) - d2[None]
            e3 = p @ m3.T + t * (d @ m3.T) - d3[None]
            valid = (t > 0) & (e1 >= 0) & (e2 >= 0) & (e3 >= 0)
            tm = jnp.where(valid, t, 3e38)
            best = jnp.argmin(tm, axis=1)
            return jnp.take_along_axis(tm, best[:, None], 1)[:, 0], best

        dt = timeit(dense, p, d, g)
        tests = R * T
        print(f"dense R={R} T={T}: {dt*1e3:.2f}ms "
              f"{tests/dt/1e9:.1f} Gtests/s "
              f"(~{tests*30/dt/1e12:.2f} TFLOP/s eff)")

    # --- 2. sort ---
    for N in [2**21, 2**24]:
        keys = jnp.asarray(
            rs.integers(0, 1 << 30, size=N, dtype=np.int32)
        )
        vals = jnp.arange(N, dtype=jnp.int32)
        f = jax.jit(lambda k, v: jax.lax.sort_key_val(k, v))
        dt = timeit(f, keys, vals)
        print(f"sort_key_val N={N}: {dt*1e3:.2f}ms "
              f"{N/dt/1e6:.0f} Mkeys/s")

    # --- 2b. argsort rows of (R, C) ---
    R, C = 262144, 1024
    mat = jnp.asarray(rs.normal(size=(R, C)), jnp.float32)
    f = jax.jit(lambda m: jnp.argsort(m, axis=1)[:, :8])
    dt = timeit(f, mat)
    print(f"row argsort (R={R}, C={C}): {dt*1e3:.2f}ms")
    f2 = jax.jit(lambda m: jax.lax.top_k(-m, 8)[1])
    dt = timeit(f2, mat)
    print(f"row top_k8 (R={R}, C={C}): {dt*1e3:.2f}ms")

    # --- 3. row gathers ---
    for rows, width, n_idx in [
        (1024, 16, 2**21),       # tri-row gather (BVH leaf style)
        (800, 2048, 2**18),      # cluster-block gather (128 tris x 16)
    ]:
        table = jnp.asarray(rs.normal(size=(rows, width)), jnp.float32)
        idx = jnp.asarray(
            rs.integers(0, rows, size=n_idx, dtype=np.int32)
        )
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt = timeit(f, table, idx)
        bytes_moved = n_idx * width * 4
        print(f"gather rows={rows} width={width} n={n_idx}: "
              f"{dt*1e3:.2f}ms {bytes_moved/dt/1e9:.0f} GB/s")

    # --- 4. scatter-min (wavefront writeback) ---
    N, R = 2**22, 2**21
    vals = jnp.asarray(rs.normal(size=(N,)), jnp.float32)
    idx = jnp.asarray(rs.integers(0, R, size=N, dtype=np.int32))
    tgt = jnp.full((R,), 3e38, jnp.float32)
    f = jax.jit(lambda t, i, v: t.at[i].min(v))
    dt = timeit(f, tgt, idx, vals)
    print(f"scatter-min N={N} -> R={R}: {dt*1e3:.2f}ms")

    # --- 5. while_loop gather traversal step cost (for contrast) ---
    R = 262144
    nodes = jnp.asarray(rs.normal(size=(4096, 8)), jnp.float32)
    cur = jnp.asarray(rs.integers(0, 4096, size=R, dtype=np.int32))

    @jax.jit
    def gather_step(cur):
        def body(i, c):
            row = jnp.take(nodes, c, axis=0)
            return (c + row[:, 0].astype(jnp.int32)) % 4096
        return jax.lax.fori_loop(0, 32, body, cur)

    dt = timeit(gather_step, cur)
    print(f"32x dependent row-gather steps R={R}: {dt*1e3:.2f}ms "
          f"({dt/32*1e6:.0f}us/step)")


if __name__ == "__main__":
    main()
