"""TPU probe: does the JAX persistent compilation cache work through
the axon remote-compile backend?

If yes, bench.py can set jax_compilation_cache_dir to a repo-local
path so the driver's official run reuses the worker's compiles — the
stress pair-path warmup (~100 s of variadic-sort compiles) drops out
of the driver's wall-clock.

Run through the worker: cp into /tmp/tpu_jobs/ as e0_*.py.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

CACHE = "/root/repo/.jax_cache"


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    # A compile heavy enough to distinguish cache hit from miss: an
    # 8-operand variadic sort (the pair path's expensive unit).
    n = 1 << 20
    xs = [jnp.arange(n, dtype=jnp.float32) * (i + 1) for i in range(7)]
    k = jnp.arange(n, dtype=jnp.int32)[::-1]

    @jax.jit
    def f(k, *xs):
        out = jax.lax.sort([k, *xs], num_keys=1)
        return sum(o.sum() for o in out[1:])

    t0 = time.perf_counter()
    float(f(k, *xs))
    t_first = time.perf_counter() - t0
    import glob
    files = glob.glob(CACHE + "/*")
    print(json.dumps({
        "probe": "compile_cache", "first_compile_s": round(t_first, 1),
        "cache_entries": len(files),
    }), flush=True)
    # A second process would prove the reuse; within one process jit
    # caching masks it. The worker runs each job with fresh modules
    # but the SAME process, so drop a marker: if a later run of this
    # same job (or the driver) sees entries > 0 and a much smaller
    # first_compile_s, the cache works end-to-end.
    return 0


if __name__ == "__main__" or __name__ == "__job__":
    main()
