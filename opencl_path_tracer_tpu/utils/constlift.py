"""Constant lifting: turn closure-captured scene arrays into runtime
arguments of the jitted program.

Why. Every intersector factory closes over its device-resident scene
packs (tri pack, Plucker packs, tab3, DOPs, ...). When a render step
built on top is `jit`ted, those captures become jaxpr constants and
are embedded in the lowered module as dense literals: the 100k-tri
stress step lowers to a ~100 MB MLIR module (51 MB of constants,
measured), the 300k-tri step fails the remote compile helper, and the
1M-tri step exceeds the compile service's request size cap outright
(HTTP 413) — program size must not scale with scene size in a
production renderer. Lifting rewrites `fn` as `lifted(consts, *args)`
whose constants enter as ordinary parameters: the module shrinks to
the code itself, compile requests stay O(1) in scene size, and the
arrays ride device-to-device (no transfer, no copy) on every call.

Reference relation: the reference uploads scene buffers ONCE with
`enqueueWriteBuffer` and its kernels take them as __global pointer
ARGUMENTS (/root/reference/main.cpp:619-634, prog.cl:292-305) — the
lifted form is the faithful analog; literal-embedding was the
accident of closure capture.
"""

from __future__ import annotations

import jax
from jax import tree_util

try:  # JAX moved eval_jaxpr between minor versions
    from jax.core import eval_jaxpr as _eval_jaxpr
except ImportError:  # pragma: no cover
    from jax.extend.core import eval_jaxpr as _eval_jaxpr


def lift_consts(fn, *example):
    """Trace `fn` at `example` and return (lifted, consts) where
    `lifted(consts, *args)` computes fn(*args) with every traced-in
    constant passed as a runtime argument.

    `consts` is a list of arrays to pass (device-put once, reuse every
    call); args must match `example`'s pytree structure and avals.
    Tracing is abstract (make_jaxpr + eval_shape) — `fn` is never
    executed here.
    """
    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*example)
    out_tree = tree_util.tree_structure(out_shape)

    def lifted(consts, *args):
        flat, _ = tree_util.tree_flatten(args)
        out_flat = _eval_jaxpr(closed.jaxpr, consts, *flat)
        return tree_util.tree_unflatten(out_tree, out_flat)

    return lifted, list(closed.consts)


def lazy_lift_jit(fn):
    """jit(fn) with constants lifted, deferred to the first call (for
    factories that have no example arguments at build time, e.g. the
    parallel/shard.py step makers). The first call traces fn at the
    given arguments and caches (jitted, consts); later calls must
    match the first call's avals — same contract as a jitted step."""
    box = {}

    def wrapped(*args):
        if not box:
            lifted, consts = lift_consts(fn, *args)
            box["j"] = jax.jit(lifted)
            box["c"] = consts
        return box["j"](box["c"], *args)

    return wrapped
