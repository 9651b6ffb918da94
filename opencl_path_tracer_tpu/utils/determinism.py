"""Determinism checking — the TPU analog of race detection.

The reference's only shared-memory hazard is the RNG's unsynchronized
read-modify-write on its global seed buffer (safe only because each
work-item touches exactly its own slot, prog.cl:72-77; SURVEY.md §5
notes there is no race detection at all). In the XLA world the
corresponding hazards are nondeterministic reductions/scatters and
unintended RNG key reuse. This helper reruns a jitted function and
bit-compares every output leaf, which catches both.
"""

from __future__ import annotations

import numpy as np
import jax


def check_deterministic(fn, *args, runs: int = 2) -> list[str]:
    """Run fn(*args) `runs` times; return a list of leaf paths whose
    outputs differ bitwise between runs (empty = deterministic)."""
    baseline = jax.tree.leaves_with_path(fn(*args))
    problems: list[str] = []
    for _ in range(runs - 1):
        again = jax.tree.leaves_with_path(fn(*args))
        for (path, a), (_, b) in zip(baseline, again):
            if not np.array_equal(
                np.asarray(a), np.asarray(b), equal_nan=True
            ):
                problems.append(jax.tree_util.keystr(path))
    return sorted(set(problems))
