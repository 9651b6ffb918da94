"""Checkpoint / resume of progressive render state.

The reference has NO checkpointing: accumulation lives solely in the
device `colors` buffer and any input resets it (current_sample=0,
main.cpp:1100-1148; clear at prog.cl:312-314). Here the full progressive
state — (colors, rng_state, sample) = models.megakernel.TraceState — is
a savable artifact, so long renders survive restarts and multi-chip
renders can be resumed and re-sharded.
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from opencl_path_tracer_tpu.models.megakernel import TraceState

FORMAT_VERSION = 1


def save_checkpoint(path: str, state: TraceState,
                    meta: dict | None = None) -> None:
    np.savez_compressed(
        path,
        colors=np.stack([np.asarray(c) for c in state.colors], -1),
        rng_state=np.asarray(state.rng_state),
        sample=np.asarray(state.sample),
        meta=json.dumps({"version": FORMAT_VERSION, **(meta or {})}),
    )


def load_checkpoint(path: str) -> tuple[TraceState, dict]:
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("version") != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint version {meta.get('version')} != "
                f"{FORMAT_VERSION}"
            )
        c = z["colors"]
        state = TraceState(
            colors=(jnp.asarray(c[:, 0]), jnp.asarray(c[:, 1]),
                    jnp.asarray(c[:, 2])),
            rng_state=jnp.asarray(z["rng_state"]),
            sample=jnp.asarray(z["sample"]),
        )
    return state, meta
