"""Checkpoint / resume of progressive render state.

The reference has NO checkpointing: accumulation lives solely in the
device `colors` buffer and any input resets it (current_sample=0,
main.cpp:1100-1148; clear at prog.cl:312-314). Here the full progressive
state is a savable artifact, so long renders survive restarts and
multi-chip renders can be resumed and re-sharded. Two state shapes:

  * megakernel (models.megakernel.TraceState): (colors, rng_state,
    sample) — meta model="megakernel" (and any version-1 checkpoint
    without a model tag);
  * wavefront (models.wavefront.WavefrontState): the full regeneration
    state (accumulators + in-flight path per lane) — meta
    model="wavefront". Resumed parity-mode renders are bit-identical
    because the in-flight rays and Lehmer streams travel with it.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax.numpy as jnp

from opencl_path_tracer_tpu.models.megakernel import TraceState

FORMAT_VERSION = 1


def _is_wavefront(state) -> bool:
    return type(state).__name__ == "WavefrontState"


def save_checkpoint(path: str, state, meta: dict | None = None) -> None:
    """state: TraceState or WavefrontState (detected, recorded in meta)."""
    if _is_wavefront(state):
        arrays = {}
        for f in dataclasses.fields(state):
            v = getattr(state, f.name)
            if isinstance(v, tuple):  # V3 component tuple
                arrays[f.name] = np.stack(
                    [np.asarray(c) for c in v], -1)
                arrays[f.name + "__v3"] = np.asarray(True)
            else:
                arrays[f.name] = np.asarray(v)
        np.savez_compressed(
            path, **arrays,
            meta=json.dumps({"version": FORMAT_VERSION,
                             "model": "wavefront", **(meta or {})}),
        )
        return
    np.savez_compressed(
        path,
        colors=np.stack([np.asarray(c) for c in state.colors], -1),
        rng_state=np.asarray(state.rng_state),
        sample=np.asarray(state.sample),
        meta=json.dumps({"version": FORMAT_VERSION,
                         "model": "megakernel", **(meta or {})}),
    )


def load_checkpoint(path: str):
    """Returns (state, meta); the state type follows meta["model"]
    ("megakernel" when absent — version-1 checkpoints predate it)."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("version") != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint version {meta.get('version')} != "
                f"{FORMAT_VERSION}"
            )
        if meta.get("model", "megakernel") == "wavefront":
            from opencl_path_tracer_tpu.models.wavefront import (
                WavefrontState,
            )
            kw = {}
            for f in dataclasses.fields(WavefrontState):
                if f.name not in z:
                    # Fields added after the checkpoint was written
                    # default to zeros: had_diffuse (EnvLight flag —
                    # exact unless a pre-env checkpoint's mid-path
                    # lanes resume WITH env on), prev_pdf (NEE's MIS
                    # bookkeeping — same caveat with --nee), lum_m2
                    # (adaptive variance — a resumed adaptive render
                    # restarts its variance estimate; finished
                    # samples are unaffected either way).
                    n = z["samples"].shape[0]
                    dt = (bool if f.name == "had_diffuse"
                          else jnp.float32)
                    kw[f.name] = jnp.zeros((n,), dt)
                    continue
                a = z[f.name]
                if f.name + "__v3" in z:
                    kw[f.name] = tuple(
                        jnp.asarray(a[..., k]) for k in range(3))
                else:
                    kw[f.name] = jnp.asarray(a)
            return WavefrontState(**kw), meta
        c = z["colors"]
        state = TraceState(
            colors=(jnp.asarray(c[:, 0]), jnp.asarray(c[:, 1]),
                    jnp.asarray(c[:, 2])),
            rng_state=jnp.asarray(z["rng_state"]),
            sample=jnp.asarray(z["sample"]),
        )
    return state, meta
