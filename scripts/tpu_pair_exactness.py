"""TPU-side exactness job: pair-v4 intersector vs the dense kernel.

VERDICT r2 #5: the "0 hit flips" claim for the pair path's HBM-DMA
kernel branch was round-2 prose only — CPU CI exercises the pair
pipeline in interpret mode with resident=True, so the DMA branch runs
ONLY on real hardware. This job is the committed artifact: it builds
the 100k-tri stress scene, advances a real wavefront to steady state
(bounce rays, corridor rays, misses — the adversarial rank
distribution from docs/BENCHMARKS.md forensics), then asserts the
pair intersector's hits equal `pallas_first_intersect` bit-for-bit on
>= 1M of those rays.

Run through the worker:  cp scripts/tpu_pair_exactness.py /tmp/tpu_jobs/
Result: one JSON line {"flips": 0, "rays": ..., "sha": ..., "date": ...}
— paste into docs/BENCHMARKS.md ("Pair-path TPU exactness record").

Reference anchor: the traversal must be a faithful stand-in for
prog.cl:144-184's kd_intersect (exact closest hit), not an
approximation.
"""

import datetime
import hashlib
import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from opencl_path_tracer_tpu.core.types import Rays
from opencl_path_tracer_tpu.models import wavefront
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    make_pallas_intersect,
)
from opencl_path_tracer_tpu.ops.pallas.sorted_intersect import (
    make_pair_intersect,
)
from opencl_path_tracer_tpu.scene import library


def main(n_rays: int = 1 << 20, warm_steps: int = 12) -> int:
    w, h = 1536, 864  # 1.3M lanes >= 1M target
    n = w * h
    scene = library.stress_scene(100_000)
    cam = library.cornell_camera(w, h)
    key = jax.random.key(3)

    dense = make_pallas_intersect(scene.tris)
    pair = make_pair_intersect(scene.tris)

    # Steady-state wavefront: advance with the DENSE intersector so the
    # ray population being compared is produced independently of the
    # code under test.
    state = wavefront.init_wavefront(cam, n, mode="fast", key=key)
    step = jax.jit(lambda st: wavefront.wavefront_step(
        cam, scene.mats, st, intersect_fn=dense, iterations=5,
        mode="fast", key=key,
    ))
    for _ in range(warm_steps):
        state = step(state)
    jax.block_until_ready(state.ray_p[0])
    rays = Rays(p=state.ray_p, d=state.ray_d)

    hd = jax.jit(dense)(rays)
    hp = jax.jit(pair)(rays)
    jax.block_until_ready((hd.t, hp.t))

    flips = 0
    fields = {}
    hit = np.asarray(hd.t) >= 0.0
    for name in ("t", "mati"):
        a = np.asarray(getattr(hd, name))
        b = np.asarray(getattr(hp, name))
        bad = int((a != b).sum())
        fields[name] = bad
        flips += bad
    # Normals are compared on HIT lanes only: on misses both kernels
    # leave whatever their argmin machinery last latched (measured
    # 2026-08-17: dense latches (0,-1,0), pair (0,0,-1) — same junk
    # class, different junk; t/mati were 0-flip everywhere).
    for k in range(3):
        a = np.asarray(hd.n[k])[hit]
        b = np.asarray(hp.n[k])[hit]
        bad = int((a != b).sum())
        fields[f"n{k}_on_hits"] = bad
        flips += bad
    fields["hits"] = int(hit.sum())

    sha = "unknown"
    try:
        sha = subprocess.check_output(
            ["git", "-C", "/root/repo", "rev-parse", "--short", "HEAD"],
            text=True).strip()
    except Exception:
        pass
    digest = hashlib.sha256(
        np.asarray(hd.t).tobytes() + np.asarray(hp.t).tobytes()
    ).hexdigest()[:16]
    print(json.dumps({
        "job": "pair_exactness", "rays": n, "flips": flips,
        "fields": fields, "t_digest": digest, "sha": sha,
        "date": datetime.date.today().isoformat(),
        "device": jax.devices()[0].device_kind,
    }))
    return 0 if flips == 0 else 1


if __name__ == "__main__" or __name__ == "__job__":
    main()
