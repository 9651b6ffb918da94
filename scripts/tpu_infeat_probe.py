"""TPU probe: can Mosaic compile the integer-bitcast bf16 split
in-kernel (plucker_kernel._split_bf16_exact)?

plucker_feat is built OUTSIDE kernels because an earlier Mosaic
version rejected in-kernel f32->bf16 truncation at these shapes —
but that finding predates the integer-bitcast split (u32 masks +
u16 bitcasts, no convert ops). If this probe COMPILES, the pair
visit kernel can compute features from the 6 sorted ray components
directly and the (32, Ppad) bf16 featp stream (~1 GB at 16.8M pairs)
disappears. A small flip count vs the outside-feat matmul is
EXPECTED and fine: the f32 cross product may or may not contract to
FMA in different compilation contexts (~2^-24 relative), which the
conservative eps band absorbs by design — wiring is gated on the
full-pipeline exactness check, not on bit-equal features.

Run through the worker: cp into /tmp/tpu_jobs/ as e7_*.py.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import (
    _split_bf16_exact, plucker_feat,
)


def _feat_rows(rays):
    px, py, pz = rays[0:1], rays[1:2], rays[2:3]
    dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
    cx = py * dz - pz * dy
    cy = pz * dx - px * dz
    cz = px * dy - py * dx
    phi = jnp.concatenate([cx, cy, cz, dx, dy, dz], axis=0)
    hi, lo = _split_bf16_exact(phi)
    zeros = jnp.zeros((14,) + phi.shape[1:], jnp.bfloat16)
    return jnp.concatenate([hi, lo, hi, zeros], axis=0)


def _kernel(ray_ref, trig_ref, out_ref):
    feat = _feat_rows(ray_ref[:])              # (32, T) bf16 in-kernel
    out_ref[:] = jax.lax.dot_general(
        trig_ref[:], feat,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def main() -> int:
    t = 512
    rows = 96
    rs = np.random.default_rng(0)
    rays = jnp.asarray(
        rs.uniform(-900, 900, size=(8, t)).astype(np.float32))
    trig = jnp.asarray(
        rs.normal(size=(rows, 32)).astype(np.float32)
    ).astype(jnp.bfloat16)

    try:
        out = pl.pallas_call(
            _kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, t), jnp.float32),
        )(rays, trig)
        out = np.asarray(out)
    except Exception as e:
        print(json.dumps({"probe": "infeat", "compiles": False,
                          "error": repr(e)[:300]}), flush=True)
        return 0

    ref = np.asarray(jax.jit(lambda r, g: jax.lax.dot_general(
        g, plucker_feat(r),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ))(rays, trig))
    flips = int((out != ref).sum())
    print(json.dumps({"probe": "infeat", "compiles": True,
                      "flips_vs_outside_feat": flips,
                      "n": int(ref.size)}), flush=True)
    return 0


if __name__ == "__main__" or __name__ == "__job__":
    main()
