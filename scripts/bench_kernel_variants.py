"""Compare intersect kernel variants on TPU: VPU rank-1 broadcasts vs
MXU-dot formulation, across tile sizes. Informs intersect_kernel.py
defaults."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA
from opencl_path_tracer_tpu.ops.pallas import intersect_kernel as ik

BIG = 3.0e38


def mxu_kernel(ray_ref, trig_ref, tric_ref, t_ref, i_ref):
    """trig: (8*TT, 8) dot matrix [pn; vn; pm1; vm1; pm2; vm2; pm3; vm3]
    row-blocks; tric: (TT, 8) columns [c0 d1 d2 d3 pad...]."""
    tt_idx = pl.program_id(1)
    tt = tric_ref.shape[0]

    dots = jax.lax.dot_general(
        trig_ref[:], ray_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (8*TT, TR)
    pn = dots[0 * tt:1 * tt]
    vn = dots[1 * tt:2 * tt]
    pm1 = dots[2 * tt:3 * tt]
    vm1 = dots[3 * tt:4 * tt]
    pm2 = dots[4 * tt:5 * tt]
    vm2 = dots[5 * tt:6 * tt]
    pm3 = dots[6 * tt:7 * tt]
    vm3 = dots[7 * tt:8 * tt]

    c0 = tric_ref[:, 0:1]
    d1 = tric_ref[:, 1:2]
    d2 = tric_ref[:, 2:3]
    d3 = tric_ref[:, 3:4]

    t = (c0 - pn) / vn
    valid = (
        (t > 0.0)
        & (pm1 + t * vm1 >= d1)
        & (pm2 + t * vm2 >= d2)
        & (pm3 + t * vm3 >= d3)
    )
    tm = jnp.where(valid, t, BIG)
    local = jnp.argmin(tm, axis=0)
    tmin = jnp.min(tm, axis=0)
    gidx = (tt_idx * tt + local).astype(jnp.float32)

    @pl.when(tt_idx == 0)
    def _():
        t_ref[0, :] = tmin
        i_ref[0, :] = gidx

    @pl.when(tt_idx != 0)
    def _():
        better = tmin < t_ref[0, :]
        t_ref[0, :] = jnp.where(better, tmin, t_ref[0, :])
        i_ref[0, :] = jnp.where(better, gidx, i_ref[0, :])


def build_trig(tris, tt):
    """(Tpad*8, 8) grouped per tile: for tile k, rows
    [k*8*tt : (k+1)*8*tt] hold the 8 row-blocks of that tile."""
    pack = np.asarray(ik.build_tri_pack(tris, tt))
    tpad = pack.shape[0]
    n, m1, m2, m3 = pack[:, 0:3], pack[:, 4:7], pack[:, 8:11], pack[:, 12:15]
    z = np.zeros_like(n)
    rows_p = lambda v: np.concatenate([v, z, np.zeros((tpad, 2), np.float32)], 1)
    rows_v = lambda v: np.concatenate([z, v, np.zeros((tpad, 2), np.float32)], 1)
    blocks = [rows_p(n), rows_v(n), rows_p(m1), rows_v(m1),
              rows_p(m2), rows_v(m2), rows_p(m3), rows_v(m3)]
    ntiles = tpad // tt
    out = np.zeros((tpad * 8, 8), np.float32)
    for k in range(ntiles):
        for b in range(8):
            out[(k * 8 + b) * tt:(k * 8 + b + 1) * tt] = (
                blocks[b][k * tt:(k + 1) * tt]
            )
    tric = np.stack(
        [pack[:, 3], pack[:, 7], pack[:, 11], pack[:, 15]]
        + [np.zeros(tpad, np.float32)] * 4, 1
    )
    return jnp.asarray(out), jnp.asarray(tric)


@functools.partial(jax.jit, static_argnums=(3, 4))
def run_mxu(rays8, trig, tric, tr, tt):
    rpad = rays8.shape[1]
    tpad = tric.shape[0]
    grid = (rpad // tr, tpad // tt)
    t_out, i_out = pl.pallas_call(
        mxu_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tr), lambda rt, tg: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * tt, 8), lambda rt, tg: (tg, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, 8), lambda rt, tg: (tg, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tr), lambda rt, tg: (0, rt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda rt, tg: (0, rt),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, rpad), jnp.float32),
            jax.ShapeDtypeStruct((1, rpad), jnp.float32),
        ],
    )(rays8, trig, tric)
    return t_out[0], i_out[0]


def main():
    f0 = jax.jit(lambda x: x + 1.0)
    float(f0(jnp.float32(0)))
    t0 = time.time()
    for i in range(10):
        float(f0(jnp.float32(i)))
    oh = (time.time() - t0) / 10
    print(f"overhead {oh*1e3:.1f}ms")

    rs = np.random.default_rng(0)
    T = 1024
    v = (rs.uniform(-10, 10, size=(T, 1, 3))
         + rs.normal(size=(T, 3, 3)) * 0.6).astype(np.float32)
    tris = TrianglesSoA.build(v[:, 0], v[:, 1], v[:, 2],
                              np.arange(T, dtype=np.int32) % 7)
    R = 1048576
    p = rs.uniform(-12, 12, size=(R, 3)).astype(np.float32)
    d = rs.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays8_full = np.concatenate(
        [p.T, d.T, np.zeros((2, R), np.float32)], 0
    )

    def bench(fn, x, reps=8, n=3):
        g = jax.jit(lambda x: sum(
            jnp.sum(fn(x + jnp.float32(k) * 1e-6)[0][:8]) for k in range(reps)
        ))
        float(g(x))
        t0 = time.time()
        for _ in range(n):
            float(g(x))
        return ((time.time() - t0) / n - oh) / reps

    # VPU variant sweep.
    for tr, tt in [(1024, 128), (2048, 128), (1024, 64), (2048, 64),
                   (4096, 128)]:
        pack = ik.build_tri_pack(tris, tt)
        rpad = -(-R // tr) * tr
        x = jnp.asarray(np.pad(rays8_full, ((0, 0), (0, rpad - R))))
        try:
            dt = bench(lambda x, pk=pack, a=tr, b=tt: ik._run(x, pk, a, b, False), x)
            print(f"VPU tr={tr} tt={tt}: {dt*1e3:.2f}ms "
                  f"{R*T/dt/1e9:.0f} Gtests/s")
        except Exception as e:
            print(f"VPU tr={tr} tt={tt}: FAIL {str(e)[:90]}")

    # MXU variant sweep.
    for tr, tt in [(512, 128), (1024, 128), (1024, 256), (2048, 128),
                   (2048, 256)]:
        trig, tric = build_trig(tris, tt)
        rpad = -(-R // tr) * tr
        x = jnp.asarray(np.pad(rays8_full, ((0, 0), (0, rpad - R))))
        try:
            dt = bench(lambda x, a=trig, c=tric, q=tr, w=tt: run_mxu(x, a, c, q, w), x)
            print(f"MXU tr={tr} tt={tt}: {dt*1e3:.2f}ms "
                  f"{R*T/dt/1e9:.0f} Gtests/s")
        except Exception as e:
            print(f"MXU tr={tr} tt={tt}: FAIL {str(e)[:90]}")


if __name__ == "__main__":
    main()
