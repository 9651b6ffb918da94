"""Random number generation.

Two engines:

1. PARITY engine — bit-faithful replay of the reference's RNG so converged
   images match exactly:
     * Device stream: Lehmer LCG n' = n * 48271 mod (2^31 - 1), uniform =
       float32(n') / 2147483647.0f, one sequential stream per pixel stored
       in a global int buffer (prog.cl:72-77).
     * Host seeding: std::minstd_rand0 (a = 16807, same modulus, default
       seed 1) drawn once per pixel (main.cpp:45, 522-527).
   TPU-native twist: the modulus is the Mersenne prime 2^31 - 1, so
   x mod m folds as (x >> 31) + (x & 0x7fffffff); a full 62-bit modular
   product decomposes into 16-bit limbs in pure uint32 — no int64, no
   Schrage divisions, fully vectorizable on the VPU. Note that exact
   reference parity CANNOT be sample-sharded (per-pixel draw counts are
   data-dependent, so no O(log k) jump-ahead can place chip boundaries);
   bit-parity sharding therefore uses framebuffer tiles — each pixel's
   whole stream lives on one chip (parallel/shard.py).

2. FAST engine — counter-based double murmur3-finalizer hash over
   (lane, sample, bounce, draw): stateless, order-independent, the
   idiomatic TPU choice when parity is not needed (replaced threefry,
   which measured 5.4 ms/step at 2M lanes — see below).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

M31 = np.uint32(0x7FFFFFFF)       # 2^31 - 1 (modulus, prime)
LEHMER_A = np.uint32(48271)       # device multiplier (prog.cl:74)
MINSTD0_A = np.uint32(16807)      # std::minstd_rand0 multiplier
# float literal 2147483647.0f as the reference divides by (prog.cl:76)
INV_M31_DEN = np.float32(2147483647.0)


def _fold(x: jnp.ndarray) -> jnp.ndarray:
    """One folding step of mod (2^31 - 1): uses 2^31 === 1 (mod m)."""
    return (x >> np.uint32(31)) + (x & M31)


def modmul31(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a * b) mod (2^31 - 1) for a, b < 2^31, in pure uint32 arithmetic.

    Decomposes both operands into 16-bit limbs; every partial product and
    partial sum fits in uint32; high bits fold via 2^31 === 1.
    """
    a = a.astype(jnp.uint32)
    b = jnp.asarray(b, jnp.uint32)
    a1, a0 = a >> np.uint32(16), a & np.uint32(0xFFFF)
    b1, b0 = b >> np.uint32(16), b & np.uint32(0xFFFF)

    hi = a1 * b1                      # < 2^30, weight 2^32 === 2
    cross = a1 * b0 + a0 * b1         # < 2^32, weight 2^16
    lo = a0 * b0                      # < 2^32, weight 1

    # cross * 2^16 = cross_hi * 2^31 + cross_lo * 2^16 === cross_hi + ...
    cross_hi = cross >> np.uint32(15)             # < 2^17
    cross_lo = (cross & np.uint32(0x7FFF)) << np.uint32(16)  # < 2^31

    acc = _fold(lo)                    # < 2^31 + 1
    acc = _fold(acc + cross_lo)        # operands < 2^32 pre-fold
    acc = _fold(acc + cross_hi)
    acc = _fold(acc + hi * np.uint32(2))
    acc = _fold(acc)
    # acc may equal m exactly (m === 0); canonicalize.
    return jnp.where(acc == M31, jnp.uint32(0), acc)


def lehmer_step(state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One rand() (prog.cl:72-77): state' = state * 48271 mod (2^31-1),
    uniform = float32(state') / 2147483647.0f. state: uint32 array."""
    new = modmul31(state, LEHMER_A)
    return new, new.astype(jnp.float32) / INV_M31_DEN


def minstd_rand0_raw(n: int, seed: int = 1) -> np.ndarray:
    """First n outputs of std::minstd_rand0(seed): x_{i+1} = 16807 x_i mod
    (2^31-1), returning successive states (host-side, used to seed the
    per-pixel device streams exactly like main.cpp:522-527)."""
    out = np.empty(n, np.uint32)
    x = np.int64(seed)
    for i in range(n):
        x = (x * 16807) % 2147483647
        out[i] = x
    return out


def seed_pixel_streams(num_pixels: int, seed: int = 1) -> jnp.ndarray:
    """Per-pixel Lehmer states, seeded like the reference host
    (main.cpp:45, 522-527: one minstd_rand0 draw per pixel, in pixel
    order). Returns uint32 (num_pixels,)."""
    return jnp.asarray(minstd_rand0_raw(num_pixels, seed))


# ---------------------------------------------------------------------------
# FAST engine: counter-based hash (stateless, reorderable).
#
# Originally threefry via jax.random; measured on v5e the two (2, 2M)
# threefry draws were ~5.4 ms/step — the bulk of the wavefront's entire
# non-intersect cost. A double murmur3-finalizer over (lane, sample,
# bounce, draw) counters has the same statelessness / reorderability
# and full avalanche at ~4x fewer VPU ops. Not cryptographic; parity
# mode (bit-exact Lehmer) is unaffected.

_M1 = np.uint32(0x85EB_CA6B)
_M2 = np.uint32(0xC2B2_AE35)
_GOLD = np.uint32(0x9E37_79B9)


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer: full avalanche on uint32."""
    h = h ^ (h >> np.uint32(16))
    h = h * _M1
    h = h ^ (h >> np.uint32(13))
    h = h * _M2
    h = h ^ (h >> np.uint32(16))
    return h


def fast_uniforms(key: jax.Array, sample: jnp.ndarray, bounce,
                  shape: tuple[int, ...], num: int,
                  lane_offset=0) -> jnp.ndarray:
    """`num` uniform draws per element for a given (sample, bounce) event.

    Returns float32 array of shape (num,) + shape in [0, 1) — num on the
    MAJOR axis so the minor dim stays wide (an (N, 2) array is lane-
    padded 64x in TPU HBM). Stateless: the same (key, sample, bounce)
    always produces the same draws, so sample batches can be sharded
    across devices in any order.

    lane_offset shifts the per-element stream index: a lane-axis SHARD
    of a larger array passes its global start so every shard draws the
    slice of the single-device stream it owns (lane-axis sharding would
    otherwise hand all shards the SAME local-iota streams — correlated
    across chips and unmatchable against one device).
    """
    kd = jnp.ravel(jax.random.key_data(key)).astype(jnp.uint32)
    out_shape = (num,) + shape
    lane = jax.lax.broadcasted_iota(jnp.uint32, out_shape,
                                    len(out_shape) - 1)
    lane = lane + jnp.asarray(lane_offset, jnp.uint32)
    draw = jax.lax.broadcasted_iota(jnp.uint32, out_shape, 0)
    h = lane * _GOLD
    h = h + kd[0]
    h = h ^ (jnp.asarray(sample, jnp.uint32) * _M1)
    h = h + (jnp.asarray(bounce, jnp.uint32) * _M2)
    h = h ^ (draw * _GOLD) ^ kd[-1]
    h = _fmix32(_fmix32(h))
    # 24 mantissa-width bits -> [0, 1)
    return (h >> np.uint32(8)).astype(jnp.float32) * np.float32(
        1.0 / (1 << 24)
    )


# QMC: the R2 low-discrepancy sequence (additive recurrence on the
# plastic constant's powers, Roberts 2018) with a per-pixel
# Cranley-Patterson rotation. Used for the camera's 2-D pixel jitter
# in fast mode (--qmc): each pixel's sample sequence covers its
# footprint with O(1/N)-class discrepancy instead of the hash
# engine's O(1/sqrt(N)), which is exactly the noise that dominates
# edge/lamp pixels. Arithmetic is uint32 FIXED POINT — wraparound IS
# the fract(), exact at any sample index (f32 fract degrades past
# s ~ 10^4).
_R2_A1 = np.uint32(3242174889)  # round(2^32 / phi2),   phi2 = plastic
_R2_A2 = np.uint32(2447445413)  # round(2^32 / phi2^2)  constant


def r2_jitter(key: jax.Array, pixel_ids: jnp.ndarray, sample):
    """(u, v) in [0,1): sample-th R2 point of each pixel's rotated
    sequence. Stateless in (key, pixel id, sample index) — sharding /
    regeneration order can't change any pixel's sequence."""
    kd = jnp.ravel(jax.random.key_data(key)).astype(jnp.uint32)
    p = pixel_ids.astype(jnp.uint32)
    rot1 = _fmix32(p * _GOLD + kd[0])
    rot2 = _fmix32(rot1 ^ kd[-1] ^ _M2)
    s = jnp.asarray(sample, jnp.uint32)
    u = rot1 + s * _R2_A1
    v = rot2 + s * _R2_A2
    to_f = np.float32(1.0 / (1 << 24))
    return ((u >> np.uint32(8)).astype(jnp.float32) * to_f,
            (v >> np.uint32(8)).astype(jnp.float32) * to_f)


# Pure-python oracle used by unit tests (closed-form Lehmer).
def lehmer_reference_sequence(state: int, n: int) -> list[int]:
    out = []
    x = int(state)
    for _ in range(n):
        x = (x * 48271) % 2147483647
        out.append(x)
    return out
