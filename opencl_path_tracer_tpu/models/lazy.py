"""Lazy-certification wavefront: temporally-amortized exact traversal
(the large-scene flagship; see ops/pallas/lazy_march.py for the
kernel and the floor argument it answers).

Semantics vs models/wavefront.py: identical estimator, different
schedule. Every lane carries, in addition to its path state, an
in-progress nearest-hit search: best-so-far hit rows and a
visited-cluster bitmask. Each step every block marches its K nearest
still-needed clusters; lanes whose certificate closes (no unvisited
cluster AABB entry below their best t) shade, bounce, fold and reset
the search; the rest STALL — their ray, throughput, RNG stream and
accumulators are untouched, so the per-pixel draw ORDER and the
progressive average are bit-identical to the eager wavefront at equal
per-pixel sample counts (parity mode is preserved: stalled lanes draw
nothing).

Throughput accounting is by SEGMENTS COMPLETED (certified lanes per
step), not lanes*steps — a stalled lane traces no ray that step, and
bench.py reports completions/second.

Reference parity anchor: prog.cl:292-381 megakernel semantics at
equal spp; prog.cl:144-184 for the traversal capability.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.camera import Camera
from opencl_path_tracer_tpu.core.materials import MaterialsSoA
from opencl_path_tracer_tpu.core.types import Hits, Rays, vadd, vwhere
from opencl_path_tracer_tpu.models.megakernel import (
    _draws_parity, apply_factors, shade,
)
from opencl_path_tracer_tpu.models import wavefront
from opencl_path_tracer_tpu.ops import raygen, rng
from opencl_path_tracer_tpu.ops.pallas.intersect_kernel import (
    BIG, make_pallas_intersect, pack_rays,
)
from opencl_path_tracer_tpu.ops.pallas.march_kernel import (
    _block_lists, _slab_entries, build_march_scene,
)
from opencl_path_tracer_tpu.ops.pallas.lazy_march import (
    run_lazy_march, unvisited_mask,
)
from opencl_path_tracer_tpu.ops.pallas.plucker_kernel import plucker_feat


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields,
                                     meta_fields=[])
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class LazyState:
    """WavefrontState fields + the carried nearest-hit search."""

    colors: tuple
    samples: jnp.ndarray
    pixel: jnp.ndarray
    rng_state: jnp.ndarray
    ray_p: tuple
    ray_d: tuple
    f_l: tuple
    f_b: tuple
    f_s: tuple
    f_r: tuple
    cur_color: tuple
    inside: jnp.ndarray
    bounce: jnp.ndarray
    step: jnp.ndarray
    # march carry
    mt: jnp.ndarray          # (N,) f32 best-so-far t (BIG = none yet)
    mnx: jnp.ndarray
    mny: jnp.ndarray
    mnz: jnp.ndarray
    mm: jnp.ndarray          # mati as f32
    mg: jnp.ndarray          # tie-break global tri id
    vis: tuple               # CW x (N,) uint32 visited bitmask words
    completions: jnp.ndarray  # () uint32 certified-segment counter


def init_lazy(cam: Camera, num_pixels: int, C: int, *, seed: int = 1,
              mode: str = "parity", key=None,
              ids: jnp.ndarray | None = None) -> LazyState:
    wf = wavefront.init_wavefront(cam, num_pixels, seed=seed,
                                  mode=mode, key=key, ids=ids)
    n = num_pixels
    cw = -(-C // 32)
    big = jnp.full((n,), BIG, jnp.float32)
    z = jnp.zeros((n,), jnp.float32)
    return LazyState(
        colors=wf.colors, samples=wf.samples, pixel=wf.pixel,
        rng_state=wf.rng_state, ray_p=wf.ray_p, ray_d=wf.ray_d,
        f_l=wf.f_l, f_b=wf.f_b, f_s=wf.f_s, f_r=wf.f_r,
        cur_color=wf.cur_color, inside=wf.inside, bounce=wf.bounce,
        step=wf.step,
        mt=big, mnx=z, mny=z, mnz=z, mm=z, mg=z,
        vis=tuple(jnp.zeros((n,), jnp.uint32) for _ in range(cw)),
        completions=jnp.uint32(0),
    )


def _sort_lanes(st: LazyState, scene_lo, scene_inv) -> LazyState:
    """Per-step lane sort by (direction octant, origin Morton):
    identical key to wavefront.sort_state, applied to every 1-D leaf
    of the lazy state (the march carry travels with its lane)."""
    q = tuple(
        jnp.clip((st.ray_p[k] - scene_lo[k]) * scene_inv[k], 0.0, 1.0)
        for k in range(3)
    )
    cell = wavefront.morton3_components(q)
    octant = (
        (st.ray_d[0] >= 0).astype(jnp.uint32) * jnp.uint32(4)
        + (st.ray_d[1] >= 0).astype(jnp.uint32) * jnp.uint32(2)
        + (st.ray_d[2] >= 0).astype(jnp.uint32)
    )
    key = (octant << jnp.uint32(27)) | (cell >> jnp.uint32(3))
    leaves, treedef = jax.tree.flatten(st)
    vec_idx = [i for i, a in enumerate(leaves) if a.ndim != 0]
    # XLA:TPU variadic-sort COMPILE time is superlinear in operand
    # count and effectively hangs above ~25 operands (measured round
    # 3: 8 payloads 86 s stable / ~40 s unstable, 20 payloads 373 s
    # stable / 212 s unstable, 27+ never returned). Chunk the
    # payloads into groups of 13 (130 s total compile, 63 ms/call at
    # 2M lanes measured); every chunk sorts by the UNIQUE compound
    # key (key, iota) with is_stable=False — a total order, so each
    # chunk computes the identical permutation, and it equals the
    # stable-by-key permutation exactly.
    iota = jnp.arange(st.samples.shape[0], dtype=jnp.int32)
    CHUNK = 13
    for i0 in range(0, len(vec_idx), CHUNK):
        grp = vec_idx[i0:i0 + CHUNK]
        sorted_ops = jax.lax.sort(
            [key, iota] + [leaves[i] for i in grp], dimension=0,
            num_keys=2, is_stable=False,
        )
        for j, i in enumerate(grp):
            leaves[i] = sorted_ops[2 + j]
    return jax.tree.unflatten(treedef, leaves)


def make_lazy_pipeline(tris, *, cs: int = 512, tr: int = 256,
                       K: int = 4, tail: int = 4096,
                       interpret: bool = False):
    """Build (step_fn, init_fn, reordered_tris) for a scene.

    step_fn(cam, mats, st, iterations, mode, key, max_samples) -> st'.
    Hits folded into samples are bit-identical to the dense kernel
    over reordered_tris (in-visit exact refine + certificate + dense
    net for pend lanes)."""
    scene, rt, C = build_march_scene(tris, cs)
    cw = -(-C // 32)
    tail_isect = make_pallas_intersect(rt, interpret=interpret)
    scene_lo = scene.scene_lo
    scene_inv = scene.scene_inv

    def step(cam: Camera, mats: MaterialsSoA, st: LazyState, *,
             iterations: int, mode: str = "fast", key=None,
             max_samples: int | None = None) -> LazyState:
        n = st.samples.shape[0]
        assert n % tr == 0, (n, tr)
        st = _sort_lanes(st, scene_lo, scene_inv)

        rays8 = pack_rays(st.ray_p, st.ray_d, n)
        feat = plucker_feat(rays8)
        vis2d = jnp.stack(st.vis)

        # ---- march K block-nearest still-needed clusters ----
        ent, _ = _slab_entries(rays8, scene,
                               jnp.full((n,), BIG, jnp.float32))
        unvis = unvisited_mask(vis2d, C)
        need1 = (ent < BIG) & (ent < st.mt[None, :]) & unvis
        clist = _block_lists(ent, need1, tr, K)
        rows_in = tuple(
            x[None, :] for x in (st.mt, st.mnx, st.mny, st.mnz,
                                 st.mm, st.mg)
        )
        outs, vis2d = run_lazy_march(
            clist, rays8, feat, rows_in, vis2d, scene, cs, K, tr,
            interpret,
        )
        mt, mnx, mny, mnz, mm, mg = (o[0] for o in outs[:6])
        pend = outs[6][0] > 0.0

        # ---- dense net: pend lanes (in-visit ambiguity) resolved now
        # (re-visiting would pend deterministically again) ----
        iota = jnp.arange(n, dtype=jnp.int32)
        u4 = min(tail, n)

        def cond(carry):
            _, _, pend = carry
            return jnp.any(pend)

        def body(carry):
            rows, vis2d, pend = carry
            srt = jax.lax.sort(
                [(~pend).astype(jnp.int32), iota], num_keys=2,
                is_stable=False,
            )
            idx = srt[1][:u4]
            sr = Rays(
                p=tuple(rays8[k][idx] for k in range(3)),
                d=tuple(rays8[k][idx] for k in range(3, 6)),
            )
            ht = tail_isect(sr)
            newt = jnp.where(ht.valid, ht.t, BIG)
            news = (newt, ht.n[0], ht.n[1], ht.n[2],
                    ht.mati.astype(jnp.float32), jnp.zeros_like(newt))
            rows = tuple(
                r.at[idx].set(s) for r, s in zip(rows, news)
            )
            vis2d = vis2d.at[:, idx].set(jnp.uint32(0xFFFFFFFF))
            return rows, vis2d, pend.at[idx].set(False)

        rows, vis2d, _ = jax.lax.while_loop(
            cond, body, ((mt, mnx, mny, mnz, mm, mg), vis2d, pend)
        )
        mt, mnx, mny, mnz, mm, mg = rows

        # ---- certificate: no unvisited cluster can beat mt ----
        unvis = unvisited_mask(vis2d, C)
        need2 = (ent < BIG) & (ent < mt[None, :]) & unvis
        certified = ~need2.any(axis=0)
        # A certified lane with mt == BIG and no unvisited passing
        # cluster is an exact MISS. (With mt == BIG, need2 == every
        # unvisited passing cluster, so certification already demands
        # the full passing set was visited.)

        if max_samples is None:
            active = certified
        else:
            active = certified & (st.samples < max_samples)

        # ---- shade / bounce / fold for active lanes (the eager
        # wavefront body, gated by `active`) ----
        has_hit = active & (mt < BIG)
        safe_t = jnp.where(mt < BIG, mt, 0.0)
        hit = Hits(
            t=jnp.where(mt < BIG, mt, -1.0),
            p=tuple(st.ray_p[k] + st.ray_d[k] * safe_t
                    for k in range(3)),
            n=(mnx, mny, mnz),
            mati=jnp.where(mt < BIG, mm, 0.0).astype(jnp.int32),
        )
        rng_state = st.rng_state
        mat = mats.take_select(hit.mati)
        mtype = mat.type
        is_d_or_e = has_hit & ((mtype == 0) | (mtype == 3))
        if mode == "parity":
            need_d = is_d_or_e | (has_hit & (mtype == 2))
            rng_state, r1, r2 = _draws_parity(rng_state, need_d,
                                              is_d_or_e)
        else:
            u = rng.fast_uniforms(key, st.step, 0, (n,), 2)
            r1, r2 = u[0], u[1]

        s = shade(cam, mat, hit, st.ray_p, st.ray_d, st.inside, r1,
                  r2, has_hit)
        cur_color = st.cur_color
        if iterations == 1:  # preview (prog.cl:323-325)
            cur_color = vwhere(
                has_hit, vadd(s["mat"].kd, s["mat"].emission),
                cur_color,
            )
        f_l, f_b, f_s, f_r, inside, cur_color = apply_factors(
            s, st.f_l, st.f_b, st.f_s, st.f_r, st.inside, cur_color
        )

        bounce = jnp.where(active, st.bounce + 1, st.bounce)
        terminated = active & (~(mt < BIG) | (bounce >= iterations))

        s_f = st.samples.astype(jnp.float32)
        inv = 1.0 / (s_f + 1.0)
        colors = tuple(
            jnp.where(
                terminated,
                (st.colors[k] * s_f + cur_color[k]) * inv,
                st.colors[k],
            )
            for k in range(3)
        )
        samples = jnp.where(terminated, st.samples + 1, st.samples)

        if mode == "parity":
            rng_state, g1, g2 = _draws_parity(rng_state, terminated,
                                              terminated)
        else:
            u = rng.fast_uniforms(key, st.step, 1, (n,), 2)
            g1, g2 = u[0], u[1]
        fresh = raygen.camera_rays(cam, st.pixel, g1, g2)

        ones = tuple(jnp.ones((n,), jnp.float32) for _ in range(3))
        zeros = tuple(jnp.zeros((n,), jnp.float32) for _ in range(3))
        adv = active  # lanes that advanced a segment this step

        # March carry: active lanes start a NEW segment (reset);
        # stalled lanes keep searching the same ray.
        big = jnp.full((n,), BIG, jnp.float32)
        zf = jnp.zeros((n,), jnp.float32)
        vis_out = jnp.where(adv[None, :], jnp.uint32(0), vis2d)

        return LazyState(
            colors=colors,
            samples=samples,
            pixel=st.pixel,
            rng_state=rng_state,
            ray_p=vwhere(terminated, fresh.p,
                         vwhere(adv, s["new_p"], st.ray_p)),
            ray_d=vwhere(terminated, fresh.d,
                         vwhere(adv, s["new_d"], st.ray_d)),
            f_l=vwhere(terminated, ones, vwhere(adv, f_l, st.f_l)),
            f_b=vwhere(terminated, ones, vwhere(adv, f_b, st.f_b)),
            f_s=vwhere(terminated, ones, vwhere(adv, f_s, st.f_s)),
            f_r=vwhere(terminated, ones, vwhere(adv, f_r, st.f_r)),
            cur_color=vwhere(terminated, zeros,
                             vwhere(adv, cur_color, st.cur_color)),
            inside=jnp.where(terminated, False,
                             jnp.where(adv, inside, st.inside)),
            bounce=jnp.where(terminated, 0,
                             jnp.where(adv, bounce, st.bounce)),
            step=st.step + jnp.uint32(1),
            mt=jnp.where(adv, big, mt),
            mnx=jnp.where(adv, zf, mnx),
            mny=jnp.where(adv, zf, mny),
            mnz=jnp.where(adv, zf, mnz),
            mm=jnp.where(adv, zf, mm),
            mg=jnp.where(adv, zf, mg),
            vis=tuple(vis_out[w] for w in range(vis_out.shape[0])),
            completions=st.completions
            + jnp.sum(adv).astype(jnp.uint32),
        )

    def init(cam: Camera, num_pixels: int, **kw) -> LazyState:
        return init_lazy(cam, num_pixels, C, **kw)

    return step, init, rt
