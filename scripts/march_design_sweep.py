"""Offline design-point sweep for the march-v2 intersector.

Consumes /tmp/stress_rays.npz (or stress_rays5.npz for staleness rows)
saved by a TPU job: the REAL 1080p steady-state stress wavefront plus
the dense kernel's final nearest-hit t per lane. Computes, entirely on
CPU numpy:

  - per-lane NEED (clusters whose inflated-AABB slab entry < final t)
    for a sweep of cluster sizes -> the per-lane-optimal test count;
  - per-block cluster-list UNIONS for a sweep of (block size, sort
    key, staleness) -> the SIMD waste factor a block-march pays;
  - the implied kernel cost (Gtests) of a flat work-list march at
    each design point.

This is the sizing evidence for march v2 (NOTES_NEXT_ROUND.md round-4
roadmap): the round-3 kernel paid N*K1*cs tests regardless of need
(fixed visit count per block) and its measured block unions at
(tr=512, cs=512) were 71 vs per-lane need 8.7 — an 8x SIMD waste on
top of a 2.9x dummy-visit waste.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def expand_bits(v):
    v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
    v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
    v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
    v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
    return v


def morton3(q):
    def scale(c):
        return np.clip(c * 1024.0, 0.0, 1023.0).astype(np.uint32)
    return ((expand_bits(scale(q[0])) << np.uint32(2))
            | (expand_bits(scale(q[1])) << np.uint32(1))
            | expand_bits(scale(q[2])))


def cluster_boxes(tri_lo, tri_hi, cs):
    t = tri_lo.shape[0]
    C = -(-t // cs)
    pad = C * cs - t
    if pad:
        tri_lo = np.concatenate(
            [tri_lo, np.full((pad, 3), np.inf, np.float32)])
        tri_hi = np.concatenate(
            [tri_hi, np.full((pad, 3), -np.inf, np.float32)])
    blo = tri_lo.reshape(C, cs, 3).min(1)
    bhi = tri_hi.reshape(C, cs, 3).max(1)
    diag = np.linalg.norm(
        np.where(np.isfinite(bhi - blo), bhi - blo, 0.0), axis=1,
        keepdims=True)
    delta = 1e-4 * diag + 1e-3
    blo = np.where(np.isfinite(blo), blo - delta, blo)
    bhi = np.where(np.isfinite(bhi), bhi + delta, bhi)
    return blo.astype(np.float32), bhi.astype(np.float32)


def need_counts(blo, bhi, P, D, t_final, chunk=1 << 14):
    """Per-lane count of needed clusters + the need mask generator.
    Returns (counts, iter_chunks) where iter_chunks yields
    (lane_slice, need_mask (C, chunk) bool)."""
    C = blo.shape[0]
    n = P.shape[1]
    counts = np.zeros((n,), np.int64)

    def chunks():
        BIG = np.float32(3.4e38)
        for a in range(0, n, chunk):
            b = min(a + chunk, n)
            tn = np.full((C, b - a), -BIG, np.float32)
            tm = np.full((C, b - a), BIG, np.float32)
            for ax in range(3):
                p = P[ax, a:b][None, :]
                d = D[ax, a:b][None, :]
                bl = blo[:, ax][:, None]
                bh = bhi[:, ax][:, None]
                d0 = d == 0.0
                inv = 1.0 / np.where(d0, 1.0, d)
                t1 = (bl - p) * inv
                t2 = (bh - p) * inv
                lo_ax = np.minimum(t1, t2)
                hi_ax = np.maximum(t1, t2)
                inside = (p >= bl) & (p <= bh)
                lo_ax = np.where(d0, np.where(inside, -BIG, BIG), lo_ax)
                hi_ax = np.where(d0, np.where(inside, BIG, -BIG), hi_ax)
                tn = np.maximum(tn, lo_ax)
                tm = np.minimum(tm, hi_ax)
            ok = (tm >= tn) & (tm >= 0)
            ent = np.where(ok, np.maximum(tn, 0.0), BIG)
            tf = t_final[a:b]
            tf = np.where(tf < 0, BIG, tf)  # miss lanes need all passes
            need = ok & (ent < tf[None, :])
            yield slice(a, b), need

    for sl, need in chunks():
        counts[sl] = need.sum(0)
    return counts, chunks


def union_stats(chunks_fn, trs):
    """Per-block union sizes for each block size in trs, assuming lanes
    are already in the desired order. Returns {tr: unions array}."""
    acc = {tr: [] for tr in trs}
    carry = None  # leftover need columns when chunk % tr != 0
    for sl, need in chunks_fn():
        if carry is not None:
            need = np.concatenate([carry, need], axis=1)
            carry = None
        for tr in trs:
            C, m = need.shape
            nb = m // tr
            if nb:
                u = need[:, :nb * tr].reshape(C, nb, tr).any(2).sum(0)
                acc[tr].append(u)
        # keep remainder for the largest tr only (chunk is a multiple
        # of every tr we use, so this is defensive)
        rem = need.shape[1] % max(trs)
        if rem:
            carry = need[:, -rem:]
    return {tr: np.concatenate(v) for tr, v in acc.items()}


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_rays.npz"
    d = np.load(path)
    pref = "s0_" if "s0_px" in d.files else ""
    P = np.stack([d[pref + k] for k in ("px", "py", "pz")])
    D = np.stack([d[pref + k] for k in ("dx", "dy", "dz")])
    tf = d[pref + "t"]
    n = P.shape[1]

    from opencl_path_tracer_tpu.scene import library
    scene = library.stress_scene(100_000)
    tris = scene.tris
    r1 = np.asarray(tris.r1)
    r2 = np.asarray(tris.r2)
    r3 = np.asarray(tris.r3)
    lo = np.minimum(np.minimum(r1, r2), r3)
    hi = np.maximum(np.maximum(r1, r2), r3)
    mid = (r1 + r2 + r3) / 3.0
    scene_lo = lo.min(0)
    extent = np.maximum(hi.max(0) - scene_lo, 1e-9)
    codes = morton3(((mid - scene_lo) / extent).T.astype(np.float32))
    diag = np.linalg.norm(hi - lo, axis=1)
    scene_diag = float(np.linalg.norm(hi.max(0) - lo.min(0)))
    codes = np.where(diag > 0.25 * scene_diag,
                     np.uint32(0), codes | np.uint32(1 << 30))
    order = np.argsort(codes, kind="stable")
    tlo, thi = lo[order], hi[order]

    # ---- sort keys ----
    q = tuple(np.clip((P[k] - scene_lo[k]) / extent[k], 0, 1)
              for k in range(3))
    cell = morton3(q)
    octant = ((D[0] >= 0).astype(np.uint32) * 4
              + (D[1] >= 0).astype(np.uint32) * 2
              + (D[2] >= 0).astype(np.uint32))
    # finer direction: 6-bit (octant + per-axis |d| ranking bit pair)
    ax_max = np.argmax(np.abs(D), axis=0).astype(np.uint32)
    del ax_max
    keys = {
        "oct_morton": (octant.astype(np.uint64) << 32)
        | cell.astype(np.uint64),
        "morton_oct": (cell.astype(np.uint64) << 3)
        | octant.astype(np.uint64),
    }

    trs = (128, 256, 512)
    for cs in (512, 256, 128, 64):
        blo, bhi = cluster_boxes(tlo, thi, cs)
        C = blo.shape[0]
        t0 = time.time()
        counts, _ = need_counts(blo, bhi, P, D, tf)
        # all-pass count: clusters the slab passes with NO t bound —
        # the first-round cost for a lane with no prior hit estimate.
        allc, _ = need_counts(blo, bhi, P, D,
                              np.full_like(tf, 3.4e38))
        print(f"cs={cs} C={C}: per-lane need mean={counts.mean():.2f} "
              f"p50={np.percentile(counts, 50):.0f} "
              f"p90={np.percentile(counts, 90):.0f} "
              f"p99={np.percentile(counts, 99):.0f} "
              f"max={counts.max()} "
              f"opt={counts.mean() * cs:.0f} tris/lane; "
              f"allpass mean={allc.mean():.2f} "
              f"p90={np.percentile(allc, 90):.0f} "
              f"[{time.time() - t0:.0f}s]")
        for kname, key in keys.items():
            if key is None:
                ordl = np.arange(n)
            else:
                ordl = np.argsort(key, kind="stable")
            Ps, Ds, tfs = P[:, ordl], D[:, ordl], tf[ordl]
            _, chunks_fn = need_counts(blo, bhi, Ps, Ds, tfs)
            st = union_stats(chunks_fn, trs)
            row = " ".join(
                f"tr={tr}:u={st[tr].mean():6.1f} "
                f"V={st[tr].sum() / 1e3:6.0f}k "
                f"Gt={st[tr].sum() * tr * cs / 1e9:6.1f}"
                for tr in trs
            )
            print(f"   key={kname:13s} {row}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
