"""Offline: certificate need vs sub-box count k (min-over-children
AABB bound) on a ray subsample.

bound_limit_eval measured the k=512 (per-tri) limit at need 3.39
(cs=512) while twolevel_bound_eval measured k=2/4 at 8.35/8.04 — this
sweep fills the curve. For each k the cluster bound is
min over its k Morton-chunk sub-AABB slab entries (each sub-AABB the
union of its members' boxes, outward-inflated like the march AABBs);
need = clusters whose bound < the lane's final hit t.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
         python scripts/subbox_k_sweep.py [/tmp/stress_rays5.npz]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from march_design_sweep import morton3

BIG = np.float32(3.4e38)


def entries(boxes_lo, boxes_hi, Ps, Ds):
    """(B, R) slab entry (BIG = miss) for B boxes x R rays."""
    B = boxes_lo.shape[0]
    R = Ps.shape[1]
    tn = np.full((B, R), -BIG, np.float32)
    tm = np.full((B, R), BIG, np.float32)
    for ax in range(3):
        p = Ps[ax][None, :]
        dv = Ds[ax][None, :]
        bl = boxes_lo[:, ax][:, None]
        bh = boxes_hi[:, ax][:, None]
        d0 = dv == 0.0
        inv = 1.0 / np.where(d0, 1.0, dv)
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
    return np.where(ok, np.maximum(tn, 0.0), BIG)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_rays5.npz"
    d = np.load(path)
    pref = "s0_" if "s0_px" in d.files else ""
    P = np.stack([d[pref + k] for k in ("px", "py", "pz")])
    D = np.stack([d[pref + k] for k in ("dx", "dy", "dz")])
    tf = d[pref + "t"]
    n = P.shape[1]

    from opencl_path_tracer_tpu.scene import library
    scene = library.stress_scene(100_000)
    tris = scene.tris
    r1, r2, r3 = (np.asarray(a) for a in (tris.r1, tris.r2, tris.r3))
    lo3 = np.minimum(np.minimum(r1, r2), r3)
    hi3 = np.maximum(np.maximum(r1, r2), r3)
    mid = (r1 + r2 + r3) / 3.0
    scene_lo = lo3.min(0)
    extent = np.maximum(hi3.max(0) - scene_lo, 1e-9)
    codes = morton3(((mid - scene_lo) / extent).T.astype(np.float32))
    diag = np.linalg.norm(hi3 - lo3, axis=1)
    scene_diag = float(np.linalg.norm(hi3.max(0) - lo3.min(0)))
    codes = np.where(diag > 0.25 * scene_diag,
                     np.uint32(0), codes | np.uint32(1 << 30))
    order = np.argsort(codes, kind="stable")

    rng = np.random.default_rng(0)
    m = min(16384, n)
    sel = rng.choice(n, size=m, replace=False)
    Ps, Ds = P[:, sel].copy(), D[:, sel].copy()
    tfs = tf[sel]
    tfs = np.where(tfs < 0, BIG, tfs).astype(np.float32)

    t_count = r1.shape[0]
    tlo = lo3[order].astype(np.float32)
    thi = hi3[order].astype(np.float32)

    for cs in (512, 256):
        C = -(-t_count // cs)
        padn = C * cs - t_count
        plo = np.concatenate(
            [tlo, np.full((padn, 3), np.inf, np.float32)])
        phi = np.concatenate(
            [thi, np.full((padn, 3), -np.inf, np.float32)])
        for k in (2, 4, 8, 16, 32, 64, 128):
            slo = plo.reshape(C, k, cs // k, 3).min(2).reshape(-1, 3)
            shi = phi.reshape(C, k, cs // k, 3).max(2).reshape(-1, 3)
            w3 = np.where(np.isfinite(shi - slo), shi - slo, 0.0)
            dl = (1e-4 * w3 + 1e-3).astype(np.float32)
            slo2 = np.where(np.isfinite(slo), slo - dl, slo)
            shi2 = np.where(np.isfinite(shi), shi + dl, shi)
            t0 = time.time()
            need = np.zeros((m,), np.int64)
            chunk = max(256, (1 << 22) // (C * k))
            for a in range(0, m, chunk):
                b = min(a + chunk, m)
                ent = entries(slo2, shi2, Ps[:, a:b], Ds[:, a:b])
                centry = ent.reshape(C, k, b - a).min(1)
                need[a:b] = (centry < tfs[a:b][None, :]).sum(0)
            print(f"cs={cs} k={k}: need mean={need.mean():.2f} "
                  f"p50={np.percentile(need, 50):.0f} "
                  f"p90={np.percentile(need, 90):.0f} "
                  f"p99={np.percentile(need, 99):.0f} "
                  f"[{time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
