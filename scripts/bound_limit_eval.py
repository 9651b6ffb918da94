"""Offline: the LIMIT of the bound-refinement direction (b).

Extends dop_bound_eval with (on the saved steady stress wavefront):
  * 26-DOP need (AABB + 4 corner diagonals + 6 edge diagonals) — is
    there headroom beyond the 14-DOP's -20%?
  * the PER-TRIANGLE-AABB limit: cluster bound = min over its tris of
    the tri's own AABB slab entry. Any conservative per-cluster bound
    B >= this (each tri bbox contains its tri, and min over members
    is the tightest decomposable bound), so the need it yields is the
    floor for the whole slab/decomposition bound family. Evaluated on
    a ray subsample (exact per-ray counts, sampled population).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
         python scripts/bound_limit_eval.py [/tmp/stress_rays5.npz]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from march_design_sweep import morton3

CORNERS = np.array([
    [1.0, 1.0, 1.0],
    [1.0, -1.0, 1.0],
    [1.0, 1.0, -1.0],
    [1.0, -1.0, -1.0],
], np.float32)
EDGES = np.array([
    [1.0, 1.0, 0.0],
    [1.0, -1.0, 0.0],
    [1.0, 0.0, 1.0],
    [1.0, 0.0, -1.0],
    [0.0, 1.0, 1.0],
    [0.0, 1.0, -1.0],
], np.float32)
BIG = np.float32(3.4e38)


def slab_need(P, D, tf, proj_lo, proj_hi, axes, chunk=1 << 14):
    """Per-ray count of clusters whose (len(axes))-DOP entry < tf."""
    n = P.shape[1]
    C = proj_lo.shape[1]
    counts = np.zeros((n,), np.int64)
    for a in range(0, n, chunk):
        b = min(a + chunk, n)
        tn = np.full((C, b - a), -BIG, np.float32)
        tm = np.full((C, b - a), BIG, np.float32)
        for k, u in enumerate(axes):
            p = (u @ P[:, a:b])[None, :]
            dv = (u @ D[:, a:b])[None, :]
            bl = proj_lo[k][:, None]
            bh = proj_hi[k][:, None]
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
        ent = np.where(ok, np.maximum(tn, 0.0), BIG)
        tfc = tf[a:b]
        tfc = np.where(tfc < 0, BIG, tfc)
        counts[a:b] = (ok & (ent < tfc[None, :])).sum(0)
    return counts


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_rays5.npz"
    d = np.load(path)
    pref = "s0_" if "s0_px" in d.files else ""
    P = np.stack([d[pref + k] for k in ("px", "py", "pz")])
    D = np.stack([d[pref + k] for k in ("dx", "dy", "dz")])
    tf = d[pref + "t"]
    n = P.shape[1]
    print(f"rays: {n}", flush=True)

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
    eye = np.eye(3, dtype=np.float32)
    axes26 = np.concatenate([eye, CORNERS, EDGES])   # 13 axes

    t_count = r1.shape[0]
    for cs in (512, 256, 128):
        C = -(-t_count // cs)
        pad = C * cs - t_count
        proj_lo, proj_hi = [], []
        for u in axes26:
            pv = np.stack([r1 @ u, r2 @ u, r3 @ u])
            plo, phi = pv.min(0)[order], pv.max(0)[order]
            if pad:
                plo = np.concatenate([plo, np.full(pad, np.inf)])
                phi = np.concatenate([phi, np.full(pad, -np.inf)])
            slo = plo.reshape(C, cs).min(1)
            shi = phi.reshape(C, cs).max(1)
            w = np.where(np.isfinite(shi - slo), shi - slo, 0.0)
            delta = (1e-4 * w + 1e-3).astype(np.float32)
            proj_lo.append(np.where(np.isfinite(slo), slo - delta, slo))
            proj_hi.append(np.where(np.isfinite(shi), shi + delta, shi))
        proj_lo = np.stack(proj_lo).astype(np.float32)   # (13, C)
        proj_hi = np.stack(proj_hi).astype(np.float32)

        t0 = time.time()
        for nax, name in ((3, "AABB"), (7, "14-DOP"), (13, "26-DOP")):
            cnt = slab_need(P, D, tf, proj_lo[:nax], proj_hi[:nax],
                            axes26[:nax])
            print(f"cs={cs} C={C} {name}: need mean={cnt.mean():.2f} "
                  f"p50={np.percentile(cnt, 50):.0f} "
                  f"p90={np.percentile(cnt, 90):.0f} "
                  f"p99={np.percentile(cnt, 99):.0f} "
                  f"[{time.time() - t0:.0f}s]", flush=True)

    # ---- per-tri-AABB limit on a subsample (cs=512, 256) ----
    rng = np.random.default_rng(0)
    m = min(16384, n)
    sel = rng.choice(n, size=m, replace=False)
    Ps, Ds = P[:, sel], D[:, sel]
    tfs = tf[sel]
    tfs = np.where(tfs < 0, BIG, tfs).astype(np.float32)

    # Per-tri AABBs in cluster order, padded.
    tlo = lo3[order].astype(np.float32)
    thi = hi3[order].astype(np.float32)
    w3 = thi - tlo
    dl = (1e-4 * w3 + 1e-3).astype(np.float32)
    tlo -= dl
    thi += dl

    for cs in (512, 256):
        C = -(-t_count // cs)
        padn = C * cs - t_count
        plo = np.concatenate(
            [tlo, np.full((padn, 3), np.inf, np.float32)])
        phi = np.concatenate(
            [thi, np.full((padn, 3), -np.inf, np.float32)])
        t0 = time.time()
        need = np.zeros((m,), np.int64)
        chunk = 512  # rays per block
        for a in range(0, m, chunk):
            b = min(a + chunk, m)
            # (T, R) per-tri slab entry for this ray block.
            tn = np.full((C * cs, b - a), -BIG, np.float32)
            tm = np.full((C * cs, b - a), BIG, np.float32)
            for ax in range(3):
                p = Ps[ax, a:b][None, :]
                dv = Ds[ax, a:b][None, :]
                bl = plo[:, ax][:, None]
                bh = phi[:, ax][:, None]
                d0 = dv == 0.0
                inv = 1.0 / np.where(d0, 1.0, dv)
                t1 = (bl - p) * inv
                t2 = (bh - p) * inv
                lo_ax = np.minimum(t1, t2)
                hi_ax = np.maximum(t1, t2)
                inside = (p >= bl) & (p <= bh)
                lo_ax = np.where(
                    d0, np.where(inside, -BIG, BIG), lo_ax)
                hi_ax = np.where(
                    d0, np.where(inside, BIG, -BIG), hi_ax)
                tn = np.maximum(tn, lo_ax)
                tm = np.minimum(tm, hi_ax)
            ok = (tm >= tn) & (tm >= 0)
            ent = np.where(ok, np.maximum(tn, 0.0), BIG)
            # Cluster bound = min entry over member tris.
            centry = ent.reshape(C, cs, b - a).min(1)   # (C, R)
            need[a:b] = (centry < tfs[a:b][None, :]).sum(0)
        print(f"cs={cs} C={C} per-tri-AABB LIMIT (n={m}): "
              f"need mean={need.mean():.2f} "
              f"p50={np.percentile(need, 50):.0f} "
              f"p90={np.percentile(need, 90):.0f} "
              f"p99={np.percentile(need, 99):.0f} "
              f"[{time.time() - t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
