"""Offline evaluation of k-DOP cluster bounds (the last untested
bound family for the stress certificate set — docs/BENCHMARKS.md
"Two-level bound refinement ... CLOSED").

Adds 4 diagonal support axes (+-1 combos) to the 3 AABB axes per
cluster (a 14-DOP) and recomputes per-lane certificate need on the
saved steady wavefront: need = clusters whose DOP slab entry < the
lane's final hit t. If the mean need does not drop well below the
AABB's 8.74 (cs=512), no slab-family bound can shrink the pair
volume and the bound-refinement direction is closed entirely.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from march_design_sweep import morton3

AXES = np.array([
    [1.0, 1.0, 1.0],
    [1.0, -1.0, 1.0],
    [1.0, 1.0, -1.0],
    [1.0, -1.0, -1.0],
], np.float32)


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
    r1, r2, r3 = (np.asarray(a) for a in (tris.r1, tris.r2, tris.r3))
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

    for cs in (512, 256):
        t_count = r1.shape[0]
        C = -(-t_count // cs)
        pad = C * cs - t_count

        # Per-axis support intervals per cluster: AABB axes first,
        # then the 4 diagonals (supports over all 3 vertices).
        # Projections (T, 7): axis k value per vertex, reduced.
        proj_lo = []
        proj_hi = []
        eye = np.eye(3, dtype=np.float32)
        for u in np.concatenate([eye, AXES]):
            pv = np.stack([r1 @ u, r2 @ u, r3 @ u])  # (3, T)
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
        proj_lo = np.stack(proj_lo).astype(np.float32)   # (7, C)
        proj_hi = np.stack(proj_hi).astype(np.float32)

        BIG = np.float32(3.4e38)
        counts_dop = np.zeros((n,), np.int64)
        counts_box = np.zeros((n,), np.int64)
        t0 = time.time()
        chunk = 1 << 14
        for a in range(0, n, chunk):
            b = min(a + chunk, n)
            for nax, name in ((3, "box"), (7, "dop")):
                tn = np.full((C, b - a), -BIG, np.float32)
                tm = np.full((C, b - a), BIG, np.float32)
                for k in range(nax):
                    u = np.concatenate([eye, AXES])[k]
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
                    lo_ax = np.where(
                        d0, np.where(inside, -BIG, BIG), lo_ax)
                    hi_ax = np.where(
                        d0, np.where(inside, BIG, -BIG), hi_ax)
                    tn = np.maximum(tn, lo_ax)
                    tm = np.minimum(tm, hi_ax)
                ok = (tm >= tn) & (tm >= 0)
                ent = np.where(ok, np.maximum(tn, 0.0), BIG)
                tfc = tf[a:b]
                tfc = np.where(tfc < 0, BIG, tfc)
                need = (ok & (ent < tfc[None, :])).sum(0)
                (counts_box if name == "box" else counts_dop)[a:b] = need
        print(f"cs={cs} C={C}: AABB need mean={counts_box.mean():.2f} "
              f"p90={np.percentile(counts_box, 90):.0f} | 14-DOP need "
              f"mean={counts_dop.mean():.2f} "
              f"p50={np.percentile(counts_dop, 50):.0f} "
              f"p90={np.percentile(counts_dop, 90):.0f} "
              f"p99={np.percentile(counts_dop, 99):.0f} "
              f"[{time.time() - t0:.0f}s]")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
