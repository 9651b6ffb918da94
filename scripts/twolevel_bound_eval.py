"""Offline evaluation of the 2-level cluster-bound refinement
(NOTES_NEXT_ROUND.md direction b) on the saved REAL stress wavefront.

For parent clusters of size cs, refine each parent's culling test to
its k sub-boxes of size cs/k: the parent is a candidate iff ANY
sub-box passes with entry < bound, and its certificate entry becomes
min over passing sub-entries (tighter, still conservative: every
triangle lives inside some sub-box).

Reports, per (cs, k): per-lane parent need under the refined bound vs
the plain AABB need, and the implied pair-kernel test volume — the
sizing evidence for adding sub-box refinement to the pair candidate
kernel. Pure numpy on /tmp/stress_rays.npz (scripts/
save_steady_wavefront.py regenerates it after a /tmp wipe).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from march_design_sweep import cluster_boxes, morton3, need_counts


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_rays.npz"
    d = np.load(path)
    pref = "s0_" if "s0_px" in d.files else ""
    P = np.stack([d[pref + k] for k in ("px", "py", "pz")])
    D = np.stack([d[pref + k] for k in ("dx", "dy", "dz")])
    tf = d[pref + "t"]

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
    tlo, thi = lo[order], hi[order]

    for cs in (512, 256):
        blo, bhi = cluster_boxes(tlo, thi, cs)
        C = blo.shape[0]
        base, _ = need_counts(blo, bhi, P, D, tf)
        for k in (2, 4, 8):
            sub = cs // k
            slo, shi = cluster_boxes(tlo, thi, sub)
            Cs = slo.shape[0]
            subneed, _ = need_counts(slo, shi, P, D, tf)
            # Parent need under the refined bound = any needed sub.
            # need_counts gives per-lane counts only; recompute with
            # the mask generator for the group-any reduction.
            _, chunks_fn = need_counts(slo, shi, P, D, tf)
            n = P.shape[1]
            pneed = np.zeros((n,), np.int64)
            for sl, need in chunks_fn():
                if need.shape[0] < C * k:   # sub padding != parent*k
                    need = np.concatenate([
                        need,
                        np.zeros((C * k - need.shape[0],
                                  need.shape[1]), bool),
                    ])
                g = need[:C * k].reshape(C, k, -1).any(1)
                pneed[sl] = g.sum(0)
            print(
                f"cs={cs} k={k} (sub={sub}): parent need "
                f"mean={pneed.mean():.2f} p50={np.percentile(pneed, 50):.0f} "
                f"p90={np.percentile(pneed, 90):.0f} "
                f"p99={np.percentile(pneed, 99):.0f} | plain AABB "
                f"mean={base.mean():.2f} | sub-level need "
                f"mean={subneed.mean():.2f} | tests/lane "
                f"refined={pneed.mean() * cs:.0f} "
                f"plain={base.mean() * cs:.0f} "
                f"sublevel={subneed.mean() * sub:.0f}"
            )
            sys.stdout.flush()


if __name__ == "__main__":
    main()
