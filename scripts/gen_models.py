"""Generate the seven model OBJs the reference scene expects.

The reference's default scene loads ../models/{lsphere,chair,egg,dragon,
Wineglass,sphere,glass-table}.obj (main.cpp:1002-1010) — files that are
NOT in the reference repo, so its default scene cannot even load
upstream. These deterministic procedural stand-ins (matched position/
scale/material class) make the full add_Obj code path — OBJ parse, MTL
with the custom Kn/Kk/Tp keys (main.cpp:564-581), X-flip + transform
(main.cpp:598-606), per-shape end_Obj (main.cpp:615) — exercisable and
the parity protocol reproducible end to end.

Writes tests/assets/models/*.obj + *.mtl. Run once; outputs are
committed. Regenerating is byte-stable.
"""

import os
import sys

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "assets", "models")

# Material blocks with the reference's custom MTL keys (Kn = per-channel
# IOR, Kk = extinction, Tp = type int; main.cpp:564-581) using the
# archetype constants of main.cpp:753-762.
MTL = {
    "lamp": """newmtl lamp
Kd 0 0 0
Ks 0 0 0
Ke 120 100 80
Ns 0
Kn 0 0 0
Kk 0 0 0
Tp 3
""",
    "purple_specular": """newmtl purple_specular
Kd 0.3 0 0
Ks 0.3 0.3 0.3
Ke 0 0 0
Ns 200
Kn 0 0 0
Kk 0 0 0
Tp 0
""",
    "gold": """newmtl gold
Kd 0 0 0
Ks 0 0 0
Ke 0 0 0
Ns 0
Kn 0.17 0.35 1.50
Kk 3.1 2.7 1.9
Tp 1
""",
    "glass": """newmtl glass
Kd 0 0 0
Ks 0 0 0
Ke 0 0 0
Ns 0
Kn 1.50 1.50 1.50
Kk 0 0 0
Tp 2
""",
}


def sphere(radius=1.0, lat=10, lon=16, squash=(1.0, 1.0, 1.0),
           center=(0.0, 0.0, 0.0), bump=0.0, seed=0):
    """UV sphere triangles; bump > 0 adds deterministic radial noise."""
    rs = np.random.default_rng(seed)
    verts, faces = [], []
    for i in range(lat + 1):
        th = np.pi * i / lat
        for j in range(lon):
            ph = 2 * np.pi * j / lon
            r = radius * (1.0 + (bump * rs.uniform(-1, 1) if bump else 0))
            v = np.array([
                r * np.sin(th) * np.cos(ph) * squash[0],
                r * np.cos(th) * squash[1],
                r * np.sin(th) * np.sin(ph) * squash[2],
            ]) + center
            verts.append(v)

    def vid(i, j):
        return i * lon + (j % lon)

    for i in range(lat):
        for j in range(lon):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j + 1), vid(i + 1, j)
            if i > 0:
                faces.append((a, b, c))
            if i < lat - 1:
                faces.append((a, c, d))
    return np.asarray(verts), faces


def box(lo, hi):
    lo, hi = np.asarray(lo, float), np.asarray(hi, float)
    corners = np.array([[lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
                        [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]],
                        [lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
                        [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]]])
    quads = [(0, 1, 2, 3), (5, 4, 7, 6), (4, 0, 3, 7),
             (1, 5, 6, 2), (3, 2, 6, 7), (4, 5, 1, 0)]
    faces = []
    for q in quads:
        faces.append((q[0], q[1], q[2]))
        faces.append((q[0], q[2], q[3]))
    return corners, faces


def lathe(profile, segments=24):
    """Surface of revolution around the Y axis. profile: (r, y) pairs."""
    verts, faces = [], []
    for r, y in profile:
        for j in range(segments):
            ph = 2 * np.pi * j / segments
            verts.append([r * np.cos(ph), y, r * np.sin(ph)])
    for i in range(len(profile) - 1):
        for j in range(segments):
            a = i * segments + j
            b = i * segments + (j + 1) % segments
            c = (i + 1) * segments + (j + 1) % segments
            d = (i + 1) * segments + j
            faces.append((a, b, c))
            faces.append((a, c, d))
    return np.asarray(verts), faces


def merge(parts):
    verts, faces = [], []
    off = 0
    for v, f in parts:
        verts.append(v)
        faces.extend((a + off, b + off, c + off) for a, b, c in f)
        off += len(v)
    return np.concatenate(verts), faces


def write_obj(name, verts, faces, mtl_name):
    os.makedirs(OUT, exist_ok=True)
    base = os.path.join(OUT, name)
    with open(base + ".mtl", "w") as fh:
        fh.write(MTL[mtl_name])
    with open(base + ".obj", "w") as fh:
        fh.write(f"mtllib {name}.mtl\no {name}\n")
        for v in verts:
            fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        fh.write(f"usemtl {mtl_name}\n")
        for a, b, c in faces:
            fh.write(f"f {a + 1} {b + 1} {c + 1}\n")
    print(f"wrote {base}.obj ({len(faces)} tris)")


def main():
    # lsphere: the ceiling lamp — unit sphere, scaled x200 by the scene.
    write_obj("lsphere", *sphere(1.0, lat=8, lon=12), "lamp")

    # chair (scaled x190): seat + back + 4 legs, ~1-unit tall.
    legs = [box((x - 0.04, 0.0, z - 0.04), (x + 0.04, 0.45, z + 0.04))
            for x in (-0.35, 0.35) for z in (-0.35, 0.35)]
    chair = merge(legs + [
        box((-0.42, 0.45, -0.42), (0.42, 0.53, 0.42)),   # seat
        box((-0.42, 0.53, 0.34), (0.42, 1.15, 0.42)),    # back
    ])
    write_obj("chair", *chair, "purple_specular")

    # egg (scaled x0.5): squashed sphere, 160-unit base radius.
    write_obj("egg", *sphere(160.0, lat=12, lon=16,
                             squash=(1.0, 1.35, 1.0)), "purple_specular")

    # dragon (scaled x10): spiky deterministic blob, 15-unit radius.
    write_obj("dragon", *sphere(15.0, lat=12, lon=16, bump=0.25, seed=7),
              "glass")

    # Wineglass (scale x1): lathe profile, ~90 units radius / 330 tall.
    profile = [(60.0, 0.0), (60.0, 8.0), (10.0, 10.0), (8.0, 150.0),
               (30.0, 170.0), (75.0, 200.0), (88.0, 260.0),
               (90.0, 330.0), (84.0, 330.0), (80.0, 270.0),
               (68.0, 215.0), (30.0, 185.0), (0.0, 180.0)]
    write_obj("Wineglass", *lathe(profile, segments=20), "glass")

    # sphere (scaled x100): the gold ball.
    write_obj("sphere", *sphere(1.0, lat=12, lon=16), "gold")

    # glass-table (scaled x500): top slab + 4 legs, ~0.66 units tall.
    legs = [box((x - 0.02, 0.0, z - 0.02), (x + 0.02, 0.60, z + 0.02))
            for x in (-0.45, 0.45) for z in (-0.45, 0.45)]
    table = merge(legs + [box((-0.5, 0.60, -0.5), (0.5, 0.66, 0.5))])
    write_obj("glass-table", *table, "glass")


if __name__ == "__main__":
    main()
