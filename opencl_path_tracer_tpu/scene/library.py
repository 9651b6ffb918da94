"""Built-in scenes.

The reference hardcodes its scene in onInitialization (main.cpp:745-1017):
ten material archetypes (:753-762), a huge ground plane (:814-816), and
seven add_Obj calls (:1002-1010) whose model files are NOT in the repo.
Here the same content is a library: the Cornell box (the commented-out
variant at main.cpp:793-816), the reference default scene (ground plane +
archetypes + whatever OBJ assets are present, with procedural stand-ins
for the missing ones), and procedural mesh generators (UV sphere — the
reference's "spheres" are tessellated OBJ meshes, main.cpp:1002,1009).
"""

from __future__ import annotations

import math
import os

import numpy as np

from opencl_path_tracer_tpu.core.materials import reference_archetypes
from opencl_path_tracer_tpu.scene.builder import Scene, SceneBuilder

# Archetype indices (main.cpp:751-762).
LAMP, SUN = 0, 1
WHITE_DIFFUSE, RED_DIFFUSE, GREEN_DIFFUSE = 2, 3, 4
PURPLE_SPECULAR, BLACK_SPECULAR = 5, 6
CHROMIUM, GOLD, GLASS = 7, 8, 9


def _add_quad(b: SceneBuilder, v0, v1, v2, v3, mat: int) -> None:
    b.add_triangle(v0, v1, v2, mat)
    b.add_triangle(v2, v3, v0, mat)


def _add_archetypes(b: SceneBuilder) -> None:
    for row in reference_archetypes():
        b.add_material_row(row)


def cornell_box(*, with_spheres: bool = True,
                light_scale: float = 1.0,
                analytic_spheres: bool = False,
                smooth_spheres: bool = False,
                sphere_lamp: bool = False,
                sphere_res: tuple = (12, 18)) -> Scene:
    """Cornell-style box in reference coordinates (the commented scene at
    main.cpp:793-816: box spanning x in [-100, 1100], y in [0, 1000],
    red left / green right / white elsewhere, lamp quad at y=999.9).

    analytic_spheres=True swaps the reference-parity tessellated
    spheres for exact analytic quadrics (core/spheres.py) at the same
    centers/radii/materials — no reference counterpart.
    smooth_spheres=True keeps the tessellation but attaches analytic
    vertex normals for smooth shading (engine smooth=True).
    sphere_lamp=True swaps the ceiling lamp quad for an emissive
    ANALYTIC SPHERE hanging below the ceiling (same LAMP material) —
    the library's sphere-emitter scene, exercising NEE's solid-angle
    cone sampler (ops/nee.py).
    sphere_res=(lat, lon) controls the tessellation density of the
    two spheres (default (12, 18) = the 792-tri reference-parity
    build; (26, 50) yields the ~5k-tri ENCLOSED mid-size anchor the
    auto-accel predictor is validated on — VERDICT r4 #4)."""
    if analytic_spheres and smooth_spheres:
        raise ValueError(
            "analytic_spheres and smooth_spheres are mutually "
            "exclusive: quadrics have exact normals already (no "
            "tessellation to smooth)"
        )
    b = SceneBuilder()
    _add_archetypes(b)

    if sphere_lamp:
        # Emissive sphere below the ceiling: comparable emitted power
        # to the lamp quad (its 4 pi R^2 at R=120 ~ 45% of the quad's
        # 400x400 area).
        b.add_analytic_sphere((500.0, 840.0, 500.0), 120.0, LAMP)
    else:
        # Lamp (main.cpp:765-766).
        b.add_triangle((300.0, 999.9, 700.0), (300.0, 999.9, 300.0),
                       (700.0, 999.9, 700.0), LAMP)
        b.add_triangle((700.0, 999.9, 700.0), (300.0, 999.9, 300.0),
                       (700.0, 999.9, 300.0), LAMP)

    _add_cornell_walls(b)
    b.end_obj()

    if with_spheres and analytic_spheres:
        b.add_analytic_sphere((250.0, 180.0, 500.0), 180.0, CHROMIUM)
        b.add_analytic_sphere((720.0, 160.0, 350.0), 160.0, GLASS)
    elif with_spheres:
        lat, lon = sphere_res
        add_sphere(b, center=(250.0, 180.0, 500.0), radius=180.0,
                   mat=CHROMIUM, lat=lat, lon=lon,
                   smooth=smooth_spheres)
        add_sphere(b, center=(720.0, 160.0, 350.0), radius=160.0,
                   mat=GLASS, lat=lat, lon=lon, smooth=smooth_spheres)
        b.end_obj()
    return b.build()


def _add_cornell_walls(b: SceneBuilder) -> None:
    """The cornell box's five wall quads (no lamp): the commented
    scene at main.cpp:794-815."""
    # Front (behind the scene, +z) (main.cpp:794-795).
    b.add_triangle((-100.0, 0.0, 1000.0), (-100.0, 1000.0, 1000.0),
                   (1100.0, 1000.0, 1000.0), WHITE_DIFFUSE)
    b.add_triangle((1100.0, 1000.0, 1000.0), (1100.0, 0.0, 1000.0),
                   (-100.0, 0.0, 1000.0), WHITE_DIFFUSE)
    # Left red (main.cpp:798-799).
    b.add_triangle((-100.0, 0.0, 1000.0), (-100.0, 0.0, -1000.0),
                   (-100.0, 1000.0, 1000.0), RED_DIFFUSE)
    b.add_triangle((-100.0, 1000.0, 1000.0), (-100.0, 0.0, -1000.0),
                   (-100.0, 1000.0, -1000.0), RED_DIFFUSE)
    # Right green (main.cpp:802-803).
    b.add_triangle((1100.0, 1000.0, 1000.0), (1100.0, 0.0, -1000.0),
                   (1100.0, 0.0, 1000.0), GREEN_DIFFUSE)
    b.add_triangle((1100.0, 1000.0, -1000.0), (1100.0, 0.0, -1000.0),
                   (1100.0, 1000.0, 1000.0), GREEN_DIFFUSE)
    # Ceiling (main.cpp:806-807).
    b.add_triangle((-100.0, 1000.0, 1000.0), (-100.0, 1000.0, -1000.0),
                   (1100.0, 1000.0, 1000.0), WHITE_DIFFUSE)
    b.add_triangle((1100.0, 1000.0, 1000.0), (-100.0, 1000.0, -1000.0),
                   (1100.0, 1000.0, -1000.0), WHITE_DIFFUSE)
    # Floor (main.cpp:814-815, shrunk to the box).
    b.add_triangle((-10000.0, 0.0, -10000.0), (-10000.0, 0.0, 10000.0),
                   (10000.0, 0.0, 10000.0), WHITE_DIFFUSE)
    b.add_triangle((10000.0, 0.0, 10000.0), (10000.0, 0.0, -10000.0),
                   (-10000.0, 0.0, -10000.0), WHITE_DIFFUSE)


def many_light_scene(count: int = 64, seed: int = 0) -> Scene:
    """Many-light benchmark scene (BEYOND the reference's scope — the
    reference samples no lights at all, its paths just stumble into
    the lamp, prog.cl:367-376): the cornell walls, two receiver
    spheres, and `count` small emissive ANALYTIC spheres scattered
    through the box volume with varied emission colors/intensities.

    Built for ops.nee's select='distance' mode: with this many lamps,
    power-proportional selection spends almost every shadow ray on a
    far-away light; distance-aware weights put them where the
    contribution is. All lamps share a handful of lamp materials —
    the pickup side disambiguates spheres by position, exactly."""
    rs = np.random.default_rng(seed)
    b = SceneBuilder()
    _add_archetypes(b)
    # A few lamp material variants (distinct colors, one shared id
    # class per color; material TYPE 3 = emitter).
    lamp_mats = []
    tints = [(120.0, 100.0, 80.0), (40.0, 80.0, 140.0),
             (140.0, 50.0, 40.0), (70.0, 130.0, 60.0)]
    for em in tints:
        lamp_mats.append(b.add_material(
            (0.0, 0.0, 0.0), (0.0, 0.0, 0.0), em,
            (0.0, 0.0, 0.0), (0.0, 0.0, 0.0), 0, 3))
    _add_cornell_walls(b)
    b.end_obj()
    b.add_analytic_sphere((250.0, 180.0, 500.0), 180.0, CHROMIUM)
    b.add_analytic_sphere((720.0, 160.0, 350.0), 160.0, GLASS)
    for i in range(count):
        c = (float(rs.uniform(-40.0, 1040.0)),
             float(rs.uniform(120.0, 960.0)),
             float(rs.uniform(-600.0, 940.0)))
        rad = float(rs.uniform(10.0, 22.0))
        b.add_analytic_sphere(c, rad, lamp_mats[i % len(lamp_mats)])
    return b.build()


def cornell_camera(width: int, height: int):
    """Camera preset for cornell_box: the reference's commented-out
    defaults (fov 60, yaw 0, pitch 0, zero shift — main.cpp:33-35,40)."""
    from opencl_path_tracer_tpu.core.camera import make_camera
    return make_camera(width, height, fov=60.0, yaw=0.0, pitch=0.0,
                       shift=(0.0, 0.0, 0.0))


def sphere_mesh(center, radius: float, lat: int = 12, lon: int = 18):
    """UV-sphere triangles: (T,3,3) vertex array."""
    cx, cy, cz = center
    tris = []
    ring = []
    for i in range(lat + 1):
        phi = math.pi * i / lat
        row = []
        for j in range(lon):
            theta = 2.0 * math.pi * j / lon
            row.append((
                cx + radius * math.sin(phi) * math.cos(theta),
                cy + radius * math.cos(phi),
                cz + radius * math.sin(phi) * math.sin(theta),
            ))
        ring.append(row)
    for i in range(lat):
        for j in range(lon):
            j2 = (j + 1) % lon
            a, bb = ring[i][j], ring[i][j2]
            c, d = ring[i + 1][j], ring[i + 1][j2]
            if i != 0:
                tris.append((a, bb, c))
            if i != lat - 1:
                tris.append((bb, d, c))
    return np.asarray(tris, np.float32)


def add_sphere(b: SceneBuilder, center, radius: float, mat: int,
               lat: int = 12, lon: int = 18,
               smooth: bool = False) -> None:
    """smooth=True attaches the exact analytic normal (corner - center)
    / radius at every corner — smooth shading over the tessellation
    (ops/shading.py); False keeps reference face-normal shading."""
    c = np.asarray(center, np.float32)
    for t in sphere_mesh(center, radius, lat, lon):
        vn = (t - c[None, :]) / np.float32(radius) if smooth else None
        b.add_triangle(t[0], t[1], t[2], mat, vn=vn)


def write_sphere_obj(path: str, *, radius: float = 1.0, lat: int = 16,
                     lon: int = 24, mtl: dict | None = None) -> None:
    """Generate a sphere OBJ (+MTL with the custom Kn/Kk/Tp keys) as a
    stand-in for the reference's missing ../models assets."""
    tris = sphere_mesh((0.0, 0.0, 0.0), radius, lat, lon)
    verts: list = []
    vmap: dict = {}
    faces = []
    for t in tris:
        idx = []
        for v in t:
            key = tuple(np.round(v, 6))
            if key not in vmap:
                vmap[key] = len(verts) + 1
                verts.append(key)
            idx.append(vmap[key])
        faces.append(idx)

    mtl = mtl or dict(name="gold", Kd=(0, 0, 0), Ks=(0, 0, 0),
                      Ke=(0, 0, 0), Ns=0.0,
                      Kn=(0.17, 0.35, 1.50), Kk=(3.1, 2.7, 1.9), Tp=1)
    mtl_path = os.path.splitext(path)[0] + ".mtl"
    with open(mtl_path, "w") as fh:
        fh.write(f"newmtl {mtl['name']}\n")
        for k in ("Kd", "Ks", "Ke", "Kn", "Kk"):
            fh.write(f"{k} {' '.join(str(x) for x in mtl[k])}\n")
        fh.write(f"Ns {mtl['Ns']}\nTp {mtl['Tp']}\n")
    with open(path, "w") as fh:
        fh.write(f"mtllib {os.path.basename(mtl_path)}\n")
        fh.write("o sphere\n")
        for v in verts:
            fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
        fh.write(f"usemtl {mtl['name']}\n")
        for f in faces:
            fh.write(f"f {f[0]} {f[1]} {f[2]}\n")


def reference_scene(models_dir: str | None = None,
                    smooth: bool = False,
                    analytic: bool = False) -> Scene:
    """The default scene of onInitialization (main.cpp:745-1017): huge
    ground plane + 10 archetypes + seven OBJ models (main.cpp:1002-1010).
    The model files are not in the reference repo; missing ones are
    replaced by procedural tessellated spheres at the same positions and
    scales so the scene always loads (the reference would exit(1),
    main.cpp:560).

    smooth=True builds vertex shading normals for every model (OBJ vn
    or computed, builder._shape_normals; analytic for the sphere
    stand-ins) — the capability the reference lacks (face normals
    only, prog.cl:11-16).

    analytic=True swaps the two SPHERE models — lsphere (the emissive
    ceiling lamp, scaled x200) and sphere (the gold ball, x100) — for
    exact analytic quadrics at the same centers/radii/materials; the
    five non-sphere models stay meshes. This assumes unit-sphere model
    files (true of the committed procedural stand-ins,
    scripts/gen_models.py; a custom models_dir with non-sphere
    lsphere/sphere geometry should keep analytic=False). The emissive
    quadric exercises NEE's solid-angle cone sampler on the
    reference's own scene content."""
    b = SceneBuilder()
    _add_archetypes(b)

    # Ground plane (main.cpp:814-816).
    b.add_triangle((-10000.0, 0.0, -10000.0), (-10000.0, 0.0, 10000.0),
                   (10000.0, 0.0, 10000.0), WHITE_DIFFUSE)
    b.add_triangle((10000.0, 0.0, 10000.0), (10000.0, 0.0, -10000.0),
                   (-10000.0, 0.0, -10000.0), WHITE_DIFFUSE)
    b.end_obj()

    # The add_Obj calls at main.cpp:1002-1010 (pos, scale).
    objs = [
        ("lsphere.obj", (0, 1000, -50), (200, 200, 200), 0, 0, LAMP, 1.0),
        ("chair.obj", (50, 0, -150), (190, 190, 190), 0, 0,
         PURPLE_SPECULAR, 0.9),
        ("egg.obj", (-350, 330, -400), (0.5, 0.5, 0.5), 0, 0,
         PURPLE_SPECULAR, 160.0),
        ("dragon.obj", (-670, 330, -410), (10, 10, 10), 0, 50,
         GLASS, 15.0),
        ("Wineglass.obj", (-300, 330, -270), (1, 1, 1), 0, 0,
         GLASS, 90.0),
        ("sphere.obj", (-490, 377, -400), (100, 100, 100), 0, 0,
         GOLD, 1.0),
        ("glass-table.obj", (-200, 0, -200), (500, 500, 500), 0, 0,
         GLASS, 0.6),
    ]
    # Native representation of the two unit-sphere models (see
    # docstring): sphere center = the add_Obj translate (model-space
    # origin; the X-flip and uniform scale leave it there), radius =
    # the uniform scale factor.
    analytic_spheres = {"lsphere.obj": LAMP, "sphere.obj": GOLD}
    for name, pos, scale, pitch, yaw, fallback_mat, fb_rad in objs:
        if analytic and name in analytic_spheres:
            b.add_analytic_sphere(pos, float(scale[0]),
                                  analytic_spheres[name])
            continue
        path = os.path.join(models_dir, name) if models_dir else None
        if path and os.path.exists(path):
            b.add_obj(path, pos, scale, pitch, yaw,
                      smooth_normals=smooth)
        else:
            r = fb_rad * float(np.mean(scale))
            add_sphere(b, center=pos, radius=max(r, 40.0),
                       mat=fallback_mat, lat=10, lon=16, smooth=smooth)
            b.end_obj()
    return b.build()


def stress_scene(num_tris: int = 100_000, seed: int = 0,
                 analytic: bool = False,
                 smooth: bool = False) -> Scene:
    """BASELINE.json config 4: a ~num_tris-triangle scene (Cornell shell +
    a grid of tessellated spheres with mixed materials) for LBVH/wavefront
    benchmarking.

    analytic=True builds the SAME scene (identical shell triangles,
    identical sphere centers/radii/materials — the grid is derived
    from the same num_tris budget and RNG stream) with analytic
    quadrics instead of the ~720-triangle tessellations: ~20 triangles
    + ~138 spheres at the default budget. This is the stress content
    in the framework's native representation; the tessellated form
    remains THE config-4 acceleration-path benchmark."""
    b = SceneBuilder()
    _add_archetypes(b)

    # Box shell (reuse cornell geometry, no spheres) + a back wall
    # behind the camera so the scene is fully enclosed: every ray
    # terminates on geometry, which keeps the cluster intersector's
    # nearest-first early exit effective for incoherent bounce rays.
    base = cornell_box(with_spheres=False)
    r1 = np.asarray(base.tris.r1)
    r2 = np.asarray(base.tris.r2)
    r3 = np.asarray(base.tris.r3)
    mi = np.asarray(base.tris.mati)
    for i in range(r1.shape[0]):
        b.add_triangle(r1[i], r2[i], r3[i], int(mi[i]))
    b.add_triangle((-100.0, 0.0, -2000.0), (1100.0, 1000.0, -2000.0),
                   (-100.0, 1000.0, -2000.0), WHITE_DIFFUSE)
    b.add_triangle((1100.0, 1000.0, -2000.0), (-100.0, 0.0, -2000.0),
                   (1100.0, 0.0, -2000.0), WHITE_DIFFUSE)
    # Seal the tube between the cornell shell (whose side walls end at
    # z=-1000) and the back wall at z=-2000: the round-1 geometry left
    # these side strips open, so ~4% of bounce rays escaped — despite
    # this docstring's claim of full enclosure. Miss rays are the worst
    # case for every nearest-first early-exit traversal (they must
    # exhaust all candidates), so the leak quietly taxed the accel
    # benchmarks too.
    _add_quad(b, (-100.0, 0.0, -2000.0), (-100.0, 0.0, -1000.0),
              (-100.0, 1000.0, -1000.0), (-100.0, 1000.0, -2000.0),
              RED_DIFFUSE)
    _add_quad(b, (1100.0, 0.0, -2000.0), (1100.0, 1000.0, -2000.0),
              (1100.0, 1000.0, -1000.0), (1100.0, 0.0, -1000.0),
              GREEN_DIFFUSE)
    _add_quad(b, (-100.0, 1000.0, -2000.0), (-100.0, 1000.0, -1000.0),
              (1100.0, 1000.0, -1000.0), (1100.0, 1000.0, -2000.0),
              WHITE_DIFFUSE)
    b.end_obj()

    lat, lon = 16, 24
    per_sphere = 2 * lat * lon - 2 * lon  # caps are single fans
    remaining = num_tris - r1.shape[0]
    count = max(1, remaining // per_sphere)
    grid = int(np.ceil(count ** (1 / 3)))
    rs = np.random.default_rng(seed)
    mats_cycle = [WHITE_DIFFUSE, RED_DIFFUSE, GREEN_DIFFUSE, CHROMIUM,
                  GOLD, GLASS, PURPLE_SPECULAR]
    n_added = 0
    for gx in range(grid):
        for gy in range(grid):
            for gz in range(grid):
                if n_added >= count:
                    break
                c = (
                    150.0 + 700.0 * gx / max(grid - 1, 1)
                    + rs.uniform(-30, 30),
                    120.0 + 700.0 * gy / max(grid - 1, 1)
                    + rs.uniform(-30, 30),
                    150.0 + 700.0 * gz / max(grid - 1, 1)
                    + rs.uniform(-30, 30),
                )
                radius = rs.uniform(40.0, 70.0)
                mat = mats_cycle[n_added % len(mats_cycle)]
                if analytic:
                    b.add_analytic_sphere(c, radius, mat)
                else:
                    add_sphere(b, center=c, radius=radius, mat=mat,
                               lat=lat, lon=lon, smooth=smooth)
                n_added += 1
    b.end_obj()
    return b.build()


def reference_camera(width: int, height: int):
    """The reference's live camera defaults (main.cpp:30-39)."""
    from opencl_path_tracer_tpu.core.camera import make_camera
    return make_camera(
        width, height, fov=75.0, yaw=-13.800002 - 50, pitch=5.599997 + 10,
        shift=(265.055481, 162.305969, 360.414001),
    )
