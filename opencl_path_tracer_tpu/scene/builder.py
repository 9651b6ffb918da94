"""Scene assembly: the host-side builder API.

Mirrors the reference `class Scene` surface (main.cpp:363-742):
add_material (:532), add_triangle (:529), add_obj (:552), end_obj (:536),
upload_* (:618-634) — collapsed here into `build()`, which produces
device-resident SoA arrays via a single device_put instead of per-buffer
enqueueWriteBuffer calls.

OBJ import semantics preserved exactly (main.cpp:552-617):
  * X axis flipped on load (vx = -attrib.vertices[...], :598),
  * per-vertex rotate_x(pitch) then rotate_y(yaw), then scale, then
    translate (:602-606),
  * MTL -> Material with custom keys Kn (per-channel IOR), Kk
    (extinction), Tp (type int) via unknown_parameter (:568-571),
  * per-face material ids offset by the running material count (:562,613),
  * end_obj() per OBJ *shape* (:615) — recorded here as object ranges so
    acceleration structures can be built per object like the reference's
    per-shape kd trees (:536-551).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA, REF_PI
from opencl_path_tracer_tpu.core.materials import (
    MaterialsSoA, make_material, stack_materials,
)
from opencl_path_tracer_tpu.io.obj import load_obj


def _np_rot_x(v: np.ndarray, deg: float) -> np.ndarray:
    a = np.float32(deg) / np.float32(180.0) * REF_PI
    c, s = np.float32(np.cos(a)), np.float32(np.sin(a))
    out = v.copy()
    out[:, 1] = v[:, 1] * c - v[:, 2] * s
    out[:, 2] = v[:, 1] * s + v[:, 2] * c
    return out


def _np_rot_y(v: np.ndarray, deg: float) -> np.ndarray:
    a = np.float32(deg) / np.float32(180.0) * REF_PI
    c, s = np.float32(np.cos(a)), np.float32(np.sin(a))
    out = v.copy()
    out[:, 0] = v[:, 0] * c + v[:, 2] * s
    out[:, 2] = -v[:, 0] * s + v[:, 2] * c
    return out


@dataclasses.dataclass
class Scene:
    """Device-ready scene: all triangles and materials as SoA arrays,
    plus host metadata about per-object ranges (the kd_tree_shift
    equivalent, main.cpp:536-551)."""

    tris: TrianglesSoA
    mats: MaterialsSoA
    # (num_objects, 2) [from, to) triangle ranges, one per end_obj();
    # consumed by accel.build_median_tree(object_ranges=...) to build
    # one subtree per object (accel='median'), like the reference's
    # per-shape kd trees + kd_tree_shift (main.cpp:536-551).
    object_ranges: np.ndarray
    # Analytic spheres (no reference counterpart — the reference
    # tessellates, main.cpp:1002,1009; BASELINE.json north-star item).
    # None when the scene is triangle-only; intersected by
    # ops.intersect.sphere_intersect and min-merged with the triangle
    # stream by runtime.engine.make_intersect_fn.
    spheres: "object | None" = None
    # Per-corner shading normals + barycentric gradients
    # (ops.shading.VertexAttribs) — present when any triangle carried
    # vertex normals (OBJ `vn`, add_obj(smooth_normals=True), or
    # add_triangle(vn=...)). The reference parses vn via tinyobj but
    # never consumes it (main.cpp:595-611); here it powers smooth
    # shading (engine make_intersect_fn(smooth=True)).
    attribs: "object | None" = None
    # Image textures (core.textures.TexturesSoA) — present when any
    # material has a bound texture (MTL map_Kd auto-loaded by
    # add_obj, or add_texture + set_material_texture). The reference's
    # tinyobj parses map_Kd into diffuse_texname
    # (tiny_obj_loader.h:124-182) but never samples it; here it
    # modulates kd when rendered with textured=True
    # (runtime.engine.make_intersect_fn).
    textures: "object | None" = None

    @property
    def num_triangles(self) -> int:
        return int(self.tris.count)

    @property
    def num_objects(self) -> int:
        return len(self.object_ranges)


class SceneBuilder:
    def __init__(self) -> None:
        self._r1: list[np.ndarray] = []
        self._r2: list[np.ndarray] = []
        self._r3: list[np.ndarray] = []
        self._mati: list[int] = []
        self._materials: list[dict] = []
        self._object_ranges: list[tuple[int, int]] = []
        self._vn: list = []
        self._uv: list = []
        self._tri_shift = 0
        self._sph_c: list[np.ndarray] = []
        self._sph_r: list[float] = []
        self._sph_m: list[int] = []
        self._textures: list[np.ndarray] = []
        self._mat_texi: dict[int, int] = {}

    # --- reference API ---------------------------------------------------
    def add_material(self, kd, ks, emission, N, K, shininess, type) -> int:
        """Returns the new material index (main.cpp:532-535)."""
        self._materials.append(
            make_material(kd, ks, emission, N, K, shininess, type)
        )
        return len(self._materials) - 1

    def add_material_row(self, row: dict) -> int:
        self._materials.append(row)
        return len(self._materials) - 1

    def add_triangle(self, r1, r2, r3, mati: int, vn=None,
                     uv=None) -> None:
        """vn: optional (3, 3) per-corner shading normals (row k is the
        unit normal at corner r{k+1}); None = face-normal shading for
        this triangle (the reference's only mode, prog.cl:11-16).
        uv: optional (3, 2) per-corner texture coordinates
        (ops.shading.interpolate_uvs consumes them; the reference
        never reads its parsed vt data)."""
        self._r1.append(np.asarray(r1, np.float32))
        self._r2.append(np.asarray(r2, np.float32))
        self._r3.append(np.asarray(r3, np.float32))
        self._mati.append(int(mati))
        self._vn.append(
            None if vn is None
            else np.asarray(vn, np.float32).reshape(3, 3)
        )
        self._uv.append(
            None if uv is None
            else np.asarray(uv, np.float32).reshape(3, 2)
        )

    def add_texture(self, img: np.ndarray) -> int:
        """Register a texture image (top-down (H, W, 3), uint8 or
        float in [0, 1]); returns its texture index. Bind it to a
        material with set_material_texture."""
        self._textures.append(np.asarray(img))
        return len(self._textures) - 1

    def set_material_texture(self, mati: int, texi: int) -> None:
        """Bind texture `texi` to material `mati`: its kd is
        multiplied by the bilinear texture sample at the hit's UV when
        the scene renders with textured=True."""
        if not 0 <= mati < len(self._materials):
            raise ValueError(f"no material {mati}")
        if not 0 <= texi < len(self._textures):
            raise ValueError(f"no texture {texi}")
        self._mat_texi[mati] = texi

    def add_analytic_sphere(self, center, radius: float,
                            mati: int) -> None:
        """Add an analytic sphere primitive (exact quadric, not a
        tessellation — for the reference-parity tessellated spheres
        use scene.library.add_sphere). Shares the material table with
        triangles."""
        self._sph_c.append(np.asarray(center, np.float32))
        self._sph_r.append(float(radius))
        self._sph_m.append(int(mati))

    def end_obj(self) -> None:
        """Close the current object (main.cpp:536-551). Records the
        [from, to) triangle range; BVH construction happens at build()."""
        n = len(self._r1)
        if n > self._tri_shift:
            self._object_ranges.append((self._tri_shift, n))
            self._tri_shift = n

    def add_obj(self, path: str, pos, scale, pitch: float = 0.0,
                yaw: float = 0.0,
                smooth_normals: bool = False) -> None:
        """Load an OBJ with the reference transforms (main.cpp:552-617).

        smooth_normals=True attaches per-corner shading normals: the
        file's `vn` data when present (transformed by the
        inverse-transpose of the vertex transform: x-flip and the
        rotations apply as-is, nonuniform scale divides), otherwise
        area-weighted normals computed over each shape's index-welded
        mesh (ops.shading.compute_vertex_normals). False keeps the
        reference's face-normal shading exactly.
        """
        attrib, shapes, materials = load_obj(path)
        mat_offset = len(self._materials)

        for m in materials:
            # Custom MTL keys (main.cpp:568-571). Missing keys raise, like
            # the reference's unchecked map::at.
            kn = tuple(
                float(x) for x in m.unknown_parameter["Kn"].split()[:3]
            )
            kk = tuple(
                float(x) for x in m.unknown_parameter["Kk"].split()[:3]
            )
            tp = int(m.unknown_parameter["Tp"].split()[0])
            mati = self.add_material(
                kd=m.diffuse, ks=m.specular, emission=m.emission,
                N=kn, K=kk, shininess=m.shininess, type=tp,
            )
            # map_Kd auto-load (tinyobj parses diffuse_texname,
            # tiny_obj_loader.h:124-182; the reference never samples
            # it). Paths resolve relative to the OBJ's directory.
            if m.diffuse_texname:
                self._load_material_texture(mati, m.diffuse_texname,
                                            path)

        pos = np.asarray(pos, np.float32)
        scale = np.asarray(scale, np.float32)
        for shape in shapes:
            v = attrib.vertices[shape.vertex_indices]  # (F*3, 3)
            v = v.copy()
            v[:, 0] = -v[:, 0]  # X flip (main.cpp:598)
            v = _np_rot_x(v, pitch)
            v = _np_rot_y(v, yaw)
            v = v * scale[None, :] + pos[None, :]
            vn = self._shape_normals(
                attrib, shape, pitch, yaw, scale, v
            ) if smooth_normals else None
            # Per-corner texture coordinates ride along whenever the
            # file has them (vt + f v/vt/... indices) — UVs are
            # transform-invariant so no pipeline needed.
            uv = None
            ti = shape.texcoord_indices
            if attrib.texcoords.shape[0] and (ti >= 0).all():
                uv = attrib.texcoords[ti].reshape(-1, 3, 2)
            v = v.reshape(-1, 3, 3)
            mids = mat_offset + shape.material_ids
            for f in range(v.shape[0]):
                self.add_triangle(
                    v[f, 0], v[f, 1], v[f, 2], int(mids[f]),
                    vn=None if vn is None else vn[f],
                    uv=None if uv is None else uv[f],
                )
            self.end_obj()  # per shape, like main.cpp:615

    def _load_material_texture(self, mati: int, texname: str,
                               obj_path: str) -> None:
        """Load an MTL map_Kd image and bind it; PNG only (the
        framework's dependency-free reader, io.image.read_png).
        Missing or non-PNG files warn and leave the material
        untextured rather than failing the whole scene load."""
        import os
        import sys as _sys

        p = texname
        if not os.path.isabs(p):
            p = os.path.join(os.path.dirname(os.path.abspath(obj_path)),
                             p)
        if not os.path.exists(p) or not p.lower().endswith(".png"):
            print(f"# WARNING: map_Kd {texname!r}: "
                  + ("not found" if not os.path.exists(p)
                     else "only PNG is supported")
                  + " — material renders untextured", file=_sys.stderr)
            return
        from opencl_path_tracer_tpu.io.image import read_png
        self.set_material_texture(mati, self.add_texture(read_png(p)))

    @staticmethod
    def _shape_normals(attrib, shape, pitch, yaw, scale,
                       v_transformed) -> np.ndarray:
        """(F, 3, 3) per-corner shading normals for one OBJ shape.

        File `vn` (when every corner has one) transforms by the
        inverse-transpose of v' = S R F v: F and R are orthogonal so
        they apply directly, diag scale divides; renormalized after.
        Otherwise normals are computed area-weighted on the shape's
        ALREADY-TRANSFORMED vertices (so nonuniform scale is handled
        for free), welded by the OBJ vertex index.
        """
        ni = shape.normal_indices
        if attrib.normals.shape[0] and (ni >= 0).all():
            n = attrib.normals[ni].copy()           # (F*3, 3)
            n[:, 0] = -n[:, 0]                      # X flip
            n = _np_rot_x(n, pitch)
            n = _np_rot_y(n, yaw)
            n = n / np.where(scale != 0.0, scale, 1.0)[None, :]
        else:
            from opencl_path_tracer_tpu.ops.shading import (
                compute_vertex_normals,
            )
            vi = shape.vertex_indices
            # Weld by original vertex index; rows of `verts` that the
            # shape never touches stay 0 and are never gathered.
            verts = np.zeros((int(vi.max()) + 1, 3), np.float32)
            verts[vi] = v_transformed
            n = compute_vertex_normals(verts, vi.reshape(-1, 3))[vi]
        norm = np.linalg.norm(n, axis=1, keepdims=True)
        n = np.where(norm > 0.0, n / np.where(norm > 0.0, norm, 1.0), 0.0)
        return n.reshape(-1, 3, 3).astype(np.float32)

    # --- build ------------------------------------------------------------
    def build(self) -> Scene:
        """Upload everything (upload_Triangles/upload_Materials,
        main.cpp:618-634)."""
        self.end_obj()  # close any dangling object
        if not self._r1:
            raise ValueError("scene has no triangles")
        tris = TrianglesSoA.build(
            np.stack(self._r1), np.stack(self._r2), np.stack(self._r3),
            np.asarray(self._mati, np.int32),
        )
        mats = stack_materials(self._materials)
        spheres = None
        if self._sph_c:
            from opencl_path_tracer_tpu.core.spheres import SpheresSoA
            spheres = SpheresSoA.build(
                np.stack(self._sph_c), np.asarray(self._sph_r),
                np.asarray(self._sph_m),
            )
        attribs = None
        if any(vn is not None for vn in self._vn) or any(
                uv is not None for uv in self._uv):
            from opencl_path_tracer_tpu.ops.shading import (
                build_vertex_attribs,
            )
            zero3 = np.zeros((3, 3), np.float32)
            vn = np.stack([z if z is not None else zero3
                           for z in self._vn])      # (T, 3, 3)
            zero2 = np.zeros((3, 2), np.float32)
            uv = np.stack([z if z is not None else zero2
                           for z in self._uv])      # (T, 3, 2)
            attribs = build_vertex_attribs(
                np.stack(self._r1), np.stack(self._r2),
                np.stack(self._r3),
                vn[:, 0], vn[:, 1], vn[:, 2],
                uv1=uv[:, 0], uv2=uv[:, 1], uv3=uv[:, 2],
            )
        textures = None
        if self._textures:
            from opencl_path_tracer_tpu.core.textures import TexturesSoA
            mt = np.full(len(self._materials), -1, np.int32)
            for mi, ti in self._mat_texi.items():
                mt[mi] = ti
            textures = TexturesSoA.build(self._textures, mt)
        return Scene(
            tris=tris, mats=mats,
            object_ranges=np.asarray(self._object_ranges, np.int64),
            spheres=spheres, attribs=attribs, textures=textures,
        )
