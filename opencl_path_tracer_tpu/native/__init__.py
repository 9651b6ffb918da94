"""ctypes bindings for the native host runtime (C++).

The reference's host-side native compute is tinyobjloader parsing and
the recursive kd-tree build (main.cpp:210-303, tiny_obj_loader.h); here
those are objloader.cpp and bvh_builder.cpp, compiled to
libptx_native.so and loaded lazily. Every native entry point has a pure
Python twin (io/obj.py, accel/median_tree.py) — `available()` gates use
and tests assert native == Python output.

The library is auto-built with `make` on first use if g++ is present
(build happens at most once per process; failures fall back silently).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libptx_native.so")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _HERE], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.ptx_load_obj.restype = ctypes.c_void_p
    lib.ptx_load_obj.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.ptx_mesh_error.restype = ctypes.c_char_p
    lib.ptx_mesh_error.argtypes = [ctypes.c_void_p]
    lib.ptx_mesh_counts.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int)
    ] * 5
    lib.ptx_mesh_vertices.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.ptx_shape_tri_count.restype = ctypes.c_int
    lib.ptx_shape_tri_count.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ptx_shape_name.restype = ctypes.c_char_p
    lib.ptx_shape_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ptx_shape_indices.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.ptx_material_name.restype = ctypes.c_char_p
    lib.ptx_material_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ptx_material.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.ptx_mesh_free.argtypes = [ctypes.c_void_p]

    lib.ptx_build_bvh.restype = ctypes.c_void_p
    lib.ptx_build_bvh.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.ptx_bvh_counts.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_int)
    ] * 3
    lib.ptx_bvh_data.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.ptx_bvh_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def load_obj_native(path: str, mtl_dir: str | None = None):
    """Native twin of io.obj.load_obj: returns (attrib, shapes,
    materials) with the same dataclasses."""
    from opencl_path_tracer_tpu.io.obj import Attrib, MtlMaterial, Shape

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    handle = lib.ptx_load_obj(
        path.encode(), (mtl_dir or "").encode() or None
    )
    try:
        err = lib.ptx_mesh_error(handle).decode()
        if err:
            raise FileNotFoundError(err)
        nv = ctypes.c_int()
        nn = ctypes.c_int()
        nt = ctypes.c_int()
        nshapes = ctypes.c_int()
        nmats = ctypes.c_int()
        lib.ptx_mesh_counts(
            handle, ctypes.byref(nv), ctypes.byref(nn),
            ctypes.byref(nt), ctypes.byref(nshapes), ctypes.byref(nmats),
        )
        verts = np.zeros((nv.value, 3), np.float32)
        if nv.value:
            lib.ptx_mesh_vertices(handle, verts.ctypes.data)
        attrib = Attrib(
            vertices=verts,
            normals=np.zeros((0, 3), np.float32),
            texcoords=np.zeros((0, 2), np.float32),
        )
        shapes = []
        for s in range(nshapes.value):
            t = lib.ptx_shape_tri_count(handle, s)
            vidx = np.zeros(3 * t, np.int32)
            mids = np.zeros(t, np.int32)
            if t:
                lib.ptx_shape_indices(
                    handle, s, vidx.ctypes.data, mids.ctypes.data
                )
            shapes.append(Shape(
                name=lib.ptx_shape_name(handle, s).decode(),
                vertex_indices=vidx,
                normal_indices=np.full(3 * t, -1, np.int32),
                texcoord_indices=np.full(3 * t, -1, np.int32),
                num_face_vertices=np.full(t, 3, np.int32),
                material_ids=mids,
            ))
        materials = []
        for i in range(nmats.value):
            fbuf = np.zeros(16, np.float32)
            ibuf = np.zeros(4, np.int32)
            lib.ptx_material(handle, i, fbuf.ctypes.data,
                             ibuf.ctypes.data)
            m = MtlMaterial(
                name=lib.ptx_material_name(handle, i).decode(),
                diffuse=tuple(float(x) for x in fbuf[0:3]),
                specular=tuple(float(x) for x in fbuf[3:6]),
                emission=tuple(float(x) for x in fbuf[6:9]),
                shininess=float(fbuf[15]),
            )
            if ibuf[1]:
                m.unknown_parameter["Kn"] = " ".join(
                    repr(float(x)) for x in fbuf[9:12]
                )
            if ibuf[2]:
                m.unknown_parameter["Kk"] = " ".join(
                    repr(float(x)) for x in fbuf[12:15]
                )
            if ibuf[3]:
                m.unknown_parameter["Tp"] = str(int(ibuf[0]))
            materials.append(m)
        return attrib, shapes, materials
    finally:
        lib.ptx_mesh_free(handle)


def build_median_tree_native(tris, *, leaf_size: int = 4):
    """Native twin of accel.median_tree.build_median_tree (median split
    policy)."""
    from opencl_path_tracer_tpu.accel.types import finalize_bvh

    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")

    r1 = np.asarray(tris.r1, np.float32)
    r2 = np.asarray(tris.r2, np.float32)
    r3 = np.asarray(tris.r3, np.float32)
    lo = np.ascontiguousarray(np.minimum(np.minimum(r1, r2), r3))
    hi = np.ascontiguousarray(np.maximum(np.maximum(r1, r2), r3))
    mid = np.ascontiguousarray(
        ((r1.astype(np.float64) + r2 + r3) / 3.0).astype(np.float32)
    )
    t = r1.shape[0]
    handle = lib.ptx_build_bvh(
        lo.ctypes.data, hi.ctypes.data, mid.ctypes.data, t, leaf_size
    )
    try:
        nn = ctypes.c_int()
        pt = ctypes.c_int()
        dep = ctypes.c_int()
        lib.ptx_bvh_counts(handle, ctypes.byref(nn), ctypes.byref(pt),
                           ctypes.byref(dep))
        nodes = np.zeros((nn.value, 8), np.float32)
        order = np.zeros(pt.value, np.int32)
        pad = np.zeros(pt.value, np.uint8)
        lib.ptx_bvh_data(handle, nodes.ctypes.data, order.ctypes.data,
                         pad.ctypes.data)
        return finalize_bvh(
            nodes, order.astype(np.int64), pad.astype(bool), tris,
            depth=dep.value, leaf_size=leaf_size,
        )
    finally:
        lib.ptx_bvh_free(handle)
