"""Flat BVH format shared by every builder and traverser.

The reference flattens its per-object midpoint trees into a heap-indexed
Node array (children of ptr at 2*ptr, 2*ptr+1; root at 1; leaves hold
[from, to) ranges into a reordered triangle array — NodeOnHost::convert,
main.cpp:263-303). That layout wastes memory exponentially on unbalanced
trees and forces an awkward per-object shift table (prog.cl:151-166).

TPU-first layout instead:
  * ONE tree over the whole scene (objects concatenated; same closest-hit
    results — intersection is order-independent).
  * Pointer-based flat nodes packed as a single (N, 8) float32 matrix so
    one row-gather fetches a whole node:
        [lo.x lo.y lo.z hi.x hi.y hi.z a b]
    a < 0: internal node, left child = -a (right child = left + 1).
    a >= 0: leaf, triangles [a, a + leaf_size) in the reordered array.
    (b is the leaf's true count; padding entries within the leaf are
    degenerate triangles that never hit.)
  * Triangles reordered + leaf-padded, packed as (T, 16) float32
    [n(3) c0 m1(3) d1 m2(3) d2 m3(3) d3] — the plane+edge-test constants
    of ops/intersect.py — so a leaf test is one contiguous gather and a
    handful of FMAs on the VPU, with zero pointer chasing.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from opencl_path_tracer_tpu.core.geometry import TrianglesSoA


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(
        cls, data_fields=fields, meta_fields=[]
    )
    return cls


@_register
@dataclasses.dataclass(frozen=True)
class BVH:
    nodes: jnp.ndarray     # (N, 8) float32, see module docstring
    tri_pack: jnp.ndarray  # (Tp, 16) float32 intersection constants
    tri_n: jnp.ndarray     # (Tp, 3) float32 unit normals (hit records)
    tri_mati: jnp.ndarray  # (Tp,) int32 material ids
    depth: int             # max tree depth (static; sizes the stack)
    leaf_size: int         # static leaf padding

    @property
    def num_nodes(self) -> int:
        return self.nodes.shape[0]


def pack_triangles(tris: TrianglesSoA) -> np.ndarray:
    """(T, 16) float32 intersection-constant rows."""
    return np.concatenate(
        [
            np.asarray(tris.n), np.asarray(tris.c0)[:, None],
            np.asarray(tris.m1), np.asarray(tris.d1)[:, None],
            np.asarray(tris.m2), np.asarray(tris.d2)[:, None],
            np.asarray(tris.m3), np.asarray(tris.d3)[:, None],
        ],
        axis=1,
    ).astype(np.float32)


DEGENERATE_ROW = np.zeros(16, np.float32)  # n=0 -> t=nan -> never hits


def finalize_bvh(nodes: np.ndarray, order: np.ndarray,
                 pad_mask: np.ndarray, tris: TrianglesSoA,
                 depth: int, leaf_size: int) -> BVH:
    """Assemble a BVH from builder output.

    order: (Tp,) indices into the original triangle array (padding slots
    arbitrary); pad_mask: (Tp,) True where the slot is padding.
    """
    pack = pack_triangles(tris)[order]
    pack[pad_mask] = DEGENERATE_ROW
    tri_n = np.asarray(tris.n)[order]
    tri_mati = np.asarray(tris.mati)[order].astype(np.int32)
    tri_mati[pad_mask] = 0
    return BVH(
        nodes=jnp.asarray(nodes, jnp.float32),
        tri_pack=jnp.asarray(pack),
        tri_n=jnp.asarray(tri_n),
        tri_mati=jnp.asarray(tri_mati),
        depth=int(depth),
        leaf_size=int(leaf_size),
    )
