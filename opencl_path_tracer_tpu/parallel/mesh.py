"""Device discovery and mesh construction.

The reference enumerates OpenCL platforms/devices and dumps their
attributes at startup (list_info, main.cpp:389-455), then picks
platform[0]/device[0] (main.cpp:466,476). The TPU-native equivalents:
`describe_devices()` dumps the JAX device table, and `make_render_mesh()`
builds a 1-D jax.sharding.Mesh over all (or the first n) devices — the
render framebuffer or sample batch shards along its single 'd' axis and
collectives ride ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

RENDER_AXIS = "d"


def describe_devices(verbose: bool = True) -> list[dict]:
    """JAX analogue of the reference's list_info (main.cpp:389-455)."""
    rows = []
    for dev in jax.devices():
        row = {
            "id": dev.id,
            "platform": dev.platform,
            "kind": getattr(dev, "device_kind", "?"),
            "process": getattr(dev, "process_index", 0),
        }
        mem = getattr(dev, "memory_stats", None)
        if callable(mem):
            try:
                stats = mem() or {}
                row["bytes_limit"] = stats.get("bytes_limit")
            except Exception:
                pass
        rows.append(row)
        if verbose:
            print(
                f"{row['id']+1}. Device: {row['kind']}"
                f" (platform={row['platform']},"
                f" process={row['process']})"
            )
    return rows


def make_render_mesh(num_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(devs, axis_names=(RENDER_AXIS,))
