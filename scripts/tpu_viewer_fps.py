"""TPU: measured viewer frame rate over the MJPEG push stream
(VERDICT r4 #9 done-criterion: >= 15 fps at 720p / 3-bounce).

Starts the real engine + ViewerServer, consumes /stream.mjpg for a
fixed window, and counts delivered JPEG frames (SOI markers) — the
rate a browser would actually paint, transport included.

Run standalone: python scripts/tpu_viewer_fps.py
"""

import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import jax

# Probe cache (round 5): keep the COMMITTED .jax_cache official-
# pathway-only; probe entries staged by a later `git add -A` were the
# round-4 pack-bloat mechanism.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_probe_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from opencl_path_tracer_tpu.config import CameraConfig, RenderConfig
from opencl_path_tracer_tpu.runtime.engine import RenderEngine
from opencl_path_tracer_tpu.runtime.viewer import ViewerServer
from opencl_path_tracer_tpu.scene import library


def main():
    print(f"# device {jax.devices()[0].device_kind}", file=sys.stderr)
    scene = library.cornell_box(with_spheres=True)
    cfg = RenderConfig(
        width=1280, height=720, iterations=3, mode="fast",
        model="megakernel", accel="auto",
        camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                            shift=(0.0, 0.0, 0.0)),
    )
    viewer = ViewerServer(RenderEngine(scene, cfg), port=8691)
    viewer.serve(block=False)
    base = "http://127.0.0.1:8691"

    # Wait out the first-frame compile.
    deadline = time.time() + 600
    while time.time() < deadline:
        if viewer._seq > 2:
            break
        time.sleep(1.0)
    assert viewer._seq > 2, f"no frames (err={viewer.last_error})"

    window = 10.0
    with urllib.request.urlopen(base + "/stream.mjpg",
                                timeout=60) as resp:
        t0 = time.time()
        blob = b""
        while time.time() - t0 < window:
            blob += resp.read(65536)
    frames = blob.count(b"\xff\xd8\xff")
    fps = frames / window
    mb = len(blob) / 1e6
    print(f"RESULT viewer: {frames} frames in {window:.0f}s = "
          f"{fps:.1f} fps over the stream ({mb:.1f} MB), engine "
          f"viewer_fps={viewer.viewer_fps:.1f} @720p/3-bounce",
          flush=True)
    viewer.shutdown()


if __name__ == "__main__":
    main()
