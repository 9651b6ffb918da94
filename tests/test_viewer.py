"""Live viewer HTTP surface: frame/stats/input endpoints."""

import json
import time
import urllib.request

from opencl_path_tracer_tpu.config import CameraConfig, RenderConfig
from opencl_path_tracer_tpu.runtime.engine import RenderEngine
from opencl_path_tracer_tpu.runtime.viewer import ViewerServer
from opencl_path_tracer_tpu.scene import library
import pytest


@pytest.mark.slow
def test_viewer_endpoints():
    scene = library.cornell_box(with_spheres=False)
    cfg = RenderConfig(
        width=16, height=16, iterations=2, mode="fast",
        accel="bruteforce",
        camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                            shift=(0.0, 0.0, 0.0)),
    )
    viewer = ViewerServer(RenderEngine(scene, cfg), port=8699)
    httpd = viewer.serve(block=False)
    try:
        base = "http://127.0.0.1:8699"
        # Wait for the first frame.
        deadline = time.time() + 60
        png = b""
        while time.time() < deadline:
            png = urllib.request.urlopen(base + "/frame.png").read()
            if png.startswith(b"\x89PNG"):
                break
            time.sleep(0.3)
        assert png.startswith(b"\x89PNG")

        page = urllib.request.urlopen(base + "/").read()
        assert b"ptx viewer" in page

        stats = json.loads(
            urllib.request.urlopen(base + "/stats").read()
        )
        assert stats["iterations"] == 2

        # Key press flows into the controller ('+' bumps bounce depth).
        req = urllib.request.Request(
            base + "/input",
            data=json.dumps({"ev": "keydown", "key": "+"}).encode(),
            method="POST",
        )
        assert urllib.request.urlopen(req).read() == b"ok"
        deadline = time.time() + 30
        while time.time() < deadline:
            stats = json.loads(
                urllib.request.urlopen(base + "/stats").read()
            )
            if stats["iterations"] == 3:
                break
            time.sleep(0.2)
        assert stats["iterations"] == 3

        # 'n' toggles the viewer's denoised display (viewer-level key,
        # not a controller binding) and frames keep coming.
        assert stats["denoise"] is False
        req = urllib.request.Request(
            base + "/input",
            data=json.dumps({"ev": "keydown", "key": "n"}).encode(),
            method="POST",
        )
        assert urllib.request.urlopen(req).read() == b"ok"
        deadline = time.time() + 60
        ok = False
        while time.time() < deadline:
            stats = json.loads(
                urllib.request.urlopen(base + "/stats").read()
            )
            if stats["denoise"] and stats["error"] is None:
                png2 = urllib.request.urlopen(
                    base + "/frame.png").read()
                if png2.startswith(b"\x89PNG"):
                    ok = True
                    break
            time.sleep(0.3)
        assert ok and stats["error"] is None

        # Push stream: at least two JPEG parts arrive without a
        # request per frame (VERDICT r3 #9: push, don't poll).
        with urllib.request.urlopen(
            base + "/stream.mjpg", timeout=30
        ) as resp:
            assert "multipart/x-mixed-replace" in resp.headers[
                "Content-Type"]
            blob = b""
            deadline = time.time() + 30
            while (blob.count(b"\xff\xd8") < 2
                   and time.time() < deadline):
                blob += resp.read(4096)
        assert blob.count(b"\xff\xd8") >= 2  # >= 2 JPEG SOI markers
    finally:
        viewer._stop.set()
        httpd.shutdown()


@pytest.mark.slow
def test_viewer_surfaces_render_error_and_esc_quits():
    """A render-thread exception lands in /stats['error'] instead of
    killing the thread silently; ESC shuts the server down."""
    scene = library.cornell_box(with_spheres=False)
    cfg = RenderConfig(
        width=16, height=16, iterations=2, mode="fast",
        accel="bruteforce",
        camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                            shift=(0.0, 0.0, 0.0)),
    )
    viewer = ViewerServer(RenderEngine(scene, cfg), port=8698)

    def boom(dt=0.0, sync=True):
        raise RuntimeError("synthetic kernel failure")

    viewer.engine.frame = boom
    httpd = viewer.serve(block=False)
    try:
        base = "http://127.0.0.1:8698"
        deadline = time.time() + 30
        err = None
        while time.time() < deadline:
            stats = json.loads(
                urllib.request.urlopen(base + "/stats").read()
            )
            err = stats.get("error")
            if err:
                break
            time.sleep(0.1)
        assert err and "synthetic kernel failure" in err
    finally:
        viewer._stop.set()
        httpd.shutdown()

    # ESC: the controller flag makes the render loop stop the server.
    viewer2 = ViewerServer(RenderEngine(scene, cfg), port=8697)
    httpd2 = viewer2.serve(block=False)
    try:
        viewer2.engine.controller.key_down("escape")
        deadline = time.time() + 30
        while time.time() < deadline and not viewer2._stop.is_set():
            time.sleep(0.1)
        assert viewer2._stop.is_set()
    finally:
        viewer2._stop.set()
        httpd2.shutdown()


@pytest.mark.slow
@pytest.mark.parametrize("model", ["megakernel", "wavefront"])
def test_display_u8_matches_image_path(model):
    """display_u8 (device tonemap + one uint8 fetch, the viewer's
    hot path) must equal to_uint8(image()) bit-for-bit for both
    models — same tonemap, same NaN clamp, same rounding."""
    import numpy as np

    from opencl_path_tracer_tpu.io.image import to_uint8
    from opencl_path_tracer_tpu.scene import library

    scene = library.cornell_box(with_spheres=True)
    cfg = RenderConfig(
        width=24, height=16, iterations=2, mode="fast", model=model,
        accel="bruteforce",
        camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                            shift=(0.0, 0.0, 0.0)),
    )
    eng = RenderEngine(scene, cfg)
    eng.render(spp=3, progress=False)
    np.testing.assert_array_equal(
        eng.display_u8(), to_uint8(eng.image())
    )
