"""Odds and ends: tile ordering, parity report script, cluster engine."""

import json
import subprocess
import sys

import numpy as np
import pytest

from opencl_path_tracer_tpu.ops import raygen


def test_tile_major_ids_partition():
    ids = np.asarray(raygen.tile_major_ids(64, 32, 16, 16))
    assert sorted(ids.tolist()) == list(range(64 * 32))
    # First tile covers the 16x16 top-left block, row-major inside.
    first = ids[:256].reshape(16, 16)
    assert first[0, 0] == 0 and first[0, 15] == 15
    assert first[1, 0] == 64  # next row of the same screen tile


def test_inverse_permutation():
    perm = raygen.tile_major_ids(32, 32, 16, 16)
    inv = raygen.inverse_permutation(perm)
    np.testing.assert_array_equal(
        np.asarray(perm)[np.asarray(inv)], np.arange(32 * 32)
    )


@pytest.mark.slow
def test_parity_report_script(tmp_path):
    import os
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)  # don't claim a TPU grant
    out = subprocess.run(
        [sys.executable, "scripts/parity_report.py",
         "--scene", "cornell", "--size", "16x16", "--iters", "2",
         "--spp", "2", "--outdir", str(tmp_path)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert out.returncode == 0, out.stderr[-500:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert "rng_fingerprint" in rec and rec["mean"] > 0
    assert (tmp_path / "parity_cornell_16x16_i2_s2.npz").exists()
    assert (tmp_path / "parity_cornell_16x16_i2_s2.png").exists()


@pytest.mark.slow
def test_engine_cluster_backend_cpu():
    from opencl_path_tracer_tpu.config import CameraConfig, RenderConfig
    from opencl_path_tracer_tpu.runtime.engine import RenderEngine
    from opencl_path_tracer_tpu.scene import library

    scene = library.cornell_box(with_spheres=False)
    cfg = RenderConfig(
        width=16, height=16, iterations=2, mode="fast", accel="cluster",
        camera=CameraConfig(fov=60.0, yaw=0.0, pitch=0.0,
                            shift=(0.0, 0.0, 0.0)),
    )
    eng = RenderEngine(scene, cfg)
    eng.render(1, progress=False)
    img = eng.image()
    assert np.all(np.isfinite(img))
