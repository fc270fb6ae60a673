"""CLI smoke tests in a production-like interpreter.

The test harness enables jax_enable_x64 (conftest), which hides ops that
only work in x64 mode (a voxel_downsample int64 bug escaped exactly this
way). These tests run the CLI in a subprocess with the default (x64-OFF)
config on small inputs."""

import subprocess
import sys

import numpy as np
import pytest

from kss_icp_tpu.io.formats import load_points, save_xyz
from helpers import random_cloud


def _run(args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "kss_icp_tpu", *args, "--platform", "cpu"],
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def cloud_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    path = tmp_path_factory.mktemp("cli") / "cloud.xyz"
    save_xyz(path, random_cloud(rng, 1200))
    return path


@pytest.mark.parametrize("method", ["fps", "grid", "hierarchy", "octree", "aivs"])
def test_simplify_methods_no_x64(cloud_file, tmp_path, method):
    out = tmp_path / f"{method}.xyz"
    r = _run(["simplify", str(cloud_file), str(out), "-m", method, "-n", "200"])
    assert r.returncode == 0, r.stderr[-2000:]
    pts = load_points(out)
    assert 1 <= pts.shape[0] <= 1200


def test_measure_no_x64(cloud_file, tmp_path):
    r = _run(["measure", str(cloud_file), str(cloud_file)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "RMSE: 0" in r.stdout  # identical clouds -> zero error


def test_serve_jsonl_no_x64(cloud_file, tmp_path):
    import json

    out = tmp_path / "served.xyz"
    req = json.dumps({"source": str(cloud_file), "target": str(cloud_file),
                      "output": str(out)})
    bad = json.dumps({"source": "/nonexistent.xyz", "target": str(cloud_file)})
    r = subprocess.run(
        [sys.executable, "-m", "kss_icp_tpu", "serve", "--platform", "cpu",
         "--full-pad", "2048", "--accurate", "2", "--iterations", "20",
         "--max-candidates", "2"],
        input=req + "\n" + bad + "\n",
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(ln) for ln in r.stdout.splitlines() if ln.strip()]
    assert lines[0]["event"] == "ready"
    ok = lines[1]
    assert ok["ok"] and ok["rmse"] < 1e-3  # identical clouds
    assert out.exists()
    assert lines[2]["ok"] is False  # bad request reported, server kept going


def test_register_pre_downsample_no_x64(cloud_file, tmp_path):
    # Room/block large-scan protocol: octree pre-downsample before
    # registration (Method_Octree.hpp:16).
    out = tmp_path / "pre.xyz"
    r = _run(["register", str(cloud_file), str(cloud_file), "-o", str(out),
              "--pre-downsample", "600", "--accurate", "2",
              "--iterations", "20", "--max-candidates", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "pre-downsampled" in r.stdout
    assert out.exists()
