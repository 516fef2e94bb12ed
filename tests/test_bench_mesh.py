"""Smoke test for `bench.py --mesh DxS` (VERDICT r2 item 8): the sharded
step-2 bench must run end-to-end on the virtual 8-device CPU mesh and emit
well-formed JSON with per-chip throughput + scaling efficiency, so real
multi-chip numbers are a single invocation away when hardware appears."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_mesh_smoke():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["MDILSS_BENCH_PROBE_ATTEMPTS"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--mesh", "4x2",
         "--steps", "2", "--batch", "2", "--height", "64", "--width", "128"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["metric"] == "erfnet_rap_step2_train_images_per_sec_mesh"
    assert out["value"] > 0
    ex = out["extras"]
    assert ex["mesh"] == {"data": 4, "spatial": 2}
    assert ex["per_chip_images_per_sec"] > 0
    assert ex["single_device_images_per_sec"] > 0
    assert 0 < ex["scaling_efficiency"]


@pytest.mark.slow
def test_bench_mesh_too_many_devices():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["MDILSS_BENCH_PROBE_ATTEMPTS"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--mesh", "4x2",
         "--steps", "1", "--batch", "1", "--height", "32", "--width", "64"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 1
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert "need 8 devices" in out["extras"]["error"]
