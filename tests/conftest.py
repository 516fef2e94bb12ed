"""Test env: force CPU backend with 8 virtual devices (SURVEY.md §4).

Must run before jax is imported anywhere, hence module-level env mutation in
conftest. The multi-chip sharding tests exercise the same mesh/pjit code paths
that run on a real TPU slice.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# A site-installed PJRT plugin (if any) may have force-registered a TPU
# backend before this file runs; the config update below wins regardless.
jax.config.update("jax_platforms", "cpu")

# The suite is COMPILE-bound on small hosts (tiny tensors, big programs); a
# persistent XLA cache makes reruns compile-free. Keyed by HLO hash, so
# stale entries are impossible; delete the dir to force cold compiles.
os.makedirs("/tmp/mdilss_xla_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/mdilss_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import time
import warnings

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_cache_growth():
    """Clear jax's in-process executable/trace caches after every test module.

    Two independent full-suite runs (259 tests, one process) segfaulted in
    arbitrary eager-dispatch calls after ~2.3 h — reproducibly at the same
    test given the same preceding sequence, every crashed test green
    standalone, 128 GB RAM free. The common factor is thousands of live
    compiled executables accumulated in one XLA CPU client. Bounding that
    growth per module costs little (the persistent disk cache makes
    recompiles cheap) and removes the only unbounded in-process state."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "budget_s(seconds): wall-clock budget for the test (measured on the "
        "1-CPU reference host, warm XLA cache, ~2x headroom). Over budget "
        "warns by default — a trainer-speed regression then shows up as a "
        "test-time anomaly (round-4 verdict #7) — and fails under "
        "MDILSS_ENFORCE_BUDGETS=1.",
    )


@pytest.fixture(autouse=True)
def _budget_guard(request):
    m = request.node.get_closest_marker("budget_s")
    if not m:
        yield
        return
    t0 = time.time()
    yield
    dt = time.time() - t0
    budget = float(m.args[0])
    if dt > budget:
        msg = (f"{request.node.nodeid}: took {dt:.0f}s, over its {budget:.0f}s "
               f"budget — trainer/step speed regression, or a loaded host")
        if os.environ.get("MDILSS_ENFORCE_BUDGETS"):
            pytest.fail(msg)
        warnings.warn(msg)
