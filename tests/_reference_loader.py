"""Load reference PyTorch model modules (read-only) for golden comparisons.

The reference at /root/reference is used purely as a numerical oracle in
tests: we instantiate its nn.Modules with random weights, export their state
dicts, and check our converted pytrees produce identical outputs. Tests that
need it skip cleanly when the reference checkout is unavailable.
"""
import importlib.util
import os

import pytest

REFERENCE_ROOT = os.environ.get("MDILSS_REFERENCE_ROOT", "/root/reference")


def load_reference_module(rel_path: str):
    path = os.path.join(REFERENCE_ROOT, rel_path)
    if not os.path.exists(path):
        pytest.skip(f"reference module {rel_path} not available")
    name = "ref_" + rel_path.replace("/", "_").removesuffix(".py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
