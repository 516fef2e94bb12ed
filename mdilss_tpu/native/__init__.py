"""Native host-runtime components (C++).

`_native_decoder` — fused PNG/JPEG decode + PIL-parity resize (decoder.cc) —
is built on demand with the system toolchain (g++ + libpng/libjpeg); the data
pipeline falls back to PIL transparently when the build or import fails, so
the native layer is an accelerator, never a requirement.

    from mdilss_tpu.native import get_decoder
    dec = get_decoder()           # module or None
    rgb = dec.decode_image(raw_bytes, h, w)   # bytes, h*w*3
"""
from __future__ import annotations

import os
import subprocess
import sysconfig
import threading

_lock = threading.Lock()
_decoder = None
_tried = False


def _build(src_dir: str) -> str | None:
    """Compile decoder.cc -> _native_decoder.so next to it; returns the path."""
    src = os.path.join(src_dir, "decoder.cc")
    out = os.path.join(src_dir, "_native_decoder.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    # Compile to a temp file and os.replace() into place: concurrent
    # builders (parallel CLI runs) then always dlopen a complete .so —
    # rename is atomic within the directory.
    tmp = os.path.join(src_dir, f"_native_decoder.tmp{os.getpid()}.so")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", src, "-lpng", "-ljpeg", "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        os.replace(tmp, out)
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None
    return out


def get_decoder():
    """The `_native_decoder` module, building it on first use; None if the
    toolchain/libraries are unavailable (callers fall back to PIL)."""
    global _decoder, _tried
    with _lock:
        if _tried:
            return _decoder
        _tried = True
        if os.environ.get("MDILSS_NO_NATIVE"):
            return None
        src_dir = os.path.dirname(os.path.abspath(__file__))
        if _build(src_dir) is None:
            return None
        try:
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "mdilss_tpu.native._native_decoder",
                os.path.join(src_dir, "_native_decoder.so"),
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _decoder = mod
        except Exception:
            _decoder = None
        return _decoder
