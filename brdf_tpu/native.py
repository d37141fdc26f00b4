"""Native (C++) extension loading via ctypes.

The runtime around the TPU compute path keeps its hot host-side pieces native
(the reference used C/C++ for its whole runtime): currently the z-buffered
rasterizer core (``csrc/rasterizer.cpp``). Libraries are built on demand with
g++ into ``csrc/build/`` and cached by source mtime; loading falls back to
None (callers keep a NumPy path) if no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CSRC = os.path.join(_ROOT, "csrc")
_BUILD = os.path.join(_CSRC, "build")

_cache: dict[str, ctypes.CDLL | None] = {}


def _build_lib(name: str) -> str | None:
    src = os.path.join(_CSRC, f"{name}.cpp")
    out = os.path.join(_BUILD, f"lib{name}.so")
    if not os.path.exists(src):
        return None
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(_BUILD, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    return out


def load(name: str) -> ctypes.CDLL | None:
    """Load (building if needed) ``csrc/<name>.cpp`` as a shared library."""
    if name not in _cache:
        path = _build_lib(name)
        _cache[name] = ctypes.CDLL(path) if path else None
    return _cache[name]


def rasterizer_lib():
    lib = load("rasterizer")
    if lib is None:
        return None
    import numpy as np  # noqa: F401  (doc: caller passes numpy buffers)

    fn = lib.rasterize_faces
    fn.restype = None
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # uv
        ctypes.POINTER(ctypes.c_double),  # z
        ctypes.POINTER(ctypes.c_int32),   # faces
        ctypes.c_int64,                   # n_faces
        ctypes.c_int32,                   # width
        ctypes.c_int32,                   # height
        ctypes.POINTER(ctypes.c_int32),   # face_id
        ctypes.POINTER(ctypes.c_float),   # bary
        ctypes.POINTER(ctypes.c_float),   # depth
    ]
    return fn
