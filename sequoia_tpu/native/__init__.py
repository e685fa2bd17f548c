"""Native (C++) components, exposed over ctypes (no pybind11 dependency).

Libraries are compiled lazily with the system toolchain on first use and
cached next to the sources; if no compiler is available, callers fall back to
the pure-numpy implementations, so the package never hard-requires a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_SRC_DIR, "_build")
_lock = threading.Lock()
_cache: dict = {}


def _compile(name: str, extra_flags: Optional[list] = None) -> str:
    src = os.path.join(_SRC_DIR, f"{name}.cpp")
    out = os.path.join(_BUILD_DIR, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    # -ffp-contract=off: no FMA contraction, so float results (and therefore
    # argmax tie-breaking) are bit-identical to the numpy reference paths.
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
        "-ffp-contract=off", "-o", out, src,
    ] + (extra_flags or [])
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Compile (if stale) and dlopen `native/<name>.cpp`. Returns None when
    compilation is impossible (no g++), letting callers fall back."""
    with _lock:
        if name in _cache:
            return _cache[name]
        try:
            lib = ctypes.CDLL(_compile(name))
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            lib = None
        _cache[name] = lib
        return lib


def planner_dp_lib() -> Optional[ctypes.CDLL]:
    lib = load_library("planner_dp")
    if lib is not None and not getattr(lib, "_configured", False):
        lib.sequoia_fill_table.restype = ctypes.c_int
        lib.sequoia_fill_table.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # p
            ctypes.c_int32,                   # max_branch
            ctypes.c_int32,                   # max_budget
            ctypes.c_int32,                   # max_depth
            ctypes.POINTER(ctypes.c_double),  # T out
            ctypes.POINTER(ctypes.c_int32),   # Y out
        ]
        lib._configured = True
    return lib
