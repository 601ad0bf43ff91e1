"""Native (C++) component loader: compiles csrc/*.cpp to shared libs on first
use (cached by source mtime) and binds them via ctypes. No pybind11 needed.

Components:
* libhalton — generalized Halton core (replaces the reference's `ghalton`
  C++ dep, SURVEY §2.2)
* libmeshfit — mesh → collision-primitive fitter (the native piece of the
  asset pipeline; the reference used Isaac Gym's C++ mesh importer)
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_BUILD = os.path.join(_CSRC, "build")
_LIBS: dict = {}


def _build_lib(name: str) -> Optional[str]:
    src = os.path.join(_CSRC, f"{name}.cpp")
    if not os.path.exists(src):
        return None
    os.makedirs(_BUILD, exist_ok=True)
    out = os.path.join(_BUILD, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        sys.stderr.write(f"[native] build of {name} failed ({e}); using fallback\n")
        return None
    return out


def load(name: str) -> Optional[ctypes.CDLL]:
    if name in _LIBS:
        return _LIBS[name]
    path = _build_lib(name)
    lib = ctypes.CDLL(path) if path else None
    _LIBS[name] = lib
    return lib


# ---------------------------------------------------------------------------
def halton(n: int, dims: int, skip: int = 1):
    """(n, dims) float64 Halton points via the native core; None on failure."""
    import numpy as np

    lib = load("halton")
    if lib is None:
        return None
    fn = lib.halton_fill
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_int64, ctypes.c_int, ctypes.c_int64,
                   ctypes.POINTER(ctypes.c_double)]
    out = np.empty((n, dims), dtype=np.float64)
    rc = fn(n, dims, skip, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        return None
    return out


def meshfit(path: str, scale=(1.0, 1.0, 1.0)):
    """Fit a bounding primitive to a mesh file.

    Returns dict(kind, pos(3), quat(4, xyzw), params(3), half_extents(3),
    nverts) or None."""
    import numpy as np

    lib = load("meshfit")
    if lib is None or not os.path.exists(path):
        return None
    fn = lib.meshfit_file
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_double, ctypes.c_double,
                   ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
    out = np.zeros(16, dtype=np.float64)
    rc = fn(path.encode(), float(scale[0]), float(scale[1]), float(scale[2]),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        return None
    return {
        "kind": int(out[0]),
        "pos": out[1:4].copy(),
        "quat": out[4:8].copy(),
        "params": out[8:11].copy(),
        "half_extents": out[11:14].copy(),
        "nverts": int(out[14]),
    }
