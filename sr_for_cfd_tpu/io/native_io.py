"""ctypes loader/builder for the native IO extension (io/native/fastdat.cpp).

Compiles the shared library on first use with g++ (cached next to the
source); everything degrades gracefully to the pure-Python writers when no
toolchain is available, so the package stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_SRC_DIR, "fastdat.cpp")
_LIB = os.path.join(_SRC_DIR, "_fastdat.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            # a prebuilt .so without the source is fine (deployment may
            # strip .cpp); only rebuild when the source exists and is newer
            if (not os.path.exists(_LIB)
                    or (os.path.exists(_SRC)
                        and os.path.getmtime(_LIB) < os.path.getmtime(_SRC))):
                # compile to a temp path and rename atomically so a
                # concurrent process can never dlopen a half-written .so
                tmp = f"{_LIB}.{os.getpid()}.tmp"
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
                os.replace(tmp, _LIB)
            lib = ctypes.CDLL(_LIB)
            lib.append_field_sections.restype = ctypes.c_int
            lib.append_field_sections.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ]
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def append_field_sections(filename: str, var: np.ndarray) -> bool:
    """Append the per-variable formatted sections via the native writer.
    Returns False (caller should fall back to Python) when unavailable."""
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(var, dtype=np.float64)
    nvar, nxp, nyp = arr.shape
    rc = lib.append_field_sections(
        filename.encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nvar, nxp, nyp,
    )
    return rc == 0
