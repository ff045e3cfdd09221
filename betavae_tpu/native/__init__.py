"""Native (C++) runtime components, bound via ctypes.

Currently: the packed-dataset builder (``packer.cpp``) — multithreaded
libpng/libjpeg decode straight into the packed uint8 (N, H, W, C) array the
device pipeline uploads to HBM.  Compiled on first use with the system
toolchain and cached next to the source; every entry point degrades
gracefully to the pure-Python (PIL) path when the toolchain or libraries are
unavailable (``available()`` reports which path is active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "packer.cpp")
_LIB = os.path.join(_HERE, "libbvpacker.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _LIB, "-lpng", "-ljpeg", "-pthread",
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    return res.returncode == 0 and os.path.exists(_LIB)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("BETAVAE_NO_NATIVE") == "1":
            return None
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.bv_pack_images.restype = ctypes.c_int
        lib.bv_pack_images.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def pack_images(paths, size: int, channels: int,
                n_threads: int = 0) -> np.ndarray | None:
    """Decode ``paths`` into a packed uint8 (N, size, size, channels) array.

    Returns ``None`` when the native library is unavailable or any image
    fails to decode (caller falls back to the PIL path).
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, size, size, channels), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    err_index = ctypes.c_int(-1)
    errors = lib.bv_pack_images(
        arr, n, size, channels,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        int(n_threads), ctypes.byref(err_index),
    )
    if errors:
        return None
    return out
