"""Native (C++) runtime components.

The reference's native layer exists for CPU compute speed; on TPU the
compute path is XLA.  What remains native-worthy is host-side I/O: this
package provides a C++ lossless TOD compression codec (delta/linear
prediction + Rice coding — the core of the FLAC scheme the reference uses
for detector data, ``observation_hdf_save.py:186``), built on demand with
g++ and bound via ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libttcodec.so")
_SRC_PATH = os.path.join(_HERE, "codec.cpp")
_lock = threading.Lock()
_lib = None


def build(force=False):
    """Compile the codec shared library (g++ -O3)."""
    if os.path.exists(_LIB_PATH) and not force:
        if os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC_PATH):
            return _LIB_PATH
    subprocess.run(
        [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            _SRC_PATH, "-o", _LIB_PATH,
        ],
        check=True,
    )
    return _LIB_PATH


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            build()
            lib = ctypes.CDLL(_LIB_PATH)
        except (OSError, subprocess.CalledProcessError):
            return None
        lib.ttc_compress.restype = ctypes.c_longlong
        lib.ttc_compress.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_longlong,
        ]
        lib.ttc_decompress.restype = ctypes.c_longlong
        lib.ttc_decompress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
        ]
        _lib = lib
        return _lib


def available():
    return _load() is not None


def compress(data, quanta):
    """Compress a float32 array with quantization step ``quanta``.

    Returns a bytes object, or None if the data is not quantizable (caller
    should store raw).
    """
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(data, dtype=np.float32).reshape(-1)
    cap = arr.nbytes * 2 + 64
    out = np.empty(cap, dtype=np.uint8)
    n = lib.ttc_compress(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(arr),
        ctypes.c_float(quanta),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def decompress(blob, n_samples):
    """Decompress to a float32 array of n_samples."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native codec unavailable")
    buf = np.frombuffer(blob, dtype=np.uint8)
    out = np.empty(n_samples, dtype=np.float32)
    n = lib.ttc_decompress(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_samples,
    )
    if n != n_samples:
        raise RuntimeError(f"codec decompress failed ({n} != {n_samples})")
    return out
