"""ctypes bindings for the native FLAC codec (native/flac.cpp).

Decode-side interop for reference observations whose detector data were
compressed with libFLAC via flacarray
(ref:src/toast/io/observation_hdf_save.py:186,379); encode side produces
spec-compliant streams for round-trip fixtures and our own writer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libttflac.so")
_SRC_PATH = os.path.join(_HERE, "flac.cpp")
_lock = threading.Lock()
_lib = None


def build(force=False):
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
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.tt_flac_info.restype = ctypes.c_int
        lib.tt_flac_info.argtypes = [
            u8p, ctypes.c_longlong, i32p, i32p,
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.tt_flac_decode.restype = ctypes.c_longlong
        lib.tt_flac_decode.argtypes = [
            u8p, ctypes.c_longlong, i32p, ctypes.c_longlong,
        ]
        lib.tt_flac_encode.restype = ctypes.c_longlong
        lib.tt_flac_encode.argtypes = [
            i32p, ctypes.c_longlong, ctypes.c_int32, ctypes.c_int32,
            u8p, ctypes.c_longlong,
        ]
        _lib = lib
        return _lib


def available():
    return _load() is not None


def stream_info(blob):
    """(n_channels, bits_per_sample, total_samples) from STREAMINFO."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native FLAC codec unavailable")
    buf = np.frombuffer(blob, dtype=np.uint8)
    ch = ctypes.c_int32()
    bps = ctypes.c_int32()
    tot = ctypes.c_longlong()
    rc = lib.tt_flac_info(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        ctypes.byref(ch), ctypes.byref(bps), ctypes.byref(tot),
    )
    if rc != 0:
        raise ValueError("not a FLAC stream")
    return ch.value, bps.value, tot.value


def decode(blob, n_samples=None):
    """Decode a FLAC stream to an int32 array.

    Returns shape (n_samples,) for mono, (n_samples, n_channels)
    otherwise.  ``n_samples`` bounds the output when STREAMINFO has no
    total-sample count.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native FLAC codec unavailable")
    buf = np.frombuffer(blob, dtype=np.uint8)
    ch, _bps, tot = stream_info(blob)
    cap = int(tot) if tot > 0 else int(n_samples or 0)
    if cap <= 0:
        raise ValueError("stream length unknown; pass n_samples")
    out = np.empty(cap * ch, dtype=np.int32)
    n = lib.tt_flac_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
    )
    if n < 0:
        raise ValueError("FLAC decode failed")
    out = out[: n * ch]
    if ch == 1:
        return out
    return out.reshape(-1, ch)


def encode(data, bps=32):
    """Encode int32 samples (1-D mono or (n, ch)) to a FLAC stream."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native FLAC codec unavailable")
    arr = np.ascontiguousarray(data, dtype=np.int32)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    cap = arr.nbytes * 2 + (n // 4096 + 2) * 64 + 1024
    out = np.empty(cap, dtype=np.uint8)
    nb = lib.tt_flac_encode(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n, ch, bps,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if nb < 0:
        raise RuntimeError("FLAC encode failed")
    return out[:nb].tobytes()
