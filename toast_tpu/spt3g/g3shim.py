"""Minimal G3 object model for SPT3G interop.

When the real ``spt3g`` package is installed, :func:`get_g3` returns its
``core`` module and the conversion logic in :mod:`spt3g_export` /
:mod:`spt3g_import` drives the real frame classes.  Without it (this
image has no spt3g), the shim below provides the same class surface —
frames are dict-like with a type tag, timestream objects carry start/stop
times — so the frame-building and frame-splitting logic is fully
implemented and tested either way (the reference separates its conversion
logic from the package the same way:
``ref:src/toast/spt3g/spt3g_export.py:205-506``).

The shim intentionally implements only the semantics the converters rely
on: G3Time with 10 ns ticks, typed scalar wrappers, vector types backed
by numpy, ``G3Timestream``/``G3TimestreamMap`` with start/stop, and
``IntervalsTime`` as a list of time pairs.
"""

from __future__ import annotations

import numpy as np

G3_TICKS_PER_SECOND = 100000000  # 10 ns ticks, matching spt3g core


class G3FrameType:
    Observation = "Observation"
    Calibration = "Calibration"
    Scan = "Scan"
    Wiring = "Wiring"
    EndProcessing = "EndProcessing"


class G3Frame(dict):
    def __init__(self, frame_type=G3FrameType.Scan):
        super().__init__()
        self.type = frame_type

    def __repr__(self):
        return f"<G3Frame {self.type} keys={sorted(self.keys())}>"


class G3String(str):
    pass


class G3Int(int):
    pass


class G3Double(float):
    pass


class G3Bool(int):
    pass


class G3Time:
    __slots__ = ("time",)

    def __init__(self, ticks=0):
        self.time = int(ticks)

    @classmethod
    def from_seconds(cls, seconds):
        return cls(int(round(float(seconds) * G3_TICKS_PER_SECOND)))

    @property
    def seconds(self):
        return self.time / G3_TICKS_PER_SECOND

    def __eq__(self, other):
        return isinstance(other, G3Time) and self.time == other.time

    def __repr__(self):
        return f"G3Time({self.time})"


class _G3Vector(np.ndarray):
    _dtype = np.float64

    def __new__(cls, values=()):
        return np.asarray(values, dtype=cls._dtype).view(cls)


class G3VectorDouble(_G3Vector):
    _dtype = np.float64


class G3VectorInt(_G3Vector):
    _dtype = np.int64


class G3VectorUnsignedChar(_G3Vector):
    _dtype = np.uint8


class G3VectorString(list):
    pass


class G3VectorVectorString(list):
    pass


class G3VectorTime(list):
    """List of G3Time."""

    @classmethod
    def from_seconds(cls, seconds):
        return cls(G3Time.from_seconds(s) for s in np.asarray(seconds))

    def to_seconds(self):
        return np.array([t.seconds for t in self], dtype=np.float64)


class G3Timestream(np.ndarray):
    """A sampled vector with start/stop times and units."""

    def __new__(cls, values, units=None):
        obj = np.asarray(values, dtype=np.float64).view(cls)
        obj.units = units
        obj.start = G3Time(0)
        obj.stop = G3Time(0)
        return obj

    def __array_finalize__(self, obj):
        if obj is None:
            return
        self.units = getattr(obj, "units", None)
        self.start = getattr(obj, "start", G3Time(0))
        self.stop = getattr(obj, "stop", G3Time(0))


class G3TimestreamMap(dict):
    """Mapping of detector name -> G3Timestream with shared start/stop."""

    @property
    def start(self):
        return next(iter(self.values())).start if self else G3Time(0)

    @property
    def stop(self):
        return next(iter(self.values())).stop if self else G3Time(0)


class G3MapVectorDouble(dict):
    pass


class G3MapVectorInt(dict):
    pass


class IntervalsTime(list):
    """List of (G3Time, G3Time) pairs."""


class _ShimCore:
    """Namespace mimicking ``spt3g.core`` for the converters."""

    G3FrameType = G3FrameType
    G3Frame = G3Frame
    G3String = G3String
    G3Int = G3Int
    G3Double = G3Double
    G3Bool = G3Bool
    G3Time = G3Time
    G3VectorDouble = G3VectorDouble
    G3VectorInt = G3VectorInt
    G3VectorUnsignedChar = G3VectorUnsignedChar
    G3VectorString = G3VectorString
    G3VectorVectorString = G3VectorVectorString
    G3VectorTime = G3VectorTime
    G3Timestream = G3Timestream
    G3TimestreamMap = G3TimestreamMap
    G3MapVectorDouble = G3MapVectorDouble
    G3MapVectorInt = G3MapVectorInt
    IntervalsTime = IntervalsTime


def get_g3():
    """(core module, is_real): the spt3g core namespace or the shim."""
    try:
        from spt3g import core as c3g  # noqa

        return c3g, True
    except ImportError:
        return _ShimCore, False


def available():
    """True when the real spt3g package is importable."""
    return get_g3()[1]


def to_g3_time(c3g, seconds):
    if hasattr(c3g.G3Time, "from_seconds"):
        return c3g.G3Time.from_seconds(seconds)
    # real spt3g: G3Time takes ticks of 10 ns
    return c3g.G3Time(int(round(float(seconds) * G3_TICKS_PER_SECOND)))


def from_g3_time(g3t):
    if hasattr(g3t, "seconds"):
        return float(g3t.seconds)
    return float(g3t.time) / G3_TICKS_PER_SECOND
