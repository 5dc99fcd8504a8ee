"""Small shared helpers (reference: ``src/toast/utils.py``)."""

from __future__ import annotations

import hashlib

import numpy as np


def name_UID(name, int64=False):
    """Stable unsigned integer ID from a string name.

    Used to key deterministic RNG streams per detector / session
    (reference ``src/toast/utils.py:635``).  Any stable hash works as long
    as it is reproducible across runs and platforms; we use SHA-256.
    """
    digest = hashlib.sha256(str(name).encode("utf-8")).digest()
    val = int.from_bytes(digest[:8], "little")
    if int64:
        return np.int64(val & 0x7FFFFFFFFFFFFFFF)
    return np.uint64(val)


_RATE_CACHE: dict = {}


def rate_from_times(timestamps):
    """Estimate sample rate statistics from a timestamp vector.

    Returns ``(rate_hz, dt, dt_min, dt_max, dt_std)`` like the reference
    ``src/toast/utils.py:655``.  Results are cached by array identity
    (weakref-guarded): the median costs a host sort of the full timestamp
    vector, and several operators call this per apply on the same shared
    ``times`` column.
    """
    import weakref

    ts = np.asarray(timestamps, dtype=np.float64)
    if len(ts) < 2:
        return (1.0, 1.0, 1.0, 1.0, 0.0)
    cacheable = ts is timestamps or (
        isinstance(timestamps, np.ndarray) and ts.base is timestamps
    )
    # cheap content guard: in-place fills of shared columns do occur
    # (e.g. spt3g_import writes into np.asarray(obs.shared[key])), so the
    # identity key alone would return stale rates after a mutation
    content = (len(ts), float(ts[0]), float(ts[-1]))
    if cacheable:
        hit = _RATE_CACHE.get(id(timestamps))
        if hit is not None and hit[0]() is timestamps and hit[2] == content:
            return hit[1]
    diffs = np.diff(ts)
    dt = float(np.median(diffs))
    result = (
        1.0 / dt,
        dt,
        float(np.min(diffs)),
        float(np.max(diffs)),
        float(np.std(diffs)),
    )
    if cacheable:
        if len(_RATE_CACHE) > 64:
            _RATE_CACHE.clear()
        try:
            _RATE_CACHE[id(timestamps)] = (
                weakref.ref(timestamps), result, content,
            )
        except TypeError:
            pass
    return result


class SetDict(dict):
    """Dict of sets with set-algebra across all values.

    Mirrors the reference ``utils.SetDict`` (``src/toast/utils.py:904``)
    used by Pipeline requires/provides bookkeeping.
    """

    def __init__(self, mapping=None):
        super().__init__()
        if mapping:
            for k, v in mapping.items():
                self[k] = set(v)

    def __setitem__(self, key, value):
        super().__setitem__(key, set(value))

    def __ior__(self, other):
        for k, v in other.items():
            if k in self:
                self[k] |= set(v)
            else:
                self[k] = set(v)
        return self

    def __isub__(self, other):
        for k, v in other.items():
            if k in self:
                self[k] -= set(v)
        return self

    def __le__(self, other):
        # self is "covered by" other
        for k, v in self.items():
            if len(v) == 0:
                continue
            if k not in other or not v <= other[k]:
                return False
        return True

    def is_empty(self):
        return all(len(v) == 0 for v in self.values())


def dtype_to_aligned(dtype):
    """Map a numpy dtype to itself (alignment handled by numpy/JAX)."""
    return np.dtype(dtype), None


def object_fullname(obj):
    cls = obj if isinstance(obj, type) else type(obj)
    return f"{cls.__module__}.{cls.__qualname__}"


def import_from_name(name):
    import importlib

    mod_name, _, cls_name = name.rpartition(".")
    return getattr(importlib.import_module(mod_name), cls_name)


def memreport(msg="", comm=None, silent=False):
    """Report process memory usage (reference ``utils.memreport``)."""
    import resource

    maxrss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024**2
    report = f"Memory usage {msg}: max RSS {maxrss_gb:.3f} GB"
    if not silent:
        from .logging import Logger

        Logger.get().info(report)
    return report
