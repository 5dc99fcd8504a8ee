"""Data housekeeping operators.

Rebuilds of ``src/toast/ops/copy.py``, ``delete.py``, ``reset.py``,
``arithmetic.py`` (``Combine``), ``ops/detrend.py``,
``ops/memory_counter.py``, ``ops/statistics.py``, and
``ops/calibrate.py`` (``CalibrateDetectors``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Dict, Instance, Int, List, Unicode
from ..models.defaults import default_values as defaults
from ..utils.logging import Logger
from ..utils.timing import function_timer
from .operator import Operator


class Copy(Operator):
    """Copy data objects (reference ``ops/copy.py``).

    Traits are lists of (source, destination) tuples.
    """

    meta = List([], help="List of (in, out) metadata key pairs")
    detdata = List([], help="List of (in, out) detdata key pairs")
    shared = List([], help="List of (in, out) shared key pairs")
    intervals = List([], help="List of (in, out) interval key pairs")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            for src, dst in self.meta:
                if src in ob:
                    ob[dst] = ob[src]
            for src, dst in self.shared:
                if src in ob.shared:
                    ob.shared[dst] = np.array(ob.shared[src])
            for src, dst in self.detdata:
                if src not in ob.detdata:
                    continue
                s = ob.detdata[src]
                ob.detdata.ensure(
                    dst, sample_shape=s.sample_shape, dtype=s.dtype,
                    detectors=s.detectors,
                )
                ob.detdata[dst].data = s.data
                ob.detdata[dst].units = s.units
            for src, dst in self.intervals:
                if src in ob.intervals:
                    ob.intervals[dst] = ob.intervals[src]


class Delete(Operator):
    """Delete data objects (reference ``ops/delete.py``)."""

    meta = List([], help="Metadata keys to delete")
    detdata = List([], help="Detdata keys to delete")
    shared = List([], help="Shared keys to delete")
    intervals = List([], help="Interval keys to delete")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            for key in self.meta:
                if key in ob:
                    del ob._internal[key]
            for key in self.shared:
                if key in ob.shared:
                    del ob.shared[key]
            for key in self.detdata:
                if key in ob.detdata:
                    del ob.detdata[key]
            for key in self.intervals:
                if key in ob.intervals:
                    del ob.intervals[key]


class Reset(Operator):
    """Zero out data objects (reference ``ops/reset.py``)."""

    meta = List([], help="Metadata keys to reset")
    detdata = List([], help="Detdata keys to zero")
    shared = List([], help="Shared keys to zero")
    intervals = List([], help="Interval keys to clear")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            for key in self.detdata:
                if key in ob.detdata:
                    field = ob.detdata[key]
                    field.data = jnp.zeros_like(field.data)
            for key in self.shared:
                if key in ob.shared:
                    ob.shared.set(key, np.zeros_like(np.asarray(ob.shared[key])))
            for key in self.meta:
                if key in ob:
                    ob[key] = None
            for key in self.intervals:
                if key in ob.intervals:
                    del ob.intervals[key]


class Combine(Operator):
    """Arithmetic between detdata fields (reference ``ops/arithmetic.py``)."""

    op = Unicode("add", help="add, subtract, multiply, or divide")
    first = Unicode(None, allow_none=True, help="First detdata operand")
    second = Unicode(None, allow_none=True, help="Second detdata operand")
    result = Unicode(None, allow_none=True, help="Output detdata (default first)")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.first is None or self.second is None:
            raise RuntimeError("first and second traits must be set")
        out_key = self.result if self.result is not None else self.first
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            a = ob.detdata[self.first]
            b = ob.detdata[self.second]
            if out_key not in ob.detdata:
                ob.detdata.ensure(
                    out_key, sample_shape=a.sample_shape, dtype=a.dtype,
                    detectors=a.detectors,
                )
            didx = ob.detector_indices(dets)
            x = a.data[didx]
            y = b.data[didx]
            if self.op == "add":
                r = x + y
            elif self.op == "subtract":
                r = x - y
            elif self.op == "multiply":
                r = x * y
            elif self.op == "divide":
                r = x / y
            else:
                raise ValueError(f"unknown op {self.op}")
            out = ob.detdata[out_key]
            out.data = out.data.at[didx].set(r)


class Detrend(Operator):
    """Remove the mean (or slope) from each detector timestream
    (reference ``ops/detrend.py``)."""

    det_data = Unicode(defaults.det_data)
    mode = Unicode("mean", help="mean, median, or linear")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.det_data]
            tod = field.data[didx]
            if self.mode == "mean":
                new = tod - jnp.mean(tod, axis=1, keepdims=True)
            elif self.mode == "median":
                new = tod - jnp.median(tod, axis=1, keepdims=True)
            elif self.mode == "linear":
                n = tod.shape[1]
                t = jnp.linspace(-1.0, 1.0, n)
                slope = jnp.sum(tod * t, axis=1, keepdims=True) / jnp.sum(t * t)
                new = tod - jnp.mean(tod, axis=1, keepdims=True) - slope * t[None, :]
            else:
                raise ValueError(f"unknown mode {self.mode}")
            field.data = field.data.at[didx].set(new)


class CalibrateDetectors(Operator):
    """Multiply timestreams by per-detector gains
    (reference ``ops/calibrate.py``)."""

    det_data = Unicode(defaults.det_data)
    cal = Unicode("calibration", help="Observation key with {det: gain}")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            if self.cal not in ob:
                continue
            gains = ob[self.cal]
            dets = [d for d in ob.select_local_detectors(detectors) if d in gains]
            if len(dets) == 0:
                continue
            didx = ob.detector_indices(dets)
            g = jnp.asarray(
                np.array([gains[d] for d in dets], dtype=np.float32)
            )
            field = ob.detdata[self.det_data]
            field.data = field.data.at[didx].multiply(g[:, None])


class MemoryCounter(Operator):
    """Aggregate memory census (reference ``ops/memory_counter.py``)."""

    silent = Int(0, help="If nonzero, do not log")
    prefix = Unicode("", help="Logging prefix")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        self.total_bytes = 0
        for ob in data.obs:
            self.total_bytes += ob.memory_use()
        if not self.silent:
            Logger.get().info(
                f"{self.prefix} Memory usage: "
                f"{self.total_bytes / 1024**3:.3f} GB in {len(data.obs)} obs"
            )

    def _finalize(self, data, **kwargs):
        return self.total_bytes


class Statistics(Operator):
    """Per-detector moments, written to HDF5
    (reference ``ops/statistics.py``)."""

    det_data = Unicode(defaults.det_data)
    output_dir = Unicode(None, allow_none=True)
    stats = Unicode("statistics", help="Observation key for the results")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        import os

        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            didx = ob.detector_indices(dets)
            tod = np.asarray(ob.detdata[self.det_data].data[didx], dtype=np.float64)
            mean = tod.mean(axis=1)
            var = tod.var(axis=1)
            sd = np.sqrt(np.maximum(var, 1e-300))
            centered = tod - mean[:, None]
            skew = (centered**3).mean(axis=1) / sd**3
            kurt = (centered**4).mean(axis=1) / sd**4
            result = {
                "detectors": dets,
                "mean": mean,
                "variance": var,
                "skewness": skew,
                "kurtosis": kurt,
            }
            ob[self.stats] = result
            if self.output_dir is not None:
                import h5py

                os.makedirs(self.output_dir, exist_ok=True)
                path = os.path.join(
                    self.output_dir, f"{self.stats}_{ob.name}.h5"
                )
                with h5py.File(path, "w") as f:
                    f.attrs["observation"] = ob.name or ""
                    f.create_dataset(
                        "detectors", data=np.array(dets, dtype="S64")
                    )
                    for k in ("mean", "variance", "skewness", "kurtosis"):
                        f.create_dataset(k, data=result[k])


class WeatherModel(Operator):
    """Attach a simulated weather draw to each observation's site.

    Rebuild of ``src/toast/ops/weather_model.py`` (``WeatherModel:24``):
    create a :class:`~toast_tpu.models.weather.SimWeather` at the
    observation mid-time and assign it to ``ob.telescope.site.weather``,
    so downstream operators (ElevationNoise, SimAtmosphere) can read PWV,
    temperature and winds.
    """

    times = Unicode(defaults.times)
    weather = Unicode(
        None, allow_none=True, help="Site name ('atacama', 'south_pole', ...)"
    )
    realization = Int(0, help="Realization index for the weather draws")
    max_pwv = Instance(klass=object, allow_none=True, help="PWV cap (Quantity, mm)")
    median_weather = Bool(False, help="Use the median instead of a random draw")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        from ..models.weather import SimWeather

        if self.weather is None:
            raise RuntimeError("The 'weather' trait must be set before exec()")
        for ob in data.obs:
            times = np.asarray(ob.shared[self.times])
            mid = 0.5 * (float(times[0]) + float(times[-1]))
            wx = SimWeather(
                time=mid,
                name=self.weather,
                site_uid=ob.telescope.site.uid,
                realization=self.realization,
                max_pwv=self.max_pwv,
                median_weather=self.median_weather,
            )
            ob.telescope.site.weather = wx

    def _requires(self):
        return {"global": [], "meta": [], "detdata": [], "shared": [self.times], "intervals": []}
