"""Observation data managers: detector data, shared data, intervals.

Rebuild of ``src/toast/observation_data.py`` for the TPU execution model:

* :class:`DetectorData` (reference ``observation_data.py:35``) holds one
  dense ``(n_det, n_samp, *sample_shape)`` array.  On TPU this is a JAX
  array — immutable, updated functionally by rebinding; the manager's
  ``__setitem__`` hides the ``.at[]`` mechanics.  There is no aligned-memory
  buffer management: XLA owns device memory.
* :class:`SharedDataManager` (reference ``observation_data.py:1263``): the
  reference used MPI shared-memory windows to hold one copy of per-sample
  telescope data per node.  Here a process owns whole observations, so
  shared data is a plain host numpy array (float64 timestamps stay exact)
  with a cached device copy for jitted consumers.
* :class:`IntervalsManager` (reference ``observation_data.py:1997``) is a
  dict of named :class:`~toast_tpu.models.intervals.IntervalList` with
  set algebra.
"""

from __future__ import annotations

from collections.abc import MutableMapping

import numpy as np

import jax
import jax.numpy as jnp

from ..utils import units as u
from .intervals import IntervalList


class DetectorData:
    """Dense per-detector timestream data with units."""

    def __init__(
        self,
        detectors,
        shape,
        dtype=np.float32,
        units=u.dimensionless,
        placer=None,
    ):
        self.detectors = list(detectors)
        self._indices = {d: i for i, d in enumerate(self.detectors)}
        if np.isscalar(shape):
            shape = (shape,)
        self._sample_shape = tuple(shape[1:]) if len(shape) > 1 else ()
        self._n_samp = int(shape[0])
        self.units = units
        self.dtype = canonical_detdata_dtype(dtype)
        # Optional sharding placer (Observation wires the live MeshDist in):
        # every full-array rebind is placed onto the observation's device
        # mesh, so detdata written by any operator stays det x samp sharded.
        self._placer = placer
        full = (len(self.detectors), self._n_samp) + self._sample_shape
        self._data = self._place(jnp.zeros(full, dtype=self.dtype))

    def _place(self, value):
        if self._placer is None:
            return value
        return self._placer(value)

    @property
    def data(self):
        return self._data

    @data.setter
    def data(self, value):
        value = jnp.asarray(value, dtype=self.dtype)
        if value.shape != self._data.shape:
            raise ValueError(
                f"shape {value.shape} does not match {self._data.shape}"
            )
        self._data = self._place(value)

    @property
    def shape(self):
        return self._data.shape

    @property
    def n_samples(self):
        return self._n_samp

    @property
    def sample_shape(self):
        return self._sample_shape

    def _resolve(self, key):
        if isinstance(key, str):
            return self._indices[key]
        return key

    def __getitem__(self, key):
        if isinstance(key, tuple):
            key = (self._resolve(key[0]),) + key[1:]
            return self._data[key]
        return self._data[self._resolve(key)]

    def __setitem__(self, key, value):
        if isinstance(key, tuple):
            key = (self._resolve(key[0]),) + key[1:]
        else:
            key = self._resolve(key)
        self._data = self._data.at[key].set(jnp.asarray(value, dtype=self.dtype))

    def numpy(self):
        return np.asarray(self._data)

    def index(self, det):
        return self._indices[det]

    def change_detectors(self, detectors):
        """Reset to a new detector list (reference ``:248``); zeros data."""
        self.detectors = list(detectors)
        self._indices = {d: i for i, d in enumerate(self.detectors)}
        full = (len(self.detectors), self._n_samp) + self._sample_shape
        self._data = self._place(jnp.zeros(full, dtype=self.dtype))

    def memory_use(self):
        return int(np.prod(self._data.shape)) * self.dtype.itemsize

    def __repr__(self):
        return (
            f"<DetectorData {len(self.detectors)} dets x {self._n_samp} samp "
            f"x {self._sample_shape} [{self.units}] {self.dtype}>"
        )


def canonical_detdata_dtype(dtype):
    """The device detector-data dtype policy, applied explicitly.

    Detector data lives on the TPU, which has no 64-bit ALU: 64-bit
    requests (e.g. reference HDF5 files storing float64 TOD,
    ref:src/toast/io/observation_hdf_save.py) are downcast to their 32-bit
    counterparts BY POLICY — not by JAX's silent truncation warning.
    Precision-critical host data (timestamps, boresight) stays float64 in
    shared data, and device reductions use compensated summation where
    float32 would lose accuracy (see kernels/mapkernels.segment_sum_sorted).
    Enabling JAX x64 mode (``jax.config.update("jax_enable_x64", True)``)
    restores 64-bit storage for workflows that need it.
    """
    import jax as _jax

    dt = np.dtype(dtype)
    if _jax.config.jax_enable_x64:
        return dt
    mapping = {
        np.dtype(np.float64): np.dtype(np.float32),
        np.dtype(np.int64): np.dtype(np.int32),
        np.dtype(np.uint64): np.dtype(np.uint32),
        np.dtype(np.complex128): np.dtype(np.complex64),
    }
    return mapping.get(dt, dt)


class DetDataManager(MutableMapping):
    """Dict of named DetectorData, with create/ensure helpers."""

    def __init__(self, detectors, n_samples, placer=None):
        self._detectors = list(detectors)
        self._n_samples = int(n_samples)
        self._placer = placer
        self._fields: dict[str, DetectorData] = {}

    def create(
        self,
        name,
        sample_shape=(),
        dtype=np.float32,
        detectors=None,
        units=u.dimensionless,
    ):
        if np.isscalar(sample_shape):
            sample_shape = (sample_shape,)
        dets = self._detectors if detectors is None else list(detectors)
        self._fields[name] = DetectorData(
            dets,
            (self._n_samples,) + tuple(sample_shape),
            dtype=dtype,
            units=units,
            placer=self._placer,
        )
        return self._fields[name]

    def ensure(
        self,
        name,
        sample_shape=(),
        dtype=np.float32,
        detectors=None,
        units=u.dimensionless,
        create_units=None,
    ):
        """Create if missing or incompatible; returns True if created."""
        if np.isscalar(sample_shape):
            sample_shape = (sample_shape,)
        if name in self._fields:
            existing = self._fields[name]
            if (
                existing.sample_shape == tuple(sample_shape)
                and existing.dtype == canonical_detdata_dtype(dtype)
            ):
                if detectors is not None:
                    missing = [
                        d for d in detectors if d not in existing._indices
                    ]
                    if not missing:
                        return False
                else:
                    return False
        self.create(
            name,
            sample_shape=sample_shape,
            dtype=dtype,
            detectors=detectors,
            units=units if create_units is None else create_units,
        )
        return True

    def __getitem__(self, name):
        return self._fields[name]

    def __setitem__(self, name, value):
        if isinstance(value, DetectorData):
            self._fields[name] = value
        else:
            arr = jnp.asarray(value)
            if name not in self._fields:
                dd = DetectorData(
                    self._detectors,
                    (self._n_samples,) + tuple(arr.shape[2:]),
                    dtype=arr.dtype,
                    placer=self._placer,
                )
                dd.data = arr
                self._fields[name] = dd
            else:
                self._fields[name].data = arr

    def __delitem__(self, name):
        del self._fields[name]

    def __iter__(self):
        return iter(self._fields)

    def __len__(self):
        return len(self._fields)

    def __contains__(self, name):
        return name in self._fields

    def clear(self):
        self._fields.clear()

    def memory_use(self):
        return sum(f.memory_use() for f in self._fields.values())


class SharedDataManager(MutableMapping):
    """Per-sample (and scalar/group) data shared across detectors.

    Host numpy is the source of truth; ``jax_view(name)`` returns a cached
    device array for jitted consumers.  The reference's comm-type concept
    (group/row/column, ``observation_data.py:1263``) collapses to plain
    storage here — noted per-field for HDF5 round-trip parity.
    """

    def __init__(self, n_samples):
        self._n_samples = int(n_samples)
        self._fields: dict[str, np.ndarray] = {}
        self._comm_types: dict[str, str] = {}
        self._jax_cache: dict[str, jax.Array] = {}

    def create_column(self, name, shape, dtype=np.float64):
        """Per-sample data (reference comm type 'column')."""
        if shape[0] != self._n_samples:
            raise ValueError(f"first dim {shape[0]} != n_samples {self._n_samples}")
        self._fields[name] = np.zeros(shape, dtype=dtype)
        self._comm_types[name] = "column"

    def create_row(self, name, shape, dtype=np.float64):
        """Per-detector-row data (reference comm type 'row')."""
        self._fields[name] = np.zeros(shape, dtype=dtype)
        self._comm_types[name] = "row"

    def create_group(self, name, shape, dtype=np.float64):
        """Whole-group data (reference comm type 'group')."""
        self._fields[name] = np.zeros(shape, dtype=dtype)
        self._comm_types[name] = "group"

    # reference API: sh.create(name, shape, dtype, comm) — alias to column
    def create(self, name, shape, dtype=np.float64, comm_type="column"):
        {
            "column": self.create_column,
            "row": self.create_row,
            "group": self.create_group,
        }[comm_type](name, shape, dtype)

    def comm_type(self, name):
        return self._comm_types[name]

    def set(self, name, data, offset=None, fromrank=0):
        arr = self._fields[name]
        data = np.asarray(data, dtype=arr.dtype)
        if offset is None:
            if data.shape != arr.shape:
                raise ValueError(f"shape {data.shape} != {arr.shape}")
            arr[...] = data
        else:
            sl = tuple(
                slice(o, o + s) for o, s in zip(offset, data.shape)
            )
            arr[sl] = data
        self._jax_cache.pop(name, None)

    def jax_view(self, name, dtype=None):
        """Cached device copy (float32 by default for float64 inputs)."""
        cache_key = name if dtype is None else f"{name}:{np.dtype(dtype)}"
        if cache_key not in self._jax_cache:
            arr = self._fields[name]
            if dtype is None and arr.dtype == np.float64:
                dtype = np.float32
            self._jax_cache[cache_key] = jnp.asarray(arr, dtype=dtype)
        return self._jax_cache[cache_key]

    def __getitem__(self, name):
        return self._fields[name]

    def __setitem__(self, name, value):
        value = np.asarray(value)
        if name not in self._fields:
            ctype = "column" if value.ndim and value.shape[0] == self._n_samples else "group"
            self._fields[name] = value.copy()
            self._comm_types[name] = ctype
            self._jax_cache.pop(name, None)
        else:
            self.set(name, value)

    def __delitem__(self, name):
        del self._fields[name]
        self._comm_types.pop(name, None)
        self._jax_cache.pop(name, None)

    def __iter__(self):
        return iter(self._fields)

    def __len__(self):
        return len(self._fields)

    def __contains__(self, name):
        return name in self._fields

    def memory_use(self):
        return sum(f.nbytes for f in self._fields.values())


class IntervalsManager(MutableMapping):
    """Named IntervalLists over one observation's timestamps."""

    # key meaning "all samples" (reference uses None)
    ALL = None

    def __init__(self, timestamps_getter, n_samples):
        self._get_times = timestamps_getter
        self._n_samples = int(n_samples)
        self._lists: dict[str, IntervalList] = {}

    def create(self, name, glb=None, timespans=None, samplespans=None, intervals=None):
        times = self._get_times()
        if intervals is not None and isinstance(intervals, IntervalList):
            self._lists[name] = intervals
        else:
            spans = glb if glb is not None else timespans
            self._lists[name] = IntervalList(
                times,
                timespans=spans,
                samplespans=samplespans,
                intervals=None if spans is not None or samplespans is not None else intervals,
            )

    # reference API alias
    create_col = create

    def __getitem__(self, name):
        if name is None or name == "":
            times = self._get_times()
            return IntervalList(
                times, samplespans=[(0, self._n_samples - 1)]
            )
        return self._lists[name]

    def __setitem__(self, name, value):
        if not isinstance(value, IntervalList):
            raise TypeError("IntervalsManager values must be IntervalList")
        self._lists[name] = value

    def __delitem__(self, name):
        del self._lists[name]

    def __iter__(self):
        return iter(self._lists)

    def __len__(self):
        return len(self._lists)

    def __contains__(self, name):
        if name is None or name == "":
            return True
        return name in self._lists
