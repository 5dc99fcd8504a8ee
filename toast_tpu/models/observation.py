"""The Observation container.

Rebuild of ``src/toast/observation.py:122``.  An Observation bundles, for one
contiguous observing session of one telescope:

* ``detdata`` — named dense ``(n_det, n_samp, ...)`` device arrays,
* ``shared`` — named per-sample host arrays (times, boresight, flags, ...),
* ``intervals`` — named interval lists,
* arbitrary metadata via the mapping interface.

TPU-first design departure from the reference: the reference splits each
observation over a 2-D MPI process grid (``DistDetSamp``,
``observation_dist.py:26``) and redistributes with Alltoallv.  Here a single
process owns whole observations (observation-level parallelism lives in
:class:`~toast_tpu.parallel.comm.Comm` groups), and *device-level*
(det x samp) parallelism is declared by a
:class:`~toast_tpu.parallel.mesh.MeshDist` — arrays are shard-placed over
the mesh and XLA inserts the collectives.  ``redistribute`` therefore
becomes a device resharding (``jax.device_put`` with a new NamedSharding)
instead of host communication.
"""

from __future__ import annotations

from collections.abc import MutableMapping

import numpy as np

from ..parallel.mesh import MeshDist
from ..utils.misc import name_UID
from .defaults import default_values as defaults
from .observation_data import (
    DetDataManager,
    IntervalsManager,
    SharedDataManager,
)


class Observation(MutableMapping):
    """One observing session's data."""

    # convenience re-export of the key-name schema
    defaults = defaults

    def __init__(
        self,
        comm,
        telescope,
        n_samples,
        name=None,
        uid=None,
        session=None,
        detector_sets=None,
        sample_sets=None,
        mesh_dist=None,
    ):
        self._comm = comm
        self.telescope = telescope
        self._n_samples = int(n_samples)
        self.name = name
        self.uid = name_UID(name) if uid is None and name is not None else uid
        self.session = session
        self._detector_sets = detector_sets
        self._sample_sets = sample_sets
        self.mesh_dist = mesh_dist if mesh_dist is not None else MeshDist()

        self._all_detectors = list(telescope.focalplane.detectors)
        self._det_flags = {d: 0 for d in self._all_detectors}

        self.detdata = DetDataManager(
            self._all_detectors, self._n_samples, placer=self._place_detdata
        )
        self.shared = SharedDataManager(self._n_samples)
        self.intervals = IntervalsManager(self._times_or_index, self._n_samples)
        self._internal = {}

    def _place_detdata(self, array):
        """Shard-place a detdata array onto this observation's live mesh.

        Called on every full-array rebind by :class:`DetectorData`, so data
        written by any operator keeps the det x samp layout declared via
        ``redistribute`` (the functional analog of the reference keeping
        buffers inside the fixed MPI process grid, ``observation.py:142``).
        """
        return self.mesh_dist.place_detdata(array)

    def _times_or_index(self):
        if defaults.times in self.shared:
            return np.asarray(self.shared[defaults.times])
        return np.arange(self._n_samples, dtype=np.float64)

    # -- detectors ---------------------------------------------------------
    @property
    def all_detectors(self):
        return list(self._all_detectors)

    @property
    def local_detectors(self):
        # whole observation lives in this process
        return list(self._all_detectors)

    @property
    def select_value(self):
        return None

    @property
    def local_detector_flags(self):
        return dict(self._det_flags)

    def set_local_detector_flags(self, vals):
        for d, f in vals.items():
            self._det_flags[d] = int(f)

    def update_local_detector_flags(self, vals):
        for d, f in vals.items():
            self._det_flags[d] |= int(f)

    def select_local_detectors(self, selection=None, flagmask=0):
        """Detectors passing the flag mask, optionally restricted to a list."""
        out = []
        for d in self._all_detectors:
            if selection is not None and d not in selection:
                continue
            if flagmask and (self._det_flags[d] & flagmask):
                continue
            out.append(d)
        return out

    def detector_indices(self, dets):
        index = {d: i for i, d in enumerate(self._all_detectors)}
        return np.array([index[d] for d in dets], dtype=np.int64)

    # -- samples -----------------------------------------------------------
    @property
    def n_local_samples(self):
        return self._n_samples

    @property
    def n_all_samples(self):
        return self._n_samples

    @property
    def local_index_offset(self):
        return 0

    @property
    def detector_sets(self):
        return self._detector_sets

    @property
    def sample_sets(self):
        return self._sample_sets

    @property
    def comm(self):
        return self._comm

    # -- metadata mapping --------------------------------------------------
    def __getitem__(self, key):
        return self._internal[key]

    def __setitem__(self, key, value):
        self._internal[key] = value

    def __delitem__(self, key):
        del self._internal[key]

    def __iter__(self):
        return iter(self._internal)

    def __len__(self):
        return len(self._internal)

    def __contains__(self, key):
        return key in self._internal

    # -- views -------------------------------------------------------------
    @property
    def view(self):
        return _ViewManager(self)

    def view_mask(self, view_name, dtype=np.float32):
        """Per-sample mask for a named interval list (None = all samples)."""
        if view_name is None or view_name == "":
            return np.ones(self._n_samples, dtype=dtype)
        return self.intervals[view_name].mask(dtype=dtype)

    # -- misc --------------------------------------------------------------
    def duplicate(self, times=None, meta=None, shared=None, detdata=None, intervals=None):
        """Copy of this observation (optionally restricting fields)."""
        ob = Observation(
            self._comm,
            self.telescope,
            self._n_samples,
            name=self.name,
            uid=self.uid,
            session=self.session,
            detector_sets=self._detector_sets,
            sample_sets=self._sample_sets,
            mesh_dist=self.mesh_dist,
        )
        ob.set_local_detector_flags(self._det_flags)
        for k, v in self._internal.items():
            if meta is None or k in meta:
                ob._internal[k] = v
        for k in self.shared:
            if shared is None or k in shared:
                ob.shared[k] = np.array(self.shared[k])
        for k in self.detdata:
            if detdata is None or k in detdata:
                src = self.detdata[k]
                ob.detdata.create(
                    k,
                    sample_shape=src.sample_shape,
                    dtype=src.dtype,
                    detectors=src.detectors,
                    units=src.units,
                )
                ob.detdata[k].data = src.data
        for k in self.intervals:
            if intervals is None or k in intervals:
                ob.intervals[k] = self.intervals[k]
        return ob

    def memory_use(self):
        return self.detdata.memory_use() + self.shared.memory_use()

    def redistribute(self, mesh_dist):
        """Reshard device data onto a new mesh layout."""
        self.mesh_dist = mesh_dist
        for k in self.detdata:
            dd = self.detdata[k]
            # rebinding through the setter runs the placer on the new mesh
            dd.data = dd.data

    def __repr__(self):
        return (
            f"<Observation '{self.name}' {len(self._all_detectors)} dets x "
            f"{self._n_samples} samples, detdata={list(self.detdata.keys())}, "
            f"shared={list(self.shared.keys())}, "
            f"intervals={list(self.intervals.keys())}>"
        )

    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)


class _DetDataView:
    """Per-interval slices of one detdata field (reference observation_view)."""

    def __init__(self, field, slices):
        self._field = field
        self._slices = slices

    def __len__(self):
        return len(self._slices)

    def __getitem__(self, i):
        return self._field.data[:, self._slices[i]]

    def __iter__(self):
        for sl in self._slices:
            yield self._field.data[:, sl]


class _ViewAccessor:
    """``ob.view[interval_name]`` -> per-interval access
    (rebuild of ``src/toast/observation_view.py:236``)."""

    def __init__(self, ob, name):
        self._ob = ob
        self._name = name

    @property
    def slices(self):
        if self._name is None or self._name == "":
            return [slice(0, self._ob.n_local_samples)]
        return [
            slice(int(r["first"]), int(r["last"]) + 1)
            for r in self._ob.intervals[self._name]
        ]

    def detdata(self, field):
        return _DetDataView(self._ob.detdata[field], self.slices)

    def shared(self, field):
        import numpy as np

        arr = np.asarray(self._ob.shared[field])
        return [arr[sl] for sl in self.slices]

    def __len__(self):
        return len(self.slices)


class _ViewManager:
    def __init__(self, ob):
        self._ob = ob

    def __getitem__(self, name):
        return _ViewAccessor(self._ob, name)
