"""Observation volume save/load operators.

Rebuilds of ``src/toast/ops/save_hdf5.py`` and ``ops/load_hdf5.py``.
"""

from __future__ import annotations

import os

import numpy as np

from ..config.traits import Bool, List, Unicode
from ..io.observation_hdf import load_hdf5, save_hdf5
from ..io.volume import index_volume
from ..utils.timing import function_timer
from .operator import Operator


class SaveHDF5(Operator):
    """Save all observations to a directory volume."""

    volume = Unicode("toast_out", help="Output directory")
    meta = List(None, allow_none=True)
    detdata = List(None, allow_none=True)
    shared = List(None, allow_none=True)
    intervals = List(None, allow_none=True)
    detdata_float32 = Bool(False)
    compress_detdata = Bool(True)
    reference_format = Bool(
        False,
        help="Write reference-TOAST v2 files (readable by hpc4cmb/toast) "
        "instead of the native toast_tpu format",
    )
    verify = Bool(False, help="Re-load and compare after writing")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        os.makedirs(self.volume, exist_ok=True)

        def sel(x):
            # empty/None selection means "everything"
            return None if not x else x

        for ob in data.obs:
            if self.reference_format:
                from ..io.observation_hdf_ref_save import save_hdf5_reference

                path = save_hdf5_reference(
                    ob,
                    self.volume,
                    meta=sel(self.meta),
                    detdata=sel(self.detdata),
                    shared=sel(self.shared),
                    intervals=sel(self.intervals),
                )
            else:
                path = save_hdf5(
                    ob,
                    self.volume,
                    meta=sel(self.meta),
                    detdata=sel(self.detdata),
                    shared=sel(self.shared),
                    intervals=sel(self.intervals),
                    detdata_float32=self.detdata_float32,
                    compress=self.compress_detdata,
                )
            if self.verify:
                check = load_hdf5(path, comm=data.comm)
                for key in ob.detdata:
                    if sel(self.detdata) is not None and key not in self.detdata:
                        continue
                    if not np.allclose(
                        check.detdata[key].numpy(), ob.detdata[key].numpy()
                    ):
                        raise RuntimeError(f"verify failed for {ob.name}:{key}")

    def _finalize(self, data, **kwargs):
        index_volume(self.volume)


class LoadHDF5(Operator):
    """Load observations from a directory volume."""

    volume = Unicode("toast_out", help="Input directory")
    files = List([], help="Explicit list of files (overrides volume listing)")
    pattern = Unicode(r".*\.h5", help="Filename regex filter")
    meta = List(None, allow_none=True)
    detdata = List(None, allow_none=True)
    shared = List(None, allow_none=True)
    intervals = List(None, allow_none=True)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        import re

        if self.files:
            paths = list(self.files)
        else:
            pat = re.compile(self.pattern)
            paths = [
                os.path.join(self.volume, f)
                for f in sorted(os.listdir(self.volume))
                if f.endswith(".h5") and pat.match(f)
            ]
        # distribute whole observations across process groups
        comm = data.comm
        n = len(paths)
        per = [n // comm.ngroups + (1 if g < n % comm.ngroups else 0) for g in range(comm.ngroups)]
        start = sum(per[: comm.group])
        for path in paths[start : start + per[comm.group]]:
            data.obs.append(
                load_hdf5(
                    path,
                    comm=comm,
                    meta=self.meta if self.meta else None,
                    detdata=self.detdata if self.detdata else None,
                    shared=self.shared if self.shared else None,
                    intervals=self.intervals if self.intervals else None,
                )
            )
