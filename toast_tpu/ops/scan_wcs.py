"""Flat-sky map scanning operators.

Rebuilds of ``src/toast/ops/scan_wcs.py`` (``ScanWCSMap``, ``ScanWCSMask``)
and ``ops/scan_wcs_detector.py`` (``ScanWCSDetectorMap``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Instance, Int, Unicode, Unit
from ..models.defaults import default_values as defaults
from ..utils import units as u
from ..utils.timing import function_timer
from .operator import Operator, Pipeline
from .scan_map import ScanMap, ScanMask


def _read_wcs_any(path):
    from ..pixels.io_wcs import read_wcs_fits, read_wcs_hdf5

    if str(path).endswith((".h5", ".hdf5")):
        return read_wcs_hdf5(path)
    return read_wcs_fits(path)


class ScanWCSMap(Operator):
    """Scan a flat-projection map file into timestreams."""

    file = Unicode(None, allow_none=True)
    det_data = Unicode(defaults.det_data)
    det_data_units = Unit(u.K)
    subtract = Bool(False)
    zero = Bool(False)
    pixel_dist = Unicode("pixel_dist")
    pixel_pointing = Instance(klass=object, allow_none=True, help="PixelsWCS")
    stokes_weights = Instance(klass=object, allow_none=True)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.file is None:
            raise RuntimeError("file trait must be set")
        mapdata, meta = _read_wcs_any(self.file)
        # configure the pixelization to match the map
        pp = self.pixel_pointing
        pp.center = [float(np.degrees(meta["lon0"])), float(np.degrees(meta["lat0"]))]
        pp.dimensions = [int(meta["nx"]), int(meta["ny"])]
        pp.projection = str(meta["projection"])
        from ..utils.units import Quantity as Qty

        pp.resolution = Qty(float(meta["res"]), u.rad)
        map_key = f"{self.name}_map"
        data[map_key] = mapdata
        scan = ScanMap(
            det_data=self.det_data,
            det_data_units=self.det_data_units,
            pixels=pp.pixels,
            weights=self.stokes_weights.weights,
            map_key=map_key,
            subtract=self.subtract,
            zero=self.zero,
        )
        Pipeline(operators=[pp, self.stokes_weights, scan]).apply(
            data, detectors=detectors
        )
        del data[map_key]


class ScanWCSMask(Operator):
    """Scan a flat-projection mask into detector flags."""

    file = Unicode(None, allow_none=True)
    det_flags = Unicode(defaults.det_flags)
    det_flags_value = Int(defaults.det_mask_processing)
    mask_bits = Int(255)
    pixel_pointing = Instance(klass=object, allow_none=True)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.file is None:
            raise RuntimeError("file trait must be set")
        mask, meta = _read_wcs_any(self.file)
        pp = self.pixel_pointing
        pp.center = [float(np.degrees(meta["lon0"])), float(np.degrees(meta["lat0"]))]
        pp.dimensions = [int(meta["nx"]), int(meta["ny"])]
        from ..utils.units import Quantity as Qty

        pp.resolution = Qty(float(meta["res"]), u.rad)
        mask_key = f"{self.name}_mask"
        data[mask_key] = mask
        op = ScanMask(
            det_flags=self.det_flags,
            det_flags_value=self.det_flags_value,
            pixels=pp.pixels,
            mask_key=mask_key,
            mask_bits=self.mask_bits,
        )
        Pipeline(operators=[pp, op]).apply(data, detectors=detectors)
        del data[mask_key]


class ScanWCSDetectorMap(Operator):
    """Per-detector flat map scanning (reference ``scan_wcs_detector.py``)."""

    file_pattern = Unicode(None, allow_none=True)
    det_data = Unicode(defaults.det_data)
    det_data_units = Unit(u.K)
    pixel_pointing = Instance(klass=object, allow_none=True)
    stokes_weights = Instance(klass=object, allow_none=True)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        import os

        from .kernels.mapkernels import scan_map as k_scan_map

        if self.file_pattern is None:
            raise RuntimeError("file_pattern trait must be set")
        Pipeline(operators=[self.pixel_pointing, self.stokes_weights]).apply(
            data, detectors=detectors
        )
        cache = {}
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            for det in dets:
                path = self.file_pattern.format(detector=det)
                if not os.path.exists(path):
                    continue
                if path not in cache:
                    cache[path] = _read_wcs_any(path)[0]
                mapdata = cache[path]
                didx = ob.detector_indices([det])
                pix = ob.detdata[self.pixel_pointing.pixels].data[didx]
                wts = ob.detdata[self.stokes_weights.weights].data[didx]
                ob.detdata.ensure(
                    self.det_data, detectors=dets, create_units=self.det_data_units
                )
                field = ob.detdata[self.det_data]
                new = k_scan_map(mapdata.data, pix, wts, field.data[didx], 1.0, "accum")
                field.data = field.data.at[didx].set(new)
