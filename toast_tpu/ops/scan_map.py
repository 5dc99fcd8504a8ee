"""Map-to-TOD scanning operators.

Rebuild of ``src/toast/ops/scan_map/scan_map.py`` (``ScanMap:20``,
``ScanMask:216``, ``ScanScale:359``): project a sky map (PixelData in
``data``) into detector timestreams using existing pixels/weights.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Float, Int, Unicode, Unit
from ..models.defaults import default_values as defaults
from ..utils import units as u
from ..utils.timing import function_timer
from .kernels.mapkernels import scan_map as k_scan_map
from .operator import Operator


class ScanMap(Operator):
    """Scan a map into timestreams: d += (or -=, *=) P m."""

    det_data = Unicode(defaults.det_data, help="Detdata key for the signal")
    det_data_units = Unit(u.K)
    view = Unicode(None, allow_none=True)
    pixels = Unicode(defaults.pixels)
    weights = Unicode(defaults.weights, allow_none=True)
    map_key = Unicode(None, allow_none=True, help="Data key holding the PixelData")
    subtract = Bool(False, help="Subtract the scanned values instead of accumulating")
    zero = Bool(False, help="Zero the signal before accumulating")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.map_key is None or self.map_key not in data:
            raise RuntimeError(f"Data does not contain map '{self.map_key}'")
        mapdata = data[self.map_key]
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            ob.detdata.ensure(
                self.det_data, detectors=dets, create_units=self.det_data_units
            )
            field = ob.detdata[self.det_data]
            didx = ob.detector_indices(dets)
            pix = ob.detdata[self.pixels].data[didx]
            wts = ob.detdata[self.weights].data[didx]
            tod = field.data[didx]
            if self.zero:
                tod = jnp.zeros_like(tod)
            # unit conversion from map units to tod units
            scale = 1.0
            try:
                scale = mapdata.units.conversion_factor(
                    field.units
                )
            except (ValueError, AttributeError):
                scale = 1.0
            mode = "subtract" if self.subtract else "accum"
            new = k_scan_map(mapdata.data, pix, wts, tod, scale, mode)
            field.data = field.data.at[didx].set(new)

    def _requires(self):
        return {
            "global": [self.map_key],
            "meta": [],
            "detdata": [self.pixels, self.weights],
            "shared": [],
            "intervals": [],
        }

    def _provides(self):
        return {"global": [], "meta": [], "detdata": [self.det_data], "shared": [], "intervals": []}


class ScanMask(Operator):
    """Scan a mask map into detector flags (reference ``scan_map.py:216``)."""

    det_flags = Unicode(defaults.det_flags, help="Detdata key for flags")
    det_flags_value = Int(defaults.det_mask_processing)
    view = Unicode(None, allow_none=True)
    pixels = Unicode(defaults.pixels)
    mask_key = Unicode(None, allow_none=True, help="Data key holding the mask")
    mask_bits = Int(255, help="Bits to check in the mask map")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.mask_key is None or self.mask_key not in data:
            raise RuntimeError(f"Data does not contain mask '{self.mask_key}'")
        mask = data[self.mask_key]
        mask_vals = jnp.asarray(np.asarray(mask.data)[:, 0].astype(np.int32))
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            ob.detdata.ensure(self.det_flags, dtype=np.uint8, detectors=dets)
            field = ob.detdata[self.det_flags]
            didx = ob.detector_indices(dets)
            pix = ob.detdata[self.pixels].data[didx]
            good = pix >= 0
            pixsafe = jnp.where(good, pix, 0)
            hit = (mask_vals[pixsafe] & self.mask_bits) != 0
            hit = hit & good
            flags = field.data[didx]
            flags = jnp.where(hit, flags | np.uint8(self.det_flags_value), flags)
            field.data = field.data.at[didx].set(flags)

    def _provides(self):
        return {"global": [], "meta": [], "detdata": [self.det_flags], "shared": [], "intervals": []}


class ScanScale(Operator):
    """Scale timestreams by values scanned from a map
    (reference ``scan_map.py:359``)."""

    det_data = Unicode(defaults.det_data)
    view = Unicode(None, allow_none=True)
    pixels = Unicode(defaults.pixels)
    weights = Unicode(defaults.weights, allow_none=True)
    map_key = Unicode(None, allow_none=True)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.map_key is None or self.map_key not in data:
            raise RuntimeError(f"Data does not contain map '{self.map_key}'")
        mapdata = data[self.map_key]
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            field = ob.detdata[self.det_data]
            didx = ob.detector_indices(dets)
            pix = ob.detdata[self.pixels].data[didx]
            wts = ob.detdata[self.weights].data[didx]
            new = k_scan_map(mapdata.data, pix, wts, field.data[didx], 1.0, "scale")
            field.data = field.data.at[didx].set(new)
