"""Flagging operators.

Rebuilds of ``src/toast/ops/flag_intervals.py`` (``FlagIntervals``),
``ops/flag_nans.py`` (``FlagNaNs``), ``ops/extend_flags.py``
(``ExtendFlags``), ``ops/azimuth_intervals.py`` (``AzimuthIntervals``),
``ops/flag_sso.py`` (``FlagSSO``), and ``ops/yield_cut.py`` (``YieldCut``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Float, Int, List, Quantity, Unicode
from ..math import coordinates as coords
from ..math import qarray as qa
from ..math import rng as toast_rng
from ..models.defaults import default_values as defaults
from ..utils import units as u
from ..utils.misc import name_UID
from ..utils.timing import function_timer
from ..utils.units import Quantity as Qty
from .operator import Operator


class FlagIntervals(Operator):
    """Set shared flag bits from interval lists
    (reference ``ops/flag_intervals.py``)."""

    shared_flags = Unicode(defaults.shared_flags)
    shared_flag_bytes = Int(1, help="Bytes of the flag field")
    view_mask = List([], help="List of (interval_name, bitmask) tuples")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            if self.shared_flags not in ob.shared:
                ob.shared.create_column(
                    self.shared_flags, (ob.n_local_samples,), dtype=np.uint8
                )
            flags = np.asarray(ob.shared[self.shared_flags]).copy()
            for vname, mask in self.view_mask:
                if vname not in ob.intervals:
                    continue
                for row in ob.intervals[vname]:
                    flags[row["first"] : row["last"] + 1] |= mask
            ob.shared.set(self.shared_flags, flags)


class FlagNaNs(Operator):
    """Flag NaN samples in detector data (reference ``ops/flag_nans.py``)."""

    det_data = Unicode(defaults.det_data)
    det_flags = Unicode(defaults.det_flags)
    det_flag_mask = Int(defaults.det_mask_invalid, help="Bit to raise")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0 or self.det_data not in ob.detdata:
                continue
            didx = ob.detector_indices(dets)
            tod = ob.detdata[self.det_data].data[didx]
            bad = ~jnp.isfinite(tod)
            ob.detdata.ensure(self.det_flags, dtype=np.uint8, detectors=dets)
            ff = ob.detdata[self.det_flags]
            cur = ff.data[didx]
            ff.data = ff.data.at[didx].set(
                jnp.where(bad, cur | np.uint8(self.det_flag_mask), cur)
            )


class ExtendFlags(Operator):
    """Dilate flagged regions in time (reference ``ops/extend_flags.py``)."""

    det_flags = Unicode(defaults.det_flags)
    det_flag_mask = Int(defaults.det_mask_invalid)
    shared_flags = Unicode(None, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_invalid)
    width = Quantity(Qty(1.0, u.second), help="Extend flags by this time")
    times = Unicode(defaults.times)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        from ..utils.misc import rate_from_times

        for ob in data.obs:
            (rate, _, _, _, _) = rate_from_times(np.asarray(ob.shared[self.times]))
            n_ext = max(1, int(self.width.to_value(u.second) * rate))
            kernel_len = 2 * n_ext + 1
            if self.det_flags is not None and self.det_flags in ob.detdata:
                dets = ob.select_local_detectors(detectors)
                didx = ob.detector_indices(dets)
                ff = ob.detdata[self.det_flags]
                flags = np.asarray(ff.data[didx])
                bad = (flags & self.det_flag_mask) != 0
                # dilate with a boolean convolution
                from scipy.ndimage import binary_dilation

                grown = binary_dilation(
                    bad, structure=np.ones((1, kernel_len), dtype=bool)
                )
                flags = np.where(
                    grown, flags | np.uint8(self.det_flag_mask), flags
                )
                ff.data = ff.data.at[didx].set(jnp.asarray(flags))
            if self.shared_flags is not None and self.shared_flags in ob.shared:
                from scipy.ndimage import binary_dilation

                sf = np.asarray(ob.shared[self.shared_flags]).copy()
                bad = (sf & self.shared_flag_mask) != 0
                grown = binary_dilation(bad, structure=np.ones(kernel_len, dtype=bool))
                sf[grown] |= self.shared_flag_mask
                ob.shared.set(self.shared_flags, sf)


class AzimuthIntervals(Operator):
    """Reconstruct scanning intervals from azimuth data
    (reference ``ops/azimuth_intervals.py:26`` — used with real data)."""

    times = Unicode(defaults.times)
    azimuth = Unicode(defaults.azimuth)
    scanning_interval = Unicode(defaults.scanning_interval)
    turnaround_interval = Unicode(defaults.turnaround_interval)
    scan_leftright_interval = Unicode(defaults.scan_leftright_interval)
    scan_rightleft_interval = Unicode(defaults.scan_rightleft_interval)
    cut_short = Float(0.25, help="Cut scans shorter than this fraction of median")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            az = np.asarray(ob.shared[self.azimuth])
            vel = np.gradient(np.unwrap(az))
            vmax = np.percentile(np.abs(vel), 90)
            scanning = np.abs(vel) > 0.5 * vmax
            right = scanning & (vel > 0)
            left = scanning & (vel < 0)

            def spans(mask):
                idx = np.nonzero(mask)[0]
                if len(idx) == 0:
                    return []
                brk = np.nonzero(np.diff(idx) > 1)[0]
                starts = np.concatenate([[idx[0]], idx[brk + 1]])
                stops = np.concatenate([idx[brk], [idx[-1]]])
                return list(zip(starts, stops))

            ob.intervals.create(self.scanning_interval, samplespans=spans(scanning))
            ob.intervals.create(self.turnaround_interval, samplespans=spans(~scanning))
            ob.intervals.create(self.scan_leftright_interval, samplespans=spans(right))
            ob.intervals.create(self.scan_rightleft_interval, samplespans=spans(left))


class FlagSSO(Operator):
    """Flag samples close to solar-system objects
    (reference ``ops/flag_sso.py`` — Sun and Moon supported here)."""

    times = Unicode(defaults.times)
    det_flags = Unicode(defaults.det_flags)
    det_flag_mask = Int(defaults.det_mask_sso)
    detector_pointing = Unicode(defaults.quats_azel, help="Azel quats detdata key")
    sso_names = List(["Sun"], help="Objects to avoid (Sun and Moon supported)")
    sso_radii = List([], help="Quantity radii per object")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            if self.detector_pointing not in ob.detdata:
                continue
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            times = np.asarray(ob.shared[self.times])
            site = ob.telescope.site
            didx = ob.detector_indices(dets)
            quats = np.asarray(ob.detdata[self.detector_pointing].data[didx])
            vdir = qa.rotate(quats, np.array([0.0, 0.0, 1.0]))
            ob.detdata.ensure(self.det_flags, dtype=np.uint8, detectors=dets)
            ff = ob.detdata[self.det_flags]
            flags = np.array(ff.data[didx])
            bodies = {"sun": coords.sun_azel, "moon": coords.moon_azel}
            for name, radius in zip(self.sso_names, self.sso_radii):
                body = bodies.get(name.lower())
                if body is None:
                    continue
                rad = radius.to_value(u.rad) if isinstance(radius, Qty) else radius
                az_s, el_s = body(site, times)
                v_s = np.stack(
                    [
                        np.cos(el_s) * np.cos(az_s),
                        -np.cos(el_s) * np.sin(az_s),
                        np.sin(el_s),
                    ],
                    axis=-1,
                )
                cosdist = np.einsum("dnk,nk->dn", vdir, v_s)
                close = cosdist > np.cos(rad)
                flags[close] |= self.det_flag_mask
            ff.data = ff.data.at[didx].set(jnp.asarray(flags))


class YieldCut(Operator):
    """Random detector yield loss (reference ``ops/yield_cut.py``)."""

    det_flags = Unicode(defaults.det_flags)
    det_flag_mask = Int(defaults.det_mask_processing, help="Bit to raise")
    center = Float(0.85, help="Yield fraction to keep")
    width = Float(0.2, help="Width of the yield distribution (unused)")
    fixed = Int(1, help="If nonzero, the same detectors are cut in every obs")
    realization = Int(0)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            cut = {}
            for det in dets:
                detuid = int(name_UID(det)) & 0xFFFFFFFF
                key2 = detuid if self.fixed else (detuid ^ (int(ob.uid or 0) & 0xFFFFFFFF))
                x = toast_rng.random(
                    1, key=(self.realization, key2), sampler="uniform_01"
                )[0]
                cut[det] = x > self.center
            flagged = {
                d: self.det_flag_mask for d, c in cut.items() if c
            }
            ob.update_local_detector_flags(flagged)


class AzimuthRanges(Operator):
    """Record each observation's azimuth range as metadata
    (reference ``ops/azimuth_intervals.py:591``): min/max of the unwrapped
    good-flagged azimuth stored as ``scan_min_az`` / ``scan_max_az``."""

    azimuth = Unicode(defaults.azimuth)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_invalid)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        from ..utils import units as u
        from ..utils.units import Quantity

        for ob in data.obs:
            if self.azimuth not in ob.shared:
                continue
            az = np.unwrap(np.asarray(ob.shared[self.azimuth]))
            good = np.ones(az.shape, bool)
            if (
                self.shared_flags is not None
                and self.shared_flags in ob.shared
            ):
                flags = np.asarray(ob.shared[self.shared_flags])
                good = (flags & self.shared_flag_mask) == 0
            if not np.any(good):
                continue
            ob["scan_min_az"] = Quantity(float(az[good].min()), u.rad)
            ob["scan_max_az"] = Quantity(float(az[good].max()), u.rad)

    def _provides(self):
        return {
            "global": [], "meta": ["scan_min_az", "scan_max_az"],
            "detdata": [], "shared": [], "intervals": [],
        }
