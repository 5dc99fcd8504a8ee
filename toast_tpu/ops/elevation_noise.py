"""Elevation-dependent noise scaling.

Rebuild of ``src/toast/ops/elevation_noise.py:24`` (``ElevationNoise``):
scale each detector's noise PSD by ``(noise_a / sin(el) + noise_c)^2``,
optionally modulated by precipitable water vapor from the site weather.
"""

from __future__ import annotations

import numpy as np

from ..config.traits import Float, Unicode
from ..models.defaults import default_values as defaults
from ..models.noise import Noise
from ..utils import units as u
from ..utils.timing import function_timer
from .operator import Operator


class ElevationNoise(Operator):
    """Modify detector noise PSDs according to elevation."""

    noise_model = Unicode(defaults.noise_model, help="Input noise model key")
    out_model = Unicode(None, allow_none=True, help="Output key (default in-place)")
    elevation = Unicode(defaults.elevation, help="Shared key with elevation")
    noise_a = Float(None, allow_none=True, help="Coefficient of 1/sin(el)")
    noise_c = Float(None, allow_none=True, help="Constant coefficient")
    pwv_a0 = Float(None, allow_none=True, help="PWV poly coefficient 0")
    pwv_a1 = Float(None, allow_none=True, help="PWV poly coefficient 1")
    pwv_a2 = Float(None, allow_none=True, help="PWV poly coefficient 2")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            if self.noise_model not in ob:
                raise KeyError(f"missing noise model '{self.noise_model}'")
            nse_in = ob[self.noise_model]
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            el = np.asarray(ob.shared[self.elevation]) if self.elevation in ob.shared else None

            # per-detector focalplane overrides
            fp = ob.telescope.focalplane
            a_col = fp.column("elevation_noise_a")
            c_col = fp.column("elevation_noise_c")

            pwv_factor = 1.0
            weather = getattr(ob.telescope.site, "weather", None)
            if weather is not None and self.pwv_a0 is not None:
                w = weather.pwv.to_value(u.mm)
                pwv_factor = (
                    self.pwv_a0
                    + (self.pwv_a1 or 0.0) * w
                    + (self.pwv_a2 or 0.0) * w * w
                )

            freqs = {}
            psds = {}
            for det in dets:
                a = self.noise_a
                c = self.noise_c
                if a_col is not None:
                    a = float(a_col[fp.detector_index(det)])
                if c_col is not None:
                    c = float(c_col[fp.detector_index(det)])
                psd = nse_in.psd(det).to_value(u.K2_s)
                if a is not None and el is not None:
                    el_med = float(np.median(el))
                    scale = (a / np.sin(el_med) + (c or 0.0)) ** 2
                else:
                    scale = 1.0
                scale *= pwv_factor**2
                freqs[det] = nse_in.freq(det).to_value(u.Hz)
                psds[det] = psd * scale
            out_key = self.out_model if self.out_model is not None else self.noise_model
            ob[out_key] = Noise(detectors=dets, freqs=freqs, psds=psds)

    def _requires(self):
        return {
            "global": [], "meta": [self.noise_model],
            "detdata": [], "shared": [self.elevation], "intervals": [],
        }

    def _provides(self):
        out = self.out_model if self.out_model is not None else self.noise_model
        return {"global": [], "meta": [out], "detdata": [], "shared": [], "intervals": []}
