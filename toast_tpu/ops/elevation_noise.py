"""Elevation-dependent noise scaling.

Rebuild of ``src/toast/ops/elevation_noise.py:24`` (``ElevationNoise``):
scale each detector's noise PSD by ``(noise_a / sin(el) + noise_c)^2``,
optionally modulated by precipitable water vapor from the site weather.
"""

from __future__ import annotations

import numpy as np

from ..config.traits import Float, Instance, Unicode
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
    detector_pointing = Instance(
        klass=object,
        allow_none=True,
        help="Optional az/el detector pointing operator: when set, the "
        "per-detector median elevation is used instead of the shared "
        "boresight elevation (ref:ops/elevation_noise.py:40)",
    )
    view = Unicode(
        None, allow_none=True, help="Restrict to this interval list"
    )
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

            det_el = None
            if self.detector_pointing is not None:
                from .operator import single_obs_view

                quat_key = self.detector_pointing.quats
                if quat_key not in ob.detdata:
                    self.detector_pointing.exec(
                        single_obs_view(data, ob), detectors=dets
                    )
                from ..math import qarray as qa

                quats = np.asarray(ob.detdata[quat_key].data)
                zax = np.broadcast_to(
                    np.array([0.0, 0.0, 1.0]), quats.shape[:-1] + (3,)
                )
                vz = qa.rotate(quats, zax)[..., 2]
                # azel frame: v_z = cos(theta) = sin(elevation)
                det_el = {
                    d: float(np.arcsin(np.clip(np.median(vz[i]), -1.0, 1.0)))
                    for i, d in enumerate(ob.local_detectors)
                    if d in set(dets)
                }

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
                if det_el is not None and det in det_el:
                    el_med = det_el[det]
                elif el is not None:
                    el_med = float(np.median(el))
                else:
                    el_med = None
                if a is not None and el_med is not None and el_med > 0:
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
