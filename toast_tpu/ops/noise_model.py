"""Noise model operators.

Rebuild of ``src/toast/ops/noise_model.py``: ``DefaultNoiseModel`` (``:24``)
builds an :class:`~toast_tpu.models.noise.AnalyticNoise` from focalplane
``psd_*`` columns; ``FitNoiseModel`` (``:168``) least-squares fits the
1/f model to estimated PSDs; ``FlagNoiseFit`` (``:598``) sigma-cuts
detectors on the fit parameters.  Also ``SignalDiffNoiseModel``
(``ops/signal_diff_noise_model.py``): white-noise levels from sample
differences.
"""

from __future__ import annotations

import numpy as np

from ..config.traits import Float, Int, Unicode
from ..models.defaults import default_values as defaults
from ..models.noise import AnalyticNoise, Noise
from ..utils import units as u
from ..utils.misc import rate_from_times
from ..utils.timing import function_timer
from ..utils.units import Quantity as Qty
from .operator import Operator


class DefaultNoiseModel(Operator):
    """Create analytic noise models from focalplane parameters."""

    noise_model = Unicode(
        defaults.noise_model, help="Observation key for the noise model"
    )

    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            fp = ob.telescope.focalplane
            dets = ob.select_local_detectors(detectors)
            rate_hz = fp.sample_rate.to_value(u.Hz)

            def col(name, default):
                c = fp.column(name)
                if c is None:
                    return {d: default for d in dets}
                return {d: float(c[fp.detector_index(d)]) for d in dets}

            net = col("psd_net", 0.1)
            fmin = col("psd_fmin", 1e-5)
            fknee = col("psd_fknee", 0.0)
            alpha = col("psd_alpha", 1.0)

            ob[self.noise_model] = AnalyticNoise(
                detectors=dets,
                rate={d: Qty(rate_hz, u.Hz) for d in dets},
                fmin={d: Qty(fmin[d], u.Hz) for d in dets},
                fknee={d: Qty(fknee[d], u.Hz) for d in dets},
                alpha={d: alpha[d] for d in dets},
                NET={d: Qty(net[d], u.K_sqrt_s) for d in dets},
            )

    def _provides(self):
        return {
            "global": [],
            "meta": [self.noise_model],
            "detdata": [],
            "shared": [],
            "intervals": [],
        }


class FitNoiseModel(Operator):
    """Least-squares 1/f fit to an estimated noise model
    (reference ``ops/noise_model.py:168``).

    Fits PSD(f) = NET^2 (f^alpha + fknee^alpha) / (f^alpha + fmin^alpha)
    in log space per detector and stores an AnalyticNoise.
    """

    noise_model = Unicode("noise_estim", help="Input (estimated) noise model key")
    out_model = Unicode("noise_fit", help="Output fitted model key")
    f_min = Float(1.0e-5, help="Fixed high-pass fmin in Hz")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        from scipy.optimize import least_squares

        for ob in data.obs:
            if self.noise_model not in ob:
                continue
            est = ob[self.noise_model]
            dets = [d for d in ob.select_local_detectors(detectors) if d in est.keys]
            if len(dets) == 0:
                continue
            rate = {}
            fmin = {}
            fknee = {}
            alpha = {}
            net = {}
            for det in dets:
                f = est.freq(det).to_value(u.Hz)
                p = est.psd(det).to_value(u.K2_s)
                good = (f > 0) & (p > 0)
                f = f[good]
                p = p[good]
                nyq = f[-1]
                # initial guesses from the data
                white = np.median(p[f > 0.4 * nyq])
                net0 = np.sqrt(white)
                low = np.median(p[: max(2, len(p) // 10)])
                fk0 = f[np.argmin(np.abs(p - 2 * white))] if low > 2 * white else f[1]
                logp = np.log(p)

                def resid(x):
                    lnet2, lfk, a = x
                    model = lnet2 + np.log(
                        (f**a + np.exp(lfk) ** a)
                        / (f**a + self.f_min**a)
                    )
                    return model - logp

                try:
                    fit = least_squares(
                        resid,
                        [np.log(white), np.log(max(fk0, 1e-4)), 1.0],
                        bounds=([-50, np.log(1e-6), 0.1], [10, np.log(nyq), 5.0]),
                    )
                    lnet2, lfk, a = fit.x
                except Exception:
                    lnet2, lfk, a = np.log(white), np.log(1e-4), 1.0
                rate[det] = Qty(2.0 * nyq, u.Hz)
                fmin[det] = Qty(self.f_min, u.Hz)
                fknee[det] = Qty(float(np.exp(lfk)), u.Hz)
                alpha[det] = float(a)
                net[det] = Qty(float(np.sqrt(np.exp(lnet2))), u.K_sqrt_s)
            ob[self.out_model] = AnalyticNoise(
                detectors=dets, rate=rate, fmin=fmin, fknee=fknee,
                alpha=alpha, NET=net,
            )

    def _provides(self):
        return {"global": [], "meta": [self.out_model], "detdata": [], "shared": [], "intervals": []}


class FlagNoiseFit(Operator):
    """Sigma-cut detectors on fitted noise parameters
    (reference ``ops/noise_model.py:598``)."""

    noise_model = Unicode("noise_fit", help="Fitted AnalyticNoise key")
    det_flag_mask = Int(defaults.det_mask_processing, help="Bit to raise")
    sigma_NET = Float(5.0, help="Cut beyond this many MAD in NET")
    sigma_fknee = Float(None, allow_none=True, help="Optional fknee cut")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            if self.noise_model not in ob:
                continue
            model = ob[self.noise_model]
            dets = [d for d in ob.select_local_detectors(detectors) if d in model.detectors]
            if len(dets) < 3:
                continue
            cuts = {}

            def sigma_cut(vals, nsigma):
                med = np.median(vals)
                mad = np.median(np.abs(vals - med)) * 1.4826
                if mad == 0:
                    # degenerate distribution: fall back to the std
                    mad = np.std(vals) / 1.4826
                if mad == 0:
                    return np.zeros(len(vals), dtype=bool)
                return np.abs(vals - med) > nsigma * mad

            nets = np.array([model.NET(d).value for d in dets])
            bad = sigma_cut(nets, self.sigma_NET)
            if self.sigma_fknee is not None:
                fks = np.array([model.fknee(d).value for d in dets])
                bad |= sigma_cut(fks, self.sigma_fknee)
            for d, b in zip(dets, bad):
                if b:
                    cuts[d] = self.det_flag_mask
            if cuts:
                ob.update_local_detector_flags(cuts)


class SignalDiffNoiseModel(Operator):
    """White-noise model from sample differences
    (reference ``ops/signal_diff_noise_model.py``)."""

    noise_model = Unicode(defaults.noise_model, help="Output model key")
    det_data = Unicode(defaults.det_data)
    times = Unicode(defaults.times)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            (rate_hz, _, _, _, _) = rate_from_times(
                np.asarray(ob.shared[self.times])
            )
            didx = ob.detector_indices(dets)
            tod = np.asarray(ob.detdata[self.det_data].data[didx], dtype=np.float64)
            # variance of (d[i+1]-d[i])/sqrt(2) estimates the white level
            sig_var = 0.5 * np.var(np.diff(tod, axis=1), axis=1)
            nyq = rate_hz / 2.0
            freqs = {}
            psds = {}
            for i, det in enumerate(dets):
                freqs[det] = np.array([1e-5, nyq])
                psd_white = sig_var[i] / rate_hz
                psds[det] = np.array([psd_white, psd_white])
            ob[self.noise_model] = Noise(detectors=dets, freqs=freqs, psds=psds)
