"""TOD cleaning operators: gap filling, time-domain noise filter, simple cuts.

Rebuilds of ``src/toast/ops/fill_gaps.py`` (``FillGaps``, using the
``flagged_noise_fill`` algorithm from ``src/toast/utils.py:961``),
``ops/noise_filter.py`` (``NoiseFilter``), and ``ops/simple_deglitch.py``/
``simple_jumpcorrect.py``/``simple_statcut.py``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Float, Int, Quantity, Unicode
from ..math.fft import filter_fourier as _filter_fourier
from ..models.defaults import default_values as defaults
from ..math import rng as toast_rng
from ..utils import units as u
from ..utils.misc import name_UID, rate_from_times
from ..utils.timing import function_timer
from ..utils.units import Quantity as Qty
from .operator import Operator


def flagged_noise_fill(signal, flags, rng_key, buffer=10):
    """Fill flagged gaps with constrained noise (reference ``utils.py:961``).

    Each gap is replaced by a linear interpolation between the good
    boundaries plus white noise matched to the local sample-difference
    variance.
    """
    sig = np.array(signal, dtype=np.float64)
    bad = flags != 0
    if not np.any(bad):
        return sig
    good_idx = np.nonzero(~bad)[0]
    if len(good_idx) < 2:
        return sig
    # local white level from sample differences of good data
    diffs = np.diff(sig[~bad])
    sigma = np.std(diffs) / np.sqrt(2.0) if len(diffs) > 1 else 0.0
    # linear interpolation across gaps
    interp = np.interp(np.arange(len(sig)), good_idx, sig[good_idx])
    n_bad = int(bad.sum())
    noise = toast_rng.random(n_bad, key=rng_key, sampler="gaussian") * sigma
    sig[bad] = interp[bad] + noise
    return sig


class FillGaps(Operator):
    """Fill flagged gaps with interpolation plus matched noise."""

    det_data = Unicode(defaults.det_data)
    det_flags = Unicode(defaults.det_flags)
    det_flag_mask = Int(defaults.det_mask_invalid)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_invalid)
    buffer = Quantity(Qty(1.0, u.second), help="Boundary buffer (API compat)")
    realization = Int(0)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.det_data]
            tod = np.asarray(field.data[didx], dtype=np.float64)
            flags = np.zeros_like(tod, dtype=np.uint8)
            if self.det_flags is not None and self.det_flags in ob.detdata:
                flags |= (
                    np.asarray(ob.detdata[self.det_flags].data[didx])
                    & self.det_flag_mask
                ).astype(np.uint8)
            if self.shared_flags is not None and self.shared_flags in ob.shared:
                sf = np.asarray(ob.shared[self.shared_flags])
                flags |= ((sf & self.shared_flag_mask) != 0).astype(np.uint8)[None, :]
            sindx = int(ob.session.uid if ob.session else 0) & 0xFFFFFFFF
            out = np.empty_like(tod)
            for i, det in enumerate(dets):
                key = (
                    (self.realization << 16) | 31,
                    (sindx << 16) ^ (int(name_UID(det)) & 0xFFFF),
                )
                out[i] = flagged_noise_fill(tod[i], flags[i], key)
            field.data = field.data.at[didx].set(
                jnp.asarray(out.astype(np.float32))
            )


class NoiseFilter(Operator):
    """Apply the inverse noise filter N^-1 in the time domain
    (reference ``ops/noise_filter.py``): Fourier-domain 1/PSD weighting."""

    det_data = Unicode(defaults.det_data)
    noise_model = Unicode(defaults.noise_model)
    times = Unicode(defaults.times)
    normalize = Int(1, help="Normalize so white-noise level is preserved")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        from ..math.fft import interpolate_psd

        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            nse = ob[self.noise_model]
            (rate, _, _, _, _) = rate_from_times(np.asarray(ob.shared[self.times]))
            n = ob.n_local_samples
            from ..math.fft import fourier_filter_freqs

            freqs = fourier_filter_freqs(n, rate)
            filt = np.empty((len(dets), len(freqs)), dtype=np.float64)
            for i, det in enumerate(dets):
                psd = interpolate_psd(
                    nse.freq(det).to_value(u.Hz),
                    nse.psd(det).to_value(u.K2_s),
                    freqs,
                )
                psd[0] = psd[1] if len(psd) > 1 else 1.0
                invpsd = 1.0 / np.maximum(psd, 1e-30)
                if self.normalize:
                    white = np.median(psd[freqs > 0.4 * freqs[-1]])
                    invpsd *= white
                filt[i] = invpsd
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.det_data]
            tod = field.data[didx]
            field.data = field.data.at[didx].set(
                _filter_fourier(tod, filt).astype(field.dtype)
            )


class SimpleDeglitch(Operator):
    """Flag glitches above a sigma threshold
    (reference ``ops/simple_deglitch.py``)."""

    det_data = Unicode(defaults.det_data)
    det_flags = Unicode(defaults.det_flags)
    det_flag_mask = Int(defaults.det_mask_invalid, help="Bit to raise")
    glitch_limit = Float(5.0, help="Sigma threshold")
    medfilt_kernel_size = Int(101, help="Running-median window (odd)")
    nsample_min = Int(4, help="Minimum good samples to process")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        from scipy.ndimage import median_filter

        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            didx = ob.detector_indices(dets)
            tod = np.asarray(ob.detdata[self.det_data].data[didx], dtype=np.float64)
            ob.detdata.ensure(self.det_flags, dtype=np.uint8, detectors=dets)
            ff = ob.detdata[self.det_flags]
            flags = np.asarray(ff.data[didx]).copy()
            for i in range(len(dets)):
                base = median_filter(
                    tod[i], size=self.medfilt_kernel_size, mode="nearest"
                )
                resid = tod[i] - base
                sigma = 1.4826 * np.median(np.abs(resid - np.median(resid)))
                if sigma == 0:
                    continue
                bad = np.abs(resid) > self.glitch_limit * sigma
                flags[i][bad] |= self.det_flag_mask
            ff.data = ff.data.at[didx].set(jnp.asarray(flags))


class SimpleJumpCorrect(Operator):
    """Detect and remove baseline jumps (reference ``ops/simple_jumpcorrect.py``)."""

    det_data = Unicode(defaults.det_data)
    det_flags = Unicode(defaults.det_flags)
    det_flag_mask = Int(defaults.det_mask_processing, help="Bit raised at jumps")
    jump_limit = Float(5.0, help="Sigma threshold on the matched filter")
    jump_radius = Int(5, help="Samples flagged around each jump")
    filterlen = Int(100, help="Matched filter half-length")
    njump_limit = Int(10, help="Max jumps to correct per detector")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.det_data]
            tod = np.asarray(field.data[didx], dtype=np.float64)
            ob.detdata.ensure(self.det_flags, dtype=np.uint8, detectors=dets)
            ff = ob.detdata[self.det_flags]
            flags = np.asarray(ff.data[didx]).copy()
            L = self.filterlen
            kernel = np.concatenate([-np.ones(L), np.ones(L)]) / L
            for i in range(len(dets)):
                sig = tod[i].copy()
                for _ in range(self.njump_limit):
                    mf = np.convolve(sig, kernel[::-1], mode="same")
                    sigma = 1.4826 * np.median(np.abs(mf - np.median(mf)))
                    if sigma == 0:
                        break
                    peak = int(np.argmax(np.abs(mf)))
                    if np.abs(mf[peak]) < self.jump_limit * sigma:
                        break
                    step = mf[peak]
                    sig[peak:] -= step
                    lo = max(0, peak - self.jump_radius)
                    hi = min(len(sig), peak + self.jump_radius + 1)
                    flags[i][lo:hi] |= self.det_flag_mask
                tod[i] = sig
            field.data = field.data.at[didx].set(
                jnp.asarray(tod.astype(np.float32))
            )
            ff.data = ff.data.at[didx].set(jnp.asarray(flags))


class SimpleStatCut(Operator):
    """Cut detectors with outlier statistics (reference ``ops/simple_statcut.py``)."""

    det_data = Unicode(defaults.det_data)
    det_flag_mask = Int(defaults.det_mask_processing, help="Bit to raise")
    sigma_rms = Float(5.0, help="MAD threshold on the RMS distribution")
    sigma_mean = Float(None, allow_none=True)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) < 3:
                continue
            didx = ob.detector_indices(dets)
            tod = np.asarray(ob.detdata[self.det_data].data[didx], dtype=np.float64)

            def mad_cut(vals, nsigma):
                med = np.median(vals)
                mad = np.median(np.abs(vals - med)) * 1.4826
                if mad == 0:
                    mad = np.std(vals) / 1.4826
                if mad == 0:
                    return np.zeros(len(vals), dtype=bool)
                return np.abs(vals - med) > nsigma * mad

            bad = mad_cut(tod.std(axis=1), self.sigma_rms)
            if self.sigma_mean is not None:
                bad |= mad_cut(tod.mean(axis=1), self.sigma_mean)
            cuts = {d: self.det_flag_mask for d, b in zip(dets, bad) if b}
            if cuts:
                ob.update_local_detector_flags(cuts)
