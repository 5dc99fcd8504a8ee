"""HWP lock-in demodulation.

Rebuild of ``src/toast/ops/demodulation.py`` (``Demodulate:93``,
``StokesWeightsDemod:~1031``): multiply the signal by twice the normalized
Q/U pointing weights (which track ``cos/sin(4 chi - 2 alpha)`` exactly),
FIR-lowpass, and downsample — producing a new Data whose observations hold
``demod0_*``, ``demod4r_*``, ``demod4i_*`` pseudo-detectors with trivial
Stokes weights.

TPU design: the reference convolves one detector at a time with
``scipy.signal.fftconvolve``; here all detectors (and all three demodulation
products) are filtered in one batched FFT convolution on device.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Float, Instance, Int, Unicode
from ..models import Data, Observation
from ..models.defaults import default_values as defaults
from ..models.noise import Noise
from ..utils import units as u
from ..utils.misc import rate_from_times
from ..utils.timing import function_timer
from .operator import Operator


def lowpass_kernel(fmax_hz, fsample_hz, wkernel=None, window="hamming"):
    """FIR lowpass coefficients (reference Lowpass class, demodulation.py:34)."""
    from scipy.signal import firwin

    if wkernel is None:
        wkernel = (1 << int(np.ceil(np.log(fsample_hz / fmax_hz * 10) / np.log(2)))) - 1
    return firwin(
        wkernel, fmax_hz, window=window, pass_zero=True, fs=fsample_hz
    )


def bandpass_kernel(fmin_hz, fmax_hz, fsample_hz, wkernel=None, window="hamming"):
    """FIR bandpass (reference Bandpass class, demodulation.py:67)."""
    from scipy.signal import firwin

    if wkernel is None:
        wkernel = (
            1 << int(np.ceil(np.log(fsample_hz / (fmax_hz - fmin_hz) * 10) / np.log(2)))
        ) - 1
    return firwin(
        wkernel, [fmin_hz, fmax_hz], window=window, pass_zero=False, fs=fsample_hz
    )


from functools import partial as _partial

import jax as _jax


@_partial(_jax.jit, static_argnames=("nfft", "start", "n"))
def _batched_fir_core(tod, kernel, nfft, start, n):
    from ..math.fft import irfft_batched

    f_t = jnp.fft.rfft(tod, nfft, axis=-1)
    f_k = jnp.fft.rfft(kernel, nfft)
    full = irfft_batched(f_t * f_k[None, :], nfft, axis=-1)
    return full[:, start : start + n]


def _batched_fir(tod, kernel):
    """'same'-mode FIR convolution of (n_det, n) with kernel (k,), on device.

    One jitted program: complex intermediates never cross an XLA program
    boundary (complex buffers are unsupported by the remote-TPU runtime).
    """
    n = tod.shape[-1]
    k = len(kernel)
    nfft = int(2 ** np.ceil(np.log2(n + k)))
    return _batched_fir_core(
        tod, jnp.asarray(kernel, dtype=tod.dtype), nfft, (k - 1) // 2, n
    )


class Demodulate(Operator):
    """Demodulate HWP-modulated data into I/Q/U pseudo-detector streams."""

    times = Unicode(defaults.times)
    det_data = Unicode(defaults.det_data)
    hwp_angle = Unicode(defaults.hwp_angle)
    stokes_weights = Instance(
        klass=object, allow_none=True, help="IQU StokesWeights with HWP"
    )
    nskip = Int(3, help="Downsampling factor")
    mode = Unicode("IQU", help="Demodulation products to compute")
    do_2f = Bool(False, help="Also produce 2f-demodulated streams")
    fmin_2f = Float(1.05, help="2f-bandpass low edge in units of HWP frequency")
    fmax_2f = Float(2.95, help="2f-bandpass high edge in units of HWP frequency")
    fmin_4f = Float(3.05, help="4f-bandpass low edge in units of HWP frequency")
    fmax_4f = Float(4.95, help="4f-bandpass high edge in units of HWP frequency")
    fmax = Float(None, allow_none=True, help="Lowpass cutoff in Hz (default auto)")
    window = Unicode("hamming", help="FIR window")
    purge = Bool(False, help="Remove inputs from the parent observations")
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    noise_model = Unicode(defaults.noise_model, allow_none=True)
    demod_data = Instance(klass=object, allow_none=True, help="Output Data")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.stokes_weights is None:
            raise RuntimeError("stokes_weights trait must be set")
        if self.demod_data is None:
            self.demod_data = Data(data.comm)
        for ob in data.obs:
            if self.hwp_angle not in ob.shared:
                raise RuntimeError("Demodulation requires an HWP angle")
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            times = np.asarray(ob.shared[self.times])
            (rate, _, _, _, _) = rate_from_times(times)
            chi = np.unwrap(np.asarray(ob.shared[self.hwp_angle]))
            hwp_rate = np.abs(np.median(np.diff(chi))) * rate / (2 * np.pi)  # rev/s
            fmod = 4.0 * hwp_rate  # 4f line in Hz
            fmax = self.fmax if self.fmax is not None else 0.9 * fmod / self.nskip
            kernel = lowpass_kernel(fmax, rate, window=self.window)

            # ensure weights exist (with HWP)
            from .operator import single_obs_view

            self.stokes_weights.exec(single_obs_view(data, ob), detectors=dets)
            didx = ob.detector_indices(dets)
            wts = ob.detdata[self.stokes_weights.weights].data[didx]
            tod = ob.detdata[self.det_data].data[didx]
            eta = jnp.sqrt(wts[..., 1] ** 2 + wts[..., 2] ** 2)
            etainv = 1.0 / jnp.maximum(eta, 1e-12)

            streams = []
            names = []
            if "I" in self.mode:
                streams.append(tod)
                names.append("demod0")
            if "QU" in self.mode:
                # bandpass around the 4f line first so the (much larger)
                # intensity signal cannot leak into Q/U when the sky
                # orientation angle sweeps quickly (reference
                # demodulation.py:737-740)
                bpf = bandpass_kernel(
                    max(self.fmin_4f * hwp_rate, fmod - fmax),
                    min(self.fmax_4f * hwp_rate, 0.499 * rate),
                    rate, window=self.window,
                )
                bandpassed = _batched_fir(tod, bpf)
                streams.append(bandpassed * 2.0 * wts[..., 1] * etainv)
                names.append("demod4r")
                streams.append(bandpassed * 2.0 * wts[..., 2] * etainv)
                names.append("demod4i")
            if self.do_2f:
                # 2f streams for gain / HWPSS studies (reference
                # demodulation.py:741-765).  The reference reconstructs the
                # half-angle branch from the weights; here the exact 2f
                # reference phase is half the unwrapped 4f phase.
                bpf2 = bandpass_kernel(
                    self.fmin_2f * hwp_rate,
                    min(self.fmax_2f * hwp_rate, 0.499 * rate),
                    rate, window=self.window,
                )
                bp2 = _batched_fir(tod, bpf2)
                phase4 = np.unwrap(
                    np.arctan2(np.asarray(wts[..., 2]), np.asarray(wts[..., 1])),
                    axis=-1,
                )
                ph2 = jnp.asarray(0.5 * phase4, dtype=jnp.float32)
                streams.append(bp2 * jnp.cos(ph2))
                names.append("demod2r")
                streams.append(bp2 * jnp.sin(ph2))
                names.append("demod2i")
            stacked = jnp.concatenate(streams, axis=0)
            filtered = _batched_fir(stacked, kernel)
            filtered = filtered[:, :: self.nskip]

            # build the demodulated observation
            n_new = filtered.shape[1]
            demod_dets = [f"{p}_{d}" for p in names for d in dets]
            fp = ob.telescope.focalplane
            new_cols = {}
            for key, col in fp.detector_data.items():
                vals = []
                for p in names:
                    for d in dets:
                        vals.append(col[fp.detector_index(d)])
                new_cols[key] = np.array(vals, dtype=col.dtype if hasattr(col, "dtype") else object)
            new_cols["name"] = np.array(demod_dets, dtype=object)
            from ..models.instrument import Focalplane, Telescope

            from ..utils.units import Quantity as Qty

            demod_fp = Focalplane(
                detector_data=new_cols,
                sample_rate=Qty(rate / self.nskip, u.Hz),
                field_of_view=fp.field_of_view,
            )
            demod_tele = Telescope(
                ob.telescope.name,
                uid=ob.telescope.uid,
                focalplane=demod_fp,
                site=ob.telescope.site,
            )
            demod_ob = Observation(
                data.comm,
                demod_tele,
                n_new,
                name=f"demod_{ob.name}",
                uid=ob.uid,
                session=ob.session,
            )
            demod_ob.shared.create_column(self.times, (n_new,))
            demod_ob.shared.set(self.times, times[:: self.nskip][:n_new])
            if self.shared_flags is not None and self.shared_flags in ob.shared:
                sf = np.asarray(ob.shared[self.shared_flags])
                demod_ob.shared.create_column(
                    self.shared_flags, (n_new,), dtype=np.uint8
                )
                demod_ob.shared.set(
                    self.shared_flags, sf[:: self.nskip][:n_new]
                )
            if self.det_flags is not None and self.det_flags in ob.detdata:
                # propagate detector flags: OR over the filter support window
                # approximated by max-pooling over nskip (reference
                # _demodulate_flags widens by the kernel length)
                df = np.asarray(ob.detdata[self.det_flags].data[didx])
                n_pool = n_new * self.nskip
                pooled = np.zeros((len(dets), n_new), dtype=np.uint8)
                dfp = np.pad(df, ((0, 0), (0, max(0, n_pool - df.shape[1]))))
                pooled = np.bitwise_or.reduce(
                    dfp[:, :n_pool].reshape(len(dets), n_new, self.nskip), axis=2
                )
                demod_ob.detdata.create(
                    self.det_flags, dtype=np.uint8,
                )
                demod_ob.detdata[self.det_flags].data = np.tile(
                    pooled, (len(names), 1)
                )
            demod_ob.detdata.create(
                self.det_data, units=ob.detdata[self.det_data].units
            )
            demod_ob.detdata[self.det_data].data = filtered
            # propagate pointing (per parent detector, downsampled)
            if defaults.quats in ob.detdata:
                q = ob.detdata[defaults.quats].data[didx][:, :: self.nskip][:, :n_new]
                qall = jnp.concatenate([q] * len(names), axis=0)
                demod_ob.detdata.create(
                    defaults.quats, sample_shape=(4,), dtype=np.float32
                )
                demod_ob.detdata[defaults.quats].data = qall
            # demodulated noise model
            if self.noise_model is not None and self.noise_model in ob:
                demod_ob[self.noise_model] = self._demod_noise(
                    ob[self.noise_model], dets, names, rate, fmod, kernel
                )
            self.demod_data.obs.append(demod_ob)
            if self.purge:
                del ob.detdata[self.det_data]
        return

    def _demod_noise(self, nse, dets, names, rate, fmod, kernel):
        """Approximate demodulated PSDs: lowpassed original (demod0) or the
        4f sideband level (demod4r/4i), on the downsampled grid."""
        new_nyq = rate / self.nskip / 2.0
        freqs = {}
        psds = {}
        kgrid = np.fft.rfftfreq(4096, 1.0 / rate)
        H2 = np.abs(np.fft.rfft(kernel, 4096)) ** 2
        for p in names:
            for d in dets:
                name = f"{p}_{d}"
                f_orig = nse.freq(d).to_value(u.Hz)
                p_orig = nse.psd(d).to_value(u.K2_s)
                fgrid = np.linspace(f_orig[0], new_nyq, 128)
                h2 = np.interp(fgrid, kgrid, H2)
                if p == "demod0":
                    base = np.interp(fgrid, f_orig, p_orig)
                else:
                    f_line = fmod if p.startswith("demod4") else 0.5 * fmod
                    side = np.interp(
                        [min(f_line, f_orig[-1])], f_orig, p_orig
                    )[0]
                    base = 2.0 * side * np.ones_like(fgrid)
                psds[name] = base * h2
                freqs[name] = fgrid
        return Noise(detectors=list(psds.keys()), freqs=freqs, psds=psds)

    def _provides(self):
        return {"global": [], "meta": [], "detdata": [], "shared": [], "intervals": []}


class StokesWeightsDemod(Operator):
    """Trivial Stokes weights for demodulated pseudo-detectors
    (reference ``demodulation.py:~1031``)."""

    mode = Unicode("IQU", help="Must be IQU")
    weights = Unicode(defaults.weights)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            fp = ob.telescope.focalplane
            eps_col = fp.column("pol_leakage")
            n = ob.n_local_samples
            ob.detdata.ensure(
                self.weights, sample_shape=(3,), dtype=np.float32, detectors=dets
            )
            field = ob.detdata[self.weights]
            w = np.zeros((len(dets), n, 3), dtype=np.float32)
            for i, det in enumerate(dets):
                eps = float(eps_col[fp.detector_index(det)]) if eps_col is not None else 0.0
                eta = (1.0 - eps) / (1.0 + eps)
                if det.startswith("demod0"):
                    w[i, :, 0] = 1.0
                elif det.startswith("demod4r"):
                    w[i, :, 1] = eta
                elif det.startswith("demod4i"):
                    w[i, :, 2] = eta
            didx = ob.detector_indices(dets)
            field.data = field.data.at[didx].set(jnp.asarray(w))

    def _provides(self):
        return {"global": [], "meta": [], "detdata": [self.weights], "shared": [], "intervals": []}
