"""Instrument systematics simulation operators.

Rebuilds of ``src/toast/ops/gainscrambler.py`` (``GainScrambler``),
``ops/sim_gaindrifts.py`` (``GainDrifter``), ``ops/sim_crosstalk.py``
(``CrossTalk``), ``ops/time_constant.py`` (``TimeConstant``),
``ops/sim_cosmic_rays.py`` (``InjectCosmicRays``),
``ops/common_mode_noise.py`` (``CommonModeNoise``), and ``ops/sim_hwp.py``
(``PerturbHWP``).  All per-sample work is batched jnp; randomness comes
from the counter-based RNG keyed by (realization, detector/observation
UIDs) so every effect is reproducible.
"""

from __future__ import annotations

import re

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Float, Int, Quantity, Unicode
from ..math import rng as toast_rng
from ..math.fft import filter_fourier as _filter_fourier
from ..models.defaults import default_values as defaults
from ..models.noise import Noise
from ..utils import units as u
from ..utils.misc import name_UID, rate_from_times
from ..utils.timing import function_timer
from ..utils.units import Quantity as Qty
from .operator import Operator


def _det_uid(det):
    return int(name_UID(det)) & 0xFFFFFFFF


class GainScrambler(Operator):
    """Multiply timestreams by random gain errors
    (reference ``ops/gainscrambler.py``)."""

    det_data = Unicode(defaults.det_data)
    pattern = Unicode(".*", help="Regex of detectors to scramble")
    center = Float(1.0, help="Distribution center")
    sigma = Float(0.01, help="Gaussian width of the gain errors")
    realization = Int(0)
    component = Int(0)
    store = Bool(False, help="Store the gains in the observation")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        pat = re.compile(self.pattern)
        for ob in data.obs:
            dets = [d for d in ob.select_local_detectors(detectors) if pat.match(d)]
            if len(dets) == 0:
                continue
            sindx = int(ob.session.uid if ob.session else 0) & 0xFFFFFFFF
            gains = {}
            for det in dets:
                key1 = (self.realization << 16) | self.component
                key2 = (sindx << 16) ^ _det_uid(det)
                g = toast_rng.random(1, key=(key1, key2), sampler="gaussian")[0]
                gains[det] = self.center + g * self.sigma
            didx = ob.detector_indices(dets)
            gvec = jnp.asarray(
                np.array([gains[d] for d in dets], dtype=np.float32)
            )
            field = ob.detdata[self.det_data]
            field.data = field.data.at[didx].multiply(gvec[:, None])
            if self.store:
                ob[f"{self.name}_gains"] = gains


class GainDrifter(Operator):
    """Slow gain drifts (reference ``ops/sim_gaindrifts.py``).

    Modes: "linear_drift" (random slope per detector) or "slow_drift"
    (low-frequency 1/f-like drift synthesized from the RNG).
    """

    det_data = Unicode(defaults.det_data)
    mode = Unicode("linear_drift", help="linear_drift or slow_drift")
    sigma_drift = Float(1.0e-2, help="Fractional drift amplitude")
    drift_rate = Float(1.0e-3, help="Cutoff frequency fraction for slow_drift")
    realization = Int(0)
    component = Int(0)
    times = Unicode(defaults.times)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            n = ob.n_local_samples
            sindx = int(ob.session.uid if ob.session else 0) & 0xFFFFFFFF
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.det_data]
            drifts = np.empty((len(dets), n), dtype=np.float32)
            t = np.linspace(-0.5, 0.5, n)
            for i, det in enumerate(dets):
                key1 = (self.realization << 16) | (self.component + 1)
                key2 = (sindx << 16) ^ _det_uid(det)
                if self.mode == "linear_drift":
                    slope = toast_rng.random(1, key=(key1, key2), sampler="gaussian")[0]
                    drifts[i] = 1.0 + self.sigma_drift * slope * t
                else:
                    # slow drift: smooth random walk from low-pass filtered noise
                    g = toast_rng.random(n, key=(key1, key2), sampler="gaussian")
                    f = np.fft.rfftfreq(n)
                    spec = np.fft.rfft(g)
                    cutoff = max(self.drift_rate, 2.0 / n)
                    spec *= 1.0 / (1.0 + (f / cutoff) ** 2)
                    slow = np.fft.irfft(spec, n)
                    slow *= self.sigma_drift / max(slow.std(), 1e-12)
                    drifts[i] = 1.0 + slow
            field.data = field.data.at[didx].multiply(jnp.asarray(drifts))


class CrossTalk(Operator):
    """Readout crosstalk between detectors (reference ``ops/sim_crosstalk.py``).

    Applies ``d' = (I + X) d`` with a crosstalk matrix either supplied via
    the ``xtalk_mat_file``-style observation key or generated randomly at
    the given level.  The mixing is a single (n_det x n_det) @
    (n_det x n_samp) matmul — MXU work, unlike the reference's per-pair
    loops.
    """

    det_data = Unicode(defaults.det_data)
    xtalk_mat_key = Unicode(
        None, allow_none=True, help="Observation key holding a mixing dict"
    )
    xtalk_mat_file = Unicode(
        None,
        allow_none=True,
        help="npz file with a 'matrix' array over the focalplane detectors "
        "in order (reference read_xtalk_matrix, ops/sim_crosstalk.py:20)",
    )
    detector_ordering = Unicode("random", help="random or pairwise coupling")
    realization = Int(0)
    level = Float(1.0e-3, help="RMS crosstalk coupling if generated")

    def _xtalk_matrix(self, ob, dets, file_mat):
        """The off-diagonal coupling X for this observation's detectors."""
        n_det = len(dets)
        if file_mat is not None:
            alldets = ob.telescope.focalplane.detectors
            if len(alldets) > file_mat.shape[0]:
                raise ValueError(
                    f"crosstalk matrix {file_mat.shape} smaller than "
                    f"the {len(alldets)}-detector focalplane"
                )
            order = {d: i for i, d in enumerate(alldets)}
            sel = np.array([order[d] for d in dets])
            X = file_mat[np.ix_(sel, sel)].astype(np.float32)
            np.fill_diagonal(X, 0.0)
        elif self.xtalk_mat_key is not None and self.xtalk_mat_key in ob:
            matdict = ob[self.xtalk_mat_key]
            X = np.zeros((n_det, n_det), dtype=np.float32)
            for i, d1 in enumerate(dets):
                for j, d2 in enumerate(dets):
                    if d1 in matdict and d2 in matdict[d1]:
                        X[i, j] = matdict[d1][d2]
        else:
            sindx = int(ob.session.uid if ob.session else 0) & 0xFFFFFFFF
            g = toast_rng.random(
                n_det * n_det,
                key=((self.realization << 16) | 3, sindx),
                sampler="gaussian",
            ).reshape(n_det, n_det)
            X = (self.level * g).astype(np.float32)
            np.fill_diagonal(X, 0.0)
        return X

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        file_mat = None
        if self.xtalk_mat_file is not None:
            file_mat = np.load(self.xtalk_mat_file)["matrix"]
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            n_det = len(dets)
            if n_det == 0:
                continue
            X = self._xtalk_matrix(ob, dets, file_mat)
            mix = jnp.asarray(np.eye(n_det, dtype=np.float32) + X)
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.det_data]
            field.data = field.data.at[didx].set(mix @ field.data[didx])


class MitigateCrossTalk(CrossTalk):
    """Invert readout crosstalk (reference ``ops/sim_crosstalk.py:351``).

    Applies ``(I + X)^-1`` built from the same matrix sources as
    :class:`CrossTalk`; ``error_coefficients`` perturbs the inverse's
    entries by a relative gaussian error to model imperfect knowledge of
    the coupling (reference trait of the same name).
    """

    error_coefficients = Float(
        0.0, help="Relative rms error on the inverse matrix coefficients"
    )

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        file_mat = None
        if self.xtalk_mat_file is not None:
            file_mat = np.load(self.xtalk_mat_file)["matrix"]
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            n_det = len(dets)
            if n_det == 0:
                continue
            X = self._xtalk_matrix(ob, dets, file_mat)
            inv = np.linalg.inv(
                np.eye(n_det, dtype=np.float64) + X.astype(np.float64)
            )
            if self.error_coefficients > 0:
                sindx = int(ob.session.uid if ob.session else 0) & 0xFFFFFFFF
                g = toast_rng.random(
                    n_det * n_det,
                    key=((self.realization << 16) | 7, sindx),
                    sampler="gaussian",
                ).reshape(n_det, n_det)
                inv = inv * (1.0 + self.error_coefficients * np.asarray(g))
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.det_data]
            field.data = field.data.at[didx].set(
                jnp.asarray(inv.astype(np.float32)) @ field.data[didx]
            )


class DecimateFocalplane(Operator):
    """Disable all but every n-th pixel (reference
    ``ops/decimate_focalplane.py:17``): flags the skipped detectors in the
    observations' local detector flags so downstream selections drop them.
    """

    nskip = Int(10, help="Keep every nskip-th pixel")
    detectors_per_pixel = Int(
        1, help="Consecutive detectors sharing a pixel (2 typical, 3/6 demod)"
    )
    pixel_property = Unicode(
        None, allow_none=True,
        help="Focalplane column identifying pixels (overrides "
        "detectors_per_pixel)",
    )
    det_mask = Int(defaults.det_mask_invalid)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.nskip == 1:
            return
        for ob in data.obs:
            fp = ob.telescope.focalplane
            alldets = list(ob.all_detectors)
            if self.pixel_property is not None:
                pix_of = {
                    d: fp.detector_data[self.pixel_property][i]
                    for i, d in enumerate(fp.detector_data["name"])
                }
                pixels = []
                for d in alldets:
                    if pix_of[d] not in pixels:
                        pixels.append(pix_of[d])
                keep_pix = set(pixels[:: self.nskip])
                cut = [d for d in alldets if pix_of[d] not in keep_pix]
            else:
                dpp = max(1, self.detectors_per_pixel)
                cut = [
                    d
                    for i, d in enumerate(alldets)
                    if (i // dpp) % self.nskip != 0
                ]
            ob.update_local_detector_flags(
                {d: self.det_mask for d in cut}
            )


class TimeConstant(Operator):
    """Detector time-constant convolution/deconvolution
    (reference ``ops/time_constant.py``): one-pole filter
    ``H(f) = 1 / (1 + 2 pi i f tau)`` applied in the Fourier domain,
    batched over detectors."""

    det_data = Unicode(defaults.det_data)
    tau = Quantity(None, allow_none=True, help="Time constant")
    tau_sigma = Float(0.0, help="Fractional random spread of tau per detector")
    deconvolve = Bool(False, help="Remove the time constant instead")
    realization = Int(0)
    times = Unicode(defaults.times)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.tau is None:
            raise RuntimeError("tau trait must be set")
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            (rate, _, _, _, _) = rate_from_times(np.asarray(ob.shared[self.times]))
            n = ob.n_local_samples
            from ..math.fft import fourier_filter_freqs

            freqs = fourier_filter_freqs(n, rate)
            taus = np.full(len(dets), self.tau.to_value(u.second))
            if self.tau_sigma > 0:
                for i, det in enumerate(dets):
                    g = toast_rng.random(
                        1,
                        key=((self.realization << 16) | 5, _det_uid(det)),
                        sampler="gaussian",
                    )[0]
                    taus[i] *= 1.0 + g * self.tau_sigma
            H = 1.0 / (1.0 + 2.0j * np.pi * freqs[None, :] * taus[:, None])
            if self.deconvolve:
                H = 1.0 / H
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.det_data]
            tod = field.data[didx]
            field.data = field.data.at[didx].set(
                _filter_fourier(tod, H).astype(field.dtype)
            )


class InjectCosmicRays(Operator):
    """Cosmic ray glitches (reference ``ops/sim_cosmic_rays.py``):
    Poisson-distributed exponential-decay glitches per detector, plus
    optional focalplane-wide 'snowball' common events."""

    det_data = Unicode(defaults.det_data)
    glitch_rate = Float(0.01, help="Glitches per second per detector")
    glitch_amplitude = Float(1.0, help="Mean amplitude (same units as signal)")
    decay_time = Quantity(Qty(0.1, u.second), help="Exponential decay constant")
    include_common_mode = Bool(False, help="Add focalplane-wide events")
    common_rate = Float(0.001, help="Common events per second")
    crfile = Unicode(
        None,
        allow_none=True,
        help="Glitch-library npz pattern with a '{detector}' tag "
        "(reference ops/sim_cosmic_rays.py:48: 'direct_hits' parameter "
        "distribution resampled by inverse CDF per event)",
    )
    realization = Int(0)
    times = Unicode(defaults.times)

    def _library_amplitudes(self, det_index, n_events, key2):
        """Resample glitch amplitudes from the library distribution
        (reference resample_cosmic_ray_statistics, inverse-CDF draw)."""
        filename = self.crfile.replace("{detector}", f"det{det_index}")
        import os

        if not os.path.exists(filename):
            filename = self.crfile  # single shared library file
        lib = np.load(filename)
        hits = np.atleast_2d(np.asarray(lib["direct_hits"], dtype=np.float64))
        col = hits[:, 0] if hits.shape[1] else hits.ravel()
        lo, hi = np.quantile(col, [0.025, 0.975])
        bins = np.linspace(lo, hi, 30)
        binned, edges = np.histogram(col, bins=bins)
        xb = 0.5 * (edges[:-1] + edges[1:])
        cdf = np.cumsum(binned) / max(binned.sum(), 1)
        un = toast_rng.random(
            max(n_events, 1),
            key=((self.realization << 16) | 9, key2),
            sampler="uniform_01",
        )
        return np.interp(np.asarray(un[:n_events]), cdf, xb)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            (rate, _, _, _, _) = rate_from_times(np.asarray(ob.shared[self.times]))
            n = ob.n_local_samples
            decay = self.decay_time.to_value(u.second) * rate  # samples
            kernel_len = min(n, max(4, int(10 * decay)))
            kernel = np.exp(-np.arange(kernel_len) / decay).astype(np.float32)
            sindx = int(ob.session.uid if ob.session else 0) & 0xFFFFFFFF
            didx = ob.detector_indices(dets)
            extra = np.zeros((len(dets), n), dtype=np.float32)

            def make_events(key2, mean_events):
                un = toast_rng.random(
                    max(4, int(mean_events * 5 + 20)),
                    key=((self.realization << 16) | 7, key2),
                    sampler="uniform_01",
                )
                # Poisson by thinning: expected count = rate * duration
                n_events = int(np.round(mean_events))
                starts = (un[:n_events] * n).astype(int) if n_events else []
                amps = 1.0 + 0.5 * (un[n_events : 2 * n_events] - 0.5)
                return starts, amps

            mean_events = self.glitch_rate * n / rate
            for i, det in enumerate(dets):
                starts, amps = make_events(_det_uid(det) ^ sindx, mean_events)
                if self.crfile is not None and len(starts):
                    amps = self._library_amplitudes(
                        i, len(starts), _det_uid(det) ^ sindx
                    )
                for s, a in zip(starts, amps):
                    stop = min(n, s + kernel_len)
                    extra[i, s:stop] += (
                        self.glitch_amplitude * a * kernel[: stop - s]
                    )
            if self.include_common_mode:
                starts, amps = make_events(sindx, self.common_rate * n / rate)
                for s, a in zip(starts, amps):
                    stop = min(n, s + kernel_len)
                    extra[:, s:stop] += (
                        self.glitch_amplitude * a * kernel[: stop - s]
                    )
            field = ob.detdata[self.det_data]
            field.data = field.data.at[didx].add(jnp.asarray(extra))


class CommonModeNoise(Operator):
    """Add common-mode streams to a noise model's mixing matrix
    (reference ``ops/common_mode_noise.py``)."""

    noise_model = Unicode(defaults.noise_model)
    out_model = Unicode(None, allow_none=True)
    fmin = Quantity(Qty(1.0e-5, u.Hz))
    fknee = Quantity(Qty(1.0, u.Hz))
    alpha = Float(1.0)
    NET = Quantity(Qty(0.01, u.K_sqrt_s))
    coupling_strength_center = Float(1.0)
    coupling_strength_width = Float(0.0)
    realization = Int(0)
    focalplane_key = Unicode(None, allow_none=True, help="Group detectors by this")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            if self.noise_model not in ob:
                continue
            nse = ob[self.noise_model]
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            # one common stream for all (or per focalplane group)
            fp = ob.telescope.focalplane
            groups = {"all": dets}
            if self.focalplane_key is not None:
                col = fp.column(self.focalplane_key)
                groups = {}
                for d in dets:
                    groups.setdefault(str(col[fp.detector_index(d)]), []).append(d)

            freqs = {k: nse.freq(k).to_value(u.Hz) for k in nse.keys}
            psds = {k: nse.psd(k).to_value(u.K2_s) for k in nse.keys}
            mix = {d: dict(nse.mixing_matrix[d]) for d in nse.detectors}
            rate = 2.0 * freqs[nse.keys[0]][-1]
            nyq = rate / 2.0
            grid = freqs[nse.keys[0]]
            fk = self.fknee.to_value(u.Hz)
            fm = self.fmin.to_value(u.Hz)
            net = self.NET.to_value(u.K_sqrt_s)
            common_psd = (
                (grid**self.alpha + fk**self.alpha)
                / (grid**self.alpha + fm**self.alpha)
                * net**2
            )
            for gname, gdets in groups.items():
                skey = f"{self.name}_common_{gname}"
                freqs[skey] = grid
                psds[skey] = common_psd
                for d in gdets:
                    c = self.coupling_strength_center
                    if self.coupling_strength_width > 0:
                        g = toast_rng.random(
                            1,
                            key=((self.realization << 16) | 9, _det_uid(d)),
                            sampler="gaussian",
                        )[0]
                        c += g * self.coupling_strength_width
                    mix.setdefault(d, {})[skey] = c
            out_key = self.out_model if self.out_model is not None else self.noise_model
            ob[out_key] = Noise(
                detectors=nse.detectors, freqs=freqs, psds=psds, mixmatrix=mix
            )


class PerturbHWP(Operator):
    """HWP rotation irregularities (reference ``ops/sim_hwp.py``):
    drift and jitter added to the nominal HWP angle."""

    hwp_angle = Unicode(defaults.hwp_angle)
    drift_sigma = Float(0.0, help="Fractional rate drift over the observation")
    time_sigma = Quantity(Qty(0.0, u.second), help="Timing jitter RMS")
    realization = Int(0)
    times = Unicode(defaults.times)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            if self.hwp_angle not in ob.shared:
                continue
            ang = np.unwrap(np.asarray(ob.shared[self.hwp_angle]).astype(np.float64))
            n = len(ang)
            sindx = int(ob.session.uid if ob.session else 0) & 0xFFFFFFFF
            rate = np.gradient(ang)
            if self.drift_sigma:
                g = toast_rng.random(
                    1, key=((self.realization << 16) | 11, sindx), sampler="gaussian"
                )[0]
                drift = 1.0 + self.drift_sigma * g * np.linspace(-0.5, 0.5, n)
                ang = ang[0] + np.cumsum(rate * drift)
            if self.time_sigma.to_value(u.second) > 0:
                (samp_rate, _, _, _, _) = rate_from_times(
                    np.asarray(ob.shared[self.times])
                )
                jit = toast_rng.random(
                    n, key=((self.realization << 16) | 12, sindx), sampler="gaussian"
                )
                ang = ang + rate * jit * self.time_sigma.to_value(u.second) * samp_rate
            ob.shared.set(self.hwp_angle, np.mod(ang, 2 * np.pi))
