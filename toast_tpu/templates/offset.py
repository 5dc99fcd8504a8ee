"""Offset (destriping baseline) template.

Rebuild of ``src/toast/templates/offset/offset.py:34`` + its kernel triple
(``templates/offset/kernels*.py``, C++ ``toast_template_offset.cpp``):
piecewise-constant baseline offsets of fixed ``step_time`` per detector per
observation.

Amplitude layout: flat concatenation over observations of
``(n_det, n_baseline)`` blocks (detector-major, like the reference
``offset.py:241-253``).

TPU design: ``add_to_signal`` is a gather ``amps[det, samp // step]`` and
``project_signal`` is a reshape-and-sum over fixed-length segments — both
one jitted expression over the whole detector block, no per-detector or
per-baseline loops.  Sample flagging enters as a 0/1 mask.  The
default preconditioner is diagonal: 1 / (detector_weight * n_good) per
baseline (reference ``offset.py:268-344``).  With ``use_noise_prior`` a
circulant noise prior is applied: the baseline-offset PSD is interpolated
from the detector noise model, turned into a real-space correlation filter
(``_build_prior``), convolved with the amplitudes in ``_add_prior``, and
the matching circulant inverse is used as the preconditioner in
``_apply_precond`` (reference ``offset.py:592-618,884-910``).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..math.fft import irfft_batched as _irfft_b
from ..config.traits import Bool, Float, Quantity, Unicode
from ..models.defaults import default_values as defaults
from ..utils import units as u
from ..utils.timing import function_timer
from ..utils.units import Quantity as Qty
from .amplitudes import Amplitudes
from .template import Template


@partial(jax.jit, static_argnames=("mask", "step", "n_base"))
def _good_counts(det_flags, mask, step, n_base):
    """Good mask (f32) and per-baseline good counts, entirely on device."""
    n_det, n_samp = det_flags.shape
    good = ((det_flags.astype(jnp.uint32) & jnp.uint32(mask)) == 0).astype(
        jnp.float32
    )
    pad = n_base * step - n_samp
    gp = jnp.pad(good, ((0, 0), (0, pad)))
    n_good = jnp.sum(gp.reshape(n_det, n_base, step), axis=-1)
    return good, n_good


@partial(jax.jit, static_argnames=("step", "n_base"))
def _offset_add(tod, amps2d, step, n_base):
    # broadcast-reshape instead of a gather: amps2d[:, t // step] lowers to
    # a slow per-element gather on TPU, while broadcast -> reshape -> slice
    # is a pure layout stream
    n_det, n_samp = tod.shape
    expanded = jnp.broadcast_to(
        amps2d[:, :, None], (n_det, n_base, step)
    ).reshape(n_det, n_base * step)[:, :n_samp]
    return tod + expanded


@partial(jax.jit, static_argnames=("step", "n_base"))
def _offset_project(tod, good, step, n_base):
    n_det, n_samp = tod.shape
    pad = n_base * step - n_samp
    x = tod * good
    x = jnp.pad(x, ((0, 0), (0, pad)))
    return jnp.sum(x.reshape(n_det, n_base, step), axis=-1)


class Offset(Template):
    """Destriping baseline offsets."""

    step_time = Quantity(Qty(10000.0, u.second), help="Baseline step length")
    use_noise_prior = Bool(
        False,
        help="Gaussian prior on baseline correlations from the noise PSD",
    )
    precond_width = Float(20, help="Preconditioner width (API compat)")
    good_fraction = Float(
        0.5, help="Baselines with fewer good samples than this fraction are cut"
    )
    times = Unicode(defaults.times, help="Shared key for timestamps")
    noise_model = Unicode(
        defaults.noise_model, allow_none=True, help="Observation noise model key"
    )

    def _initialize(self, new_data):
        from ..utils.misc import rate_from_times

        self._obs_info = []
        offset = 0
        for ob in new_data.obs:
            dets = ob.select_local_detectors(flagmask=self.det_flag_mask)
            if len(dets) == 0:
                continue
            times = np.asarray(ob.shared[self.times])
            (rate, _, _, _, _) = rate_from_times(times)
            step = max(1, int(round(self.step_time.to_value(u.second) * rate)))
            n_samp = ob.n_local_samples
            n_base = -(-n_samp // step)
            n_amp = len(dets) * n_base

            det_weights = np.ones(len(dets))
            if self.noise_model is not None and self.noise_model in ob:
                nse = ob[self.noise_model]
                det_weights = np.array(
                    [nse.detector_weight(d).value for d in dets]
                )

            # good-sample mask (n_det, n_samp) — built and reduced on device;
            # only the tiny (n_det, n_base) count matrix moves to the host
            # (the reference reduces on the host; a 64-det x 262k-samp flag
            # fetch through a remote-TPU link costs seconds)
            didx = ob.detector_indices(dets)
            if self.det_flags is not None and self.det_flags in ob.detdata:
                df = ob.detdata[self.det_flags].data[didx]
                good_dev, n_good_dev = _good_counts(
                    df, int(self.det_flag_mask), step, n_base
                )
                n_good = np.asarray(n_good_dev)
            else:
                good_dev = jnp.ones((len(dets), n_samp), dtype=jnp.float32)
                n_good = np.full((len(dets), n_base), step, dtype=np.float64)
                n_good[:, -1] = n_samp - (n_base - 1) * step

            # per-baseline flags and preconditioner.  The good fraction is
            # relative to each baseline's ACTUAL length — the trailing
            # baseline is legitimately short (reference offset.py:328-334
            # divides by amplen, not the nominal step; dividing by the
            # nominal step cuts every amplitude of an observation shorter
            # than one step, silently turning the solve into a no-op)
            amp_len = np.full(n_base, step, dtype=np.float64)
            amp_len[-1] = n_samp - (n_base - 1) * step
            frac = n_good / amp_len[None, :]
            amp_flags = (frac <= self.good_fraction).astype(np.uint8)
            with np.errstate(divide="ignore"):
                precond = 1.0 / (det_weights[:, None] * n_good)
            precond[n_good == 0] = 0.0
            precond[amp_flags != 0] = 0.0

            info = {
                "ob": ob,
                "dets": dets,
                "det_idx": didx,
                "offset": offset,
                "step": step,
                "amp_len": amp_len,
                "n_base": n_base,
                "n_amp": n_amp,
                "good": good_dev,
                "amp_flags": amp_flags.reshape(-1),
                "precond": jnp.asarray(
                    precond.astype(np.float32).reshape(-1)
                ),
            }
            if (
                self.use_noise_prior
                and self.noise_model is not None
                and self.noise_model in ob
            ):
                info["prior_filter"], info["precond_filter"] = (
                    self._build_prior(
                        ob[self.noise_model], dets, step / rate, n_base,
                        det_weights, n_good,
                    )
                )
            self._obs_info.append(info)
            offset += n_amp
        self._n_local = offset

    def _build_prior(self, nse, dets, tau, n_base, det_weights, n_good):
        """Frequency-domain baseline prior (reference ``offset.py:342-370``).

        The baseline sequence (tau-averages at rate 1/tau) of noise with
        sample-variance convention var = PSD * rate has
        ``PSD_base(f) ~ PSD_tod(f)``; the white level is removed so the
        prior constrains only the correlated component
        (``offset.py:592-618``).  Returns per-detector rfft-domain filters:

        * prior C_a^-1(f) = tau / max(PSD_corr(f), eps)
        * preconditioner M^-1(f) = 1 / (w n_good_mean + C_a^-1(f))
          — a circulant approximation of the reference's banded Cholesky.
        """
        freqs = np.fft.rfftfreq(n_base, tau)
        prior = np.empty((len(dets), len(freqs)), dtype=np.float32)
        precond = np.empty_like(prior)
        for i, det in enumerate(dets):
            f_in = nse.freq(det).to_value(u.second**-1)
            p_in = nse.psd(det).to_value(u.K**2 * u.second)
            # white level from the top of the band
            white = np.median(p_in[f_in > 0.4 * f_in[-1]])
            p_corr = np.interp(
                np.maximum(freqs, f_in[0]), f_in, np.maximum(p_in - white, 0.0)
            )
            floor = max(1e-6 * white, 1e-30)
            cinv = tau / np.maximum(p_corr, floor)
            cinv[0] = 0.0  # no constraint on the mean
            prior[i] = cinv
            diag = det_weights[i] * max(np.mean(n_good[i]), 1.0)
            precond[i] = 1.0 / (diag + cinv)
        return jnp.asarray(prior), jnp.asarray(precond)


    def detectors(self):
        dets = []
        for info in self._obs_info:
            for d in info["dets"]:
                if d not in dets:
                    dets.append(d)
        return dets

    def _zeros(self):
        amps = Amplitudes(self._data.comm, self._n_local, self._n_local)
        flags = np.concatenate(
            [info["amp_flags"] for info in self._obs_info]
        ) if self._obs_info else np.zeros(0, dtype=np.uint8)
        amps.local_flags[:] = flags
        return amps

    # -- batched interface -------------------------------------------------
    @function_timer
    def add_to_signal_batch(self, amplitudes, **kwargs):
        for info in self._obs_info:
            ob = info["ob"]
            field = ob.detdata[self.det_data]
            n_det = len(info["dets"])
            amps2d = amplitudes.local[
                info["offset"] : info["offset"] + info["n_amp"]
            ].reshape(n_det, info["n_base"])
            tod = field.data[info["det_idx"]]
            new = _offset_add(tod, amps2d, info["step"], info["n_base"])
            field.data = field.data.at[info["det_idx"]].set(new)

    @function_timer
    def project_signal_batch(self, amplitudes, **kwargs):
        chunks = []
        for info in self._obs_info:
            ob = info["ob"]
            field = ob.detdata[self.det_data]
            tod = field.data[info["det_idx"]]
            proj = _offset_project(tod, info["good"], info["step"], info["n_base"])
            chunks.append(proj.reshape(-1))
        if chunks:
            amplitudes.local = amplitudes.local + jnp.concatenate(chunks)
            amplitudes.apply_flags()

    # -- per-detector API (reference compatibility) ------------------------
    def _add_to_signal(self, detector, amplitudes, **kwargs):
        for info in self._obs_info:
            if detector not in info["dets"]:
                continue
            ob = info["ob"]
            di = info["dets"].index(detector)
            field = ob.detdata[self.det_data]
            amps2d = amplitudes.local[
                info["offset"] : info["offset"] + info["n_amp"]
            ].reshape(len(info["dets"]), info["n_base"])
            row = int(info["det_idx"][di])
            tod = field.data[row : row + 1]
            new = _offset_add(tod, amps2d[di : di + 1], info["step"], info["n_base"])
            field.data = field.data.at[row : row + 1].set(new)

    def _project_signal(self, detector, amplitudes, **kwargs):
        chunks = []
        full = amplitudes.local
        for info in self._obs_info:
            if detector not in info["dets"]:
                continue
            ob = info["ob"]
            di = info["dets"].index(detector)
            row = int(info["det_idx"][di])
            field = ob.detdata[self.det_data]
            tod = field.data[row : row + 1]
            proj = _offset_project(
                tod, info["good"][di : di + 1], info["step"], info["n_base"]
            )
            start = info["offset"] + di * info["n_base"]
            full = full.at[start : start + info["n_base"]].add(proj.reshape(-1))
        amplitudes.local = full
        amplitudes.apply_flags()

    def _apply_precond(self, amps_in, amps_out, **kwargs):
        if self.use_noise_prior and any(
            "precond_filter" in info for info in self._obs_info
        ):
            out = amps_out.local
            for info in self._obs_info:
                sl = slice(info["offset"], info["offset"] + info["n_amp"])
                a2d = amps_in.local[sl].reshape(len(info["dets"]), info["n_base"])
                if "precond_filter" in info:
                    fd = jnp.fft.rfft(a2d, axis=-1) * info["precond_filter"]
                    res = _irfft_b(fd, info["n_base"], axis=-1)
                else:
                    res = a2d * info["precond"].reshape(a2d.shape)
                out = out.at[sl].set(res.reshape(-1))
            amps_out.local = out
            amps_out.apply_flags()
            return
        precond = jnp.concatenate(
            [info["precond"] for info in self._obs_info]
        ) if self._obs_info else jnp.zeros(0)
        amps_out.local = amps_in.local * precond

    def _add_prior(self, amps_in, amps_out, **kwargs):
        """amps_out += C_a^-1 amps_in via the rfft-domain prior filter
        (reference ``offset.py:884-910``)."""
        if not self.use_noise_prior:
            return
        out = amps_out.local
        for info in self._obs_info:
            if "prior_filter" not in info:
                continue
            sl = slice(info["offset"], info["offset"] + info["n_amp"])
            a2d = amps_in.local[sl].reshape(len(info["dets"]), info["n_base"])
            fd = jnp.fft.rfft(a2d, axis=-1) * info["prior_filter"]
            res = _irfft_b(fd, info["n_base"], axis=-1)
            out = out.at[sl].add(res.reshape(-1))
        amps_out.local = out
        amps_out.apply_flags()
