"""HWPSS modeling and demodulation post-processing operators.

Rebuilds of ``src/toast/ops/hwpss_model.py`` (``HWPSynchronousModel``),
``ops/t2pfilter.py`` (``T2PFilter``), and ``ops/demod_common_mode.py``
(``DemodCommonModeFilter``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Float, Int, Unicode
from ..hwp_utils import hwpss_samples
from ..models.defaults import default_values as defaults
from ..utils.timing import function_timer
from .kernels.filters import fit_and_subtract
from .operator import Operator
from .polyfilter import _good


class HWPSynchronousModel(Operator):
    """Fit and optionally remove a time-drifting HWPSS model, optionally
    solving for relative gains (reference ``ops/hwpss_model.py``)."""

    det_data = Unicode(defaults.det_data)
    hwp_angle = Unicode(defaults.hwp_angle)
    harmonics = Int(9, help="Number of HWPSS harmonics")
    time_drift = Bool(False, help="Allow linear drift of the harmonics")
    subtract_model = Bool(True, help="Subtract the fitted model")
    save_model = Bool(False, help="Store coefficients in the observation")
    relcal_fixed = Bool(False, help="Solve relative gains from 2f amplitude")
    model_key = Unicode("hwpss_model", help="Observation key for coefficients")
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_nonscience)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_invalid)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            if self.hwp_angle not in ob.shared:
                continue
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            chi = np.asarray(ob.shared[self.hwp_angle]).astype(np.float64)
            n = len(chi)
            drift = 1 if self.time_drift else 0
            basis_np = hwpss_samples(n, chi, self.harmonics, drift)
            basis = jnp.asarray(basis_np.astype(np.float32))
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.det_data]
            tod = field.data[didx]
            good = _good(
                ob, didx, self.det_flags, self.det_flag_mask,
                self.shared_flags, self.shared_flag_mask,
            )
            # fit coefficients (same normal equations as fit_and_subtract)
            wb = good[..., None] * basis[None]
            ata = jnp.einsum("dnk,dnl->dkl", wb, basis[None] * good[..., None])
            k = basis.shape[-1]
            ata = ata + 1e-10 * jnp.eye(k, dtype=ata.dtype)[None]
            atd = jnp.einsum("dnk,dn->dk", wb, tod)
            coeff = jnp.linalg.solve(ata, atd[..., None])[..., 0]
            if self.save_model:
                ob[self.model_key] = {
                    d: np.asarray(coeff[i]) for i, d in enumerate(dets)
                }
            if self.relcal_fixed:
                # relative gains from the 2f cos/sin amplitude magnitude
                stride = 2 * (drift + 1)
                i2f = stride  # harmonic k=2 block start
                amp2f = np.sqrt(
                    np.asarray(coeff[:, i2f]) ** 2
                    + np.asarray(coeff[:, i2f + drift + 1]) ** 2
                )
                mean_amp = np.mean(amp2f[amp2f > 0]) if np.any(amp2f > 0) else 1.0
                gains = {
                    d: float(mean_amp / a) if a > 0 else 1.0
                    for d, a in zip(dets, amp2f)
                }
                ob["hwpss_relcal"] = gains
            if self.subtract_model:
                model = jnp.einsum("nk,dk->dn", basis, coeff)
                field.data = field.data.at[didx].set(tod - model * good)


class T2PFilter(Operator):
    """Intensity-to-polarization leakage projection from demodulated data
    (reference ``ops/t2pfilter.py``): regress the demod0 (intensity) stream
    out of the demod4r/4i (polarization) streams per parent detector."""

    det_data = Unicode(defaults.det_data)
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_nonscience)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            parents = {}
            for det in dets:
                if det.startswith("demod0_"):
                    parents[det[len("demod0_"):]] = det
            if not parents:
                continue
            field = ob.detdata[self.det_data]
            for parent, idet in parents.items():
                intensity = jnp.asarray(field[idet])[None, :]
                basis = intensity.T  # (n, 1)
                for prefix in ("demod4r_", "demod4i_"):
                    pdet = f"{prefix}{parent}"
                    if pdet not in field._indices:
                        continue
                    row = field.index(pdet)
                    tod = field.data[row : row + 1]
                    good = jnp.ones_like(tod)
                    out = fit_and_subtract(basis, tod, good)
                    field.data = field.data.at[row : row + 1].set(out)


class DemodCommonModeFilter(Operator):
    """Project out common modes among demod4r / demod4i streams
    (reference ``ops/demod_common_mode.py``)."""

    det_data = Unicode(defaults.det_data)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        from .kernels.filters import common_mode_subtract

        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            field = ob.detdata[self.det_data]
            for prefix in ("demod4r_", "demod4i_"):
                group = [d for d in dets if d.startswith(prefix)]
                if len(group) < 2:
                    continue
                didx = ob.detector_indices(group)
                tod = field.data[didx]
                good = jnp.ones_like(tod)
                field.data = field.data.at[didx].set(
                    common_mode_subtract(tod, good)
                )
