"""Scan sky signal from spherical-harmonic coefficients.

Rebuild of ``ref:src/toast/ops/scan_alm.py:31`` with a native SHT instead
of ducc0: the a_lm are (optionally beam-smoothed and) synthesized once onto
an equiangular band-limit-oversampled grid with the recurrence SHT in
:mod:`toast_tpu.math.sht`, then every detector sample is evaluated by
bicubic interpolation at its pointing angles and co-added with the
detector's Stokes weights.  All per-sample work is one jitted expression
over the whole (det, samp) block.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config.traits import Bool, Instance, Int, Unicode
from ..config.traits import Quantity as QuantityTrait
from ..math import qarray as qa
from ..math import sht
from ..models.defaults import default_values as defaults
from ..utils import units as u
from ..utils.timing import function_timer
from ..utils.units import Quantity
from .operator import Operator, single_obs_view


def _load_alm(source, data):
    """Resolve a_lm arrays from a Data key or a .npz file.

    Accepted forms: a dict with keys among {"T", "E", "B"} of dense
    complex (lmax+1, lmax+1) arrays, or a single array (T only).
    """
    if isinstance(source, str) and source in data:
        obj = data[source]
    elif isinstance(source, str):
        with np.load(source) as f:
            obj = {k: f[k] for k in f.files}
    else:
        obj = source
    if not isinstance(obj, dict):
        obj = {"T": np.asarray(obj)}
    out = {}
    for key in ("T", "E", "B"):
        if key in obj:
            out[key] = np.asarray(obj[key], dtype=np.complex128)
    if "T" not in out:
        raise ValueError("alm source must provide at least 'T'")
    return out


@jax.jit
def _quat_to_angles(quats):
    """Detector quaternions -> (theta, phi) of the pointing direction."""
    zaxis = jnp.asarray([0.0, 0.0, 1.0], dtype=quats.dtype)
    vd = qa.rotate(quats, jnp.broadcast_to(zaxis, quats.shape[:-1] + (3,)))
    theta = jnp.arccos(jnp.clip(vd[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(vd[..., 1], vd[..., 0])
    return theta, phi


class ScanAlm(Operator):
    """Scan a_lm sky signal into detector timestreams (native SHT)."""

    det_data = Unicode(defaults.det_data, help="Output detdata key")
    alm = Unicode(
        None,
        allow_none=True,
        help="Data key or .npz path providing T (and optionally E/B) a_lm",
    )
    lmax = Int(0, help="Band limit; 0 means infer from the alm array shape")
    fwhm = QuantityTrait(
        Quantity(0.0, u.deg), help="Additional Gaussian smoothing to apply"
    )
    pol = Bool(True, help="Scan Q/U if E/B alms are present")
    oversample = Int(4, help="Grid oversampling factor over the band limit")
    zero = Bool(False, help="Zero det_data before accumulating")
    subtract = Bool(False, help="Subtract instead of accumulate")
    quats = Unicode(defaults.quats, help="Detdata key for detector quats")
    weights = Unicode(defaults.weights, help="Detdata key for Stokes weights")
    detector_pointing = Instance(klass=object, allow_none=True)
    stokes_weights = Instance(klass=object, allow_none=True)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.alm is None:
            raise RuntimeError("ScanAlm requires the 'alm' trait")
        alms = _load_alm(self.alm, data)
        lmax = self.lmax if self.lmax > 0 else alms["T"].shape[0] - 1

        fwhm_rad = self.fwhm.to_value(u.rad)
        if fwhm_rad > 0:
            beam = sht.gaussian_beam(lmax, fwhm_rad)
            alms = {k: v[: lmax + 1, : lmax + 1] * beam[:, None] for k, v in alms.items()}
        else:
            alms = {k: v[: lmax + 1, : lmax + 1] for k, v in alms.items()}

        n_theta = max(self.oversample * (lmax + 1), 16)
        n_phi = 2 * n_theta
        T_grid = sht.synthesize_grid_T(jnp.asarray(alms["T"]), lmax, n_theta, n_phi)
        do_pol = self.pol and "E" in alms
        if do_pol:
            aB = alms.get("B", np.zeros_like(alms["E"]))
            Q_grid, U_grid = sht.synthesize_grid_pol(
                jnp.asarray(alms["E"]), jnp.asarray(aB), lmax, n_theta, n_phi
            )

        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            if self.quats not in ob.detdata and self.detector_pointing is not None:
                self.detector_pointing.exec(single_obs_view(data, ob), detectors=dets)
            if do_pol and self.weights not in ob.detdata:
                if self.stokes_weights is not None:
                    self.stokes_weights.exec(single_obs_view(data, ob), detectors=dets)
            quats = ob.detdata[self.quats].data
            theta, phi = _quat_to_angles(quats)
            tod = sht.grid_interpolate(T_grid, theta, phi)
            if do_pol:
                wts = ob.detdata[self.weights].data
                tod = (
                    tod * wts[..., 0]
                    + sht.grid_interpolate(Q_grid, theta, phi) * wts[..., 1]
                    + sht.grid_interpolate(U_grid, theta, phi) * wts[..., 2]
                )
            ob.detdata.ensure(self.det_data, units=u.K)
            prev = ob.detdata[self.det_data].data
            if self.zero:
                prev = jnp.zeros_like(prev)
            sign = -1.0 if self.subtract else 1.0
            ob.detdata[self.det_data].data = prev + sign * tod.astype(prev.dtype)

    def _requires(self):
        return {
            "global": [] if self.alm is None else [self.alm],
            "meta": [],
            "detdata": [self.quats],
            "shared": [],
            "intervals": [],
        }

    def _provides(self):
        return {
            "global": [],
            "meta": [],
            "detdata": [self.det_data],
            "shared": [],
            "intervals": [],
        }


class SimTotalconvolve(ScanAlm):
    """Beam-convolved sky scanning (reference ``ops/totalconvolve.py:39``).

    The reference delegates 4-pi convolution to ``ducc0.totalconvolve``.
    This native version implements the same Wandelt-Gorski factorization
    on the TPU SHT (``math/beam_convolve.py``):

    * azimuthally symmetric beams collapse to a smoothed-sky scan
      (``a^conv_lm = a_lm b_l0 sqrt(4 pi / (2l+1))``);
    * asymmetric beams (m' > 0 multipoles) build one complex ``C_m'``
      grid per beam mode and the detector signal is the psi-phase sum
      ``C_0 + 2 Re[e^{-i m' psi} C_m']`` at the per-sample Euler
      pointing, with psi the detector orientation about the line of
      sight — validated against an exact Wigner-D oracle
      (tests/test_beam_convolve.py).

    The asymmetric path convolves the temperature sky; polarized
    asymmetric beams (the T/E/B cross-cube) follow the same structure
    and are not yet wired.
    """

    beam = Unicode(
        None,
        allow_none=True,
        help="Data key or .npz path with beam alm ('T' dense array) or "
        "a 'bl' window vector",
    )

    def _exec(self, data, detectors=None, **kwargs):
        if self.beam is not None:
            import numpy as _np

            if isinstance(self.beam, str) and self.beam in data:
                bobj = data[self.beam]
            else:
                with _np.load(self.beam) as f:
                    bobj = {k: f[k] for k in f.files}
            alms = _load_alm(self.alm, data)
            lmax = self.lmax if self.lmax > 0 else alms["T"].shape[0] - 1
            beam_alm = None
            if "bl" in bobj:
                bl = _np.asarray(bobj["bl"], dtype=_np.float64)
            else:
                beam_alm = _np.asarray(
                    bobj["T"] if isinstance(bobj, dict) else bobj
                )
                asymmetric = False
                if beam_alm.ndim == 2 and beam_alm.shape[1] > 1:
                    m0_pow = _np.sum(_np.abs(beam_alm[:, 0]) ** 2)
                    rest = _np.sum(_np.abs(beam_alm[:, 1:]) ** 2)
                    asymmetric = rest > 1.0e-6 * max(m0_pow, 1e-30)
                if asymmetric:
                    self._exec_asymmetric(
                        data, alms, beam_alm, lmax, detectors
                    )
                    return
                ell = _np.arange(beam_alm.shape[0])
                bl = _np.real(beam_alm[:, 0]) * _np.sqrt(
                    4.0 * _np.pi / (2.0 * ell + 1.0)
                )
            if len(bl) < lmax + 1:
                bl = _np.pad(bl, (0, lmax + 1 - len(bl)))
            conv = {
                k: v[: lmax + 1, : lmax + 1] * bl[: lmax + 1, None]
                for k, v in alms.items()
            }
            key = f"_{self.name}_convolved_alm"
            data[key] = conv
            saved = self.alm
            self.alm = key
            try:
                super()._exec(data, detectors=detectors, **kwargs)
            finally:
                self.alm = saved
                del data[key]
            return
        super()._exec(data, detectors=detectors, **kwargs)

    def _exec_asymmetric(self, data, alms, beam_alm, lmax, detectors):
        """Full 4-pi convolution for an azimuthally asymmetric beam."""
        import numpy as _np

        from ..math.beam_convolve import (
            convolution_grids,
            convolve_samples,
            euler_zyz_from_quat,
        )
        from .operator import single_obs_view

        # beam mmax: last column with significant power
        power = _np.sum(_np.abs(beam_alm) ** 2, axis=0)
        mmax = int(_np.max(_np.nonzero(power > 1e-12 * power.max())[0]))
        blm = beam_alm[: lmax + 1, : mmax + 1]
        if blm.shape[0] < lmax + 1:
            blm = _np.pad(blm, ((0, lmax + 1 - blm.shape[0]), (0, 0)))
        n_theta = max(self.oversample * (lmax + 1), 16)
        grids_re, grids_im = convolution_grids(
            alms["T"][: lmax + 1, : lmax + 1], blm, lmax, mmax,
            n_theta=n_theta, n_phi=2 * n_theta,
        )
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            if self.quats not in ob.detdata and self.detector_pointing is not None:
                self.detector_pointing.exec(
                    single_obs_view(data, ob), detectors=dets
                )
            quats = ob.detdata[self.quats].data
            phi, theta, psi = euler_zyz_from_quat(quats)
            tod = convolve_samples(grids_re, grids_im, theta, phi, psi)
            ob.detdata.ensure(self.det_data, units=u.K)
            prev = ob.detdata[self.det_data].data
            if self.zero:
                prev = jnp.zeros_like(prev)
            sign = -1.0 if self.subtract else 1.0
            ob.detdata[self.det_data].data = prev + sign * tod.astype(
                prev.dtype
            )
