"""Additional destriping templates.

Rebuilds of ``src/toast/templates/subharmonic.py:20`` (``SubHarmonic``),
``templates/periodic.py:25`` (``Periodic``), ``templates/fourier2d.py:27``
(``Fourier2D``), and ``templates/gaintemplate.py:18`` (``GainTemplate``).

Each follows the same batched pattern as Offset: per-observation amplitude
blocks, jitted projection via basis matmuls (MXU), diagonal preconditioners.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config.traits import Int, Quantity, Unicode
from ..models.defaults import default_values as defaults
from ..utils import units as u
from ..utils.misc import rate_from_times
from ..utils.timing import function_timer
from ..utils.units import Quantity as Qty
from .amplitudes import Amplitudes
from .template import Template


@jax.jit
def _basis_add(tod, basis, amps2d):
    # tod (d, n) += basis (n, k) @ amps (d, k)
    return tod + jnp.einsum("nk,dk->dn", basis, amps2d)


@jax.jit
def _basis_project(tod, good, basis):
    return jnp.einsum("dn,nk->dk", tod * good, basis)


class _BasisTemplate(Template):
    """Shared machinery: per-obs shared basis, per-detector amplitudes."""

    def _make_basis(self, ob, dets):
        raise NotImplementedError

    def _initialize(self, new_data):
        self._obs_info = []
        offset = 0
        for ob in new_data.obs:
            dets = ob.select_local_detectors(flagmask=self.det_flag_mask)
            if len(dets) == 0:
                continue
            basis = self._make_basis(ob, dets)  # (n_samp, k)
            if basis is None:
                continue
            k = basis.shape[-1]
            good = self._good_mask(ob, dets)
            det_weights = np.ones(len(dets))
            if defaults.noise_model in ob:
                nse = ob[defaults.noise_model]
                det_weights = np.array(
                    [nse.detector_weight(d).value for d in dets]
                )
            # diagonal preconditioner: 1 / (w_det * sum basis^2 over good)
            b2 = np.einsum(
                "dn,nk->dk", good.astype(np.float64), np.asarray(basis) ** 2
            )
            precond = 1.0 / np.maximum(det_weights[:, None] * b2, 1e-30)
            self._obs_info.append(
                {
                    "ob": ob,
                    "dets": dets,
                    "det_idx": ob.detector_indices(dets),
                    "offset": offset,
                    "k": k,
                    "n_amp": len(dets) * k,
                    "basis": jnp.asarray(basis, dtype=jnp.float32),
                    "good": jnp.asarray(good.astype(np.float32)),
                    "precond": jnp.asarray(
                        precond.astype(np.float32).reshape(-1)
                    ),
                }
            )
            offset += len(dets) * k
        self._n_local = offset

    def _good_mask(self, ob, dets):
        n_samp = ob.n_local_samples
        good = np.ones((len(dets), n_samp), dtype=bool)
        if self.det_flags is not None and self.det_flags in ob.detdata:
            df = ob.detdata[self.det_flags].numpy()
            didx = ob.detector_indices(dets)
            good &= (df[didx] & self.det_flag_mask) == 0
        return good

    def detectors(self):
        dets = []
        for info in self._obs_info:
            for d in info["dets"]:
                if d not in dets:
                    dets.append(d)
        return dets

    def _zeros(self):
        return Amplitudes(self._data.comm, self._n_local, self._n_local)

    @function_timer
    def add_to_signal_batch(self, amplitudes, **kwargs):
        for info in self._obs_info:
            ob = info["ob"]
            field = ob.detdata[self.det_data]
            amps2d = amplitudes.local[
                info["offset"] : info["offset"] + info["n_amp"]
            ].reshape(len(info["dets"]), info["k"])
            tod = field.data[info["det_idx"]]
            field.data = field.data.at[info["det_idx"]].set(
                _basis_add(tod, info["basis"], amps2d)
            )

    @function_timer
    def project_signal_batch(self, amplitudes, **kwargs):
        chunks = []
        for info in self._obs_info:
            ob = info["ob"]
            tod = ob.detdata[self.det_data].data[info["det_idx"]]
            proj = _basis_project(tod, info["good"], info["basis"])
            chunks.append(proj.reshape(-1))
        if chunks:
            amplitudes.local = amplitudes.local + jnp.concatenate(chunks)
            amplitudes.apply_flags()

    def _add_to_signal(self, detector, amplitudes, **kwargs):
        for info in self._obs_info:
            if detector not in info["dets"]:
                continue
            di = info["dets"].index(detector)
            row = int(info["det_idx"][di])
            ob = info["ob"]
            field = ob.detdata[self.det_data]
            amps2d = amplitudes.local[
                info["offset"] : info["offset"] + info["n_amp"]
            ].reshape(len(info["dets"]), info["k"])
            tod = field.data[row : row + 1]
            field.data = field.data.at[row : row + 1].set(
                _basis_add(tod, info["basis"], amps2d[di : di + 1])
            )

    def _project_signal(self, detector, amplitudes, **kwargs):
        full = amplitudes.local
        for info in self._obs_info:
            if detector not in info["dets"]:
                continue
            di = info["dets"].index(detector)
            row = int(info["det_idx"][di])
            ob = info["ob"]
            tod = ob.detdata[self.det_data].data[row : row + 1]
            proj = _basis_project(tod, info["good"][di : di + 1], info["basis"])
            start = info["offset"] + di * info["k"]
            full = full.at[start : start + info["k"]].add(proj.reshape(-1))
        amplitudes.local = full
        amplitudes.apply_flags()

    def _apply_precond(self, amps_in, amps_out, **kwargs):
        precond = (
            jnp.concatenate([info["precond"] for info in self._obs_info])
            if self._obs_info
            else jnp.zeros(0)
        )
        amps_out.local = amps_in.local * precond


class SubHarmonic(_BasisTemplate):
    """Per-observation polynomial modes below the baseline length
    (reference ``templates/subharmonic.py:20``)."""

    order = Int(1, help="Polynomial order")

    def _make_basis(self, ob, dets):
        from ..ops.kernels.filters import legendre_basis

        n = ob.n_local_samples
        x = jnp.linspace(-1.0, 1.0, n)
        return np.asarray(legendre_basis(x, self.order))


class Periodic(_BasisTemplate):
    """Amplitudes binned on a periodic (or any) shared variable
    (reference ``templates/periodic.py:25``), e.g. HWP angle or azimuth."""

    key = Unicode(defaults.azimuth, help="Shared data key to bin on")
    bins = Int(10, help="Number of bins")
    is_periodic = Int(1, help="Treat the variable as an angle (wraps at 2 pi)")

    def _make_basis(self, ob, dets):
        if self.key not in ob.shared:
            return None
        vals = np.asarray(ob.shared[self.key], dtype=np.float64)
        if self.is_periodic:
            vals = vals % (2 * np.pi)
            edges = np.linspace(0, 2 * np.pi, self.bins + 1)
        else:
            edges = np.linspace(vals.min(), vals.max() + 1e-9, self.bins + 1)
        idx = np.clip(np.digitize(vals, edges) - 1, 0, self.bins - 1)
        basis = np.zeros((len(vals), self.bins), dtype=np.float32)
        basis[np.arange(len(vals)), idx] = 1.0
        return basis


class Fourier2D(_BasisTemplate):
    """Time-drifting 2D focalplane Fourier modes (atmosphere proxy,
    reference ``templates/fourier2d.py:27``).

    Unlike the generic basis templates, the modes couple detectors through
    their focalplane positions: amplitude a_{m,t_coarse} multiplies mode
    value f_m(det) at coarse time t.  Implemented by building a per-detector
    basis = mode value x coarse-time boxcar.
    """

    order = Int(1, help="Fourier mode order across the focalplane")
    fit_subharmonics = Int(1, help="Include gradient modes")
    correlation_length = Quantity(
        Qty(10.0, u.second), help="Coarse time step of the drifting amplitudes"
    )

    def _initialize(self, new_data):
        from ..math import qarray as qa

        self._obs_info = []
        offset = 0
        for ob in new_data.obs:
            dets = ob.select_local_detectors(flagmask=self.det_flag_mask)
            if len(dets) == 0:
                continue
            n = ob.n_local_samples
            times = np.asarray(ob.shared[defaults.times])
            (rate, _, _, _, _) = rate_from_times(times)
            step = max(1, int(self.correlation_length.to_value(u.second) * rate))
            n_coarse = -(-n // step)
            fp = ob.telescope.focalplane
            quats = np.array([fp[d]["quat"] for d in dets])
            theta, phi, _ = qa.to_iso_angles(quats)
            x = theta * np.cos(phi)
            y = theta * np.sin(phi)
            scale = max(np.abs(x).max(), np.abs(y).max(), 1e-12)
            x = x / scale
            y = y / scale
            modes = [np.ones(len(dets))]
            for m in range(1, self.order + 1):
                modes += [
                    np.cos(np.pi * m * x), np.sin(np.pi * m * x),
                    np.cos(np.pi * m * y), np.sin(np.pi * m * y),
                ]
            modes = np.stack(modes, axis=-1)  # (n_det, n_mode)
            n_mode = modes.shape[-1]
            good = self._good_mask(ob, dets)
            det_weights = np.ones(len(dets))
            if defaults.noise_model in ob:
                nse = ob[defaults.noise_model]
                det_weights = np.array(
                    [nse.detector_weight(d).value for d in dets]
                )
            # precond: per (mode, coarse) amplitude, sum over dets/samples of
            # w_det * mode^2
            pad = n_coarse * step - n
            goodp = np.pad(good, ((0, 0), (0, pad)))
            n_good = goodp.reshape(len(dets), n_coarse, step).sum(axis=-1)
            m2w = np.einsum("dm,d->dm", modes**2, det_weights)
            denom = np.einsum("dm,dc->mc", m2w, n_good)
            precond = 1.0 / np.maximum(denom, 1e-30)
            self._obs_info.append(
                {
                    "ob": ob,
                    "dets": dets,
                    "det_idx": ob.detector_indices(dets),
                    "offset": offset,
                    "n_mode": n_mode,
                    "n_coarse": n_coarse,
                    "step": step,
                    "n_amp": n_mode * n_coarse,
                    "modes": jnp.asarray(modes.astype(np.float32)),
                    "good": jnp.asarray(good.astype(np.float32)),
                    "precond": jnp.asarray(
                        precond.astype(np.float32).reshape(-1)
                    ),
                }
            )
            offset += n_mode * n_coarse
        self._n_local = offset

    def _zeros(self):
        return Amplitudes(self._data.comm, self._n_local, self._n_local)

    @function_timer
    def add_to_signal_batch(self, amplitudes, **kwargs):
        for info in self._obs_info:
            ob = info["ob"]
            field = ob.detdata[self.det_data]
            n = ob.n_local_samples
            amps = amplitudes.local[
                info["offset"] : info["offset"] + info["n_amp"]
            ].reshape(info["n_mode"], info["n_coarse"])
            cidx = jnp.arange(n, dtype=jnp.int32) // info["step"]
            per_coarse = amps[:, cidx]  # (n_mode, n)
            tod_add = info["modes"] @ per_coarse  # (n_det, n)
            field.data = field.data.at[info["det_idx"]].add(tod_add)

    @function_timer
    def project_signal_batch(self, amplitudes, **kwargs):
        chunks = []
        for info in self._obs_info:
            ob = info["ob"]
            tod = ob.detdata[self.det_data].data[info["det_idx"]] * info["good"]
            # project: a_{m,c} = sum_d mode_{d,m} sum_{t in c} tod_{d,t}
            n = tod.shape[1]
            pad = info["n_coarse"] * info["step"] - n
            seg = jnp.pad(tod, ((0, 0), (0, pad))).reshape(
                tod.shape[0], info["n_coarse"], info["step"]
            ).sum(axis=-1)  # (n_det, n_coarse)
            proj = info["modes"].T @ seg  # (n_mode, n_coarse)
            chunks.append(proj.reshape(-1))
        if chunks:
            amplitudes.local = amplitudes.local + jnp.concatenate(chunks)
            amplitudes.apply_flags()

    def _apply_precond(self, amps_in, amps_out, **kwargs):
        precond = (
            jnp.concatenate([info["precond"] for info in self._obs_info])
            if self._obs_info
            else jnp.zeros(0)
        )
        amps_out.local = amps_in.local * precond

    def _good_mask(self, ob, dets):
        n_samp = ob.n_local_samples
        good = np.ones((len(dets), n_samp), dtype=bool)
        if self.det_flags is not None and self.det_flags in ob.detdata:
            df = ob.detdata[self.det_flags].numpy()
            didx = ob.detector_indices(dets)
            good &= (df[didx] & self.det_flag_mask) == 0
        return good


class GainTemplate(_BasisTemplate):
    """Gain fluctuation amplitudes with Legendre time dependence multiplying
    a reference signal estimate (reference ``templates/gaintemplate.py:18``)."""

    order = Int(1, help="Legendre order of the gain drift")
    template_name = Unicode(
        None, allow_none=True, help="Detdata key with the reference signal"
    )

    def _make_basis(self, ob, dets):
        # basis shared across detectors uses the time Legendre; the
        # per-detector reference signal enters through add/project overrides
        from ..ops.kernels.filters import legendre_basis

        n = ob.n_local_samples
        x = jnp.linspace(-1.0, 1.0, n)
        return np.asarray(legendre_basis(x, self.order))

    def _ref(self, info):
        ob = info["ob"]
        key = self.template_name if self.template_name is not None else self.det_data
        return ob.detdata[key].data[info["det_idx"]]

    @function_timer
    def add_to_signal_batch(self, amplitudes, **kwargs):
        for info in self._obs_info:
            ob = info["ob"]
            field = ob.detdata[self.det_data]
            amps2d = amplitudes.local[
                info["offset"] : info["offset"] + info["n_amp"]
            ].reshape(len(info["dets"]), info["k"])
            gain = jnp.einsum("nk,dk->dn", info["basis"], amps2d)
            ref = self._ref(info)
            field.data = field.data.at[info["det_idx"]].add(gain * ref)

    @function_timer
    def project_signal_batch(self, amplitudes, **kwargs):
        chunks = []
        for info in self._obs_info:
            ob = info["ob"]
            tod = ob.detdata[self.det_data].data[info["det_idx"]]
            ref = self._ref(info)
            proj = jnp.einsum(
                "dn,nk->dk", tod * ref * info["good"], info["basis"]
            )
            chunks.append(proj.reshape(-1))
        if chunks:
            amplitudes.local = amplitudes.local + jnp.concatenate(chunks)
            amplitudes.apply_flags()
