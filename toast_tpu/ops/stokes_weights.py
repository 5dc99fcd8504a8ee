"""Stokes weight computation operator.

Rebuild of ``src/toast/ops/stokes_weights/stokes_weights.py:19``: computes
the I (or I/Q/U) pointing-matrix weights for each detector sample, with
optional HWP modulation, calibration, and the IAU sign convention.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Instance, Unicode
from ..models.defaults import default_values as defaults
from ..utils.timing import function_timer
from .kernels.pointing import stokes_weights_iqu as k_stokes_iqu
from .kernels.pointing import stokes_weights_iqu_fused as k_stokes_iqu_fused
from .operator import Operator, single_obs_view
from .pixels_healpix import _FUSE_QUATS_THRESHOLD


class StokesWeights(Operator):
    """Compute pointing-matrix Stokes weights ("I" or "IQU" modes)."""

    mode = Unicode("I", help="The Stokes weights to generate (I or IQU)")
    view = Unicode(None, allow_none=True, help="Restrict to this interval list")
    detector_pointing = Instance(
        klass=object, allow_none=True, help="PointingDetectorSimple instance"
    )
    quats = Unicode(defaults.quats, help="Detdata key for detector quaternions")
    weights = Unicode(defaults.weights, help="Output detdata key for weights")
    hwp_angle = Unicode(None, allow_none=True, help="Shared key for HWP angle")
    IAU = Bool(False, help="Use the IAU polarization convention")
    cal = Unicode(None, allow_none=True, help="Obs key with pol_angle calibration")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.mode not in ("I", "IQU"):
            raise RuntimeError(f"Invalid mode '{self.mode}'")
        nnz = 3 if self.mode == "IQU" else 1
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            # detector-pointing operator's quats key takes precedence
            quat_key = self.quats
            fused = None
            if self.detector_pointing is not None:
                quat_key = self.detector_pointing.quats
                if quat_key not in ob.detdata:
                    if (
                        self.mode == "IQU"
                        and len(dets) * ob.n_local_samples
                        > _FUSE_QUATS_THRESHOLD
                        and hasattr(self.detector_pointing, "kernel_inputs")
                    ):
                        # large block: fuse the boresight product into the
                        # weights kernel — the (n_det, n_samp, 4) quats
                        # intermediate never touches HBM
                        fused = self.detector_pointing.kernel_inputs(ob, dets)
                    else:
                        self.detector_pointing.exec(
                            single_obs_view(data, ob), detectors=dets
                        )
            fp = ob.telescope.focalplane
            n_det = len(dets)
            cal = np.ones(n_det)
            if self.cal is not None and self.cal in ob:
                caldict = ob[self.cal]
                cal = np.array([caldict.get(d, 1.0) for d in dets])
            if self.mode == "I":
                ob.detdata.ensure(
                    self.weights, sample_shape=(nnz,), dtype=np.float32,
                    detectors=dets,
                )
                w = jnp.broadcast_to(
                    jnp.asarray(cal, dtype=jnp.float32)[:, None, None],
                    (n_det, ob.n_local_samples, 1),
                )
                ob.detdata[self.weights].data = w
                continue

            eps_col = fp.column("pol_leakage")
            gamma_col = fp.column("gamma")
            eps = np.array(
                [
                    eps_col[fp.detector_index(d)] if eps_col is not None else 0.0
                    for d in dets
                ]
            )
            gamma = np.array(
                [
                    gamma_col[fp.detector_index(d)] if gamma_col is not None else 0.0
                    for d in dets
                ]
            )
            hwp = None
            if self.hwp_angle is not None and self.hwp_angle in ob.shared:
                hwp = ob.shared.jax_view(self.hwp_angle)
            if fused is None:
                quats = ob.detdata[quat_key].data
                cache_key = (id(quats), id(hwp), self.IAU, tuple(cal))
            else:
                cache_key = (
                    id(fused[1]), id(fused[2]), fused[3], id(hwp), self.IAU,
                    tuple(cal),
                )
            cache_tag = f"_cache_{self.weights}"
            # the presence test MUST precede detdata.ensure: ensure creates
            # a zero-filled array, and the fused-path cache key is built
            # from shared-array identities that legitimately persist across
            # Monte-Carlo realizations — checking after ensure would keep
            # the zeros (this exact bug zeroed run 2 of the flagship bench)
            if (
                self.weights in ob.detdata
                and ob._internal.get(cache_tag) == cache_key
            ):
                continue
            ob.detdata.ensure(
                self.weights, sample_shape=(nnz,), dtype=np.float32,
                detectors=dets,
            )
            ob._internal[cache_tag] = cache_key
            eps_j = jnp.asarray(eps, dtype=jnp.float32)
            gamma_j = jnp.asarray(gamma, dtype=jnp.float32)
            cal_j = jnp.asarray(cal, dtype=jnp.float32)
            if fused is None:
                w = k_stokes_iqu(quats, hwp, eps_j, gamma_j, cal_j, iau=self.IAU)
            else:
                w = k_stokes_iqu_fused(
                    *fused,
                    hwp if hwp is not None
                    else jnp.zeros((ob.n_local_samples,), jnp.float32),
                    eps_j, gamma_j, cal_j,
                    iau=self.IAU, has_hwp=hwp is not None,
                )
            ob.detdata[self.weights].data = w

    def _requires(self):
        return {
            "global": [],
            "meta": [],
            "detdata": [self.quats],
            "shared": [] if self.hwp_angle is None else [self.hwp_angle],
            "intervals": [] if self.view is None else [self.view],
        }

    def _provides(self):
        return {
            "global": [],
            "meta": [],
            "detdata": [self.weights],
            "shared": [],
            "intervals": [],
        }
