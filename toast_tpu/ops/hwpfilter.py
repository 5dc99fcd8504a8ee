"""HWP-synchronous signal filter.

Rebuild of ``src/toast/ops/hwpfilter.py:57``: regress harmonics of the HWP
angle (cos/sin k*chi, k=1..order) out of each detector's timestream,
optionally with a polynomial trend.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Int, Unicode
from ..models.defaults import default_values as defaults
from ..utils.timing import function_timer
from .kernels.filters import fit_and_subtract, legendre_basis
from .operator import Operator
from .polyfilter import _good


class HWPFilter(Operator):
    """Fit and subtract HWP-synchronous signal."""

    det_data = Unicode(defaults.det_data)
    hwp_angle = Unicode(defaults.hwp_angle)
    trend_order = Int(5, help="Order of the polynomial-in-time trend")
    filter_order = Int(8, help="Number of HWPSS harmonics")
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
            chi = np.asarray(ob.shared[self.hwp_angle]).astype(np.float32)
            cols = [np.ones((len(chi), 1), dtype=np.float32)]
            for k in range(1, self.filter_order + 1):
                cols.append(np.cos(k * chi)[:, None])
                cols.append(np.sin(k * chi)[:, None])
            if self.trend_order > 0:
                t = np.linspace(-1.0, 1.0, len(chi)).astype(np.float32)
                trend = np.asarray(legendre_basis(jnp.asarray(t), self.trend_order))
                cols.append(trend[:, 1:])
            basis = jnp.asarray(np.concatenate(cols, axis=-1))
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.det_data]
            tod = field.data[didx]
            good = _good(
                ob, didx, self.det_flags, self.det_flag_mask,
                self.shared_flags, self.shared_flag_mask,
            )
            field.data = field.data.at[didx].set(
                fit_and_subtract(basis, tod, good)
            )

    def _requires(self):
        return {
            "global": [], "meta": [], "detdata": [self.det_data],
            "shared": [self.hwp_angle], "intervals": [],
        }

    def _provides(self):
        return {"global": [], "meta": [], "detdata": [self.det_data], "shared": [], "intervals": []}
