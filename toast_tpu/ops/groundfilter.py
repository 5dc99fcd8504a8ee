"""Ground (scan-synchronous) filter.

Rebuild of ``src/toast/ops/groundfilter.py:57``: regress Legendre
polynomials in azimuth (optionally plus an intercept/trend) out of each
detector's timestream — removes ground pickup that is fixed in azimuth.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Int, Unicode
from ..models.defaults import default_values as defaults
from ..utils.timing import function_timer
from .kernels.filters import fit_and_subtract, legendre_basis
from .operator import Operator
from .polyfilter import _good


class GroundFilter(Operator):
    """Fit and subtract azimuth-synchronous signal."""

    det_data = Unicode(defaults.det_data)
    azimuth = Unicode(defaults.azimuth)
    ground_flag_mask = Int(1, help="Flag bits to raise on failure")
    trend_order = Int(5, help="Order of the polynomial-in-time trend to include")
    filter_order = Int(5, help="Order of the Legendre-in-azimuth filter")
    detrend = Bool(False, help="Also remove a linear trend first")
    split_template = Bool(
        False, help="Separate templates for left/right going scans"
    )
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_nonscience)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_invalid)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            az = np.asarray(ob.shared[self.azimuth])
            azmin, azmax = az.min(), az.max()
            x = (2.0 * (az - azmin) / max(azmax - azmin, 1e-12) - 1.0).astype(
                np.float32
            )
            cols = [np.asarray(legendre_basis(jnp.asarray(x), self.filter_order))]
            if self.split_template:
                vel = np.gradient(az)
                right = (vel >= 0).astype(np.float32)[:, None]
                base = cols[0]
                cols = [base * right, base * (1.0 - right)]
            if self.trend_order > 0:
                t = np.linspace(-1.0, 1.0, ob.n_local_samples).astype(np.float32)
                # skip the constant term (already in the az template)
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
            "shared": [self.azimuth], "intervals": [],
        }

    def _provides(self):
        return {"global": [], "meta": [], "detdata": [self.det_data], "shared": [], "intervals": []}
