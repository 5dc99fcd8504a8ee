"""Noise model operators.

Rebuild of ``src/toast/ops/noise_model.py``: ``DefaultNoiseModel`` (``:24``)
builds an :class:`~toast_tpu.models.noise.AnalyticNoise` from focalplane
``psd_*`` columns and stores it in each observation.
"""

from __future__ import annotations

import numpy as np

from ..config.traits import Unicode
from ..models.defaults import default_values as defaults
from ..models.noise import AnalyticNoise
from ..utils import units as u
from ..utils.units import Quantity as Qty
from .operator import Operator


class DefaultNoiseModel(Operator):
    """Create analytic noise models from focalplane parameters."""

    noise_model = Unicode(
        defaults.noise_model, help="Observation key for the noise model"
    )

    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            fp = ob.telescope.focalplane
            dets = ob.select_local_detectors(detectors)
            rate_hz = fp.sample_rate.to_value(u.Hz)

            def col(name, default):
                c = fp.column(name)
                if c is None:
                    return {d: default for d in dets}
                return {d: float(c[fp.detector_index(d)]) for d in dets}

            net = col("psd_net", 0.1)
            fmin = col("psd_fmin", 1e-5)
            fknee = col("psd_fknee", 0.0)
            alpha = col("psd_alpha", 1.0)

            ob[self.noise_model] = AnalyticNoise(
                detectors=dets,
                rate={d: Qty(rate_hz, u.Hz) for d in dets},
                fmin={d: Qty(fmin[d], u.Hz) for d in dets},
                fknee={d: Qty(fknee[d], u.Hz) for d in dets},
                alpha={d: alpha[d] for d in dets},
                NET={d: Qty(net[d], u.K_sqrt_s) for d in dets},
            )

    def _provides(self):
        return {
            "global": [],
            "meta": [self.noise_model],
            "detdata": [],
            "shared": [],
            "intervals": [],
        }
