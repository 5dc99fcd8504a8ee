"""Detector pointing expansion operator.

Rebuild of ``src/toast/ops/pointing_detector/pointing_detector.py:20``
(``PointingDetectorSimple``): composes the shared boresight with each
detector's focalplane offset quaternion.  The compute is one jitted kernel
over the whole (n_det, n_samp) block
(:func:`toast_tpu.ops.kernels.pointing.pointing_detector`).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Int, Unicode
from ..models.defaults import default_values as defaults
from ..utils.timing import function_timer
from .kernels.pointing import pointing_detector as k_pointing_detector
from .operator import Operator


class PointingDetectorSimple(Operator):
    """Expand boresight pointing to detector quaternions."""

    view = Unicode(None, allow_none=True, help="Restrict to this interval list")
    boresight = Unicode(defaults.boresight_radec, help="Shared key for boresight")
    shared_flags = Unicode(
        defaults.shared_flags, allow_none=True, help="Shared key for common flags"
    )
    shared_flag_mask = Int(
        defaults.shared_mask_invalid, help="Bit mask for shared flags"
    )
    quats = Unicode(defaults.quats, help="Output detdata key for quaternions")
    coord_in = Unicode(None, allow_none=True, help="Input coordinate frame")
    coord_out = Unicode(None, allow_none=True, help="Output coordinate frame")

    def kernel_inputs(self, ob, dets):
        """The boresight-product kernel operands for one observation:
        ``(fp_quats_f32, boresight, flags, mask)``.  Shared with the
        fused quats-free paths in PixelsHealpix / StokesWeights."""
        fp = ob.telescope.focalplane
        fp_quats = np.array([fp[d]["quat"] for d in dets], dtype=np.float64)
        # optional coordinate rotation folded into the boresight
        bore = ob.shared.jax_view(self.boresight)
        if self.shared_flags is not None and self.shared_flags in ob.shared:
            flags = ob.shared.jax_view(self.shared_flags)
            mask = self.shared_flag_mask
        else:
            flags = jnp.zeros(ob.n_local_samples, dtype=jnp.uint8)
            mask = 0
        return jnp.asarray(fp_quats, dtype=jnp.float32), bore, flags, mask

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            fp_quats, bore, flags, mask = self.kernel_inputs(ob, dets)
            # skip recomputation when inputs are unchanged (array identities
            # change whenever shared data or flags are updated)
            cache_key = (id(bore), id(flags), mask, tuple(dets))
            cache_tag = f"_cache_{self.quats}"
            if (
                self.quats in ob.detdata
                and ob._internal.get(cache_tag) == cache_key
            ):
                continue
            quats = k_pointing_detector(fp_quats, bore, flags, mask)
            ob.detdata.ensure(
                self.quats, sample_shape=(4,), dtype=np.float32, detectors=dets
            )
            ob.detdata[self.quats].data = quats
            ob._internal[cache_tag] = cache_key

    def _requires(self):
        return {
            "global": [],
            "meta": [],
            "detdata": [],
            "shared": [self.boresight],
            "intervals": [] if self.view is None else [self.view],
        }

    def _provides(self):
        return {
            "global": [],
            "meta": [],
            "detdata": [self.quats],
            "shared": [],
            "intervals": [],
        }
