"""Binned map-making operator.

Rebuild of ``src/toast/ops/mapmaker_binning.py:21`` (``BinMap``): runs the
pointing pipeline + noise-weighted accumulation, then applies the
(pre-computed) pixel covariance to produce the binned map
``m = (P^T N^-1 P)^-1 P^T N^-1 d``.
"""

from __future__ import annotations

import numpy as np

from ..config.traits import Bool, Instance, Int, Unicode, Unit
from ..models.defaults import default_values as defaults
from ..pixels import PixelData, covariance_apply
from ..utils import units as u
from ..utils.timing import function_timer
from .mapmaker_utils import BuildNoiseWeighted
from .operator import Operator, Pipeline


class BinMap(Operator):
    """Bin a map using a pre-computed pixel covariance."""

    pixel_dist = Unicode("pixel_dist", help="Data key for the PixelDistribution")
    covariance = Unicode("covariance", help="Data key for the pixel covariance")
    binned = Unicode("binned", help="Data key for the output binned map")
    noiseweighted = Unicode(
        None, allow_none=True, help="Optional output of the noise-weighted map"
    )
    det_data = Unicode(defaults.det_data)
    det_data_units = Unit(u.K)
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_invalid)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_nonscience)
    pixel_pointing = Instance(klass=object, allow_none=True, help="PixelsHealpix")
    stokes_weights = Instance(klass=object, allow_none=True, help="StokesWeights")
    noise_model = Unicode(defaults.noise_model)
    pre_process = Instance(klass=object, allow_none=True, help="Operator run first")
    sync_type = Unicode("allreduce")
    full_pointing = Bool(False, help="Unused; pointing is always precomputed here")
    sharded = Bool(
        False, help="Shard the map pixel axis over the observation's mesh"
    )

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.covariance not in data:
            raise RuntimeError(f"Data does not contain covariance '{self.covariance}'")
        dist = data[self.pixel_dist]

        # fresh zmap accumulation for this binning
        zmap_key = f"{self.binned}_zmap"
        if zmap_key in data:
            del data[zmap_key]

        build_zmap = BuildNoiseWeighted(
            pixel_dist=self.pixel_dist,
            zmap=zmap_key,
            pixels=self.pixel_pointing.pixels,
            weights=self.stokes_weights.weights,
            det_data=self.det_data,
            noise_model=self.noise_model,
            det_flags=self.det_flags,
            det_flag_mask=self.det_flag_mask,
            shared_flags=self.shared_flags,
            shared_flag_mask=self.shared_flag_mask,
            sharded=self.sharded,
        )
        ops = [self.pixel_pointing, self.stokes_weights, build_zmap]
        if self.pre_process is not None:
            ops.insert(0, self.pre_process)
        Pipeline(operators=ops, detector_sets=["ALL"]).apply(
            data, detectors=detectors
        )

        zmap = data[zmap_key]
        if self.noiseweighted is not None:
            data[self.noiseweighted] = zmap.duplicate()

        # binned = covariance @ zmap
        covariance_apply(data[self.covariance], zmap)
        if self.binned in data:
            data[self.binned].data = zmap.data
            data[self.binned].units = zmap.units
        else:
            data[self.binned] = zmap
        del data[zmap_key]

    def _requires(self):
        return {
            "global": [self.pixel_dist, self.covariance],
            "meta": [self.noise_model],
            "detdata": [self.det_data],
            "shared": [],
            "intervals": [],
        }

    def _provides(self):
        prov = [self.binned]
        if self.noiseweighted is not None:
            prov.append(self.noiseweighted)
        return {"global": prov, "meta": [], "detdata": [], "shared": [], "intervals": []}
