"""Map accumulation operators: hits, inverse covariance, noise-weighted map.

Rebuild of ``src/toast/ops/mapmaker_utils/mapmaker_utils.py``
(``BuildHitMap:24``, ``BuildInverseCovariance:249``,
``BuildNoiseWeighted:559``, ``CovarianceAndHits:962``) plus ``NoiseWeight``
(``src/toast/ops/noise_weight/noise_weight.py``).  All accumulation runs in
jitted scatter-add kernels over dense device maps
(:mod:`toast_tpu.ops.kernels.mapkernels`); cross-process reduction happens
once in ``_finalize`` via ``PixelData.sync_allreduce``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Float, Instance, Int, Unicode, Unit
from ..models.defaults import default_values as defaults
from ..pixels import PixelData, PixelDistribution, covariance_invert
from ..utils import units as u
from ..utils.timing import function_timer
from .kernels.mapkernels import (
    cov_accum_diag_invnpp_hits,
    build_noise_weighted,
    cov_accum_diag_hits,
    cov_accum_diag_invnpp,
    get_bin_plan,
    noise_weight,
)
from .operator import Operator


def _map_mesh(op, ob):
    """The observation's MeshDist when this op runs in sharded-map mode."""
    md = ob.mesh_dist
    if getattr(op, "sharded", False) and md is not None and md.n_devices > 1:
        return md
    return None


def _pix_and_plan(ob, pixels_name, didx, dist, mesh_dist=None):
    """Pixel block for the selected detectors plus a cached bin plan.

    In sharded-map mode the sort-based bin plan is skipped: the sharded
    reduce-scatter path bins with local scatter-adds instead
    (kernels.mapkernels.sharded_scatter_accum).
    """
    dd = ob.detdata[pixels_name]
    if len(didx) == dd.data.shape[0]:
        pix = dd.data
    else:
        pix = dd.data[didx]
    if mesh_dist is not None:
        return pix, None
    n_padded = dist.n_submap * dist.n_pix_submap
    return pix, get_bin_plan(pix, n_padded)


def _det_flags(ob, name, dets_idx):
    if name is not None and name in ob.detdata:
        return ob.detdata[name].data[dets_idx]
    return None


def _shared_flags(ob, name):
    if name is not None and name in ob.shared:
        return ob.shared.jax_view(name)
    return None


class BuildHitMap(Operator):
    """Accumulate a hit map (reference ``mapmaker_utils.py:24``)."""

    pixel_dist = Unicode("pixel_dist", help="Data key for the PixelDistribution")
    hits = Unicode("hits", help="Data key for the output hit map")
    view = Unicode(None, allow_none=True, help="Interval list to use")
    pixels = Unicode(defaults.pixels, help="Detdata key for pixel indices")
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_invalid)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_nonscience)
    sync_type = Unicode("allreduce", help="allreduce or alltoallv")
    sharded = Bool(
        False, help="Shard the map pixel axis over the observation's mesh"
    )

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.pixel_dist not in data:
            raise RuntimeError(f"Data does not contain '{self.pixel_dist}'")
        dist = data[self.pixel_dist]
        md = _map_mesh(self, data.obs[0]) if data.obs else None
        if self.hits not in data:
            data[self.hits] = PixelData(
                dist, dtype=np.int32, n_value=1, mesh_dist=md
            )
        hits = data[self.hits]
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors, flagmask=self.det_flag_mask)
            if len(dets) == 0:
                continue
            didx = ob.detector_indices(dets)
            pix, plan = _pix_and_plan(ob, self.pixels, didx, dist, mesh_dist=md)
            new = cov_accum_diag_hits(
                hits.data[:, 0],
                pix,
                _det_flags(ob, self.det_flags, didx),
                self.det_flag_mask,
                _shared_flags(ob, self.shared_flags),
                self.shared_flag_mask,
                plan=plan,
                mesh_dist=md,
            )
            hits.data = new[:, None]

    def _finalize(self, data, **kwargs):
        if self.hits in data:
            data[self.hits].sync_allreduce()

    def _requires(self):
        return {
            "global": [self.pixel_dist],
            "meta": [],
            "detdata": [self.pixels],
            "shared": [],
            "intervals": [],
        }

    def _provides(self):
        return {"global": [self.hits], "meta": [], "detdata": [], "shared": [], "intervals": []}


class BuildInverseCovariance(Operator):
    """Accumulate the diagonal inverse pixel covariance
    (reference ``mapmaker_utils.py:249``)."""

    pixel_dist = Unicode("pixel_dist", help="Data key for the PixelDistribution")
    inverse_covariance = Unicode(
        "inv_covariance", help="Data key for the output inverse covariance"
    )
    view = Unicode(None, allow_none=True)
    pixels = Unicode(defaults.pixels)
    weights = Unicode(defaults.weights)
    noise_model = Unicode(defaults.noise_model)
    det_data_units = Unit(u.K, help="Detector data units for weight scaling")
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_invalid)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_nonscience)
    sync_type = Unicode("allreduce")
    sharded = Bool(
        False, help="Shard the map pixel axis over the observation's mesh"
    )

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        dist = data[self.pixel_dist]
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors, flagmask=self.det_flag_mask)
            if len(dets) == 0:
                continue
            md = _map_mesh(self, ob)
            nse = ob[self.noise_model]
            didx = ob.detector_indices(dets)
            pix, plan = _pix_and_plan(ob, self.pixels, didx, dist, mesh_dist=md)
            wts = ob.detdata[self.weights].data[didx]
            nnz = wts.shape[-1]
            n_tri = nnz * (nnz + 1) // 2
            if self.inverse_covariance not in data:
                invcov_units = self.det_data_units**-2
                data[self.inverse_covariance] = PixelData(
                    dist,
                    dtype=np.float32,
                    n_value=n_tri,
                    units=invcov_units,
                    mesh_dist=md,
                )
            invcov = data[self.inverse_covariance]
            det_weights = np.array(
                [nse.detector_weight(d).value for d in dets], dtype=np.float32
            )
            invcov.data = cov_accum_diag_invnpp(
                invcov.data,
                pix,
                wts,
                jnp.asarray(det_weights),
                _det_flags(ob, self.det_flags, didx),
                self.det_flag_mask,
                _shared_flags(ob, self.shared_flags),
                self.shared_flag_mask,
                nnz,
                plan=plan,
                mesh_dist=md,
            )

    def _finalize(self, data, **kwargs):
        if self.inverse_covariance in data:
            data[self.inverse_covariance].sync_allreduce()

    def _requires(self):
        return {
            "global": [self.pixel_dist],
            "meta": [self.noise_model],
            "detdata": [self.pixels, self.weights],
            "shared": [],
            "intervals": [],
        }

    def _provides(self):
        return {
            "global": [self.inverse_covariance],
            "meta": [],
            "detdata": [],
            "shared": [],
            "intervals": [],
        }


class BuildNoiseWeighted(Operator):
    """Accumulate the noise-weighted map Z = P^T N^-1 d
    (reference ``mapmaker_utils.py:559``)."""

    pixel_dist = Unicode("pixel_dist", help="Data key for the PixelDistribution")
    zmap = Unicode("zmap", help="Data key for the output noise-weighted map")
    view = Unicode(None, allow_none=True)
    pixels = Unicode(defaults.pixels)
    weights = Unicode(defaults.weights)
    det_data = Unicode(defaults.det_data)
    noise_model = Unicode(defaults.noise_model)
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_invalid)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_nonscience)
    sync_type = Unicode("allreduce")
    sharded = Bool(
        False, help="Shard the map pixel axis over the observation's mesh"
    )

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        dist = data[self.pixel_dist]
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors, flagmask=self.det_flag_mask)
            if len(dets) == 0:
                continue
            md = _map_mesh(self, ob)
            nse = ob[self.noise_model]
            didx = ob.detector_indices(dets)
            pix, plan = _pix_and_plan(ob, self.pixels, didx, dist, mesh_dist=md)
            wts = ob.detdata[self.weights].data[didx]
            tod = ob.detdata[self.det_data].data[didx]
            nnz = wts.shape[-1]
            if self.zmap not in data:
                # zmap = P^T N^-1 d: tod units times 1/K^2 detector weights
                zunits = ob.detdata[self.det_data].units * u.K**-2
                data[self.zmap] = PixelData(
                    dist, dtype=np.float32, n_value=nnz, units=zunits, mesh_dist=md
                )
            zmap = data[self.zmap]
            det_weights = np.array(
                [nse.detector_weight(d).value for d in dets], dtype=np.float32
            )
            zmap.data = build_noise_weighted(
                zmap.data,
                pix,
                wts,
                tod,
                jnp.asarray(det_weights),
                _det_flags(ob, self.det_flags, didx),
                self.det_flag_mask,
                _shared_flags(ob, self.shared_flags),
                self.shared_flag_mask,
                plan=plan,
                mesh_dist=md,
            )

    def _finalize(self, data, **kwargs):
        if self.zmap in data:
            data[self.zmap].sync_allreduce()

    def _requires(self):
        return {
            "global": [self.pixel_dist],
            "meta": [self.noise_model],
            "detdata": [self.pixels, self.weights, self.det_data],
            "shared": [],
            "intervals": [],
        }

    def _provides(self):
        return {"global": [self.zmap], "meta": [], "detdata": [], "shared": [], "intervals": []}


class CovarianceAndHits(Operator):
    """One-shot covariance + hits + rcond (reference ``mapmaker_utils.py:962``).

    Runs the pointing pipeline per observation, accumulates N_pp^-1 and
    hits, then inverts with the rcond threshold — the standard precursor to
    binned map-making.
    """

    pixel_dist = Unicode("pixel_dist", help="Data key for the PixelDistribution")
    covariance = Unicode("covariance", help="Output covariance key")
    inverse_covariance = Unicode(
        None, allow_none=True, help="Optional output of the raw inverse"
    )
    hits = Unicode("hits", help="Output hits key")
    rcond = Unicode("rcond", help="Output rcond key")
    det_data_units = Unit(u.K, help="Detector data units")
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_invalid)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_nonscience)
    pixel_pointing = Instance(klass=object, allow_none=True, help="PixelsHealpix")
    stokes_weights = Instance(klass=object, allow_none=True, help="StokesWeights")
    noise_model = Unicode(defaults.noise_model)
    rcond_threshold = Float(1.0e-8, help="rcond cut for pixel inversion")
    sync_type = Unicode("allreduce")
    sharded = Bool(
        False, help="Shard the map pixel axis over the observation's mesh"
    )

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        from .operator import Pipeline

        md = _map_mesh(self, data.obs[0]) if data.obs else None

        # ensure pixel distribution exists
        if self.pixel_dist not in data:
            saved = self.pixel_pointing.create_dist
            self.pixel_pointing.create_dist = self.pixel_dist
            Pipeline(
                operators=[self.pixel_pointing], detector_sets=["ALL"]
            ).apply(data, detectors=detectors)
            self.pixel_pointing.create_dist = saved

        # the accumulation (hits + N_pp^-1) depends only on the pointing
        # products and noise weights — cache it across calls that differ
        # only in the rcond threshold (solver vs final covariance)
        cache_key = tuple(
            (
                id(ob.detdata[self.pixel_pointing.pixels].data)
                if self.pixel_pointing.pixels in ob.detdata
                else None,
                id(ob.detdata[self.stokes_weights.weights].data)
                if self.stokes_weights.weights in ob.detdata
                else None,
            )
            for ob in data.obs
        )
        cached = data._internal.get("_covhits_cache")
        if cached is not None and cached[0] == cache_key and None not in [
            c for pair in cache_key for c in pair
        ]:
            _, inv_raw, hits_raw = cached
            data[self.hits] = hits_raw.duplicate()
            invcov_key = (
                self.inverse_covariance
                if self.inverse_covariance is not None
                else self.covariance
            )
            data[invcov_key] = inv_raw.duplicate()
            dist = data[self.pixel_dist]
            data[self.rcond] = PixelData(
                dist, dtype=np.float32, n_value=1, mesh_dist=md
            )
            if self.inverse_covariance is not None:
                data[self.covariance] = data[invcov_key].duplicate()
            covariance_invert(
                data[self.covariance],
                self.rcond_threshold,
                rcond=data[self.rcond],
            )
            return

        invcov_key = (
            self.inverse_covariance
            if self.inverse_covariance is not None
            else self.covariance
        )
        pipe = Pipeline(
            operators=[self.pixel_pointing, self.stokes_weights],
            detector_sets=["ALL"],
        )
        pipe.apply(data, detectors=detectors)

        # fused hits + N_pp^-1 accumulation: one binning pass for both
        dist = data[self.pixel_dist]
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors, flagmask=self.det_flag_mask)
            if len(dets) == 0:
                continue
            nse = ob[self.noise_model]
            didx = ob.detector_indices(dets)
            pix, plan = _pix_and_plan(
                ob, self.pixel_pointing.pixels, didx, dist, mesh_dist=md
            )
            wts = ob.detdata[self.stokes_weights.weights].data[didx]
            nnz = wts.shape[-1]
            n_tri = nnz * (nnz + 1) // 2
            if invcov_key not in data:
                data[invcov_key] = PixelData(
                    dist,
                    dtype=np.float32,
                    n_value=n_tri,
                    units=self.det_data_units**-2,
                    mesh_dist=md,
                )
                data[self.hits] = PixelData(
                    dist, dtype=np.int32, n_value=1, mesh_dist=md
                )
            det_weights = np.array(
                [nse.detector_weight(d).value for d in dets], dtype=np.float32
            )
            new_ic, new_hits = cov_accum_diag_invnpp_hits(
                data[invcov_key].data,
                data[self.hits].data[:, 0],
                pix,
                wts,
                jnp.asarray(det_weights),
                _det_flags(ob, self.det_flags, didx),
                self.det_flag_mask,
                _shared_flags(ob, self.shared_flags),
                self.shared_flag_mask,
                nnz,
                plan=plan,
                mesh_dist=md,
            )
            data[invcov_key].data = new_ic
            data[self.hits].data = new_hits[:, None]
        if invcov_key in data:
            data[invcov_key].sync_allreduce()
            data[self.hits].sync_allreduce()

        # invert with rcond cut
        dist = data[self.pixel_dist]
        if invcov_key not in data:
            raise RuntimeError(
                "CovarianceAndHits: no observations contributed data "
                "(empty schedule or all detectors flagged?)"
            )
        data[self.rcond] = PixelData(
            dist, dtype=np.float32, n_value=1, mesh_dist=md
        )
        data._internal["_covhits_cache"] = (
            cache_key,
            data[invcov_key].duplicate(),
            data[self.hits].duplicate(),
        )
        if self.inverse_covariance is not None:
            data[self.covariance] = data[invcov_key].duplicate()
        covariance_invert(
            data[self.covariance],
            self.rcond_threshold,
            rcond=data[self.rcond],
        )

    def _requires(self):
        req = {
            "global": [],
            "meta": [self.noise_model],
            "detdata": [],
            "shared": [],
            "intervals": [],
        }
        return req

    def _provides(self):
        return {
            "global": [self.covariance, self.hits, self.rcond],
            "meta": [],
            "detdata": [],
            "shared": [],
            "intervals": [],
        }


class NoiseWeight(Operator):
    """Multiply detector data by inverse noise variance
    (reference ``ops/noise_weight/noise_weight.py``)."""

    noise_model = Unicode(defaults.noise_model)
    det_data = Unicode(defaults.det_data)
    view = Unicode(None, allow_none=True)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            nse = ob[self.noise_model]
            field = ob.detdata[self.det_data]
            didx = ob.detector_indices(dets)
            det_weights = np.array(
                [nse.detector_weight(d).value for d in dets], dtype=np.float32
            )
            updated = noise_weight(field.data[didx], jnp.asarray(det_weights))
            field.data = field.data.at[didx].set(updated)
            field.units = field.units * u.K**-2

    def _requires(self):
        return {
            "global": [],
            "meta": [self.noise_model],
            "detdata": [self.det_data],
            "shared": [],
            "intervals": [],
        }

    def _provides(self):
        return {"global": [], "meta": [], "detdata": [self.det_data], "shared": [], "intervals": []}
