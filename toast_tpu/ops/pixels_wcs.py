"""Flat-sky (WCS) pixelization.

Rebuild of ``src/toast/ops/pixels_wcs.py:39`` (``PixelsWCS``) without
astropy: supported projections are CAR (plate carree), CEA (cylindrical
equal area), MER (Mercator), and TAN (gnomonic).  Pixel indices are
computed in one jitted kernel from detector quaternions; auto-bounds sweep
the pointing once to size the patch (reference behavior).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..config.traits import Bool, Instance, Int, List, Quantity, Unicode
from ..math import qarray as qa
from ..models.defaults import default_values as defaults
from ..pixels import PixelDistribution
from ..utils import units as u
from ..utils.timing import function_timer
from ..utils.units import Quantity as Qty
from .operator import Operator, single_obs_view


@partial(jax.jit, static_argnames=("proj", "nx", "ny"))
def wcs_pixels(quats, lon0, lat0, res, nx, ny, proj="CAR"):
    """Detector quaternions -> flat projection pixel indices (int32)."""
    zaxis = jnp.asarray([0.0, 0.0, 1.0], dtype=quats.dtype)
    vdir = qa.rotate(quats, jnp.broadcast_to(zaxis, quats.shape[:-1] + (3,)))
    lon = jnp.arctan2(vdir[..., 1], vdir[..., 0])
    lat = jnp.arcsin(jnp.clip(vdir[..., 2], -1.0, 1.0))
    dlon = (lon - lon0 + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
    if proj == "CAR":
        x = dlon * jnp.cos(lat0)
        y = lat - lat0
    elif proj == "CEA":
        x = dlon * jnp.cos(lat0)
        y = (jnp.sin(lat) - jnp.sin(lat0)) / jnp.cos(lat0)
    elif proj == "MER":
        x = dlon * jnp.cos(lat0)
        y = jnp.log(jnp.tan(jnp.pi / 4 + lat / 2)) - jnp.log(
            jnp.tan(jnp.pi / 4 + lat0 / 2)
        )
    elif proj == "TAN":
        # gnomonic about (lon0, lat0)
        cosc = jnp.sin(lat0) * jnp.sin(lat) + jnp.cos(lat0) * jnp.cos(lat) * jnp.cos(
            dlon
        )
        safe = jnp.maximum(cosc, 1e-6)
        x = jnp.cos(lat) * jnp.sin(dlon) / safe
        y = (
            jnp.cos(lat0) * jnp.sin(lat)
            - jnp.sin(lat0) * jnp.cos(lat) * jnp.cos(dlon)
        ) / safe
    else:
        raise ValueError(f"unknown projection {proj}")
    ix = jnp.floor(x / res + nx / 2).astype(jnp.int32)
    iy = jnp.floor(y / res + ny / 2).astype(jnp.int32)
    good = (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
    return jnp.where(good, iy * nx + ix, jnp.int32(-1))


class PixelsWCS(Operator):
    """Expand detector pointing to flat-projection pixel numbers."""

    detector_pointing = Instance(klass=object, allow_none=True)
    projection = Unicode("CAR", help="CAR, CEA, MER, or TAN")
    resolution = Quantity(Qty(0.05, u.deg), help="Pixel size")
    center = List([], help="(lon_deg, lat_deg) projection center; [] = auto")
    dimensions = List([], help="(nx, ny) pixel dims; [] = auto from pointing")
    auto_bounds = Bool(True)
    quats = Unicode(defaults.quats)
    pixels = Unicode(defaults.pixels)
    create_dist = Unicode(None, allow_none=True)
    nest = Bool(False, help="Unused (API compatibility with PixelsHealpix)")
    submaps = Int(10, help="Submap grid for the PixelDistribution")

    _nx = None
    _ny = None
    _lon0 = None
    _lat0 = None

    @property
    def n_pix(self):
        return (self._nx or 0) * (self._ny or 0)

    def _auto_bounds(self, data, detectors):
        lons = []
        lats = []
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            quat_key = self.quats
            if self.detector_pointing is not None:
                quat_key = self.detector_pointing.quats
            if quat_key not in ob.detdata:
                self.detector_pointing.exec(single_obs_view(data, ob), detectors=dets)
            didx = ob.detector_indices(dets)
            quats = np.asarray(ob.detdata[quat_key].data[didx])
            vdir = qa.rotate(quats, np.array([0.0, 0.0, 1.0]))
            lons.append(np.arctan2(vdir[..., 1], vdir[..., 0]))
            lats.append(np.arcsin(np.clip(vdir[..., 2], -1, 1)))
        lon = np.concatenate([x.ravel() for x in lons])
        lat = np.concatenate([x.ravel() for x in lats])
        lon0 = np.arctan2(np.mean(np.sin(lon)), np.mean(np.cos(lon)))
        lat0 = np.mean(lat)
        res = self.resolution.to_value(u.rad)
        # size the patch in *projected* coordinates so nonlinear
        # projections (MER, TAN) are fully covered
        dlon = (lon - lon0 + np.pi) % (2 * np.pi) - np.pi
        if self.projection == "CAR":
            x = dlon * np.cos(lat0)
            y = lat - lat0
        elif self.projection == "CEA":
            x = dlon * np.cos(lat0)
            y = (np.sin(lat) - np.sin(lat0)) / np.cos(lat0)
        elif self.projection == "MER":
            lat_c = np.clip(lat, -1.55, 1.55)
            x = dlon * np.cos(lat0)
            y = np.log(np.tan(np.pi / 4 + lat_c / 2)) - np.log(
                np.tan(np.pi / 4 + lat0 / 2)
            )
        elif self.projection == "TAN":
            cosc = np.sin(lat0) * np.sin(lat) + np.cos(lat0) * np.cos(lat) * np.cos(
                dlon
            )
            safe = np.maximum(cosc, 1e-2)
            x = np.cos(lat) * np.sin(dlon) / safe
            y = (
                np.cos(lat0) * np.sin(lat)
                - np.sin(lat0) * np.cos(lat) * np.cos(dlon)
            ) / safe
        else:
            raise ValueError(f"unknown projection {self.projection}")
        nx = int(2 * (np.abs(x).max() / res + 2))
        ny = int(2 * (np.abs(y).max() / res + 2))
        return lon0, lat0, nx, ny

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.center and self.dimensions:
            self._lon0 = np.radians(self.center[0])
            self._lat0 = np.radians(self.center[1])
            self._nx, self._ny = int(self.dimensions[0]), int(self.dimensions[1])
        elif self._nx is None:
            self._lon0, self._lat0, self._nx, self._ny = self._auto_bounds(
                data, detectors
            )
        res = self.resolution.to_value(u.rad)
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            quat_key = self.quats
            if self.detector_pointing is not None:
                quat_key = self.detector_pointing.quats
            if quat_key not in ob.detdata:
                self.detector_pointing.exec(single_obs_view(data, ob), detectors=dets)
            quats = ob.detdata[quat_key].data
            pix = wcs_pixels(
                quats,
                jnp.float32(self._lon0),
                jnp.float32(self._lat0),
                jnp.float32(res),
                self._nx,
                self._ny,
                self.projection,
            )
            ob.detdata.ensure(self.pixels, dtype=np.int32, detectors=dets)
            ob.detdata[self.pixels].data = pix
        if self.create_dist is not None:
            data[self.create_dist] = PixelDistribution(
                n_pix=self.n_pix,
                n_submap=min(self.submaps, self.n_pix),
                comm=data.comm,
            )
            data[f"{self.create_dist}_wcs"] = {
                "projection": self.projection,
                "lon0": float(self._lon0),
                "lat0": float(self._lat0),
                "res": res,
                "nx": self._nx,
                "ny": self._ny,
            }

    def _provides(self):
        prov = {"global": [], "meta": [], "detdata": [self.pixels], "shared": [], "intervals": []}
        if self.create_dist is not None:
            prov["global"].append(self.create_dist)
        return prov
