"""Auxiliary map products: crosslinking, cadence, pixel distribution.

Rebuilds of ``src/toast/ops/crosslinking.py`` (``CrossLinking``),
``ops/cadence_map.py`` (``CadenceMap``), ``ops/pointing.py``
(``BuildPixelDistribution:18``), and ``ops/pointing_detector_fp.py``
(``PointingDetectorFP``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Instance, Int, Unicode
from ..math import qarray as qa
from ..models.defaults import default_values as defaults
from ..pixels import PixelData, PixelDistribution
from ..utils import units as u
from ..utils.timing import function_timer
from .kernels.mapkernels import build_noise_weighted, get_bin_plan
from .operator import Operator, Pipeline
from .pointing_detector import PointingDetectorSimple


class BuildPixelDistribution(Operator):
    """One-shot pointing sweep to build the PixelDistribution
    (reference ``ops/pointing.py:18``)."""

    pixel_dist = Unicode("pixel_dist", help="Data key for the distribution")
    pixel_pointing = Instance(klass=object, allow_none=True, help="PixelsHealpix")
    save_pointing = Int(0, help="Keep the expanded pixel numbers")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.pixel_dist in data:
            return
        saved = self.pixel_pointing.create_dist
        self.pixel_pointing.create_dist = self.pixel_dist
        Pipeline(operators=[self.pixel_pointing]).apply(data, detectors=detectors)
        self.pixel_pointing.create_dist = saved
        if not self.save_pointing:
            for ob in data.obs:
                if self.pixel_pointing.pixels in ob.detdata:
                    del ob.detdata[self.pixel_pointing.pixels]

    def _provides(self):
        return {"global": [self.pixel_dist], "meta": [], "detdata": [], "shared": [], "intervals": []}


class CrossLinking(Operator):
    """Cross-linking factor map (reference ``ops/crosslinking.py``).

    Accumulates cos/sin of twice the scan direction angle per pixel; the
    output 3-component map (hits, <cos 2psi>, <sin 2psi>) measures how well
    crossing angles are covered.
    """

    pixel_dist = Unicode("pixel_dist")
    pixel_pointing = Instance(klass=object, allow_none=True)
    detector_pointing = Instance(klass=object, allow_none=True)
    output_dir = Unicode(None, allow_none=True)
    crosslinking = Unicode("crosslinking", help="Output data key")
    quats = Unicode(defaults.quats)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.pixel_dist not in data:
            BuildPixelDistribution(
                pixel_dist=self.pixel_dist, pixel_pointing=self.pixel_pointing,
                save_pointing=1,
            ).apply(data, detectors=detectors)
        dist = data[self.pixel_dist]
        out = PixelData(dist, n_value=3, dtype=np.float32)
        n_padded = dist.n_submap * dist.n_pix_submap
        Pipeline(operators=[self.pixel_pointing]).apply(data, detectors=detectors)
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            didx = ob.detector_indices(dets)
            quats = ob.detdata[self.quats].data[didx]
            # scan direction: angle of the time derivative of the pointing
            zaxis = jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32)
            vdir = qa.rotate(quats, jnp.broadcast_to(zaxis, quats.shape[:-1] + (3,)))
            dv = jnp.diff(vdir, axis=1, append=vdir[:, -1:])
            # project derivative onto local (e_theta, e_phi) basis
            theta = jnp.arccos(jnp.clip(vdir[..., 2], -1, 1))
            phi = jnp.arctan2(vdir[..., 1], vdir[..., 0])
            e_theta = jnp.stack(
                [jnp.cos(theta) * jnp.cos(phi), jnp.cos(theta) * jnp.sin(phi),
                 -jnp.sin(theta)], axis=-1)
            e_phi = jnp.stack(
                [-jnp.sin(phi), jnp.cos(phi), jnp.zeros_like(phi)], axis=-1)
            ang = jnp.arctan2(
                jnp.sum(dv * e_phi, axis=-1), jnp.sum(dv * e_theta, axis=-1)
            )
            wts = jnp.stack(
                [jnp.ones_like(ang), jnp.cos(2 * ang), jnp.sin(2 * ang)], axis=-1
            )
            pix = ob.detdata[self.pixel_pointing.pixels].data[didx]
            plan = get_bin_plan(pix, n_padded)
            out.data = build_noise_weighted(
                out.data, pix, wts,
                jnp.ones_like(ang), jnp.ones(len(dets), dtype=jnp.float32),
                None, 0, None, 0, plan=plan,
            )
        data[self.crosslinking] = out
        if self.output_dir is not None:
            import os

            from ..pixels.io_healpix import write_healpix_hdf5

            os.makedirs(self.output_dir, exist_ok=True)
            write_healpix_hdf5(
                out, os.path.join(self.output_dir, f"{self.crosslinking}.h5"),
                nest=self.pixel_pointing.nest,
            )


class CadenceMap(Operator):
    """Per-day pixel-visit table (reference ``ops/cadence_map.py``):
    boolean matrix (n_days, n_pix) of which pixels were hit on which days."""

    pixel_dist = Unicode("pixel_dist")
    pixel_pointing = Instance(klass=object, allow_none=True)
    times = Unicode(defaults.times)
    output_dir = Unicode(None, allow_none=True)
    cadence_map = Unicode("cadence_map", help="Output data key")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        Pipeline(operators=[self.pixel_pointing]).apply(data, detectors=detectors)
        n_pix = self.pixel_pointing.n_pix
        daily = {}
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            didx = ob.detector_indices(dets)
            times = np.asarray(ob.shared[self.times])
            days = (times // 86400.0).astype(np.int64)
            pix = np.asarray(ob.detdata[self.pixel_pointing.pixels].data[didx])
            for day in np.unique(days):
                sel = days == day
                hits = np.zeros(n_pix, dtype=bool)
                p = pix[:, sel].reshape(-1)
                hits[p[p >= 0]] = True
                if day in daily:
                    daily[day] |= hits
                else:
                    daily[day] = hits
        days_sorted = sorted(daily.keys())
        table = np.stack([daily[d] for d in days_sorted]) if days_sorted else np.zeros((0, n_pix), dtype=bool)
        data[self.cadence_map] = {"days": np.array(days_sorted), "hits": table}
        if self.output_dir is not None:
            import os

            import h5py

            os.makedirs(self.output_dir, exist_ok=True)
            with h5py.File(
                os.path.join(self.output_dir, "cadence_map.h5"), "w"
            ) as f:
                f.create_dataset("days", data=np.array(days_sorted))
                f.create_dataset("hits", data=table, compression="gzip")


class PointingDetectorFP(PointingDetectorSimple):
    """Detector pointing in the focalplane frame
    (reference ``ops/pointing_detector_fp.py``): like the simple operator
    but with an extra fixed focalplane-frame rotation applied."""

    fp_rotation = Instance(klass=object, allow_none=True, help="Quaternion (4,)")

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        super()._exec(data, detectors=detectors, **kwargs)
        if self.fp_rotation is None:
            return
        rot = jnp.asarray(np.asarray(self.fp_rotation, dtype=np.float32))
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0 or self.quats not in ob.detdata:
                continue
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.quats]
            q = field.data[didx]
            field.data = field.data.at[didx].set(qa.mult(q, rot[None, None, :]))
