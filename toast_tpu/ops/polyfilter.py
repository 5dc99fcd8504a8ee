"""Polynomial / common-mode filters.

Rebuild of ``src/toast/ops/polyfilter/polyfilter.py`` (``PolyFilter2D:30``,
``PolyFilter:434``, ``CommonModeFilter:648``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Int, Unicode
from ..models.defaults import default_values as defaults
from ..utils.timing import function_timer
from .kernels.filters import (
    common_mode_subtract,
    poly2d_filter,
    poly_filter_intervals,
)
from .operator import Operator


def _good(ob, dets_idx, det_flags, det_flag_mask, shared_flags, shared_flag_mask):
    n_samp = ob.n_local_samples
    good = jnp.ones((len(dets_idx), n_samp), dtype=jnp.float32)
    if det_flags is not None and det_flags in ob.detdata:
        df = ob.detdata[det_flags].data[dets_idx]
        good = good * (
            (df.astype(jnp.uint32) & jnp.uint32(det_flag_mask)) == 0
        ).astype(jnp.float32)
    if shared_flags is not None and shared_flags in ob.shared:
        sf = ob.shared.jax_view(shared_flags)
        good = good * (
            (sf.astype(jnp.uint32) & jnp.uint32(shared_flag_mask)) == 0
        ).astype(jnp.float32)[None, :]
    return good


class PolyFilter(Operator):
    """Per-interval 1D Legendre filtering."""

    det_data = Unicode(defaults.det_data)
    pattern = Unicode(".*", allow_none=True, help="Regex of detectors to filter")
    order = Int(1, help="Polynomial order")
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_nonscience)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_nonscience)
    view = Unicode(
        defaults.throw_interval, allow_none=True, help="Filter within these intervals"
    )

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        import re

        pat = re.compile(self.pattern) if self.pattern is not None else None
        for ob in data.obs:
            dets = [
                d
                for d in ob.select_local_detectors(detectors)
                if pat is None or pat.match(d)
            ]
            if len(dets) == 0:
                continue
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.det_data]
            tod = field.data[didx]
            good = _good(
                ob, didx, self.det_flags, self.det_flag_mask,
                self.shared_flags, self.shared_flag_mask,
            )
            if self.view is not None and self.view in ob.intervals:
                ivals = ob.intervals[self.view]
                starts = np.array([r["first"] for r in ivals], dtype=np.int32)
                lengths = np.array(
                    [r["last"] - r["first"] + 1 for r in ivals], dtype=np.int32
                )
            else:
                starts = np.array([0], dtype=np.int32)
                lengths = np.array([ob.n_local_samples], dtype=np.int32)
            if len(starts) == 0:
                continue
            max_len = int(lengths.max())
            new = poly_filter_intervals(
                tod,
                good,
                jnp.asarray(starts),
                jnp.asarray(lengths),
                self.order,
                max_len,
            )
            field.data = field.data.at[didx].set(new)

    def _requires(self):
        return {
            "global": [], "meta": [], "detdata": [self.det_data],
            "shared": [], "intervals": [] if self.view is None else [self.view],
        }

    def _provides(self):
        return {"global": [], "meta": [], "detdata": [self.det_data], "shared": [], "intervals": []}


class CommonModeFilter(Operator):
    """Subtract the focalplane-average signal at each sample."""

    det_data = Unicode(defaults.det_data)
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_nonscience)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_invalid)
    focalplane_key = Unicode(
        None, allow_none=True, help="Split detectors by this focalplane column"
    )

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            fp = ob.telescope.focalplane
            groups = [dets]
            if self.focalplane_key is not None:
                col = fp.column(self.focalplane_key)
                seen = {}
                for d in dets:
                    seen.setdefault(col[fp.detector_index(d)], []).append(d)
                groups = list(seen.values())
            field = ob.detdata[self.det_data]
            for group in groups:
                didx = ob.detector_indices(group)
                tod = field.data[didx]
                good = _good(
                    ob, didx, self.det_flags, self.det_flag_mask,
                    self.shared_flags, self.shared_flag_mask,
                )
                field.data = field.data.at[didx].set(
                    common_mode_subtract(tod, good)
                )

    def _provides(self):
        return {"global": [], "meta": [], "detdata": [self.det_data], "shared": [], "intervals": []}


class PolyFilter2D(Operator):
    """Per-sample 2D focalplane polynomial filtering."""

    det_data = Unicode(defaults.det_data)
    order = Int(1, help="Max combined order of the 2D modes")
    det_flags = Unicode(defaults.det_flags, allow_none=True)
    det_flag_mask = Int(defaults.det_mask_nonscience)
    shared_flags = Unicode(defaults.shared_flags, allow_none=True)
    shared_flag_mask = Int(defaults.shared_mask_invalid)
    focalplane_key = Unicode(None, allow_none=True)

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        from ..math import qarray as qa

        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            fp = ob.telescope.focalplane
            # detector positions in the focalplane (theta*cos/sin(phi))
            quats = np.array([fp[d]["quat"] for d in dets])
            theta, phi, _ = qa.to_iso_angles(quats)
            xpos = theta * np.cos(phi)
            ypos = theta * np.sin(phi)
            scale = max(np.max(np.abs(xpos)), np.max(np.abs(ypos)), 1e-12)
            xpos = xpos / scale
            ypos = ypos / scale
            modes = []
            for total in range(self.order + 1):
                for xo in range(total + 1):
                    yo = total - xo
                    modes.append(xpos**xo * ypos**yo)
            templates = jnp.asarray(
                np.stack(modes, axis=-1).astype(np.float32)
            )
            didx = ob.detector_indices(dets)
            field = ob.detdata[self.det_data]
            tod = field.data[didx]
            good = _good(
                ob, didx, self.det_flags, self.det_flag_mask,
                self.shared_flags, self.shared_flag_mask,
            )
            field.data = field.data.at[didx].set(
                poly2d_filter(tod, good, templates)
            )

    def _provides(self):
        return {"global": [], "meta": [], "detdata": [self.det_data], "shared": [], "intervals": []}
