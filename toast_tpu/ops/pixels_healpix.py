"""HEALPix pixelization operator.

Rebuild of ``src/toast/ops/pixels_healpix/pixels_healpix.py:19``: converts
detector quaternions to HEALPix pixel indices and (optionally) tracks hit
submaps for building a PixelDistribution.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config.traits import Bool, Instance, Int, Unicode
from ..models.defaults import default_values as defaults
from ..pixels import PixelDistribution
from ..utils.timing import function_timer
from .kernels.pointing import pixels_healpix as k_pixels_healpix
from .kernels.pointing import pixels_healpix_fused as k_pixels_healpix_fused
from .operator import Operator, single_obs_view

# above this (n_det x n_samp) size, skip materializing detector quats and
# fuse the boresight product into the pixel/weight kernels
_FUSE_QUATS_THRESHOLD = 1 << 25
from functools import partial

import jax


@jax.jit
def _uncovered_count(marks, uncovered):
    """Count of submaps hit by the pointing but absent from a reused
    distribution.  One fixed-shape program: the ``uncovered`` mask is
    built on the HOST (a handful of bytes) so the check never compiles
    shape-dependent eager ops in the middle of a production pass — each
    first-time tiny-program compile costs ~1 s through the remote-TPU
    tunnel."""
    return jnp.sum(marks & uncovered, dtype=jnp.int32)


@partial(jax.jit, static_argnames=("n_submap",))
def _submap_marks(sub_flat, n_submap):
    """Boolean hit mask per submap via blocked one-hot any-reduce."""
    blk = 1 << 16
    n = sub_flat.shape[0]
    pad = (-n) % blk
    s = jnp.pad(sub_flat, (0, pad), constant_values=-1).reshape(-1, blk)
    ids = jnp.arange(n_submap, dtype=sub_flat.dtype)

    def body(carry, row):
        hit = jnp.any(row[:, None] == ids[None, :], axis=0)
        return carry | hit, None

    marks, _ = jax.lax.scan(body, jnp.zeros(n_submap, dtype=bool), s)
    return marks


class PixelsHealpix(Operator):
    """Expand detector quaternions to HEALPix pixel numbers."""

    detector_pointing = Instance(
        klass=object, allow_none=True, help="PointingDetectorSimple instance"
    )
    nside = Int(64, help="HEALPix NSIDE")
    nside_submap = Int(16, help="HEALPix NSIDE of the submap grid")
    nest = Bool(True, help="Use NESTED ordering")
    view = Unicode(None, allow_none=True, help="Restrict to this interval list")
    quats = Unicode(defaults.quats, help="Detdata key for detector quaternions")
    pixels = Unicode(defaults.pixels, help="Output detdata key for pixels")
    create_dist = Unicode(
        None, allow_none=True, help="Data key to store a PixelDistribution"
    )
    shared_flags = Unicode(
        defaults.shared_flags, allow_none=True, help="Shared key for common flags"
    )
    shared_flag_mask = Int(
        defaults.shared_mask_invalid, help="Bit mask for shared flags"
    )

    @property
    def n_pix(self):
        return 12 * self.nside * self.nside

    @property
    def n_pix_submap(self):
        return 12 * self.nside_submap * self.nside_submap

    @property
    def n_submap(self):
        return (self.nside // self.nside_submap) ** 2 * 12

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.nside_submap > self.nside:
            self.nside_submap = self.nside
        hit_submaps = None
        existing_dist = None
        if self.create_dist is not None:
            existing = (
                data[self.create_dist] if self.create_dist in data else None
            )
            if (
                existing is not None
                and existing.n_pix == self.n_pix
                and existing.n_submap == self.n_submap
            ):
                # distribution already built for this geometry: reuse it,
                # but guard the reuse — a pointing change that hits submaps
                # outside the distribution would silently misassign them.
                # The coverage count stays a DEVICE scalar queued through
                # the guards registry (one batched fetch at the next drain
                # point) so Monte-Carlo realizations never pay a sync here.
                existing_dist = existing
            else:
                hit_submaps = np.zeros(self.n_submap, dtype=bool)

        for ob in data.obs:
            dets = ob.select_local_detectors(detectors)
            if len(dets) == 0:
                continue
            # like the reference, the detector pointing operator's quats key
            # takes precedence (ref:ops/pixels_healpix/pixels_healpix.py)
            quat_key = self.quats
            fused = None
            if self.detector_pointing is not None:
                quat_key = self.detector_pointing.quats
                if quat_key not in ob.detdata:
                    if (
                        len(dets) * ob.n_local_samples > _FUSE_QUATS_THRESHOLD
                        and hasattr(self.detector_pointing, "kernel_inputs")
                    ):
                        # large block: compose the boresight product into
                        # the pixel kernel instead of materializing the
                        # (n_det, n_samp, 4) quats (kernels/pointing.py
                        # fused variants)
                        fused = self.detector_pointing.kernel_inputs(ob, dets)
                    else:
                        self.detector_pointing.exec(
                            single_obs_view(data, ob), detectors=dets
                        )
            if self.shared_flags is not None and self.shared_flags in ob.shared:
                flags = ob.shared.jax_view(self.shared_flags)
                mask = self.shared_flag_mask
            else:
                flags = jnp.zeros(ob.n_local_samples, dtype=jnp.uint8)
                mask = 0
            if fused is None:
                quats = ob.detdata[quat_key].data
                cache_key = (id(quats), id(flags), mask, self.nside, self.nest)
            else:
                cache_key = (
                    id(fused[1]), id(fused[2]), fused[3], id(flags), mask,
                    self.nside, self.nest,
                )
            cache_tag = f"_cache_{self.pixels}"
            if (
                self.pixels in ob.detdata
                and ob._internal.get(cache_tag) == cache_key
            ):
                pix = ob.detdata[self.pixels].data
            else:
                if fused is None:
                    pix = k_pixels_healpix(
                        quats, flags, mask, self.nside, self.nest
                    )
                else:
                    pix = k_pixels_healpix_fused(
                        *fused, flags, mask, self.nside, self.nest
                    )
                ob.detdata.ensure(
                    self.pixels, sample_shape=(), dtype=np.int32, detectors=dets
                )
                ob.detdata[self.pixels].data = pix
                ob._internal[cache_tag] = cache_key
            if hit_submaps is not None or existing_dist is not None:
                # submap hit tracking (dense maps keep every submap on TPU,
                # so this is bookkeeping only): mark on device.  Cached per
                # observation by the pixel-array identity — repeated execs
                # (solver, final binning) skip the compare sweep.
                marks_tag = f"_cache_{self.pixels}_submaps"
                cached = ob._internal.get(marks_tag)
                if cached is not None and cached[0] == cache_key:
                    marks = cached[1]
                else:
                    # one-hot any-reduce instead of a scatter: XLA scatter
                    # costs ~9-16 ns/sample (scalar-issue bound on TPU),
                    # ~400 ms at 33M samples; the (n_samp, n_submap) compare
                    # + or-reduce streams on the VPU in a few ms
                    sub = pix.reshape(-1) // (self.n_pix // self.n_submap)
                    marks = _submap_marks(sub, self.n_submap)
                    ob._internal[marks_tag] = (cache_key, marks)
                if hit_submaps is not None:
                    # building a new distribution: the host needs the marks.
                    # Also pre-warm the coverage-check program (below) with
                    # an all-covered mask, so reuse passes in the same
                    # process never hit a first-time compile mid-pipeline.
                    hit_submaps |= np.asarray(marks)
                    _uncovered_count(
                        marks, jnp.asarray(np.zeros(self.n_submap, bool))
                    )
                else:
                    # reusing the existing distribution: queue a deferred
                    # coverage check (count of hit-but-unowned submaps).
                    # The uncovered mask is host-built: no eager device
                    # scatter / logical ops, hence no fresh compiles.
                    from ..utils.guards import defer_check

                    uncov = np.ones(self.n_submap, dtype=bool)
                    uncov[np.asarray(existing_dist.local_submaps)] = False
                    defer_check(
                        f"PixelsHealpix obs '{ob.name}': pointing hits "
                        f"submaps outside the reused distribution "
                        f"'{self.create_dist}' (delete the data key to "
                        f"rebuild it); uncovered submaps",
                        _uncovered_count(marks, jnp.asarray(uncov)),
                    )

        if hit_submaps is not None:
            data[self.create_dist] = PixelDistribution(
                n_pix=self.n_pix,
                n_submap=self.n_submap,
                local_submaps=np.nonzero(hit_submaps)[0],
                comm=data.comm,
            )

    def _requires(self):
        return {
            "global": [],
            "meta": [],
            "detdata": [self.quats],
            "shared": [],
            "intervals": [] if self.view is None else [self.view],
        }

    def _provides(self):
        prov = {
            "global": [] if self.create_dist is None else [self.create_dist],
            "meta": [],
            "detdata": [self.pixels],
            "shared": [],
            "intervals": [],
        }
        return prov
