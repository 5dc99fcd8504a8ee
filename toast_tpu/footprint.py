"""Sky footprint helpers.

Rebuild of ``src/toast/footprint.py:169``: build a PixelDistribution from a
predeclared sky footprint instead of a pointing sweep.
"""

from __future__ import annotations

import numpy as np

from .math import healpix as hpx
from .pixels import PixelDistribution


def footprint_distribution(
    nside=None,
    n_submap=None,
    lonlat_corners_deg=None,
    healpix_submap_file=None,
    comm=None,
):
    """PixelDistribution covering a footprint.

    With ``lonlat_corners_deg`` (min_lon, min_lat, max_lon, max_lat), only
    submaps intersecting the rectangle are marked local; otherwise the full
    sky is used.
    """
    npix = hpx.nside2npix(nside)
    if n_submap is None:
        n_submap = min(1000, npix)
    dist = PixelDistribution(n_pix=npix, n_submap=n_submap, comm=comm)
    if lonlat_corners_deg is not None:
        lon_min, lat_min, lon_max, lat_max = np.radians(
            np.asarray(lonlat_corners_deg, dtype=np.float64)
        )
        pix = np.arange(npix)
        vec = hpx.nest2vec(nside, pix)
        lon = np.arctan2(vec[:, 1], vec[:, 0]) % (2 * np.pi)
        lat = np.arcsin(np.clip(vec[:, 2], -1, 1))
        inside = (lat >= lat_min) & (lat <= lat_max)
        lo = lon_min % (2 * np.pi)
        hi = lon_max % (2 * np.pi)
        if lo <= hi:
            inside &= (lon >= lo) & (lon <= hi)
        else:
            inside &= (lon >= lo) | (lon <= hi)
        submaps = np.unique(pix[inside] // dist.n_pix_submap)
        dist = PixelDistribution(
            n_pix=npix, n_submap=n_submap, local_submaps=submaps, comm=comm
        )
    return dist
