"""Pointing utilities.

Rebuild of ``src/toast/pointing_utils.py`` (``center_offset_lonlat:16``,
``scan_range_lonlat:71``): sky-footprint extents of observations.
"""

from __future__ import annotations

import numpy as np

from .math import qarray as qa
from .models.defaults import default_values as defaults


def center_offset_lonlat(quats, center_offset=None, degrees=False, is_azimuth=False):
    """Lon/lat (and optional recentering) of pointing quaternions."""
    vdir = qa.rotate(np.asarray(quats), np.array([0.0, 0.0, 1.0]))
    lon = np.arctan2(vdir[..., 1], vdir[..., 0])
    lat = np.arcsin(np.clip(vdir[..., 2], -1.0, 1.0))
    if is_azimuth:
        lon = -lon
    if center_offset is not None:
        lon = (lon - center_offset[0] + np.pi) % (2 * np.pi) - np.pi
        lat = lat - center_offset[1]
    if degrees:
        return np.degrees(lon), np.degrees(lat)
    return lon, lat


def scan_range_lonlat(ob, boresight=None, flags=None, flag_mask=0, field_of_view=None):
    """Lon/lat center and extent of one observation's boresight scan.

    Returns (lon_center, lat_center, lon_width, lat_height) in radians,
    padded by the focalplane field of view.
    """
    from .utils import units as u

    if boresight is None:
        boresight = defaults.boresight_radec
    quats = np.asarray(ob.shared[boresight])
    good = slice(None)
    if flags is not None and flags in ob.shared:
        f = np.asarray(ob.shared[flags])
        good = (f & flag_mask) == 0
    lon, lat = center_offset_lonlat(quats[good])
    lon0 = np.arctan2(np.mean(np.sin(lon)), np.mean(np.cos(lon)))
    dlon = (lon - lon0 + np.pi) % (2 * np.pi) - np.pi
    if field_of_view is not None:
        fov = field_of_view.to_value(u.rad)
    elif ob.telescope.focalplane.field_of_view is not None:
        fov = ob.telescope.focalplane.field_of_view.to_value(u.rad)
    else:
        fov = 0.0
    width = dlon.max() - dlon.min() + fov
    height = lat.max() - lat.min() + fov
    return (
        lon0,
        0.5 * (lat.max() + lat.min()),
        width,
        height,
    )
