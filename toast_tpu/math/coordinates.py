"""Coordinate transforms: horizontal <-> equatorial, solar ephemeris.

Rebuild of ``src/toast/coordinates.py`` without astropy/pyephem.  The
Az/El -> RA/Dec boresight transform follows the reference design
(``coordinates.py:235-330``): the horizontal->equatorial rotation is slowly
varying, so it is computed analytically at sparse time steps and SLERPed to
the full sample rate; the result left-multiplies the Az/El boresight
quaternions.

Conventions (matching the reference):
* Az/El quaternions are ``from_lonlat_angles(-az, el, psi)`` — azimuth is
  measured clockwise (East of North), ISO longitude counter-clockwise, so
  the horizontal frame is (North, West, Up).
* Sidereal time uses the IAU-1982 GMST polynomial; precession to J2000 uses
  the IAU-1976 zeta/z/theta polynomials (arcsecond-level — adequate for
  simulation work where scanning and map-making share the same transform).
* The built-in solar ephemeris is the standard low-precision algorithm
  (~0.01 deg), used for Sun avoidance flags.
"""

from __future__ import annotations

import numpy as np

from . import qarray as qa

_J2000_UNIX = 946728000.0  # 2000-01-01 12:00:00 UTC


def to_JD(t):
    return np.asarray(t, dtype=np.float64) / 86400.0 + 2440587.5


def to_MJD(t):
    return to_JD(t) - 2400000.5


def to_DJD(t):
    return to_JD(t) - 2415020.0


def gmst_rad(times):
    """Greenwich mean sidereal time in radians (IAU 1982)."""
    t = np.asarray(times, dtype=np.float64)
    du = (t - _J2000_UNIX) / 86400.0  # days since J2000.0 (UT)
    tu = du / 36525.0
    gmst_sec = (
        67310.54841
        + (876600.0 * 3600.0 + 8640184.812866) * tu
        + 0.093104 * tu * tu
        - 6.2e-6 * tu * tu * tu
    )
    return (gmst_sec % 86400.0) / 86400.0 * 2.0 * np.pi


def precession_rotmat_date_to_j2000(times):
    """IAU-1976 precession matrices rotating mean-of-date -> J2000."""
    t = np.atleast_1d(np.asarray(times, dtype=np.float64))
    T = (to_JD(t) - 2451545.0) / 36525.0
    arcsec = np.pi / (180.0 * 3600.0)
    zeta = (2306.2181 * T + 0.30188 * T**2 + 0.017998 * T**3) * arcsec
    z = (2306.2181 * T + 1.09468 * T**2 + 0.018203 * T**3) * arcsec
    theta = (2004.3109 * T - 0.42665 * T**2 - 0.041833 * T**3) * arcsec
    cz, sz = np.cos(zeta), np.sin(zeta)
    cZ, sZ = np.cos(z), np.sin(z)
    ct, st = np.cos(theta), np.sin(theta)
    # P(date->J2000) = Rz(zeta) Ry(-theta) Rz(z)
    m = np.empty(t.shape + (3, 3))
    m[..., 0, 0] = cz * ct * cZ - sz * sZ
    m[..., 0, 1] = -cz * ct * sZ - sz * cZ
    m[..., 0, 2] = -cz * st
    m[..., 1, 0] = sz * ct * cZ + cz * sZ
    m[..., 1, 1] = -sz * ct * sZ + cz * cZ
    m[..., 1, 2] = -sz * st
    m[..., 2, 0] = st * cZ
    m[..., 2, 1] = -st * sZ
    m[..., 2, 2] = ct
    return m


def hor_to_radec_rotmat(lat_rad, lon_rad, times, j2000=True):
    """Rotation matrices from the (North, West, Up) horizontal frame to
    equatorial RA/Dec at the given times."""
    t = np.atleast_1d(np.asarray(times, dtype=np.float64))
    lst = gmst_rad(t) + lon_rad  # local sidereal angle
    sl, cl = np.sin(lst), np.cos(lst)
    sp, cp = np.sin(lat_rad), np.cos(lat_rad)
    m = np.empty(t.shape + (3, 3))
    # columns = equatorial images of (North, West, Up)
    m[..., 0, 0] = -sp * cl
    m[..., 1, 0] = -sp * sl
    m[..., 2, 0] = cp
    m[..., 0, 1] = sl
    m[..., 1, 1] = -cl
    m[..., 2, 1] = 0.0
    m[..., 0, 2] = cp * cl
    m[..., 1, 2] = cp * sl
    m[..., 2, 2] = sp
    if j2000:
        prec = precession_rotmat_date_to_j2000(t)
        m = prec @ m
    return m


def azel_to_radec(site, times, quats_azel, use_ephem=False, use_qpoint=False):
    """Transform Az/El boresight quaternions to RA/Dec (J2000).

    Sparse analytic transform + SLERP, applied as
    ``q_radec = q_transform(t) x q_azel`` (reference ``coordinates.py:235``).
    """
    from ..utils import units as u

    times = np.asarray(times, dtype=np.float64)
    lat = site.lat.to_value(u.rad)
    lon = site.lon.to_value(u.rad)

    sparse_step = 120.0
    span = times[-1] - times[0]
    if span < sparse_step:
        # constant transform over a short span
        mats = hor_to_radec_rotmat(lat, lon, np.array([0.5 * (times[0] + times[-1])]))
        transform = qa.from_rotmat(mats)
        return qa.mult(transform, quats_azel)
    n_sparse = int(span / sparse_step) + 2
    sparse_times = np.linspace(times[0], times[-1], num=n_sparse, endpoint=True)
    mats = hor_to_radec_rotmat(lat, lon, sparse_times)
    sparse_quat = qa.from_rotmat(mats)
    # consistent sign branch for interpolation
    for i in range(1, len(sparse_quat)):
        if np.dot(sparse_quat[i - 1], sparse_quat[i]) < 0:
            sparse_quat[i] *= -1
    transform = qa.slerp(times, sparse_times, sparse_quat)
    return qa.mult(transform, quats_azel)


def azel_quat(az, el, psi=None):
    """Horizontal-frame boresight quaternions from az/el (radians)."""
    az = np.asarray(az, dtype=np.float64)
    el = np.asarray(el, dtype=np.float64)
    if psi is None:
        psi = np.zeros_like(az)
    return qa.from_lonlat_angles(-az, el, psi)


def sun_radec(times):
    """Low-precision solar RA/Dec (radians), ~0.01 deg accuracy."""
    t = np.asarray(times, dtype=np.float64)
    n = to_JD(t) - 2451545.0
    L = np.radians((280.460 + 0.9856474 * n) % 360.0)  # mean longitude
    g = np.radians((357.528 + 0.9856003 * n) % 360.0)  # mean anomaly
    lam = L + np.radians(1.915) * np.sin(g) + np.radians(0.020) * np.sin(2 * g)
    eps = np.radians(23.439 - 0.0000004 * n)
    ra = np.arctan2(np.cos(eps) * np.sin(lam), np.cos(lam))
    dec = np.arcsin(np.sin(eps) * np.sin(lam))
    return ra % (2.0 * np.pi), dec


def radec_to_azel(lat_rad, lon_rad, times, ra, dec):
    """Equatorial -> horizontal (az East-of-North, el), radians."""
    t = np.asarray(times, dtype=np.float64)
    lst = gmst_rad(t) + lon_rad
    H = lst - np.asarray(ra)
    sd, cd = np.sin(dec), np.cos(dec)
    sp, cp = np.sin(lat_rad), np.cos(lat_rad)
    sin_el = sp * sd + cp * cd * np.cos(H)
    el = np.arcsin(np.clip(sin_el, -1.0, 1.0))
    az = np.arctan2(
        -cd * np.sin(H), sd * cp - cd * sp * np.cos(H)
    )
    return az % (2.0 * np.pi), el


def sun_azel(site, times):
    from ..utils import units as u

    ra, dec = sun_radec(times)
    return radec_to_azel(
        site.lat.to_value(u.rad), site.lon.to_value(u.rad), times, ra, dec
    )


def moon_radec(times):
    """Low-precision geocentric lunar RA/Dec (radians).

    Truncated ELP-style series (the leading evection/variation terms of the
    classical low-precision formula): mean longitude + largest periodic
    corrections, ~0.3 deg accuracy — adequate for scheduling (moon
    avoidance, calibration-scan targeting), not for pointing reconstruction.
    The reference uses pyephem (``schedule_sim_ground.py``).
    """
    t = np.asarray(times, dtype=np.float64)
    d = to_JD(t) - 2451545.0
    L = np.radians((218.316 + 13.176396 * d) % 360.0)  # mean longitude
    M = np.radians((134.963 + 13.064993 * d) % 360.0)  # mean anomaly
    F = np.radians((93.272 + 13.229350 * d) % 360.0)  # argument of latitude
    Msun = np.radians((357.529 + 0.98560028 * d) % 360.0)
    D = np.radians((297.850 + 12.190749 * d) % 360.0)  # mean elongation
    lon = (
        L
        + np.radians(6.289) * np.sin(M)
        + np.radians(1.274) * np.sin(2 * D - M)  # evection
        + np.radians(0.658) * np.sin(2 * D)  # variation
        - np.radians(0.186) * np.sin(Msun)  # annual equation
    )
    lat = (
        np.radians(5.128) * np.sin(F)
        + np.radians(0.281) * np.sin(M + F)
    )
    eps = np.radians(23.4393)
    sl, cl = np.sin(lon), np.cos(lon)
    sb, cb = np.sin(lat), np.cos(lat)
    ra = np.arctan2(sl * cb * np.cos(eps) - sb * np.sin(eps), cl * cb)
    dec = np.arcsin(sb * np.cos(eps) + cb * np.sin(eps) * sl)
    return ra % (2.0 * np.pi), dec


def moon_azel(site, times):
    from ..utils import units as u

    ra, dec = moon_radec(times)
    return radec_to_azel(
        site.lat.to_value(u.rad), site.lon.to_value(u.rad), times, ra, dec
    )


def moon_phase(times):
    """Percent of the lunar disk illuminated (0 = new, 100 = full).

    Computed from the sun-moon elongation: illuminated fraction
    ``(1 - cos(elongation)) / 2``.  Matches the semantics of pyephem's
    ``Moon.phase`` used by the reference scheduler
    (``ref:src/toast/schedule_sim_ground.py:1994``).
    """
    ra_m, dec_m = moon_radec(times)
    ra_s, dec_s = sun_radec(times)
    cose = np.sin(dec_m) * np.sin(dec_s) + np.cos(dec_m) * np.cos(
        dec_s
    ) * np.cos(ra_m - ra_s)
    elong = np.arccos(np.clip(cose, -1.0, 1.0))
    return 100.0 * 0.5 * (1.0 - np.cos(elong))
