"""Coordinate transform tests (self-consistency invariants)."""

import numpy as np

from toast_tpu.math import coordinates as coords
from toast_tpu.math import qarray as qa
from toast_tpu.models import GroundSite
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

SITE = GroundSite(
    "atacama",
    Quantity(-22.958, u.deg),
    Quantity(-67.786, u.deg),
    Quantity(5200.0, u.meter),
)
T0 = 1700000000.0  # 2023-11-14


def test_zenith_maps_to_site_latitude():
    times = np.array([T0])
    q = coords.azel_quat(np.array([0.0]), np.array([np.pi / 2]))
    q_radec = coords.azel_to_radec(SITE, times, q)
    vdir = qa.rotate(q_radec, np.array([0.0, 0.0, 1.0]))
    dec = np.arcsin(vdir[0, 2])
    # precession date->J2000 shifts by < 0.4 deg
    assert abs(np.degrees(dec) - (-22.958)) < 0.4


def test_north_horizon():
    times = np.array([T0])
    q = coords.azel_quat(np.array([0.0]), np.array([0.0]))
    q_radec = coords.azel_to_radec(SITE, times, q)
    vdir = qa.rotate(q_radec, np.array([0.0, 0.0, 1.0]))
    dec = np.degrees(np.arcsin(vdir[0, 2]))
    # north horizon: dec = 90 - |lat|... for southern site: dec = 90 + lat
    assert abs(dec - (90.0 - 22.958)) < 0.4


def test_transform_is_rigid():
    """Angular separations are preserved by the transform."""
    rng = np.random.default_rng(1)
    n = 50
    az = rng.uniform(0, 2 * np.pi, n)
    el = rng.uniform(0.1, np.pi / 2, n)
    times = np.full(n, T0)
    q = coords.azel_quat(az, el)
    q_radec = coords.azel_to_radec(SITE, times, q)
    v_h = qa.rotate(q, np.array([0.0, 0.0, 1.0]))
    v_e = qa.rotate(q_radec, np.array([0.0, 0.0, 1.0]))
    dots_h = v_h @ v_h.T
    dots_e = v_e @ v_e.T
    np.testing.assert_allclose(dots_e, dots_h, atol=1e-6)


def test_fixed_target_tracks_sidereal():
    """A fixed az/el target drifts in RA at the sidereal rate."""
    times = T0 + np.arange(0, 3600.0, 600.0)
    n = len(times)
    q = coords.azel_quat(np.zeros(n) + 1.0, np.full(n, 0.8))
    q_radec = coords.azel_to_radec(SITE, times, q)
    v = qa.rotate(q_radec, np.array([0.0, 0.0, 1.0]))
    ra = np.unwrap(np.arctan2(v[:, 1], v[:, 0]))
    dec = np.arcsin(v[:, 2])
    # RA advances at ~ sidereal rate; dec constant
    rate = np.diff(ra) / 600.0
    sidereal = 2 * np.pi / 86164.0905
    np.testing.assert_allclose(rate, sidereal, rtol=1e-3)
    np.testing.assert_allclose(dec, dec[0], atol=5e-5)


def test_radec_azel_roundtrip():
    lat = np.radians(-22.958)
    lon = np.radians(-67.786)
    rng = np.random.default_rng(2)
    ra = rng.uniform(0, 2 * np.pi, 20)
    dec = rng.uniform(-1.2, 1.2, 20)
    times = np.full(20, T0)
    az, el = coords.radec_to_azel(lat, lon, times, ra, dec)
    # convert back through the quaternion transform (no precession for
    # an exact round trip of the analytic rotation)
    m = coords.hor_to_radec_rotmat(lat, lon, times, j2000=False)
    v_h = np.stack(
        [np.cos(el) * np.cos(az), -np.cos(el) * np.sin(az), np.sin(el)], axis=-1
    )
    v_e = np.einsum("tij,tj->ti", m, v_h)
    ra2 = np.arctan2(v_e[:, 1], v_e[:, 0]) % (2 * np.pi)
    dec2 = np.arcsin(np.clip(v_e[:, 2], -1, 1))
    np.testing.assert_allclose(ra2, ra, atol=1e-9)
    np.testing.assert_allclose(dec2, dec, atol=1e-9)


def test_sun_position_sanity():
    # At the June solstice the Sun's declination is ~ +23.4 deg
    t_solstice = 1687000000.0  # 2023-06-17, near solstice
    ra, dec = coords.sun_radec(np.array([t_solstice]))
    assert abs(np.degrees(dec[0]) - 23.4) < 0.5
    # equinox: dec ~ 0
    t_equinox = 1695400000.0  # 2023-09-22
    ra, dec = coords.sun_radec(np.array([t_equinox]))
    assert abs(np.degrees(dec[0])) < 1.0


def test_sun_azel_day_night():
    """Sun elevation cycles through a day at the site."""
    times = T0 + np.arange(0, 86400.0, 1800.0)
    az, el = coords.sun_azel(SITE, times)
    assert el.max() > np.radians(30)
    assert el.min() < np.radians(-30)
