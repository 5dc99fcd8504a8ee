"""Ground observation scheduler.

Rebuild of the core of ``src/toast/schedule_sim_ground.py`` (3.7 kLoC):
given sky patches and a site, plan constant-elevation scans subject to
elevation limits, sun/moon avoidance, and patch priorities, producing a
:class:`~toast_tpu.models.schedule.GroundSchedule`.

This implementation covers the main scheduling loop (``build_schedule``,
reference ``:2379``): step through time, find visible patches, pick the
highest-priority one (weighted by hit deficit), observe it for ces_time,
and emit a GroundScan with the az range that covers the patch at the chosen
elevation.  Patch types: rectangular (``Patch``, optional max-time budget),
fixed-horizontal (``HorizontalPatch``), solar-system-object calibration
(``SSOPatch`` — sun/moon via built-in ephemerides), and forced cooler
cycles (``CoolerCyclePatch``).  Sun and moon avoidance are both supported.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np

from .math import coordinates as coords
from .models.schedule import GroundScan, GroundSchedule
from .utils import units as u
from .utils.logging import Logger
from .utils.units import Quantity


class Patch:
    """A rectangular sky patch with an observation priority
    (reference ``schedule_sim_ground.py:45``)."""

    def __init__(self, name, weight, corners_lonlat_deg, max_time=None):
        """corners_lonlat_deg: list of (ra_deg, dec_deg) corners.

        max_time: optional Quantity — stop observing once this much
        integration has accumulated (reference ``MaxDepthPatch:816``
        semantics expressed as a time budget).
        """
        self.name = name
        self.weight = float(weight)
        self.corners = np.radians(np.asarray(corners_lonlat_deg, dtype=np.float64))
        self.max_time_s = (
            None if max_time is None else max_time.to_value(u.second)
        )
        self.hits = 0
        self.time_observed = 0.0
        # elevation-balancing bookkeeping (reference schedule_sim_ground.py
        # elevation balancing: spread integration over scan elevations)
        self.el_time = 0.0
        self.el_time_weighted = 0.0

    @property
    def ra_center(self):
        return np.mean(self.corners[:, 0])

    @property
    def dec_center(self):
        return np.mean(self.corners[:, 1])

    def corners_azel(self, site, t):
        """Az/el of all patch corners at time t."""
        lat = site.lat.to_value(u.rad)
        lon = site.lon.to_value(u.rad)
        times = np.full(len(self.corners), t)
        return coords.radec_to_azel(
            lat, lon, times, self.corners[:, 0], self.corners[:, 1]
        )

    def priority(self, t):
        """Weighted hit deficit; exhausted patches drop out."""
        if self.max_time_s is not None and self.time_observed >= self.max_time_s:
            return -np.inf
        return self.weight / (1.0 + self.time_observed / 3600.0)

    def avoids(self, site, t, az, el, sun_rad, moon_rad):
        """True when the patch center clears the sun and moon."""
        azc = np.arctan2(np.mean(np.sin(az)), np.mean(np.cos(az)))
        elc = np.median(el)
        if sun_rad > 0:
            az_s, el_s = coords.sun_azel(site, np.array([t]))
            if el_s[0] > 0 and _angdist(azc, elc, az_s[0], el_s[0]) < sun_rad:
                return False
        if moon_rad > 0:
            az_m, el_m = coords.moon_azel(site, np.array([t]))
            if el_m[0] > 0 and _angdist(azc, elc, az_m[0], el_m[0]) < moon_rad:
                return False
        return True

    def visible(
        self,
        site,
        t,
        el_min,
        el_max,
        sun_rad,
        moon_rad,
        partial=False,
        min_visible_fraction=0.5,
    ):
        """(az_min, az_max, el_scan, ces_s or None) when observable at t.

        With ``partial`` (reference partial-visibility logic,
        ``schedule_sim_ground.py:2379`` region): the patch counts as
        observable when at least ``min_visible_fraction`` of its corners
        are inside the elevation limits, scanning only the visible part.
        """
        az, el = self.corners_azel(site, t)
        inside = (el >= el_min) & (el <= el_max)
        if partial:
            if inside.mean() < min_visible_fraction:
                return None
            az = az[inside]
            el = el[inside]
        elif not inside.all():
            return None
        if not self.avoids(site, t, az, el, sun_rad, moon_rad):
            return None
        # scan elevation: bottom of the (visible part of the) patch —
        # constant-elevation scanning sweeps it as the sky rotates through
        el_scan = max(el.min(), el_min)
        # unwrap azimuths around the circular mean to avoid branch issues
        az0 = np.arctan2(np.mean(np.sin(az)), np.mean(np.cos(az)))
        az_rel = (az - az0 + np.pi) % (2 * np.pi) - np.pi
        az_min = az0 + az_rel.min() - 0.05
        az_max = az0 + az_rel.max() + 0.05
        return az_min, az_max, el_scan, None


def _angdist(az1, el1, az2, el2):
    cosd = np.sin(el1) * np.sin(el2) + np.cos(el1) * np.cos(el2) * np.cos(az1 - az2)
    return np.arccos(np.clip(cosd, -1.0, 1.0))


def _check_sso(site, az_lo, az_hi, el, body_azel, angle_rad, alt_min_rad, t1, t2):
    """Does a solar-system object come within ``angle_rad`` of the CES?

    Mirrors the reference ``check_sso`` (``schedule_sim_ground.py:1186``):
    sample the scan's az range and the time span on a 10x10 grid; the body
    only matters while above ``alt_min_rad``.  Returns ``(too_close,
    t_safe)`` where ``t_safe`` is the last sampled time before the
    encroachment (== t2 when clear).
    """
    azs = np.linspace(az_lo, az_hi, 10)
    times = np.linspace(t1, t2, 10)
    az_b, el_b = body_azel(site, times)
    for i, t in enumerate(times):
        if el_b[i] <= alt_min_rad:
            continue
        min_dist = np.min(_angdist(azs, el, az_b[i], el_b[i]))
        if min_dist < angle_rad:
            return True, times[max(i - 1, 0)]
    return False, t2


class HorizontalPatch(Patch):
    """Fixed azimuth-range, fixed-elevation patch
    (reference ``schedule_sim_ground.py:541``): scans a constant horizontal
    window regardless of what sky drifts through it."""

    def __init__(self, name, weight, azmin, azmax, el, scantime):
        self.name = name
        self.weight = float(weight)
        self.az_min = azmin.to_value(u.rad)
        self.az_max = azmax.to_value(u.rad)
        self.el = el.to_value(u.rad)
        self.scantime_s = scantime.to_value(u.second)
        self.max_time_s = None
        self.hits = 0
        self.time_observed = 0.0
        # elevation-balancing bookkeeping (reference schedule_sim_ground.py
        # elevation balancing: spread integration over scan elevations)
        self.el_time = 0.0
        self.el_time_weighted = 0.0

    def visible(self, site, t, el_min, el_max, sun_rad, moon_rad, **kw):
        if self.el < el_min or self.el > el_max:
            return None
        az = np.array([self.az_min, self.az_max])
        el = np.array([self.el, self.el])
        if not self.avoids(site, t, az, el, sun_rad, moon_rad):
            return None
        return self.az_min, self.az_max, self.el, self.scantime_s


class WeightedHorizontalPatch(HorizontalPatch):
    """Horizontal patch whose priority follows a HEALPix weight map
    (reference ``schedule_sim_ground.py:660``): before each candidate
    scan, the sky the scan would sweep is hit-counted against the weight
    map (5-minute time steps x 10 azimuth points, a disc of ``fov/2``
    per pointing — the reference's fixed grid so total hits depend only
    on scan time), and the patch weight becomes
    ``weight0 / sum(hits * weightmap) * scantime``: zero-weight sky is
    never scheduled, and already-deep sky deprioritizes itself when the
    weight map encodes inverse depth."""

    _weightmaps = {}

    def __init__(self, name, weight, azmin, azmax, el, scantime, weightfile, fov):
        super().__init__(name, weight, azmin, azmax, el, scantime)
        self.weight0 = float(weight)
        self.fov_rad = fov.to_value(u.rad)
        self.weightfile = weightfile
        if weightfile not in self._weightmaps:
            self._weightmaps[weightfile] = self._load_weightmap(weightfile)
        wmap, nside, vecs = self._weightmaps[weightfile]
        self._wmap = wmap
        self._wm_nside = nside
        self._wm_vecs = vecs

    @staticmethod
    def _load_weightmap(path):
        from .math import healpix as hpx
        from .pixels.io_healpix import read_healpix_fits, read_healpix_hdf5

        if path.endswith((".h5", ".hdf5")):
            m = read_healpix_hdf5(path, nest=False).numpy()
        else:
            m = read_healpix_fits(path, nest=False).numpy()
        if m.ndim > 1:  # PixelData layout is (n_pix, n_value)
            m = m[:, 0]
        nside = hpx.npix2nside(m.shape[0])
        vecs = hpx.ring2vec(nside, np.arange(m.shape[0]))
        return m.astype(np.float64), nside, vecs

    def update_weight(self, site, t):
        """Hit-count the proposed scan against the weight map."""
        lat = site.lat.to_value(u.rad)
        lon = site.lon.to_value(u.rad)
        mats = None
        hits = np.zeros(self._wmap.shape[0])
        cos_fov = np.cos(self.fov_rad / 2.0)
        tstep = 300.0
        times = np.arange(t, t + self.scantime_s, tstep)
        azs = np.linspace(self.az_min, self.az_max, 10)
        mats = coords.hor_to_radec_rotmat(lat, lon, times)
        ce, se = np.cos(self.el), np.sin(self.el)
        # pointing unit vectors in the (North, West, Up) horizontal frame
        hvec = np.stack(
            [ce * np.cos(azs), -ce * np.sin(azs), np.full_like(azs, se)], -1
        )
        for m in mats:
            eq = hvec @ m.T  # (naz, 3) equatorial pointings
            # disc membership by dot product against the map pixel centers
            inside = (self._wm_vecs @ eq.T) > cos_fov  # (npix, naz)
            hits += inside.sum(axis=1)
        nhit = float(np.sum(hits * self._wmap))
        if nhit == 0:
            self.weight = 0.0
        else:
            # modulate by scan time so longer observations don't
            # automatically win (reference ``update_weight``)
            self.weight = self.weight0 / nhit * (self.scantime_s / 60.0)

    def priority(self, t):
        if self.weight == 0.0:
            return -np.inf
        return self.weight / (1.0 + self.time_observed / 3600.0)

    def visible(self, site, t, el_min, el_max, sun_rad, moon_rad, **kw):
        self.update_weight(site, t)
        if self.weight == 0.0:
            return None
        return super().visible(site, t, el_min, el_max, sun_rad, moon_rad, **kw)


class SiderealPatch(HorizontalPatch):
    """Horizontal patch observable only inside a local-sidereal-time
    window (reference ``schedule_sim_ground.py:745``): sidereal time
    equals the RA on the meridian, so the window selects what sky drifts
    through the fixed horizontal scan."""

    def __init__(
        self, name, weight, azmin, azmax, el,
        siderealtime_start, siderealtime_stop, scantime,
    ):
        super().__init__(name, weight, azmin, azmax, el, scantime)
        self.lst_start = siderealtime_start.to_value(u.rad) % (2 * np.pi)
        self.lst_stop = siderealtime_stop.to_value(u.rad) % (2 * np.pi)

    def visible(self, site, t, el_min, el_max, sun_rad, moon_rad, **kw):
        lst = float(
            (coords.gmst_rad(np.array([t]))[0] + site.lon.to_value(u.rad))
            % (2 * np.pi)
        )
        if self.lst_start < self.lst_stop:
            inside = self.lst_start <= lst <= self.lst_stop
        else:  # window wraps the zero meridian
            inside = lst >= self.lst_start or lst <= self.lst_stop
        if not inside:
            return None
        return super().visible(site, t, el_min, el_max, sun_rad, moon_rad, **kw)


class SSOPatch(Patch):
    """Solar-system-object patch (reference ``schedule_sim_ground.py:394``):
    tracks a moving body (sun or moon via the built-in low-precision
    ephemerides) with a circular footprint of the given radius, for
    calibration scans."""

    _BODIES = {"sun": coords.sun_azel, "moon": coords.moon_azel}

    def __init__(self, name, weight, radius, body=None):
        self.name = name
        self.weight = float(weight)
        self.radius = radius.to_value(u.rad)
        key = (body or name.split(";")[0]).lower()
        if key not in self._BODIES:
            raise ValueError(
                f"Unknown SSO body '{key}' (built-in ephemerides: sun, moon)"
            )
        self.body = key
        self.max_time_s = None
        self.hits = 0
        self.time_observed = 0.0
        # elevation-balancing bookkeeping (reference schedule_sim_ground.py
        # elevation balancing: spread integration over scan elevations)
        self.el_time = 0.0
        self.el_time_weighted = 0.0

    def visible(self, site, t, el_min, el_max, sun_rad, moon_rad, **kw):
        az_b, el_b = self._BODIES[self.body](site, np.array([t]))
        azc, elc = float(az_b[0]), float(el_b[0])
        if elc - self.radius < el_min or elc + self.radius > el_max:
            return None
        # never avoid the body being targeted
        if self.body != "sun" and sun_rad > 0:
            az_s, el_s = coords.sun_azel(site, np.array([t]))
            if el_s[0] > 0 and _angdist(azc, elc, az_s[0], el_s[0]) < sun_rad:
                return None
        if self.body != "moon" and moon_rad > 0:
            az_m, el_m = coords.moon_azel(site, np.array([t]))
            if el_m[0] > 0 and _angdist(azc, elc, az_m[0], el_m[0]) < moon_rad:
                return None
        half_az = self.radius / max(np.cos(elc), 0.05)
        return azc - half_az, azc + half_az, elc - self.radius, None


class MaxDepthPatch(Patch):
    """Maximum-depth patch (reference ``schedule_sim_ground.py:816``):
    tracks a fixed sky CENTER instead of corners — the telescope scans a
    fixed azimuth throw around the center's current azimuth at (clamped)
    its current elevation, accumulating depth on one spot.  The primary
    South-Pole-style deep-survey target type."""

    def __init__(
        self, name, weight, center_lonlat_deg, radius, throw, scantime,
    ):
        self.name = name
        self.weight = float(weight)
        self.center = np.radians(
            np.asarray(center_lonlat_deg, dtype=np.float64)
        )
        self.radius = radius.to_value(u.rad)
        self.throw = throw.to_value(u.rad)
        self.scantime_s = scantime.to_value(u.second)
        self.max_time_s = None
        self.hits = 0
        self.time_observed = 0.0
        self.el_time = 0.0
        self.el_time_weighted = 0.0

    def center_azel(self, site, t):
        lat = site.lat.to_value(u.rad)
        lon = site.lon.to_value(u.rad)
        az, el = coords.radec_to_azel(
            lat, lon, np.array([t]),
            np.array([self.center[0]]), np.array([self.center[1]]),
        )
        return float(az[0]), float(el[0])

    def corners_azel(self, site, t):
        """Degenerate 'corners': the fixed az throw at the center's el
        (reference ``MaxDepthPatch.corner_coordinates``)."""
        az_c, el_c = self.center_azel(site, t)
        return (
            np.array([az_c - self.throw / 2, az_c + self.throw / 2]),
            np.array([el_c, el_c]),
        )

    def visible(self, site, t, el_min, el_max, sun_rad, moon_rad, **kw):
        az_c, el_c = self.center_azel(site, t)
        # reference visibility window: the center may sit up to `radius`
        # outside the el limits, the scan elevation is clamped inside
        if el_c < el_min - self.radius or el_c > el_max + self.radius:
            return None
        el = float(np.clip(el_c, el_min, el_max))
        az = np.array([az_c - self.throw / 2, az_c + self.throw / 2])
        if not self.avoids(site, t, az, np.array([el, el]), sun_rad, moon_rad):
            return None
        return az[0], az[1], el, self.scantime_s


class CoolerCyclePatch(Patch):
    """Forced cryocooler-cycle slot (reference ``schedule_sim_ground.py:465``):
    schedulable after ``hold_time_min`` since the last cycle, with priority
    growing until it becomes mandatory at ``hold_time_max``.  The 'scan' is
    a stationary dwell of ``cycle_time`` at the given az/el."""

    def __init__(
        self,
        name,
        weight,
        hold_time_min,
        hold_time_max,
        cycle_time,
        az=Quantity(180.0, u.deg),
        el=Quantity(45.0, u.deg),
        last_cycle_end=0.0,
    ):
        self.name = name
        self.weight = float(weight)
        self.hold_min_s = hold_time_min.to_value(u.second)
        self.hold_max_s = hold_time_max.to_value(u.second)
        self.cycle_s = cycle_time.to_value(u.second)
        self.az = az.to_value(u.rad)
        self.el = el.to_value(u.rad)
        self.last_cycle_end = last_cycle_end
        self.max_time_s = None
        self.hits = 0
        self.time_observed = 0.0
        # elevation-balancing bookkeeping (reference schedule_sim_ground.py
        # elevation balancing: spread integration over scan elevations)
        self.el_time = 0.0
        self.el_time_weighted = 0.0

    def priority(self, t):
        held = t - self.last_cycle_end
        if held < self.hold_min_s:
            return -np.inf
        if held >= self.hold_max_s:
            return np.inf  # mandatory
        frac = (held - self.hold_min_s) / max(
            self.hold_max_s - self.hold_min_s, 1.0
        )
        return self.weight * frac

    def visible(self, site, t, el_min, el_max, sun_rad, moon_rad, **kw):
        if t - self.last_cycle_end < self.hold_min_s:
            return None
        return self.az - 0.01, self.az + 0.01, self.el, self.cycle_s


def _extent_at_el(site, patch, t, el, fp_radius):
    """Azimuthal extent of the patch polygon along elevation ``el``
    (reference ``current_extent_pole:1768``): corner azimuths within
    ``fp_radius`` of the line, plus interpolated crossings of polygon
    edges straddling it.  Returns (az_min, az_max) or None."""
    azs, els = patch.corners_azel(site, t)
    n = len(azs)
    radius = max(np.radians(1.0), fp_radius)
    cross = []
    for i in range(n):
        j = (i + 1) % n
        if abs(els[i] - el) < radius:
            cross.append(azs[i])
        if abs(els[j] - el) < radius:
            cross.append(azs[j])
        if abs(els[i] - el) < radius or abs(els[j] - el) < radius:
            continue
        if (els[i] - el) * (els[j] - el) < 0:
            az1, az2 = azs[i], azs[j]
            el1, el2 = els[i] - el, els[j] - el
            if az2 - az1 > np.pi:
                az1 += 2 * np.pi
            if az1 - az2 > np.pi:
                az2 += 2 * np.pi
            cross.append((az1 + el1 * (az2 - az1) / (el1 - el2)) % (2 * np.pi))
    if not cross:
        return None
    cross = np.asarray(cross)
    # unwind into a compact cluster around the first crossing
    ref = cross[0]
    cross = ref + (cross - ref + np.pi) % (2 * np.pi) - np.pi
    return float(cross.min()), float(cross.max())


def _pole_raster_time(
    el_start, el_stop, az_range, el_rate, el_accel, az_rate_sky,
    az_accel_mount, raster_el_step,
):
    """Duration of an az-locked raster covering one pole elevation step
    (reference ``get_pole_raster_scan:1614`` kinematics)."""
    t_accel_el = el_rate / el_accel
    if el_accel * t_accel_el**2 > raster_el_step:
        t_el_step = 2 * np.sqrt(raster_el_step / el_accel)
    else:
        el_scan = raster_el_step - el_accel * t_accel_el**2
        t_el_step = 2 * t_accel_el + el_scan / el_rate
    nstep = max(1, int((el_stop - el_start) / raster_el_step))
    total = 0.0
    el = el_start
    for istep in range(nstep):
        scan_time = np.cos(el) * az_range / az_rate_sky
        az_rate_mount = az_rate_sky / np.cos(el)
        turnaround = az_rate_mount / az_accel_mount * 2
        total += 2 * scan_time + 2 * turnaround
        if istep < nstep - 1:
            el += raster_el_step
            total += t_el_step
    return total


def _pole_scan_sequence(
    site, patch, t, el_min, el_max, fp_radius, pole_el_step, pole_ces_s,
    t_limit, raster=None,
):
    """The pole-mode observation of one patch: a sequence of
    constant-elevation scans stepping UP through the patch (reference
    ``attempt_scan_pole:1214`` / ``scan_patch_pole:1697``).  Pole
    scheduling does not wait for sky drift — at a polar site the patch
    barely moves, so the telescope rasters through it in elevation.

    Returns a list of (el, az_min, az_max, t0, t1) subscans, or None.
    """
    azs, els = patch.corners_azel(site, t)
    el = float(np.min(els)) - fp_radius  # just below the patch
    if el < el_min or el > el_max:
        return None
    subscans = []
    while t < t_limit:
        azs, els = patch.corners_azel(site, t)
        if np.max(els) + fp_radius < el:
            break  # stepped past the top of the patch
        # az extent along this elevation, unioned over the scan duration
        ces = pole_ces_s
        if raster is not None:
            ext0 = _extent_at_el(site, patch, t, el, fp_radius)
            if ext0 is not None:
                ces = _pole_raster_time(
                    el, el + pole_el_step, ext0[1] - ext0[0], **raster
                )
        lo, hi = None, None
        for ts in np.arange(t, min(t + ces, t_limit) + 1.0, 60.0):
            ext = _extent_at_el(site, patch, ts, el, fp_radius)
            if ext is None:
                continue
            lo = ext[0] if lo is None else min(lo, ext[0])
            hi = ext[1] if hi is None else max(hi, ext[1])
        if lo is not None:
            subscans.append((el, lo, hi, t, min(t + ces, t_limit)))
            t = min(t + ces, t_limit)
        el += pole_el_step
        if el > el_max:
            break
    if raster is not None and subscans:
        # az-locked raster: every subscan spans the full union range
        lo = min(s[1] for s in subscans)
        hi = max(s[2] for s in subscans)
        subscans = [(el, lo, hi, t0, t1) for el, _, _, t0, t1 in subscans]
    return subscans or None


def build_schedule(
    telescope_name="telescope",
    site_name="site",
    site_lat=Quantity(-22.96, u.deg),
    site_lon=Quantity(-67.79, u.deg),
    site_alt=Quantity(5200.0, u.meter),
    start=None,
    stop=None,
    patches=None,
    el_min=Quantity(30.0, u.deg),
    el_max=Quantity(80.0, u.deg),
    sun_avoidance_angle=Quantity(30.0, u.deg),
    moon_avoidance_angle=Quantity(0.0, u.deg),
    ces_max_time=Quantity(20.0, u.minute),
    gap=Quantity(1.0, u.minute),
    gap_small=Quantity(10.0, u.second),
    partial_visibility=False,
    elevation_balance=False,
    sun_avoidance_altitude=Quantity(-18.0, u.deg),
    moon_avoidance_altitude=Quantity(-18.0, u.deg),
    operational_days=None,
    timezone_hours=0.0,
    elevations=None,
    boresight_angle_step=Quantity(0.0, u.deg),
    boresight_angle_time=None,
    ces_min_time=Quantity(1.0, u.second),
    north_south_avoidance=Quantity(0.0, u.deg),
    pole_mode=False,
    pole_el_step=Quantity(0.25, u.deg),
    pole_ces_time=Quantity(20.0, u.minute),
    pole_raster_scan=False,
    fp_radius=Quantity(0.0, u.deg),
    az_rate_sky=Quantity(1.0, u.deg / u.second),
    az_accel_mount=Quantity(1.0, u.deg / (u.second * u.second)),
    el_rate=Quantity(1.0, u.deg / u.second),
    el_accel=Quantity(1.0, u.deg / (u.second * u.second)),
    pole_raster_el_step=Quantity(0.02, u.deg),
):
    """Plan constant-elevation scans of the given patches.

    ``partial_visibility`` admits patches with only part of their corners
    inside the elevation limits (scanning the visible part);
    ``elevation_balance`` boosts patches whose currently-available scan
    elevation differs from their time-weighted mean observed elevation,
    spreading integration depth over elevations (reference
    ``schedule_sim_ground.py:2379`` behaviors).

    Reference-parity options (``schedule_sim_ground.py`` CLI):

    * sun/moon avoidance is enforced over the FULL scan az range and
      duration on a 10x10 grid (reference ``check_sso:1186``), with
      avoidance altitudes below which the body is ignored;
      HorizontalPatch and partial scans are truncated at the encroachment
      time, regular patches are skipped (``SunTooClose``/``MoonTooClose``
      semantics);
    * ``operational_days`` stops scheduling once scans span more than that
      many distinct local days (``timezone_hours`` sets the day boundary,
      reference ``--operational-days``/``--timezone``);
    * ``elevations`` (sequence of Quantity) snaps each scan elevation up
      to a discrete allowed grid (reference ``--elevations-deg``);
    * ``boresight_angle_step``/``boresight_angle_time`` rotate the
      boresight on a time schedule (reference ``--boresight-angle-step-deg``
      / ``--boresight-angle-time-min``);
    * every scan records sun/moon az/el at its endpoints and the mean moon
      phase, like the reference schedule format;
    * ``pole_mode`` schedules South-Pole style: corner patches are swept
      by a SEQUENCE of constant-elevation scans stepping ``pole_el_step``
      up from just below the patch, each lasting ``pole_ces_time``
      (reference ``attempt_scan_pole:1214``); ``pole_raster_scan``
      replaces the fixed CES time with the az-locked raster duration
      computed from the mount kinematics (``get_pole_raster_scan:1614``).

    Returns a GroundSchedule.
    """
    from .models.instrument import GroundSite

    log = Logger.get()
    if start is None:
        start = datetime(2023, 1, 1, tzinfo=timezone.utc)
    if stop is None:
        stop = start + timedelta(days=1)
    if start.tzinfo is None:
        start = start.replace(tzinfo=timezone.utc)
    if stop.tzinfo is None:
        stop = stop.replace(tzinfo=timezone.utc)
    if not patches:
        raise ValueError("at least one patch is required")

    site = GroundSite(site_name, site_lat, site_lon, site_alt)
    el_min_rad = el_min.to_value(u.rad)
    el_max_rad = el_max.to_value(u.rad)
    sun_rad = sun_avoidance_angle.to_value(u.rad)
    moon_rad = moon_avoidance_angle.to_value(u.rad)
    sun_alt_rad = sun_avoidance_altitude.to_value(u.rad)
    moon_alt_rad = moon_avoidance_altitude.to_value(u.rad)
    ces_s = ces_max_time.to_value(u.second)
    ces_min_s = ces_min_time.to_value(u.second)
    gap_s = gap.to_value(u.second)
    el_grid = (
        None
        if not elevations
        else np.sort(np.asarray([e.to_value(u.rad) for e in elevations]))
    )
    ns_avoid_rad = north_south_avoidance.to_value(u.rad)
    fp_radius_rad = fp_radius.to_value(u.rad)
    pole_el_step_rad = pole_el_step.to_value(u.rad)
    pole_ces_s = pole_ces_time.to_value(u.second)
    raster = (
        {
            "el_rate": el_rate.to_value(u.rad / u.second),
            "el_accel": el_accel.to_value(u.rad / (u.second * u.second)),
            "az_rate_sky": az_rate_sky.to_value(u.rad / u.second),
            "az_accel_mount": az_accel_mount.to_value(
                u.rad / (u.second * u.second)
            ),
            "raster_el_step": pole_raster_el_step.to_value(u.rad),
        }
        if pole_raster_scan
        else None
    )
    bore_step_rad = boresight_angle_step.to_value(u.rad)
    bore_time_s = (
        None
        if boresight_angle_time is None
        else boresight_angle_time.to_value(u.second)
    )

    scans = []
    t = start.timestamp()
    t_stop = stop.timestamp()
    scan_idx = {p.name: 0 for p in patches}
    ods = set()
    while t < t_stop:
        # rank visible patches by priority; try candidates in order so a
        # mid-scan sun/moon encroachment on one patch falls through to the
        # next (reference attempt_scan semantics)
        candidates = []
        for patch in patches:
            score = patch.priority(t)
            if score == -np.inf:
                continue
            if pole_mode and not isinstance(
                patch,
                (HorizontalPatch, SSOPatch, CoolerCyclePatch, MaxDepthPatch),
            ):
                # pole visibility criterion (get_constant_elevation_pole:
                # 1436): the sweep STARTS just below the patch; only that
                # first elevation must be inside the limits — the patch
                # top may exceed el_max
                az_c, els_c = patch.corners_azel(site, t)
                el0 = float(np.min(els_c)) - fp_radius_rad
                if el0 < el_min_rad or el0 > el_max_rad:
                    continue
                if not patch.avoids(site, t, az_c, els_c, sun_rad, moon_rad):
                    continue
                az0 = np.arctan2(np.mean(np.sin(az_c)), np.mean(np.cos(az_c)))
                az_rel = (az_c - az0 + np.pi) % (2 * np.pi) - np.pi
                vis = (az0 + az_rel.min(), az0 + az_rel.max(), el0, None)
            else:
                vis = patch.visible(
                    site,
                    t,
                    el_min_rad,
                    el_max_rad,
                    sun_rad,
                    moon_rad,
                    partial=partial_visibility,
                )
            if vis is None:
                continue
            if elevation_balance and patch.el_time > 0:
                mean_el = patch.el_time_weighted / patch.el_time
                score *= 1.0 + 2.0 * abs(vis[2] - mean_el)
            candidates.append((score, len(candidates), patch, vis))
        candidates.sort(key=lambda c: -c[0])

        chosen = None
        for score, _, patch, (az_min, az_max, el_scan, patch_ces) in candidates:
            if ns_avoid_rad > 0.0:
                # reject scans whose azimuth range enters the sector of
                # half-width avoid/2 around due North or due South
                # (reference ``north_south_avoidance_deg``, ``:1581``)
                a0 = az_min % (2 * np.pi)
                a1 = a0 + (az_max - az_min)
                half = ns_avoid_rad / 2.0
                if a0 < np.pi:
                    if a0 < half or a1 > np.pi - half:
                        continue
                else:
                    if a0 < np.pi + half or a1 > 2 * np.pi - half:
                        continue
            if el_grid is not None and not isinstance(
                patch, (HorizontalPatch, SSOPatch, CoolerCyclePatch,
                        MaxDepthPatch)
            ):
                # snap the scan elevation UP to the allowed grid (the scan
                # must still clear the patch bottom)
                k = np.searchsorted(el_grid, el_scan - 1e-9)
                if k >= len(el_grid) or el_grid[k] > el_max_rad:
                    continue
                el_scan = max(el_scan, el_grid[k])
            t_end = min(t + (patch_ces if patch_ces else ces_s), t_stop)
            truncatable = partial_visibility or isinstance(
                patch, HorizontalPatch
            )
            clear = True
            own_body = patch.body if isinstance(patch, SSOPatch) else None
            for body, body_azel, ang, alt in (
                ("sun", coords.sun_azel, sun_rad, sun_alt_rad),
                ("moon", coords.moon_azel, moon_rad, moon_alt_rad),
            ):
                if ang <= 0 or body == own_body:
                    # a calibration patch tracking this body scans AT it
                    continue
                too_close, t_safe = _check_sso(
                    site, az_min, az_max, el_scan, body_azel, ang, alt, t, t_end
                )
                if too_close:
                    if truncatable and t_safe - t >= ces_min_s:
                        t_end = min(t_end, t_safe)
                    else:
                        clear = False
                        break
            if not clear or t_end - t < ces_min_s:
                continue
            chosen = (patch, az_min, az_max, el_scan, t_end)
            break

        if chosen is None:
            t += 600.0  # nothing observable; try again in 10 minutes
            continue
        patch, az_min, az_max, el_scan, t_end = chosen
        if operational_days is not None:
            od = int((t + 3600.0 * timezone_hours) // 86400.0)
            ods.add(od)
            if len(ods) > operational_days:
                break
        if isinstance(patch, CoolerCyclePatch):
            patch.last_cycle_end = t_end
        bore = 0.0
        if bore_step_rad != 0.0:
            steps_per_cycle = max(
                1, int(round(2.0 * np.pi / abs(bore_step_rad)))
            )
            if bore_time_s:
                k = int((t - start.timestamp()) // bore_time_s)
            else:
                k = len(scans)
            bore = (k % steps_per_cycle) * bore_step_rad
        def _emit(az_lo, az_hi, el_s, t0, t1, sub):
            tb = np.array([t0, t1])
            sun_az_be, sun_el_be = coords.sun_azel(site, tb)
            moon_az_be, moon_el_be = coords.moon_azel(site, tb)
            phase = float(np.mean(coords.moon_phase(tb)))
            scans.append(
                GroundScan(
                    name=patch.name,
                    start=datetime.fromtimestamp(t0, tz=timezone.utc),
                    stop=datetime.fromtimestamp(t1, tz=timezone.utc),
                    az_min=Quantity(az_lo, u.rad),
                    az_max=Quantity(az_hi, u.rad),
                    el=Quantity(el_s, u.rad),
                    scan_indx=scan_idx[patch.name],
                    subscan_indx=sub,
                    boresight_angle=Quantity(bore, u.rad),
                    sun_az_begin=Quantity(sun_az_be[0], u.rad),
                    sun_az_end=Quantity(sun_az_be[1], u.rad),
                    sun_el_begin=Quantity(sun_el_be[0], u.rad),
                    sun_el_end=Quantity(sun_el_be[1], u.rad),
                    moon_az_begin=Quantity(moon_az_be[0], u.rad),
                    moon_az_end=Quantity(moon_az_be[1], u.rad),
                    moon_el_begin=Quantity(moon_el_be[0], u.rad),
                    moon_el_end=Quantity(moon_el_be[1], u.rad),
                    moon_phase=phase,
                )
            )
            patch.time_observed += t1 - t0
            patch.el_time += t1 - t0
            patch.el_time_weighted += (t1 - t0) * el_s

        pole_seq = None
        if pole_mode and not isinstance(
            patch, (HorizontalPatch, SSOPatch, CoolerCyclePatch, MaxDepthPatch)
        ):
            # South-Pole scheduling: sweep the patch with constant-
            # elevation subscans stepping up (attempt_scan_pole:1214)
            pole_seq = _pole_scan_sequence(
                site, patch, t, el_min_rad, el_max_rad, fp_radius_rad,
                pole_el_step_rad, pole_ces_s, t_stop, raster=raster,
            )
        if pole_seq is not None:
            for sub, (el_s, az_lo, az_hi, t0, t1) in enumerate(pole_seq):
                _emit(az_lo, az_hi, el_s, t0, t1, sub)
            t = pole_seq[-1][4] + gap_s
        else:
            _emit(az_min, az_max, el_scan, t, t_end, 0)
            t = t_end + gap_s
        patch.hits += 1
        scan_idx[patch.name] += 1

    log.info(
        f"build_schedule: {len(scans)} scans of {len(patches)} patches "
        f"over {(t_stop - start.timestamp()) / 86400:.1f} days"
        + (f" ({len(ods)} operational days)" if ods else "")
    )
    return GroundSchedule(
        scans=scans,
        site_name=site_name,
        telescope_name=telescope_name,
        site_lat=site_lat,
        site_lon=site_lon,
        site_alt=site_alt,
    )




def _is_float(s):
    try:
        float(s)
        return True
    except ValueError:
        return False

def run_scheduler(opts=None):
    """CLI for the ground scheduler (reference ``schedule_sim_ground.py:3697``)."""
    import argparse

    parser = argparse.ArgumentParser(description="TOAST-TPU ground scheduler")
    parser.add_argument("--site-name", default="atacama")
    parser.add_argument("--telescope", default="telescope")
    parser.add_argument("--site-lat", default="-22.958 deg")
    parser.add_argument("--site-lon", default="-67.786 deg")
    parser.add_argument("--site-alt", default="5200 m")
    parser.add_argument("--start", default="2023-01-01 00:00:00")
    parser.add_argument("--stop", default="2023-01-02 00:00:00")
    parser.add_argument("--el-min", default="30 deg")
    parser.add_argument("--el-max", default="80 deg")
    parser.add_argument("--sun-avoidance-angle", default="30 deg")
    parser.add_argument("--moon-avoidance-angle", default="0 deg")
    parser.add_argument("--sun-avoidance-altitude", default="-18 deg")
    parser.add_argument("--moon-avoidance-altitude", default="-18 deg")
    parser.add_argument("--ces-max-time", default="20 min")
    parser.add_argument("--ces-min-time", default="1 s")
    parser.add_argument("--gap", default="60 s")
    parser.add_argument(
        "--operational-days", type=int, default=None,
        help="Stop after this many distinct local observing days",
    )
    parser.add_argument(
        "--timezone", type=float, default=0.0,
        help="UTC offset in hours defining operational-day boundaries",
    )
    parser.add_argument(
        "--elevations",
        default=None,
        help="Comma-separated allowed scan elevations in degrees",
    )
    parser.add_argument("--boresight-angle-step", default="0 deg")
    parser.add_argument(
        "--boresight-angle-time", default=None,
        help="Rotate the boresight on this time cadence (e.g. '60 min')",
    )
    parser.add_argument("--partial-visibility", action="store_true")
    parser.add_argument("--elevation-balance", action="store_true")
    parser.add_argument(
        "--north-south-avoidance", default="0 deg",
        help="Reject scans entering this sector around due North/South",
    )
    parser.add_argument("--pole-mode", action="store_true",
                        help="South-Pole scheduling: elevation-stepped scans")
    parser.add_argument("--pole-el-step", default="0.25 deg")
    parser.add_argument("--pole-ces-time", default="20 min")
    parser.add_argument("--pole-raster-scan", action="store_true",
                        help="Az-locked raster timing from mount kinematics")
    parser.add_argument("--fp-radius", default="0 deg")
    parser.add_argument(
        "--patch",
        action="append",
        required=True,
        help="name,weight,lon_min,lat_max,lon_max,lat_min (deg)",
    )
    parser.add_argument("--out", default="schedule.txt")
    args = parser.parse_args(opts)

    from .utils.units import quantity_from_string as qs

    patches = []
    for pstr in args.patch:
        parts = pstr.split(",")
        name = parts[0]
        kind = parts[1].upper() if not _is_float(parts[1]) else "RECT"
        if kind == "HORIZONTAL":
            # name,HORIZONTAL,weight,azmin_deg,azmax_deg,el_deg,scantime_min
            patches.append(
                HorizontalPatch(
                    name,
                    float(parts[2]),
                    Quantity(float(parts[3]), u.deg),
                    Quantity(float(parts[4]), u.deg),
                    Quantity(float(parts[5]), u.deg),
                    Quantity(float(parts[6]), u.minute),
                )
            )
        elif kind == "WEIGHTED":
            # name,WEIGHTED,weight,azmin_deg,azmax_deg,el_deg,scantime_min,weightfile,fov_deg
            patches.append(
                WeightedHorizontalPatch(
                    name,
                    float(parts[2]),
                    Quantity(float(parts[3]), u.deg),
                    Quantity(float(parts[4]), u.deg),
                    Quantity(float(parts[5]), u.deg),
                    Quantity(float(parts[6]), u.minute),
                    parts[7],
                    Quantity(float(parts[8]), u.deg),
                )
            )
        elif kind == "SIDEREAL":
            # name,SIDEREAL,weight,azmin_deg,azmax_deg,el_deg,lst_start_deg,lst_stop_deg,scantime_min
            patches.append(
                SiderealPatch(
                    name,
                    float(parts[2]),
                    Quantity(float(parts[3]), u.deg),
                    Quantity(float(parts[4]), u.deg),
                    Quantity(float(parts[5]), u.deg),
                    Quantity(float(parts[6]), u.deg),
                    Quantity(float(parts[7]), u.deg),
                    Quantity(float(parts[8]), u.minute),
                )
            )
        elif kind == "SSO":
            # name,SSO,weight,radius_deg   (name = sun or moon)
            patches.append(
                SSOPatch(name, float(parts[2]), Quantity(float(parts[3]), u.deg))
            )
        elif kind in ("MAX-DEPTH", "MAX_DEPTH"):
            # name,MAX-DEPTH,weight,lon_deg,lat_deg,radius_deg,throw_deg,scantime_min
            # (reference parse_patch_max_depth:3196)
            patches.append(
                MaxDepthPatch(
                    name,
                    float(parts[2]),
                    (float(parts[3]), float(parts[4])),
                    Quantity(float(parts[5]), u.deg),
                    Quantity(float(parts[6]), u.deg),
                    Quantity(float(parts[7]), u.minute),
                )
            )
        elif kind == "COOLER":
            # name,COOLER,weight,hold_min_h,hold_max_h,cycle_min[,az_deg,el_deg]
            extra = {}
            if len(parts) > 6:
                extra["az"] = Quantity(float(parts[6]), u.deg)
                extra["el"] = Quantity(float(parts[7]), u.deg)
            patches.append(
                CoolerCyclePatch(
                    name,
                    float(parts[2]),
                    Quantity(float(parts[3]), u.hour),
                    Quantity(float(parts[4]), u.hour),
                    Quantity(float(parts[5]), u.minute),
                    **extra,
                )
            )
        elif kind != "RECT":
            raise ValueError(
                f"Unknown patch type '{parts[1]}' in '{pstr}' — expected a "
                "numeric weight (rectangle) or HORIZONTAL / WEIGHTED / "
                "SIDEREAL / SSO / COOLER / MAX-DEPTH"
            )
        else:
            weight = float(parts[1])
            lon_min, lat_max, lon_max, lat_min = [float(x) for x in parts[2:6]]
            corners = [
                (lon_min, lat_max),
                (lon_max, lat_max),
                (lon_max, lat_min),
                (lon_min, lat_min),
            ]
            patches.append(Patch(name, weight, corners))

    def parse_time(s):
        return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)

    schedule = build_schedule(
        telescope_name=args.telescope,
        site_name=args.site_name,
        site_lat=qs(args.site_lat),
        site_lon=qs(args.site_lon),
        site_alt=qs(args.site_alt),
        start=parse_time(args.start),
        stop=parse_time(args.stop),
        patches=patches,
        el_min=qs(args.el_min),
        el_max=qs(args.el_max),
        sun_avoidance_angle=qs(args.sun_avoidance_angle),
        moon_avoidance_angle=qs(args.moon_avoidance_angle),
        sun_avoidance_altitude=qs(args.sun_avoidance_altitude),
        moon_avoidance_altitude=qs(args.moon_avoidance_altitude),
        ces_max_time=qs(args.ces_max_time),
        ces_min_time=qs(args.ces_min_time),
        gap=qs(args.gap),
        operational_days=args.operational_days,
        timezone_hours=args.timezone,
        elevations=(
            None
            if not args.elevations
            else [
                Quantity(float(e), u.deg)
                for e in args.elevations.split(",")
            ]
        ),
        boresight_angle_step=qs(args.boresight_angle_step),
        boresight_angle_time=(
            None
            if args.boresight_angle_time is None
            else qs(args.boresight_angle_time)
        ),
        partial_visibility=args.partial_visibility,
        elevation_balance=args.elevation_balance,
        north_south_avoidance=qs(args.north_south_avoidance),
        pole_mode=args.pole_mode,
        pole_el_step=qs(args.pole_el_step),
        pole_ces_time=qs(args.pole_ces_time),
        pole_raster_scan=args.pole_raster_scan,
        fp_radius=qs(args.fp_radius),
    )
    schedule.write(args.out)
    return schedule
