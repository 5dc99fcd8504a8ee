"""Ground observation scheduler.

Rebuild of the core of ``src/toast/schedule_sim_ground.py`` (3.7 kLoC):
given sky patches and a site, plan constant-elevation scans subject to
elevation limits, sun/moon avoidance, and patch priorities, producing a
:class:`~toast_tpu.models.schedule.GroundSchedule`.

This implementation covers the main scheduling loop (``build_schedule``,
reference ``:2379``): step through time, find visible patches, pick the
highest-priority one (weighted by hit deficit), observe it for ces_time,
and emit a GroundScan with the az range that covers the patch at the chosen
elevation.  SSO/cooler-cycle patch types and horizontal patches are not yet
implemented.
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
    """A rectangular sky patch with an observation priority."""

    def __init__(self, name, weight, corners_lonlat_deg):
        """corners_lonlat_deg: list of (ra_deg, dec_deg) corners."""
        self.name = name
        self.weight = float(weight)
        self.corners = np.radians(np.asarray(corners_lonlat_deg, dtype=np.float64))
        self.hits = 0
        self.time_observed = 0.0

    @property
    def ra_center(self):
        return np.mean(self.corners[:, 0])

    @property
    def dec_center(self):
        return np.mean(self.corners[:, 1])


def patch_azel(patch, site, t):
    """Az/el of all patch corners at time t."""
    lat = site.lat.to_value(u.rad)
    lon = site.lon.to_value(u.rad)
    times = np.full(len(patch.corners), t)
    az, el = coords.radec_to_azel(
        lat, lon, times, patch.corners[:, 0], patch.corners[:, 1]
    )
    return az, el


def _visible(patch, site, t, el_min, el_max, sun_avoidance_rad):
    az, el = patch_azel(patch, site, t)
    if el.min() < el_min or el.max() > el_max:
        return None
    az_sun, el_sun = coords.sun_azel(site, np.array([t]))
    if el_sun[0] > 0:
        # angular distance between patch center and sun
        azc, elc = np.median(az), np.median(el)
        cosd = np.sin(elc) * np.sin(el_sun[0]) + np.cos(elc) * np.cos(
            el_sun[0]
        ) * np.cos(azc - az_sun[0])
        if cosd > np.cos(sun_avoidance_rad):
            return None
    # scan elevation: bottom of the patch (constant-elevation scanning
    # sweeps the patch as the sky rotates through it)
    el_scan = el.min()
    # unwrap azimuths around the circular mean to avoid branch issues
    az0 = np.arctan2(np.mean(np.sin(az)), np.mean(np.cos(az)))
    az_rel = (az - az0 + np.pi) % (2 * np.pi) - np.pi
    az_min = az0 + az_rel.min() - 0.05
    az_max = az0 + az_rel.max() + 0.05
    return az_min, az_max, el_scan


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
    ces_max_time=Quantity(20.0, u.minute),
    gap=Quantity(1.0, u.minute),
    gap_small=Quantity(10.0, u.second),
):
    """Plan constant-elevation scans of the given patches.

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
    ces_s = ces_max_time.to_value(u.second)
    gap_s = gap.to_value(u.second)

    scans = []
    t = start.timestamp()
    t_stop = stop.timestamp()
    scan_idx = {p.name: 0 for p in patches}
    while t < t_stop:
        # choose the visible patch with the largest weighted deficit
        best = None
        best_score = -np.inf
        for patch in patches:
            vis = _visible(patch, site, t, el_min_rad, el_max_rad, sun_rad)
            if vis is None:
                continue
            score = patch.weight / (1.0 + patch.time_observed / 3600.0)
            if score > best_score:
                best_score = score
                best = (patch, vis)
        if best is None:
            t += 600.0  # nothing visible; try again in 10 minutes
            continue
        patch, (az_min, az_max, el_scan) = best
        t_end = min(t + ces_s, t_stop)
        scans.append(
            GroundScan(
                name=patch.name,
                start=datetime.fromtimestamp(t, tz=timezone.utc),
                stop=datetime.fromtimestamp(t_end, tz=timezone.utc),
                az_min=Quantity(az_min, u.rad),
                az_max=Quantity(az_max, u.rad),
                el=Quantity(el_scan, u.rad),
                scan_indx=scan_idx[patch.name],
                subscan_indx=0,
            )
        )
        patch.time_observed += t_end - t
        patch.hits += 1
        scan_idx[patch.name] += 1
        t = t_end + gap_s

    log.info(
        f"build_schedule: {len(scans)} scans of {len(patches)} patches "
        f"over {(t_stop - start.timestamp()) / 86400:.1f} days"
    )
    return GroundSchedule(
        scans=scans,
        site_name=site_name,
        telescope_name=telescope_name,
        site_lat=site_lat,
        site_lon=site_lon,
        site_alt=site_alt,
    )


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
    parser.add_argument("--ces-max-time", default="20 min")
    parser.add_argument("--gap", default="60 s")
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
        ces_max_time=qs(args.ces_max_time),
        gap=qs(args.gap),
    )
    schedule.write(args.out)
    return schedule
