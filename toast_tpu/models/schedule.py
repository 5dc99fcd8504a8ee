"""Observing schedules.

Rebuild of ``src/toast/schedule.py`` (``GroundScan:45``, ``SatelliteScan:178``,
``Schedule:23``, ``GroundSchedule:217``, ``SatelliteSchedule:811``) and the
satellite scheduler ``src/toast/schedule_sim_satellite.py:16``.  Times are
python ``datetime`` (UTC) with unix-second accessors (astropy-free).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np

from ..utils import units as u
from ..utils.units import Quantity


def to_timestamp(dt):
    if isinstance(dt, (int, float)):
        return float(dt)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.timestamp()


def to_utc(ts):
    return datetime.fromtimestamp(ts, tz=timezone.utc)


class Scan:
    """One scheduled observation."""

    def __init__(self, name=None, start=None, stop=None):
        self.name = name
        self.start = start
        self.stop = stop

    @property
    def start_timestamp(self):
        return to_timestamp(self.start)

    @property
    def stop_timestamp(self):
        return to_timestamp(self.stop)

    @property
    def duration(self):
        return self.stop_timestamp - self.start_timestamp

    def __repr__(self):
        return f"<{type(self).__name__} '{self.name}' {self.start} - {self.stop}>"


class GroundScan(Scan):
    """A constant-elevation ground scan of one patch."""

    def __init__(
        self,
        name=None,
        start=None,
        stop=None,
        boresight_angle=Quantity(0.0, u.deg),
        az_min=Quantity(0.0, u.deg),
        az_max=Quantity(0.0, u.deg),
        el=Quantity(0.0, u.deg),
        scan_indx=0,
        subscan_indx=0,
        sun_az_begin=Quantity(0.0, u.deg),
        sun_az_end=Quantity(0.0, u.deg),
        sun_el_begin=Quantity(0.0, u.deg),
        sun_el_end=Quantity(0.0, u.deg),
        moon_az_begin=Quantity(0.0, u.deg),
        moon_az_end=Quantity(0.0, u.deg),
        moon_el_begin=Quantity(0.0, u.deg),
        moon_el_end=Quantity(0.0, u.deg),
        moon_phase=0.0,
    ):
        super().__init__(name=name, start=start, stop=stop)
        self.boresight_angle = boresight_angle
        self.az_min = az_min
        self.az_max = az_max
        self.el = el
        self.scan_indx = scan_indx
        self.subscan_indx = subscan_indx
        self.sun_az_begin = sun_az_begin
        self.sun_az_end = sun_az_end
        self.sun_el_begin = sun_el_begin
        self.sun_el_end = sun_el_end
        self.moon_az_begin = moon_az_begin
        self.moon_az_end = moon_az_end
        self.moon_el_begin = moon_el_begin
        self.moon_el_end = moon_el_end
        self.moon_phase = moon_phase


class SatelliteScan(Scan):
    """A satellite observation with precession/spin motion parameters."""

    def __init__(
        self,
        name=None,
        start=None,
        stop=None,
        prec_period=Quantity(0.0, u.minute),
        prec_angle=Quantity(0.0, u.deg),
        spin_period=Quantity(0.0, u.minute),
        spin_angle=Quantity(0.0, u.deg),
    ):
        super().__init__(name=name, start=start, stop=stop)
        self.prec_period = prec_period
        self.prec_angle = prec_angle
        self.spin_period = spin_period
        self.spin_angle = spin_angle


class Schedule:
    """Base schedule: a telescope name and a list of scans."""

    def __init__(self, scans=None, site_name="Unknown", telescope_name="Unknown"):
        self.scans = list(scans) if scans is not None else []
        self.site_name = site_name
        self.telescope_name = telescope_name

    def __len__(self):
        return len(self.scans)

    def __getitem__(self, i):
        return self.scans[i]

    def __iter__(self):
        return iter(self.scans)

    def sort_by_RA(self):
        # placeholder ordering hook used by ground schedules
        pass

    def __repr__(self):
        return f"<{type(self).__name__} {len(self.scans)} scans>"


class SatelliteSchedule(Schedule):
    """Schedule of satellite scans, with text round-trip."""

    def write(self, path):
        with open(path, "w") as f:
            f.write(f"# site={self.site_name} telescope={self.telescope_name}\n")
            f.write(
                "# name start stop prec_period_min prec_angle_deg "
                "spin_period_min spin_angle_deg\n"
            )
            for sc in self.scans:
                f.write(
                    f"{sc.name} {sc.start_timestamp:.3f} {sc.stop_timestamp:.3f} "
                    f"{sc.prec_period.to_value(u.minute):.6f} "
                    f"{sc.prec_angle.to_value(u.deg):.6f} "
                    f"{sc.spin_period.to_value(u.minute):.6f} "
                    f"{sc.spin_angle.to_value(u.deg):.6f}\n"
                )

    @classmethod
    def read(cls, path):
        scans = []
        site = "Unknown"
        tele = "Unknown"
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("#"):
                    if "site=" in line:
                        for tok in line.lstrip("# ").split():
                            k, _, v = tok.partition("=")
                            if k == "site":
                                site = v
                            elif k == "telescope":
                                tele = v
                    continue
                if not line:
                    continue
                toks = line.split()
                scans.append(
                    SatelliteScan(
                        name=toks[0],
                        start=to_utc(float(toks[1])),
                        stop=to_utc(float(toks[2])),
                        prec_period=Quantity(float(toks[3]), u.minute),
                        prec_angle=Quantity(float(toks[4]), u.deg),
                        spin_period=Quantity(float(toks[5]), u.minute),
                        spin_angle=Quantity(float(toks[6]), u.deg),
                    )
                )
        return cls(scans=scans, site_name=site, telescope_name=tele)


class GroundSchedule(Schedule):
    """Schedule of ground scans, with text round-trip."""

    def __init__(
        self, scans=None, site_name="Unknown", telescope_name="Unknown",
        site_lat=Quantity(0.0, u.deg), site_lon=Quantity(0.0, u.deg),
        site_alt=Quantity(0.0, u.meter),
    ):
        super().__init__(scans=scans, site_name=site_name, telescope_name=telescope_name)
        self.site_lat = site_lat
        self.site_lon = site_lon
        self.site_alt = site_alt

    def write(self, path):
        with open(path, "w") as f:
            f.write(
                f"# site={self.site_name} telescope={self.telescope_name} "
                f"lat_deg={self.site_lat.to_value(u.deg):.6f} "
                f"lon_deg={self.site_lon.to_value(u.deg):.6f} "
                f"alt_m={self.site_alt.to_value(u.meter):.1f}\n"
            )
            f.write("# name start stop az_min_deg az_max_deg el_deg scan subscan\n")
            for sc in self.scans:
                f.write(
                    f"{sc.name} {sc.start_timestamp:.3f} {sc.stop_timestamp:.3f} "
                    f"{sc.az_min.to_value(u.deg):.6f} "
                    f"{sc.az_max.to_value(u.deg):.6f} "
                    f"{sc.el.to_value(u.deg):.6f} "
                    f"{sc.scan_indx} {sc.subscan_indx}\n"
                )

    @classmethod
    def read(cls, path):
        scans = []
        meta = {}
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("#"):
                    for tok in line.lstrip("# ").split():
                        k, _, v = tok.partition("=")
                        if v:
                            meta[k] = v
                    continue
                if not line:
                    continue
                toks = line.split()
                scans.append(
                    GroundScan(
                        name=toks[0],
                        start=to_utc(float(toks[1])),
                        stop=to_utc(float(toks[2])),
                        az_min=Quantity(float(toks[3]), u.deg),
                        az_max=Quantity(float(toks[4]), u.deg),
                        el=Quantity(float(toks[5]), u.deg),
                        scan_indx=int(toks[6]),
                        subscan_indx=int(toks[7]),
                    )
                )
        return cls(
            scans=scans,
            site_name=meta.get("site", "Unknown"),
            telescope_name=meta.get("telescope", "Unknown"),
            site_lat=Quantity(float(meta.get("lat_deg", 0.0)), u.deg),
            site_lon=Quantity(float(meta.get("lon_deg", 0.0)), u.deg),
            site_alt=Quantity(float(meta.get("alt_m", 0.0)), u.meter),
        )


def create_satellite_schedule(
    prefix="",
    mission_start=None,
    observation_time=Quantity(10.0, u.minute),
    gap_time=Quantity(0.0, u.minute),
    num_observations=1,
    prec_period=Quantity(10.0, u.minute),
    prec_angle=Quantity(30.0, u.deg),
    spin_period=Quantity(2.0, u.minute),
    spin_angle=Quantity(30.0, u.deg),
    site_name="space",
    telescope_name="satellite",
):
    """Evenly spaced satellite scans (reference ``schedule_sim_satellite.py:16``)."""
    if mission_start is None:
        mission_start = datetime(2023, 1, 1, tzinfo=timezone.utc)
    if mission_start.tzinfo is None:
        mission_start = mission_start.replace(tzinfo=timezone.utc)
    obs_sec = observation_time.to_value(u.second)
    gap_sec = gap_time.to_value(u.second)
    scans = []
    t = mission_start
    for i in range(num_observations):
        stop = t + timedelta(seconds=obs_sec)
        scans.append(
            SatelliteScan(
                name=f"{prefix}{i:06d}",
                start=t,
                stop=stop,
                prec_period=prec_period,
                prec_angle=prec_angle,
                spin_period=spin_period,
                spin_angle=spin_angle,
            )
        )
        t = stop + timedelta(seconds=gap_sec)
    return SatelliteSchedule(
        scans=scans, site_name=site_name, telescope_name=telescope_name
    )
