"""South-Pole scheduling: pole mode, MaxDepthPatch, raster timing.

Reference behaviors: ``attempt_scan_pole`` (schedule_sim_ground.py:1214),
``MaxDepthPatch`` (:816), ``get_pole_raster_scan`` (:1614).
"""

import os
from datetime import datetime, timedelta, timezone

import numpy as np

from toast_tpu.schedule_sim_ground import (
    MaxDepthPatch,
    Patch,
    build_schedule,
)
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

POLE_SITE = dict(
    site_name="south_pole",
    site_lat=Quantity(-89.99, u.deg),
    site_lon=Quantity(-44.65, u.deg),
    site_alt=Quantity(2843.0, u.meter),
)


def _pole_patch():
    # a small patch near dec -60: at the pole it sits at constant el ~30
    return Patch(
        "deep", 1.0, [(10, -62), (20, -62), (20, -58), (10, -58)]
    )


def test_pole_mode_elevation_steps():
    start = datetime(2027, 6, 1, tzinfo=timezone.utc)
    sched = build_schedule(
        patches=[_pole_patch()],
        start=start,
        stop=start + timedelta(hours=8),
        el_min=Quantity(20.0, u.deg),
        el_max=Quantity(70.0, u.deg),
        pole_mode=True,
        pole_el_step=Quantity(0.5, u.deg),
        pole_ces_time=Quantity(20.0, u.minute),
        fp_radius=Quantity(1.0, u.deg),
        **POLE_SITE,
    )
    scans = sched.scans
    assert len(scans) >= 4
    # subscans of one scan set step UP in elevation by pole_el_step
    first = [s for s in scans if s.scan_indx == scans[0].scan_indx]
    assert len(first) >= 3
    els = np.array([s.el.to_value(u.deg) for s in first])
    steps = np.diff(els)
    np.testing.assert_allclose(steps, 0.5, atol=1e-6)
    subs = [s.subscan_indx for s in first]
    assert subs == list(range(len(first)))
    # the sweep starts just below the patch (corner els ~ 58-62 deg at
    # dec in [-62, -58] from lat -89.99, fp_radius 1) and ends above it
    assert els[0] < 57.5
    assert els[-1] > 62.0


def test_pole_raster_az_locked():
    start = datetime(2027, 6, 1, tzinfo=timezone.utc)
    sched = build_schedule(
        patches=[_pole_patch()],
        start=start,
        stop=start + timedelta(hours=8),
        el_min=Quantity(20.0, u.deg),
        el_max=Quantity(70.0, u.deg),
        pole_mode=True,
        pole_el_step=Quantity(1.0, u.deg),
        pole_raster_scan=True,
        fp_radius=Quantity(1.0, u.deg),
        **POLE_SITE,
    )
    first = [
        s for s in sched.scans if s.scan_indx == sched.scans[0].scan_indx
    ]
    assert len(first) >= 2
    # az-locked: every subscan spans the same az range
    az_lo = {round(s.az_min.to_value(u.deg), 6) for s in first}
    az_hi = {round(s.az_max.to_value(u.deg), 6) for s in first}
    assert len(az_lo) == 1 and len(az_hi) == 1
    # raster duration from mount kinematics, not the fixed CES time
    d0 = (first[0].stop - first[0].start).total_seconds()
    assert 10.0 < d0 < 3600.0


def test_max_depth_patch_tracks_center():
    start = datetime(2027, 6, 1, tzinfo=timezone.utc)
    patch = MaxDepthPatch(
        "spot",
        1.0,
        (12.0, -60.0),
        Quantity(2.0, u.deg),
        Quantity(10.0, u.deg),
        Quantity(15.0, u.minute),
    )
    sched = build_schedule(
        patches=[patch],
        start=start,
        stop=start + timedelta(hours=2),
        el_min=Quantity(20.0, u.deg),
        el_max=Quantity(70.0, u.deg),
        **POLE_SITE,
    )
    scans = sched.scans
    assert len(scans) >= 3
    for s in scans:
        # fixed az throw around the center, elevation ~60 (pole geometry:
        # alt = 90 - |lat - dec| = 60 at dec -60)
        throw = s.az_max.to_value(u.deg) - s.az_min.to_value(u.deg)
        np.testing.assert_allclose(throw, 10.0, atol=1e-6)
        assert 55.0 < s.el.to_value(u.deg) < 65.0


def test_pole_schedule_feeds_sim_ground(tmp_path):
    """A pole-mode schedule drives SimGround end-to-end."""
    from toast_tpu import ops
    from toast_tpu.models import (
        Data,
        GroundSite,
        Telescope,
        fake_hexagon_focalplane,
    )
    from toast_tpu.models.schedule import GroundSchedule
    from toast_tpu.parallel import Comm

    start = datetime(2027, 6, 1, tzinfo=timezone.utc)
    sched = build_schedule(
        patches=[_pole_patch()],
        start=start,
        stop=start + timedelta(hours=2),
        el_min=Quantity(20.0, u.deg),
        el_max=Quantity(70.0, u.deg),
        pole_mode=True,
        pole_el_step=Quantity(0.5, u.deg),
        pole_ces_time=Quantity(10.0, u.minute),
        fp_radius=Quantity(1.0, u.deg),
        **POLE_SITE,
    )
    path = os.path.join(tmp_path, "pole_schedule.txt")
    sched.write(path)
    loaded = GroundSchedule.read(path)
    assert len(loaded.scans) == len(sched.scans)

    fp = fake_hexagon_focalplane(
        n_pix=1, sample_rate=Quantity(10.0, u.Hz)
    )
    site = GroundSite(
        "south_pole",
        POLE_SITE["site_lat"],
        POLE_SITE["site_lon"],
        POLE_SITE["site_alt"],
    )
    tele = Telescope("pole_tele", focalplane=fp, site=site)
    data = Data(Comm())
    ops.SimGround(
        telescope=tele, schedule=loaded, max_n_obs=3, weather="south_pole"
    ).apply(data)
    assert len(data.obs) >= 1
    ob = data.obs[0]
    az = np.asarray(ob.shared["azimuth"])
    el = np.asarray(ob.shared["elevation"])
    assert np.isfinite(az).all() and np.isfinite(el).all()
    # constant-elevation scan at the scheduled elevation
    el0 = sched.scans[0].el.to_value(u.rad)
    np.testing.assert_allclose(el, el0, atol=1e-6)
