"""Ground simulation and filtering tests."""

from datetime import datetime, timezone

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.models import (
    Data,
    GroundSchedule,
    GroundScan,
    GroundSite,
    Telescope,
    fake_hexagon_focalplane,
)
from toast_tpu.models.defaults import default_values as defaults
from toast_tpu.parallel import Comm
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity


def create_ground_data(n_pix=3, duration_s=600.0, hwp_rpm=None, el_deg=50.0):
    fp = fake_hexagon_focalplane(
        n_pix=n_pix,
        sample_rate=Quantity(10.0, u.Hz),
        psd_fknee=Quantity(0.05, u.Hz),
    )
    site = GroundSite(
        "atacama",
        Quantity(-22.958, u.deg),
        Quantity(-67.786, u.deg),
        Quantity(5200.0, u.meter),
    )
    tele = Telescope("ground_test", focalplane=fp, site=site)
    t0 = datetime(2023, 6, 15, 6, 0, tzinfo=timezone.utc)
    from datetime import timedelta

    scans = [
        GroundScan(
            name="scan0",
            start=t0,
            stop=t0 + timedelta(seconds=duration_s),
            az_min=Quantity(40.0, u.deg),
            az_max=Quantity(60.0, u.deg),
            el=Quantity(el_deg, u.deg),
        )
    ]
    schedule = GroundSchedule(scans=scans, site_name="atacama")
    data = Data(Comm())
    sim = ops.SimGround(
        telescope=tele,
        schedule=schedule,
        scan_rate_az=Quantity(1.0, u.deg),
        scan_accel_az=Quantity(3.0, u.deg),
        weather="atacama",
        hwp_angle="hwp_angle" if hwp_rpm else None,
        hwp_rpm=Quantity(float(hwp_rpm), u.dimensionless) if hwp_rpm else None,
    )
    sim.apply(data)
    return data


def test_sim_ground_structure():
    data = create_ground_data()
    assert len(data.obs) == 1
    ob = data.obs[0]
    for key in ("times", "flags", "azimuth", "elevation", "boresight_azel",
                "boresight_radec"):
        assert key in ob.shared
    for iv in ("scanning", "turnaround", "throw", "scan_leftright",
               "scan_rightleft"):
        assert iv in ob.intervals
    az = np.asarray(ob.shared["azimuth"])
    # fix_rate_on_sky=True (the reference default,
    # ref:src/toast/ops/sim_ground.py:148-153): scan_rate_az is a SKY rate,
    # so the mount sweeps at scan_rate/cos(el) and the turnaround overshoot
    # is v_mount^2 / (2 a)
    mount_rate = np.radians(1.0) / np.cos(np.radians(50.0))
    overshoot = mount_rate**2 / np.radians(3.0) / 2.0
    assert az.min() > np.radians(40.0) - 1.05 * overshoot - 1e-6
    assert az.max() < np.radians(60.0) + 1.05 * overshoot + 1e-6
    # scanning samples move at the mount rate
    vel = np.gradient(az) * 10.0
    scanning = ob.intervals["scanning"].mask().astype(bool)
    np.testing.assert_allclose(
        np.abs(vel[scanning][2:-2]), mount_rate, rtol=0.1
    )
    # elevation constant
    el = np.asarray(ob.shared["elevation"])
    np.testing.assert_allclose(el, np.radians(50.0))
    # turnarounds flagged
    flags = np.asarray(ob.shared["flags"])
    turn = ob.intervals["turnaround"].mask().astype(bool)
    assert np.all(flags[turn] & defaults.shared_mask_unstable_scanrate)
    # weather attached
    assert ob.telescope.site.weather is not None
    assert ob.telescope.site.weather.pwv.value > 0


def test_sim_ground_el_modulation():
    """Continuous and stepped elevation modulation + el-nods
    (reference ops/sim_ground.py:172-198,265)."""
    from datetime import datetime, timezone

    from toast_tpu.models import (
        Data,
        GroundScan,
        GroundSchedule,
        GroundSite,
        Telescope,
        fake_hexagon_focalplane,
    )
    from toast_tpu.parallel import Comm

    def make_data(**simkw):
        fp = fake_hexagon_focalplane(n_pix=1, sample_rate=Quantity(10.0, u.Hz))
        site = GroundSite(
            "atacama",
            Quantity(-22.96, u.deg),
            Quantity(-67.79, u.deg),
            Quantity(5200.0, u.meter),
        )
        tele = Telescope("t", focalplane=fp, site=site)
        start = datetime(2023, 6, 1, 4, 0, tzinfo=timezone.utc)
        scans = [
            GroundScan(
                name="p",
                start=start,
                stop=datetime(2023, 6, 1, 4, 10, tzinfo=timezone.utc),
                az_min=Quantity(0.4, u.rad),
                az_max=Quantity(0.9, u.rad),
                el=Quantity(50.0, u.deg),
            )
        ]
        schedule = GroundSchedule(
            scans=scans,
            site_name="atacama",
            telescope_name="t",
            site_lat=Quantity(-22.96, u.deg),
            site_lon=Quantity(-67.79, u.deg),
            site_alt=Quantity(5200.0, u.meter),
        )
        data = Data(Comm())
        ops.SimGround(telescope=tele, schedule=schedule, **simkw).apply(data)
        return data.obs[0]

    # continuous sine modulation
    ob = make_data(
        el_mod_rate=Quantity(0.05, u.Hz),
        el_mod_amplitude=Quantity(1.0, u.deg),
        el_mod_sine=True,
    )
    el = np.asarray(ob.shared["elevation"])
    assert np.ptp(el) > np.radians(1.5)
    assert abs(np.ptp(el) - np.radians(2.0)) < np.radians(0.3)

    # stepped modulation: elevation increases between scan pairs
    ob = make_data(el_mod_step=Quantity(0.5, u.deg))
    el = np.asarray(ob.shared["elevation"])
    assert el[-1] > el[0] + np.radians(0.4)
    assert len(np.unique(np.round(el, 6))) < 50  # piecewise constant

    # cosecant-modulated scan still covers the az range
    ob = make_data(scan_cosecant_modulation=True)
    az = np.asarray(ob.shared["azimuth"])
    assert az.min() < 0.45 and az.max() > 0.85

    # el-nod at the start produces the elnod interval + el excursion
    ob = make_data(elnod_start=True, elnods="-1,1")
    assert "elnod" in ob.intervals
    el = np.asarray(ob.shared["elevation"])
    assert np.ptp(el[:100]) > np.radians(1.5)


def test_ground_scheduler_partial_and_elevation_balance():
    """Partial visibility admits patches straddling the elevation limit;
    elevation balancing spreads scans over elevations
    (reference schedule_sim_ground.py:2379 behaviors)."""
    from datetime import datetime, timezone

    from toast_tpu.schedule_sim_ground import Patch, build_schedule

    corners = [(40.0, -60.0), (50.0, -60.0), (50.0, -30.0), (40.0, -30.0)]
    start = datetime(2023, 6, 1, tzinfo=timezone.utc)
    stop = datetime(2023, 6, 2, tzinfo=timezone.utc)

    def run(**kw):
        return build_schedule(
            patches=[Patch("big", 1.0, corners)],
            start=start,
            stop=stop,
            el_min=Quantity(40.0, u.deg),
            el_max=Quantity(70.0, u.deg),
            sun_avoidance_angle=Quantity(20.0, u.deg),
            **kw,
        )

    strict = run()
    partial = run(partial_visibility=True)
    # a 30-degree-tall patch rarely fits entirely inside the limits:
    # partial visibility must find strictly more observing time
    t_strict = sum(
        (s.stop - s.start).total_seconds() for s in strict.scans
    )
    t_partial = sum(
        (s.stop - s.start).total_seconds() for s in partial.scans
    )
    assert t_partial > t_strict

    balanced = run(partial_visibility=True, elevation_balance=True)
    els_b = np.array([s.el.to_value(u.deg) for s in balanced.scans])
    els_p = np.array([s.el.to_value(u.deg) for s in partial.scans])
    if len(els_b) > 3 and len(els_p) > 3:
        assert np.std(els_b) >= 0.5 * np.std(els_p)


def test_sim_ground_radec_tracks_sky():
    data = create_ground_data(duration_s=1200.0)
    ob = data.obs[0]
    from toast_tpu.math import qarray as qa

    bore = np.asarray(ob.shared["boresight_radec"])
    vdir = qa.rotate(bore, np.array([0.0, 0.0, 1.0]))
    # pointing must be unit and move smoothly
    np.testing.assert_allclose(np.linalg.norm(vdir, axis=1), 1.0, atol=1e-6)
    step = np.arccos(np.clip(np.sum(vdir[1:] * vdir[:-1], axis=1), -1, 1))
    assert step.max() < 0.01


def test_ground_pipeline_binned_map():
    """Full ground slice: sim -> noise -> pointing -> binned map."""
    data = create_ground_data(n_pix=3, duration_s=600.0)
    ops.DefaultNoiseModel().apply(data)
    ops.ElevationNoise(noise_a=1.0, noise_c=0.5).apply(data)
    ops.SimNoise().apply(data)
    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(
        nside=64, detector_pointing=det_pointing, create_dist="pixel_dist"
    )
    weights = ops.StokesWeights(mode="IQU", detector_pointing=det_pointing)
    cov = ops.CovarianceAndHits(pixel_pointing=pixels, stokes_weights=weights)
    cov.apply(data)
    binner = ops.BinMap(
        pixel_pointing=pixels, stokes_weights=weights, covariance="covariance"
    )
    binner.apply(data)
    m = data["binned"].numpy()
    assert np.isfinite(m).all()
    assert data["hits"].numpy().sum() > 0


def test_elevation_noise_scales_psd():
    data = create_ground_data(el_deg=30.0)
    ops.DefaultNoiseModel().apply(data)
    ob = data.obs[0]
    psd_before = ob["noise_model"].psd(ob.local_detectors[0]).value.copy()
    ops.ElevationNoise(noise_a=1.0, noise_c=0.0, out_model="el_noise").apply(data)
    psd_after = ob["el_noise"].psd(ob.local_detectors[0]).value
    expected = (1.0 / np.sin(np.radians(30.0))) ** 2
    np.testing.assert_allclose(psd_after / psd_before, expected, rtol=1e-6)


def test_polyfilter_removes_polynomial():
    data = create_ground_data(n_pix=1)
    ob = data.obs[0]
    n_det = len(ob.local_detectors)
    n = ob.n_local_samples
    t = np.linspace(-1, 1, n)
    ob.detdata.create("signal")
    sig = 3.0 + 2.0 * t + 0.5 * t**2
    ob.detdata["signal"].data = np.tile(sig, (n_det, 1)).astype(np.float32)
    ops.PolyFilter(order=2, view=None).apply(data)
    out = ob.detdata["signal"].numpy()
    assert np.abs(out).max() < 1e-3


def test_polyfilter_per_interval():
    data = create_ground_data(n_pix=1)
    ob = data.obs[0]
    n_det = len(ob.local_detectors)
    n = ob.n_local_samples
    rng = np.random.default_rng(0)
    # different constant per throw interval
    sig = np.zeros(n, dtype=np.float32)
    for i, row in enumerate(ob.intervals["throw"]):
        sig[row["first"] : row["last"] + 1] = rng.normal() * 5
    ob.detdata.create("signal")
    ob.detdata["signal"].data = np.tile(sig, (n_det, 1))
    ops.PolyFilter(order=0, view="throw").apply(data)
    out = ob.detdata["signal"].numpy()
    mask = ob.intervals["throw"].mask().astype(bool)
    assert np.abs(out[:, mask]).max() < 1e-3


def test_common_mode_filter():
    data = create_ground_data(n_pix=3)
    ob = data.obs[0]
    n_det = len(ob.local_detectors)
    n = ob.n_local_samples
    rng = np.random.default_rng(1)
    common = rng.normal(size=n).astype(np.float32)
    indiv = rng.normal(size=(n_det, n)).astype(np.float32) * 0.1
    ob.detdata.create("signal")
    ob.detdata["signal"].data = common[None, :] + indiv
    ops.CommonModeFilter().apply(data)
    out = ob.detdata["signal"].numpy()
    # the common mode is gone at unflagged samples (turnarounds carry the
    # nonscience flag and are skipped); per-detector deviations remain
    flags = np.asarray(ob.shared["flags"])
    good = (flags & defaults.shared_mask_nonscience) == 0
    resid_common = out[:, good].mean(axis=0)
    assert np.abs(resid_common).max() < 1e-4
    assert out.std() > 0.01


def test_ground_filter_removes_az_pickup():
    data = create_ground_data(n_pix=1, duration_s=600.0)
    ob = data.obs[0]
    n_det = len(ob.local_detectors)
    az = np.asarray(ob.shared["azimuth"])
    pickup = 2.0 * (az - az.mean()) ** 2 + 0.3 * az
    rng = np.random.default_rng(2)
    noise = rng.normal(size=(n_det, len(az))).astype(np.float32) * 0.01
    ob.detdata.create("signal")
    ob.detdata["signal"].data = (pickup[None, :] + noise).astype(np.float32)
    ops.GroundFilter(filter_order=4, trend_order=0).apply(data)
    out = ob.detdata["signal"].numpy()
    flags = np.asarray(ob.shared["flags"])
    good = (flags & defaults.shared_mask_nonscience) == 0
    # residual at good samples is at the injected white-noise floor
    assert out[:, good].std() < 0.02


def test_hwp_filter_removes_hwpss():
    data = create_ground_data(n_pix=1, hwp_rpm=60.0)
    ob = data.obs[0]
    n_det = len(ob.local_detectors)
    chi = np.asarray(ob.shared["hwp_angle"])
    hwpss = 1.0 * np.cos(2 * chi) + 0.5 * np.sin(4 * chi) + 0.2 * np.cos(chi)
    rng = np.random.default_rng(3)
    noise = rng.normal(size=(n_det, len(chi))).astype(np.float32) * 0.01
    ob.detdata.create("signal")
    ob.detdata["signal"].data = (hwpss[None, :] + noise).astype(np.float32)
    before = ob.detdata["signal"].numpy().std()
    ops.HWPFilter(filter_order=4, trend_order=0).apply(data)
    after = ob.detdata["signal"].numpy().std()
    assert after < 0.05 * before


def test_poly2d_filter():
    data = create_ground_data(n_pix=7)
    ob = data.obs[0]
    dets = ob.local_detectors
    n_det = len(dets)
    n = ob.n_local_samples
    # signal = gradient across the focalplane, varying in time
    from toast_tpu.math import qarray as qa

    fp = ob.telescope.focalplane
    quats = np.array([fp[d]["quat"] for d in dets])
    theta, phi, _ = qa.to_iso_angles(quats)
    xpos = theta * np.cos(phi)
    drift = np.linspace(1.0, 2.0, n)
    sig = np.outer(xpos / max(abs(xpos).max(), 1e-9), drift).astype(np.float32)
    ob.detdata.create("signal")
    ob.detdata["signal"].data = sig
    before = ob.detdata["signal"].numpy().std()
    ops.PolyFilter2D(order=1).apply(data)
    out = ob.detdata["signal"].numpy()
    flags = np.asarray(ob.shared["flags"])
    good = (flags & defaults.shared_mask_nonscience) == 0
    assert out[:, good].std() < 1e-3 * before


def test_weather_model_operator():
    """WeatherModel attaches reproducible SimWeather to each site."""
    import sys

    from toast_tpu import ops

    sys.path.insert(0, "tests")
    from helpers import create_satellite_data

    data = create_satellite_data()
    op = ops.WeatherModel(weather="atacama", realization=5)
    op.apply(data)
    wx = data.obs[0].telescope.site.weather
    assert wx is not None
    assert wx.pwv.value > 0
    # same realization -> same draw
    data2 = create_satellite_data()
    ops.WeatherModel(weather="atacama", realization=5).apply(data2)
    assert data2.obs[0].telescope.site.weather.pwv.value == wx.pwv.value
    # median mode is deterministic at the seasonally-modulated climatology
    # median: the Atacama tables put the monthly median PWV between
    # ~0.57 mm (Jul) and ~2.1 mm (Jan), with a +-15% diurnal cycle
    ops.WeatherModel(weather="atacama", median_weather=True).apply(data)
    med = data.obs[0].telescope.site.weather.pwv.value
    assert 0.45 <= med <= 2.6, med
    ops.WeatherModel(weather="atacama", median_weather=True).apply(data)
    assert data.obs[0].telescope.site.weather.pwv.value == med


def test_weather_quantile_tables(tmp_path):
    """SimWeather draws by inverse-CDF sampling of month x hour quantile
    tables in the reference's structure (ref weather.py:300-553): a
    reference-format HDF5 file round-trips through ``file=``, truncation
    reshapes the CDF, and the counter scheme makes draws reproducible."""
    import h5py

    from toast_tpu.models.weather import SimWeather, build_site_tables
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    table = build_site_tables("atacama")
    assert set(table[0]["data"]) == {
        "TQI", "TQL", "TQV", "QV10M", "PS", "TS", "T10M", "U10M", "V10M"
    }
    for m in range(12):
        for var, rows in table[m]["data"].items():
            assert rows.shape == (24, table[m]["NSTEP"])
            assert np.all(np.diff(rows, axis=1) >= 0), (m, var)

    # write the synthesized table in the reference's HDF5 layout and load
    # it back through the file= path
    path = tmp_path / "wx.h5"
    with h5py.File(path, "w") as hf:
        for m in range(12):
            grp = hf.create_group(f"month_{m:02d}")
            grp.attrs["PROBSTRT"] = table[m]["PROBSTRT"]
            grp.attrs["PROBSTOP"] = table[m]["PROBSTOP"]
            grp.attrs["NSTEP"] = table[m]["NSTEP"]
            for var, rows in table[m]["data"].items():
                grp.create_dataset(var, data=rows)
    # (median mode: the random-stream variable indexing depends on the
    # file's dataset iteration order, as in the reference, so exact-draw
    # equality only holds at the order-independent median)
    w_file = SimWeather(
        time=1700000000.0, file=str(path), site_uid=42, median_weather=True
    )
    w_builtin = SimWeather(
        time=1700000000.0, name="atacama", site_uid=42, median_weather=True
    )
    assert w_file.pwv.value == w_builtin.pwv.value
    assert w_file.air_temperature.value == w_builtin.air_temperature.value

    # truncation clips the drawn distribution
    draws = [
        SimWeather(
            time=1700000000.0 + 3600.0 * i,
            name="atacama",
            max_pwv=Quantity(1.0, u.mm),
        ).pwv.value
        for i in range(50)
    ]
    assert max(draws) <= 1.0 + 1e-9


def test_bandpass_unit_conversions():
    """kcmb2krj < 1 and kcmb2jysr positive, decreasing with frequency
    in the Wien tail (reference instrument.py:461 Bandpass)."""
    from toast_tpu.models.instrument import Bandpass
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    bp = Bandpass(
        {"d0": Quantity(100.0, u.GHz), "d1": Quantity(300.0, u.GHz)},
        {"d0": Quantity(20.0, u.GHz), "d1": Quantity(60.0, u.GHz)},
    )
    r100 = bp.kcmb2krj("d0")
    r300 = bp.kcmb2krj("d1")
    assert 0 < r300 < r100 < 1.0
    j100 = bp.kcmb2jysr("d0")
    assert j100 > 0


def test_moon_ephemeris_syzygies():
    """Low-precision lunar ephemeris: sun-moon elongation at known
    full/new moons (2023-01-06 / 2023-01-21)."""
    import numpy as np

    from toast_tpu.math.coordinates import moon_radec, sun_radec

    def elong(t):
        ra_m, dec_m = moon_radec(t)
        ra_s, dec_s = sun_radec(np.array([t]))
        return np.degrees(np.arccos(
            np.sin(dec_m) * np.sin(dec_s[0])
            + np.cos(dec_m) * np.cos(dec_s[0]) * np.cos(ra_m - ra_s[0])
        ))
    assert elong(1673046480.0) > 172.0  # full moon
    assert elong(1674334380.0) < 8.0    # new moon


def test_ground_scheduler_patch_types():
    """HorizontalPatch, SSOPatch and CoolerCyclePatch all schedule."""
    from datetime import datetime, timezone

    import numpy as np

    from toast_tpu.schedule_sim_ground import (
        CoolerCyclePatch,
        HorizontalPatch,
        Patch,
        SSOPatch,
        build_schedule,
    )
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    patches = [
        Patch("rect", 1.0, [(30, -30), (50, -30), (50, -45), (30, -45)]),
        HorizontalPatch(
            "horiz", 0.5,
            Quantity(100.0, u.deg), Quantity(140.0, u.deg),
            Quantity(50.0, u.deg), Quantity(15.0, u.minute),
        ),
        SSOPatch("moon", 2.0, Quantity(5.0, u.deg)),
        CoolerCyclePatch(
            "cooler", 0.1,
            Quantity(6.0, u.hour), Quantity(10.0, u.hour),
            Quantity(30.0, u.minute),
        ),
    ]
    sch = build_schedule(
        start=datetime(2023, 1, 10, tzinfo=timezone.utc),
        stop=datetime(2023, 1, 12, tzinfo=timezone.utc),
        patches=patches,
        el_min=Quantity(20.0, u.deg),
        el_max=Quantity(85.0, u.deg),
        moon_avoidance_angle=Quantity(10.0, u.deg),
    )
    names = {s.name for s in sch.scans}
    # over two days every patch type gets observed
    assert "horiz" in names
    assert "moon" in names
    assert "cooler" in names
    # cooler cycles respect the hold-time window (>= 6h apart)
    cool = sorted(
        s.start_timestamp for s in sch.scans if s.name == "cooler"
    )
    if len(cool) > 1:
        gaps = np.diff(cool)
        assert np.all(gaps >= 6 * 3600 - 1.0)
    # cooler dwell is a stationary 30-min slot
    cs = [s for s in sch.scans if s.name == "cooler"][0]
    assert abs((cs.stop_timestamp - cs.start_timestamp) - 1800.0) < 1.0
    # horizontal scans keep their fixed az window
    hs = [s for s in sch.scans if s.name == "horiz"][0]
    assert abs(hs.az_min.to_value(u.deg) - 100.0) < 1e-6
    assert abs(hs.el.to_value(u.deg) - 50.0) < 1e-6


def test_ground_scheduler_max_time_budget():
    """A Patch with max_time stops being scheduled once exhausted."""
    from datetime import datetime, timezone

    from toast_tpu.schedule_sim_ground import Patch, build_schedule
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    patches = [
        Patch("budget", 10.0, [(30, -30), (50, -30), (50, -45), (30, -45)],
              max_time=Quantity(40.0, u.minute)),
        Patch("open", 1.0, [(120, -30), (140, -30), (140, -45), (120, -45)]),
    ]
    sch = build_schedule(
        start=datetime(2023, 1, 10, tzinfo=timezone.utc),
        stop=datetime(2023, 1, 11, tzinfo=timezone.utc),
        patches=patches,
        el_min=Quantity(20.0, u.deg),
        el_max=Quantity(85.0, u.deg),
    )
    budget_time = sum(
        s.stop_timestamp - s.start_timestamp
        for s in sch.scans if s.name == "budget"
    )
    assert budget_time <= 60 * 60  # 40 min budget + one 20-min overshoot max
    assert any(s.name == "open" for s in sch.scans)


def test_ground_scheduler_reference_options():
    """Operational days, elevation grid, boresight rotation, moon phase and
    sun/moon ephemeris columns (reference schedule_sim_ground.py CLI
    behaviors: --operational-days, --elevations-deg,
    --boresight-angle-step-deg)."""
    from datetime import datetime, timezone

    import numpy as np

    from toast_tpu.schedule_sim_ground import Patch, build_schedule
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    def mk_patches():
        return [
            Patch("p1", 1.0, [(30, -30), (50, -30), (50, -45), (30, -45)]),
            Patch("p2", 1.0, [(120, -30), (140, -30), (140, -45), (120, -45)]),
        ]

    sch = build_schedule(
        start=datetime(2023, 1, 10, tzinfo=timezone.utc),
        stop=datetime(2023, 1, 20, tzinfo=timezone.utc),
        patches=mk_patches(),
        el_min=Quantity(20.0, u.deg),
        el_max=Quantity(85.0, u.deg),
        operational_days=2,
        elevations=[Quantity(e, u.deg) for e in (25.0, 35.0, 45.0, 55.0, 65.0)],
        boresight_angle_step=Quantity(45.0, u.deg),
    )
    assert len(sch.scans) > 0
    # operational days: all scans inside <= 2 distinct UTC days
    days = {int(s.start_timestamp // 86400) for s in sch.scans}
    assert len(days) <= 2
    # elevation grid: every scan elevation snaps to the allowed values
    grid = {25.0, 35.0, 45.0, 55.0, 65.0}
    for s in sch.scans:
        assert min(abs(s.el.to_value(u.deg) - g) for g in grid) < 1e-6
    # boresight rotation: more than one angle appears, all multiples of 45
    angles = {round(s.boresight_angle.to_value(u.deg), 6) for s in sch.scans}
    assert len(angles) > 1
    for a in angles:
        assert abs(a / 45.0 - round(a / 45.0)) < 1e-9
    # ephemeris columns are populated: moon phase in (0, 100], sun el sane
    phases = [s.moon_phase for s in sch.scans]
    assert all(0.0 <= p <= 100.0 for p in phases)
    assert any(p > 1.0 for p in phases)
    assert all(
        -np.pi / 2 <= s.sun_el_begin.to_value(u.rad) <= np.pi / 2
        for s in sch.scans
    )


def test_moon_phase_cycle():
    """The moon-phase model tracks the synodic cycle: a full moon and a new
    moon occur within any 30-day window, ~29.5 days apart."""
    import numpy as np

    from toast_tpu.math.coordinates import moon_phase

    t0 = 1700000000.0
    t = t0 + np.arange(0, 30 * 86400, 3600.0)
    ph = moon_phase(t)
    assert ph.max() > 97.0
    assert ph.min() < 3.0
    # period: peaks of consecutive cycles ~29.5 days apart
    t2 = t0 + np.arange(0, 70 * 86400, 3600.0)
    ph2 = moon_phase(t2)
    peaks = t2[np.where((ph2[1:-1] > ph2[:-2]) & (ph2[1:-1] > ph2[2:]) &
                        (ph2[1:-1] > 90))[0] + 1]
    assert len(peaks) >= 2
    period = np.diff(peaks)[0] / 86400.0
    assert abs(period - 29.53) < 1.5


def test_weather_seasonal_cycle():
    """Atacama pwv follows the annual cycle: austral summer (Jan) wetter
    than winter (Jul) — the parametric analog of the reference's monthly
    MERRA-2 distributions (ref weather.py:385)."""
    from datetime import datetime, timezone

    from toast_tpu.models.weather import SimWeather

    def med(month):
        t0 = datetime(2023, month, 15, tzinfo=timezone.utc).timestamp()
        return np.median(
            [
                SimWeather(time=t0 + i, name="atacama").pwv.value
                for i in range(100)
            ]
        )

    assert med(1) > 1.5 * med(7)


def test_ground_scheduler_sidereal_patch():
    """SiderealPatch schedules only inside its local-sidereal-time window
    (reference schedule_sim_ground.py:745)."""
    from datetime import datetime, timezone

    from toast_tpu.math import coordinates as coords
    from toast_tpu.models.instrument import GroundSite
    from toast_tpu.schedule_sim_ground import SiderealPatch, build_schedule
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    patch = SiderealPatch(
        "sid", 1.0,
        Quantity(100.0, u.deg), Quantity(140.0, u.deg), Quantity(50.0, u.deg),
        Quantity(30.0, u.deg), Quantity(90.0, u.deg),  # LST window 30..90 deg
        Quantity(15.0, u.minute),
    )
    sch = build_schedule(
        start=datetime(2023, 1, 10, tzinfo=timezone.utc),
        stop=datetime(2023, 1, 12, tzinfo=timezone.utc),
        patches=[patch],
        el_min=Quantity(20.0, u.deg),
        el_max=Quantity(85.0, u.deg),
    )
    assert len(sch.scans) > 0
    site = GroundSite(
        "s", Quantity(-22.96, u.deg), Quantity(-67.79, u.deg),
        Quantity(5200.0, u.meter),
    )
    lon = site.lon.to_value(u.rad)
    for s in sch.scans:
        lst = np.degrees(
            (coords.gmst_rad(np.array([s.start_timestamp]))[0] + lon)
            % (2 * np.pi)
        )
        assert 30.0 - 1e-6 <= lst <= 90.0 + 1e-6, f"scan at LST {lst}"


def test_ground_scheduler_weighted_patch(tmp_path):
    """WeightedHorizontalPatch follows its weight map: zero-weight sky is
    never scheduled (reference schedule_sim_ground.py:660)."""
    from datetime import datetime, timezone

    import h5py

    from toast_tpu.schedule_sim_ground import (
        WeightedHorizontalPatch,
        build_schedule,
    )
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    nside = 16
    npix = 12 * nside * nside

    def write_map(path, values):
        with h5py.File(path, "w") as f:
            d = f.create_dataset("map", data=values.reshape(1, npix))
            d.attrs["ORDERING"] = "RING"
            d.attrs["UNITS"] = ""

    ones = tmp_path / "w_ones.h5"
    zeros = tmp_path / "w_zeros.h5"
    write_map(ones, np.ones(npix))
    write_map(zeros, np.zeros(npix))

    def patch_for(wfile):
        return WeightedHorizontalPatch(
            "wpatch", 1.0,
            Quantity(100.0, u.deg), Quantity(140.0, u.deg),
            Quantity(50.0, u.deg), Quantity(15.0, u.minute),
            str(wfile), Quantity(3.0, u.deg),
        )

    kw = dict(
        start=datetime(2023, 1, 10, tzinfo=timezone.utc),
        stop=datetime(2023, 1, 11, tzinfo=timezone.utc),
        el_min=Quantity(20.0, u.deg),
        el_max=Quantity(85.0, u.deg),
    )
    sch_ones = build_schedule(patches=[patch_for(ones)], **kw)
    sch_zeros = build_schedule(patches=[patch_for(zeros)], **kw)
    assert len(sch_ones.scans) > 0
    assert len(sch_zeros.scans) == 0


def test_ground_scheduler_north_south_avoidance():
    """north_south_avoidance rejects scans entering the meridian sectors
    (reference schedule_sim_ground.py:1581)."""
    from datetime import datetime, timezone

    from toast_tpu.schedule_sim_ground import HorizontalPatch, build_schedule
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    # one scan window straddling due South (170..190 deg), one clear of it
    south = HorizontalPatch(
        "south", 5.0,
        Quantity(170.0, u.deg), Quantity(190.0, u.deg),
        Quantity(50.0, u.deg), Quantity(15.0, u.minute),
    )
    clear = HorizontalPatch(
        "clear", 1.0,
        Quantity(100.0, u.deg), Quantity(140.0, u.deg),
        Quantity(50.0, u.deg), Quantity(15.0, u.minute),
    )
    sch = build_schedule(
        start=datetime(2023, 1, 10, tzinfo=timezone.utc),
        stop=datetime(2023, 1, 11, tzinfo=timezone.utc),
        patches=[south, clear],
        el_min=Quantity(20.0, u.deg),
        el_max=Quantity(85.0, u.deg),
        north_south_avoidance=Quantity(30.0, u.deg),
    )
    names = {s.name for s in sch.scans}
    assert "clear" in names
    assert "south" not in names
