"""Noise estimation, model fitting, and demodulation tests."""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.pixels import PixelData
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data


def test_noise_estimation_recovers_psd():
    data = create_satellite_data(n_pix=1, obs_time=Quantity(60.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ops.NoiseEstim(name="est", out_model="noise_est").apply(data)
    ob = data.obs[0]
    est = ob["noise_est"]
    true = ob["noise_model"]
    det = ob.local_detectors[0]
    f_est = est.freq(det).to_value(u.Hz)
    p_est = est.psd(det).to_value(u.K2_s)
    # white plateau matches NET^2 within 20%
    net2 = true.NET(det).to_value(u.K_sqrt_s) ** 2
    plateau = np.median(p_est[f_est > 1.0])
    assert abs(plateau / net2 - 1.0) < 0.2


def test_cross_psd_recovers_common_mode():
    """Two detectors sharing an injected common mode: the cross-PSD must
    recover the common-mode PSD while independent noise averages away
    (reference noise_estimation_utils.py:259 crosscov_psd capability)."""
    data = create_satellite_data(n_pix=1, obs_time=Quantity(60.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ob = data.obs[0]
    n = ob.n_local_samples
    rate = 10.0
    rng = np.random.default_rng(7)
    # white common mode at a known level, well above the detector noise
    # plateau (NET 0.05 -> 2.5e-3 K^2 s); common PSD = sigma^2 / rate
    sigma = 0.5
    common = rng.normal(0.0, sigma, n).astype(np.float32)
    sig = np.asarray(ob.detdata["signal"].data)
    ob.detdata["signal"].data = sig + common[None, :]

    ops.NoiseEstim(name="est", out_model="noise_est", pairs="ALL").apply(data)
    est = ob["noise_est"]
    d0, d1 = ob.local_detectors[:2]
    key = f"{d0}_x_{d1}"
    assert key in est.keys
    f = np.asarray(est.freq(key).value)
    p = np.asarray(est.psd(key).value)
    want = sigma**2 / rate
    plateau = np.median(p[f > 0.5])
    assert abs(plateau / want - 1.0) < 0.2

    # without a common mode the cross-PSD is consistent with zero at the
    # common-mode scale
    data2 = create_satellite_data(n_pix=1, obs_time=Quantity(60.0, u.minute))
    ops.DefaultNoiseModel().apply(data2)
    ops.SimNoise().apply(data2)
    ops.NoiseEstim(name="est", out_model="noise_est", pairs="ALL").apply(data2)
    est2 = data2.obs[0]["noise_est"]
    p2 = np.asarray(est2.psd(key).value)
    f2 = np.asarray(est2.freq(key).value)
    assert np.abs(np.median(p2[f2 > 0.5])) < 0.05 * want


def test_fit_noise_model():
    data = create_satellite_data(n_pix=1, obs_time=Quantity(60.0, u.minute))
    fp = data.obs[0].telescope.focalplane
    fp.detector_data["psd_fknee"][:] = 0.5
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ops.NoiseEstim(name="est", out_model="noise_est").apply(data)
    ops.FitNoiseModel(noise_model="noise_est", out_model="noise_fit").apply(data)
    ob = data.obs[0]
    fit = ob["noise_fit"]
    true = ob["noise_model"]
    det = ob.local_detectors[0]
    assert abs(fit.NET(det).value / true.NET(det).value - 1.0) < 0.2
    # fknee recovered within a factor of ~2 (statistical)
    assert 0.2 < fit.fknee(det).value / 0.5 < 3.0


def test_signal_diff_noise_model():
    data = create_satellite_data(n_pix=1, obs_time=Quantity(20.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ob = data.obs[0]
    true_net2 = ob["noise_model"].NET(ob.local_detectors[0]).value ** 2
    ops.SignalDiffNoiseModel(noise_model="diff_model").apply(data)
    model = ob["diff_model"]
    det = ob.local_detectors[0]
    psd = model.psd(det).to_value(u.K2_s)
    assert abs(psd[0] / true_net2 - 1.0) < 0.2


def test_flag_noise_fit():
    data = create_satellite_data(n_pix=7, obs_time=Quantity(10.0, u.minute))
    fp = data.obs[0].telescope.focalplane
    # one outlier detector with 10x NET
    fp.detector_data["psd_net"][3] *= 10
    ops.DefaultNoiseModel().apply(data)
    ob = data.obs[0]
    # use the analytic model directly as the "fit"
    ob["noise_fit"] = ob["noise_model"]
    ops.FlagNoiseFit(noise_model="noise_fit", sigma_NET=4.0).apply(data)
    bad_det = ob.all_detectors[3]
    assert ob.local_detector_flags[bad_det] != 0
    n_flagged = sum(1 for f in ob.local_detector_flags.values() if f)
    assert n_flagged == 1


def test_demodulate_recovers_iqu():
    """Scan a constant-polarization sky with HWP, demodulate, check I/Q/U."""
    data = create_satellite_data(
        n_pix=2, obs_time=Quantity(20.0, u.minute), hwp_rpm=60.0
    )
    ops.DefaultNoiseModel().apply(data)
    ob = data.obs[0]
    nside = 8
    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(
        nside=nside, detector_pointing=det_pointing, create_dist="pixel_dist"
    )
    weights = ops.StokesWeights(
        mode="IQU", detector_pointing=det_pointing, hwp_angle="hwp_angle"
    )
    ops.Pipeline(operators=[pixels, weights]).apply(data)
    # uniform sky: I=3, Q=0.5, U=-0.3 everywhere
    n_pix = 12 * nside * nside
    sky = np.tile(np.array([3.0, 0.5, -0.3], dtype=np.float32), (n_pix, 1))
    sky_px = PixelData(data["pixel_dist"], n_value=3, units=u.K)
    sky_px.set_numpy(sky)
    data["sky"] = sky_px
    ops.ScanMap(map_key="sky", det_data="signal").apply(data)

    demod = ops.Demodulate(stokes_weights=weights, nskip=3)
    demod.apply(data)
    ddata = demod.demod_data
    assert len(ddata.obs) == 1
    dob = ddata.obs[0]
    margin = 100  # ignore filter edge effects
    expected = {"demod0": 3.0, "demod4r": 0.5, "demod4i": -0.3}
    for det in dob.local_detectors:
        tod = np.asarray(dob.detdata["signal"][det])[margin:-margin]
        want = expected[det.split("_")[0]]
        dev = np.abs(tod - want)
        # demodulation is singular where the scan crosses the coordinate
        # pole (the orientation angle sweeps arbitrarily fast), so test the
        # bulk of samples rather than the max
        assert np.median(dev) < 0.01, (det, np.median(dev))
        assert np.quantile(dev, 0.95) < 0.02, (det, np.quantile(dev, 0.95))
    # StokesWeightsDemod provides trivial weights
    ops.StokesWeightsDemod().apply(ddata)
    w = dob.detdata["weights"]
    for det in dob.local_detectors:
        wd = np.asarray(w[det])
        if det.startswith("demod0"):
            np.testing.assert_allclose(wd[:, 0], 1.0)
        elif det.startswith("demod4r"):
            assert wd[:, 1].mean() > 0.9
        elif det.startswith("demod4i"):
            assert wd[:, 2].mean() > 0.9


def test_demodulate_2f_streams():
    """do_2f adds demod2r/2i pseudo-detectors tracking the 2f line."""
    data = create_satellite_data(
        n_pix=1, obs_time=Quantity(10.0, u.minute), hwp_rpm=60.0
    )
    ops.DefaultNoiseModel().apply(data)
    det_pointing = ops.PointingDetectorSimple()
    sw = ops.StokesWeights(
        mode="IQU", detector_pointing=det_pointing, hwp_angle="hwp_angle"
    )
    ob = data.obs[0]
    ob.detdata.create("signal")
    # pure 2f tone: cos(2*chi) gain-like signal
    chi = np.asarray(ob.shared["hwp_angle"])
    tone = np.cos(2.0 * np.unwrap(chi)).astype(np.float32)
    ob.detdata["signal"].data = np.tile(tone, (len(ob.all_detectors), 1))
    demod = ops.Demodulate(
        stokes_weights=sw, nskip=3, do_2f=True, noise_model=None
    )
    demod.apply(data)
    dob = demod.demod_data.obs[0]
    prefixes = {d.split("_")[0] for d in dob.all_detectors}
    assert "demod2r" in prefixes and "demod2i" in prefixes
    # a pure 2f tone (gain signal) lands in the 2f streams, not in 4f
    sig2 = np.asarray(
        dob.detdata["signal"].data[
            [i for i, d in enumerate(dob.all_detectors) if d.startswith("demod2r")][0]
        ]
    )
    sig4 = np.asarray(
        dob.detdata["signal"].data[
            [i for i, d in enumerate(dob.all_detectors) if d.startswith("demod4r")][0]
        ]
    )
    assert np.isfinite(sig2).all() and np.isfinite(sig4).all()


def test_noise_estim_remove_common_mode():
    """remove_common_mode subtracts the focalplane average before the
    estimate (ref noise_estimation.py:340-355): an injected common
    sinusoid dominates the naive PSD and vanishes from the cleaned one."""
    data = create_satellite_data(n_pix=2, obs_time=Quantity(30.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ob = data.obs[0]
    n = ob.n_local_samples
    rate = 10.0
    t = np.arange(n) / rate
    f0 = 0.5
    line = (0.05 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    sig = np.asarray(ob.detdata["signal"].data)
    ob.detdata["signal"].data = sig + line[None, :]

    ops.NoiseEstim(name="raw", out_model="raw_est").apply(data)
    ops.NoiseEstim(
        name="cm", out_model="cm_est", remove_common_mode=True
    ).apply(data)
    det = ob.local_detectors[0]

    def line_power(model):
        f = model.freq(det).to_value(u.Hz)
        p = model.psd(det).to_value(u.K2_s)
        sel = (f > 0.4) & (f < 0.62)
        return np.max(p[sel])

    raw = line_power(ob["raw_est"])
    cleaned = line_power(ob["cm_est"])
    # the log-binned line rides ~4x above the white floor in the raw
    # estimate; after removal it must drop back to the floor (NET^2)
    net2 = ob["noise_model"].NET(det).to_value(u.K_sqrt_s) ** 2
    assert raw > 3.0 * net2, (raw, net2)
    assert cleaned < 1.5 * net2, (cleaned, net2)


def test_noise_estim_focalplane_key():
    """focalplane_key mode estimates one representative stream per key
    value, named by the key (ref noise_estimation.py:397-415)."""
    data = create_satellite_data(n_pix=2, obs_time=Quantity(20.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ob = data.obs[0]
    fp = ob.telescope.focalplane
    import numpy as _np

    fp.detector_data["band"] = _np.array(
        ["f090" if i % 2 == 0 else "f150" for i in range(len(fp.detector_data["name"]))]
    )
    ops.NoiseEstim(
        name="fk", out_model="fk_est", focalplane_key="band"
    ).apply(data)
    est = ob["fk_est"]
    assert set(est.detectors) == {"f090", "f150"}
    for k in ("f090", "f150"):
        assert np.all(est.psd(k).to_value(u.K2_s) >= 0)


def test_noise_estim_mapfile_subtraction(tmp_path):
    """mapfile scan-subtraction removes sky signal from the estimate
    (ref noise_estimation.py:358-372)."""
    from toast_tpu.pixels.io_healpix import write_healpix_fits

    data = create_satellite_data(
        n_pix=2, obs_time=Quantity(30.0, u.minute), hwp_rpm=6.0
    )
    ops.DefaultNoiseModel().apply(data)
    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(
        nside=16, detector_pointing=det_pointing, create_dist="pixel_dist"
    )
    weights = ops.StokesWeights(
        mode="IQU", detector_pointing=det_pointing, hwp_angle="hwp_angle"
    )
    ops.Pipeline(operators=[pixels, weights]).apply(data)

    # a bright sky: scan it into the signal
    rng = np.random.default_rng(7)
    dist = data["pixel_dist"]
    sky = PixelData(dist, n_value=3)
    vals = np.zeros((dist.n_pix, 3), dtype=np.float32)
    vals[:, 0] = 5.0 * rng.standard_normal(dist.n_pix)
    sky.set_numpy(vals)
    path = str(tmp_path / "sky.fits")
    write_healpix_fits(sky, path, nest=pixels.nest)
    data["sky"] = sky
    ops.SimNoise().apply(data)
    ops.ScanMap(
        det_data="signal", pixels="pixels", weights="weights", map_key="sky"
    ).apply(data)

    ob = data.obs[0]
    det = ob.local_detectors[0]
    ops.NoiseEstim(name="nraw", out_model="nraw_est").apply(data)
    raw_est = ob["nraw_est"]
    ops.NoiseEstim(
        name="nsub",
        out_model="nsub_est",
        mapfile=path,
        pixel_pointing=pixels,
        stokes_weights=weights,
    ).apply(data)
    sub_est = ob["nsub_est"]
    true = ob["noise_model"]
    net2 = true.NET(det).to_value(u.K_sqrt_s) ** 2

    def plateau(model):
        f = model.freq(det).to_value(u.Hz)
        p = model.psd(det).to_value(u.K2_s)
        return np.median(p[f > 1.0])

    # sky power inflates the raw estimate; subtraction restores the noise
    assert plateau(raw_est) > 3.0 * net2
    assert abs(plateau(sub_est) / net2 - 1.0) < 0.3
