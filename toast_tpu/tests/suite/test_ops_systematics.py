"""Tests for systematics simulation and housekeeping operators."""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data


def _data_with_signal(value=1.0, n_pix=3):
    data = create_satellite_data(n_pix=n_pix, obs_time=Quantity(5.0, u.minute))
    ob = data.obs[0]
    n_det = len(ob.local_detectors)
    ob.detdata.create("signal", units=u.K)
    ob.detdata["signal"].data = np.full(
        (n_det, ob.n_local_samples), value, dtype=np.float32
    )
    return data, ob


def test_gain_scrambler_reproducible():
    data, ob = _data_with_signal()
    ops.GainScrambler(sigma=0.1, realization=5).apply(data)
    out1 = ob.detdata["signal"].numpy().copy()
    # gains differ between detectors but are constant in time
    assert np.all(np.ptp(out1, axis=1) < 1e-6)
    assert np.ptp(out1[:, 0]) > 0.01
    # same realization reproduces the same gains
    data2, ob2 = _data_with_signal()
    ops.GainScrambler(sigma=0.1, realization=5).apply(data2)
    np.testing.assert_array_equal(ob2.detdata["signal"].numpy(), out1)
    # different realization gives different gains
    data3, ob3 = _data_with_signal()
    ops.GainScrambler(sigma=0.1, realization=6).apply(data3)
    assert not np.allclose(ob3.detdata["signal"].numpy(), out1)


def test_gain_drifter_linear():
    data, ob = _data_with_signal()
    ops.GainDrifter(mode="linear_drift", sigma_drift=0.1).apply(data)
    out = ob.detdata["signal"].numpy()
    # drift is linear in time: second differences vanish
    d2 = np.diff(out, n=2, axis=1)
    assert np.abs(d2).max() < 1e-4
    assert np.abs(out - 1.0).max() > 1e-4


def test_crosstalk_mixes():
    data, ob = _data_with_signal()
    n_det = len(ob.local_detectors)
    # distinct per-detector values
    sig = np.arange(n_det, dtype=np.float32)[:, None] * np.ones(
        (1, ob.n_local_samples), dtype=np.float32
    )
    ob.detdata["signal"].data = sig
    ops.CrossTalk(level=0.01).apply(data)
    out = ob.detdata["signal"].numpy()
    assert not np.allclose(out, sig)
    # mixing is small
    np.testing.assert_allclose(out, sig, atol=0.2)


def test_time_constant_roundtrip():
    data, ob = _data_with_signal()
    rng = np.random.default_rng(0)
    sig = rng.normal(size=ob.detdata["signal"].shape).astype(np.float32)
    ob.detdata["signal"].data = sig
    tau = Quantity(0.2, u.second)
    ops.TimeConstant(tau=tau).apply(data)
    smoothed = ob.detdata["signal"].numpy()
    # convolution suppresses high-frequency variance
    assert smoothed.std() < 0.8 * sig.std()
    ops.TimeConstant(tau=tau, deconvolve=True).apply(data)
    recovered = ob.detdata["signal"].numpy()
    np.testing.assert_allclose(recovered, sig, atol=1e-3)


def test_cosmic_rays_add_glitches():
    data, ob = _data_with_signal(value=0.0)
    ops.InjectCosmicRays(glitch_rate=0.1, glitch_amplitude=5.0).apply(data)
    out = ob.detdata["signal"].numpy()
    assert out.max() > 1.0
    assert (np.abs(out) > 1.0).mean() < 0.2  # sparse


def test_common_mode_noise_model():
    data, _ = _data_with_signal()
    ops.DefaultNoiseModel().apply(data)
    ob = data.obs[0]
    n_keys = len(ob["noise_model"].keys)
    ops.CommonModeNoise(NET=Quantity(0.02, u.K_sqrt_s)).apply(data)
    nse = ob["noise_model"]
    assert len(nse.keys) == n_keys + 1
    # all detectors couple to the common stream
    common = [k for k in nse.keys if "common" in str(k)][0]
    for det in nse.detectors:
        assert nse.weight(det, common) == 1.0
    # simulating with the common mode produces correlated noise
    ops.SimNoise().apply(data)
    tod = ob.detdata["signal"].numpy() - 1.0
    corr = np.corrcoef(tod)
    off_diag = corr[np.triu_indices_from(corr, k=1)]
    assert off_diag.mean() > 0.1


def test_dipole():
    data = create_satellite_data(n_pix=1, obs_time=Quantity(10.0, u.minute))
    ops.PointingDetectorSimple().apply(data)
    ops.SimDipole(mode="solar").apply(data)
    ob = data.obs[0]
    tod = ob.detdata["signal"].numpy()
    # solar dipole amplitude ~ 3.36 mK
    assert tod.max() < 3.4e-3
    assert tod.min() > -3.4e-3
    assert np.abs(tod).max() > 1e-4


def test_sss_fixed_in_azimuth():
    from test_ops_ground import create_ground_data

    data = create_ground_data(n_pix=1, duration_s=600.0)
    ob = data.obs[0]
    ob.detdata.create("signal", units=u.K)
    ops.SimScanSynchronousSignal(scale=Quantity(1.0, u.mK)).apply(data)
    tod = ob.detdata["signal"].numpy()[0]
    az = np.asarray(ob.shared["azimuth"])
    # signal at revisited azimuths must repeat
    order = np.argsort(az)
    az_s = az[order]
    tod_s = tod[order]
    close = np.diff(az_s) < 1e-4
    assert np.abs(np.diff(tod_s)[close]).max() < 1e-5
    assert tod.std() > 1e-4


def test_sim_catalog():
    data = create_satellite_data(n_pix=1, obs_time=Quantity(10.0, u.minute))
    ops.PointingDetectorSimple().apply(data)
    ob = data.obs[0]
    # place a source exactly where the first sample points
    from toast_tpu.math import qarray as qa

    q0 = np.asarray(ob.detdata["quats"][0])[0]
    v0 = qa.rotate(q0, np.array([0.0, 0.0, 1.0]))
    ra = np.degrees(np.arctan2(v0[1], v0[0]))
    dec = np.degrees(np.arcsin(v0[2]))
    data["source_catalog"] = {
        "src0": {"ra_deg": ra, "dec_deg": dec, "flux_K": 1.0}
    }
    ops.SimCatalog(beam_fwhm=Quantity(30.0, u.arcmin)).apply(data)
    tod = ob.detdata["signal"].numpy()
    assert abs(tod[0, 0] - 1.0) < 1e-3  # at the source center
    assert tod.max() <= 1.0 + 1e-5
    assert (tod > 0.5).mean() < 0.1


def test_yield_cut():
    data, ob = _data_with_signal(n_pix=19)
    ops.YieldCut(center=0.7, realization=1).apply(data)
    good = ob.select_local_detectors(flagmask=255)
    frac = len(good) / len(ob.all_detectors)
    assert 0.4 < frac <= 1.0
    # reproducible
    data2, ob2 = _data_with_signal(n_pix=19)
    ops.YieldCut(center=0.7, realization=1).apply(data2)
    assert ob2.local_detector_flags == ob.local_detector_flags


def test_copy_delete_reset_combine():
    data, ob = _data_with_signal(value=2.0)
    ops.Copy(detdata=[("signal", "sig2")]).apply(data)
    assert np.all(ob.detdata["sig2"].numpy() == 2.0)
    ops.Combine(op="multiply", first="signal", second="sig2", result="prod").apply(data)
    assert np.all(ob.detdata["prod"].numpy() == 4.0)
    ops.Reset(detdata=["sig2"]).apply(data)
    assert np.all(ob.detdata["sig2"].numpy() == 0.0)
    ops.Delete(detdata=["sig2"]).apply(data)
    assert "sig2" not in ob.detdata


def test_detrend():
    data, ob = _data_with_signal()
    n = ob.n_local_samples
    t = np.linspace(-1, 1, n).astype(np.float32)
    ob.detdata["signal"].data = np.tile(5.0 + 3.0 * t, (len(ob.local_detectors), 1))
    ops.Detrend(mode="linear").apply(data)
    assert np.abs(ob.detdata["signal"].numpy()).max() < 1e-4


def test_flag_nans():
    data, ob = _data_with_signal()
    sig = ob.detdata["signal"].numpy().copy()
    sig[0, 10] = np.nan
    sig[1, 20] = np.inf
    ob.detdata["signal"].data = sig
    ops.FlagNaNs().apply(data)
    flags = ob.detdata["flags"].numpy()
    assert flags[0, 10] & 1
    assert flags[1, 20] & 1
    assert flags[0, 11] == 0


def test_statistics():
    data, ob = _data_with_signal()
    rng = np.random.default_rng(3)
    ob.detdata["signal"].data = rng.normal(
        2.0, 3.0, ob.detdata["signal"].shape
    ).astype(np.float32)
    ops.Statistics().apply(data)
    st = ob["statistics"]
    np.testing.assert_allclose(st["mean"], 2.0, atol=0.3)
    np.testing.assert_allclose(np.sqrt(st["variance"]), 3.0, rtol=0.1)
    np.testing.assert_allclose(st["kurtosis"], 3.0, atol=0.5)


def test_perturb_hwp():
    data = create_satellite_data(
        n_pix=1, obs_time=Quantity(5.0, u.minute), hwp_rpm=6.0
    )
    ob = data.obs[0]
    before = np.asarray(ob.shared["hwp_angle"]).copy()
    ops.PerturbHWP(drift_sigma=0.01, realization=2).apply(data)
    after = np.asarray(ob.shared["hwp_angle"])
    assert not np.allclose(before, after)
    # still monotonic modulo wrap
    d = np.diff(np.unwrap(after))
    assert np.all(d > 0)


def test_crosstalk_matrix_file(tmp_path):
    """Crosstalk matrix loaded from an npz file (reference
    read_xtalk_matrix format: 'matrix' over focalplane detectors)."""
    import os

    data = create_satellite_data(n_pix=2, obs_time=Quantity(1.0, u.minute))
    ob = data.obs[0]
    n_det = len(ob.local_detectors)
    ob.detdata.create("signal")
    sig = np.zeros((n_det, ob.n_local_samples), dtype=np.float32)
    sig[0, :] = 1.0
    ob.detdata["signal"].data = sig
    mat = np.zeros((n_det, n_det))
    mat[1, 0] = 0.25  # detector 1 picks up 25% of detector 0
    path = os.path.join(tmp_path, "xtalk.npz")
    np.savez(path, matrix=mat)
    ops.CrossTalk(xtalk_mat_file=path).apply(data)
    out = ob.detdata["signal"].numpy()
    np.testing.assert_allclose(out[1], 0.25, atol=1e-6)
    np.testing.assert_allclose(out[0], 1.0, atol=1e-6)


def test_cosmic_rays_glitch_library(tmp_path):
    """Glitch amplitudes drawn from a library file distribution."""
    import os

    data = create_satellite_data(n_pix=1, obs_time=Quantity(5.0, u.minute))
    ob = data.obs[0]
    ob.detdata.create("signal")
    # library whose amplitude distribution is sharply peaked at 7.0
    path = os.path.join(tmp_path, "cr_library.npz")
    np.savez(
        path,
        direct_hits=np.full((500, 2), 7.0) + np.random.default_rng(0).normal(0, 0.01, (500, 2)),
        low_noise=np.array([0.0, 1.0]),
        sampling_rate=150.0,
        correlation_matrix=np.eye(2),
    )
    ops.InjectCosmicRays(
        crfile=path, glitch_rate=0.05, glitch_amplitude=1.0
    ).apply(data)
    sig = ob.detdata["signal"].numpy()
    peaks = sig[sig > 3.0]
    assert len(peaks) > 0
    # glitch peaks near the library amplitude
    assert abs(np.max(sig) - 7.0) < 0.5


def test_mitigate_crosstalk_inverts():
    """MitigateCrossTalk undoes CrossTalk (same matrix sources/seeds)."""
    data = create_satellite_data(n_pix=3, obs_time=Quantity(1.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ob = data.obs[0]
    sig0 = ob.detdata["signal"].numpy().copy()
    ops.CrossTalk(level=0.01, realization=5).apply(data)
    assert np.abs(ob.detdata["signal"].numpy() - sig0).max() > 1e-5
    ops.MitigateCrossTalk(level=0.01, realization=5).apply(data)
    np.testing.assert_allclose(
        ob.detdata["signal"].numpy(), sig0, rtol=5e-4, atol=5e-5
    )
    # imperfect knowledge leaves a residual
    ops.CrossTalk(level=0.01, realization=5).apply(data)
    ops.MitigateCrossTalk(
        level=0.01, realization=5, error_coefficients=0.2
    ).apply(data)
    resid = np.abs(ob.detdata["signal"].numpy() - sig0).max()
    assert resid > 1e-5


def test_decimate_focalplane():
    """DecimateFocalplane flags all but every n-th pixel."""
    data = create_satellite_data(n_pix=7, obs_time=Quantity(0.5, u.minute))
    ob = data.obs[0]
    n_all = len(ob.all_detectors)
    before = len(ob.select_local_detectors(flagmask=255))
    assert before == n_all
    ops.DecimateFocalplane(nskip=2, detectors_per_pixel=2).apply(data)
    kept = ob.select_local_detectors(flagmask=255)
    # every other 2-detector pixel survives
    assert 0 < len(kept) < n_all
    assert abs(len(kept) - n_all / 2) <= 2
    # surviving detectors come in whole pixels (A/B pairs)
    names = set(kept)
    for d in kept:
        pair = d[:-1] + ("B" if d.endswith("A") else "A")
        assert pair in names


def test_azimuth_ranges():
    """AzimuthRanges records the scan azimuth span."""
    import numpy as _np

    data = create_satellite_data(n_pix=1, obs_time=Quantity(0.5, u.minute))
    ob = data.obs[0]
    n = ob.n_local_samples
    az = _np.linspace(0.3, 1.2, n)
    ob.shared.create_column("azimuth", (n,))
    ob.shared.set("azimuth", az)
    ops.AzimuthRanges().apply(data)
    assert abs(ob["scan_min_az"].to_value(u.rad) - 0.3) < 1e-9
    assert abs(ob["scan_max_az"].to_value(u.rad) - 1.2) < 1e-9
