"""Tests for WCS pixelization/IO and HWPSS/demod post-processing."""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.pixels import PixelData, read_wcs_fits, read_wcs_hdf5, write_wcs_fits, write_wcs_hdf5
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data


def test_pixels_wcs_auto_bounds():
    data = create_satellite_data(n_pix=2, obs_time=Quantity(5.0, u.minute))
    det_pointing = ops.PointingDetectorSimple()
    pw = ops.PixelsWCS(
        detector_pointing=det_pointing,
        projection="CAR",
        resolution=Quantity(0.2, u.deg),
        create_dist="wcs_dist",
    )
    pw.apply(data)
    ob = data.obs[0]
    pix = np.asarray(ob.detdata["pixels"].data)
    assert pix.max() < pw.n_pix
    # nearly all samples land inside the auto-sized patch
    assert (pix >= 0).mean() > 0.99
    assert "wcs_dist" in data
    assert "wcs_dist_wcs" in data


@pytest.mark.parametrize("proj", ["CAR", "CEA", "MER", "TAN"])
def test_wcs_projections_injective(proj):
    data = create_satellite_data(n_pix=1, obs_time=Quantity(2.0, u.minute))
    det_pointing = ops.PointingDetectorSimple()
    pw = ops.PixelsWCS(
        detector_pointing=det_pointing,
        projection=proj,
        resolution=Quantity(0.3, u.deg),
    )
    pw.apply(data)
    pix = np.asarray(data.obs[0].detdata["pixels"].data)
    assert (pix >= 0).mean() > 0.95


def test_wcs_map_roundtrip(tmp_path):
    meta = {"projection": "CAR", "lon0": 0.5, "lat0": -0.3, "res": 0.001,
            "nx": 30, "ny": 20}
    from toast_tpu.pixels import PixelDistribution

    dist = PixelDistribution(n_pix=600, n_submap=10)
    px = PixelData(dist, n_value=3, units=u.K)
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(600, 3)).astype(np.float32)
    px.set_numpy(arr)
    for fmt, writer, reader in (
        ("h5", write_wcs_hdf5, read_wcs_hdf5),
        ("fits", write_wcs_fits, read_wcs_fits),
    ):
        path = str(tmp_path / f"m.{fmt}")
        writer(px, path, meta)
        loaded, meta2 = reader(path)
        np.testing.assert_allclose(loaded.numpy(), arr, rtol=1e-6)
        assert int(meta2["nx"]) == 30
        assert abs(float(meta2["lat0"]) - (-0.3)) < 1e-6


def test_scan_wcs_map(tmp_path):
    # build a map over the scan footprint and scan it back
    data = create_satellite_data(n_pix=1, obs_time=Quantity(5.0, u.minute))
    det_pointing = ops.PointingDetectorSimple()
    pw = ops.PixelsWCS(
        detector_pointing=det_pointing,
        projection="CAR",
        resolution=Quantity(0.3, u.deg),
        create_dist="wcs_dist",
    )
    weights = ops.StokesWeights(mode="IQU", detector_pointing=det_pointing)
    pw.apply(data)
    meta = data["wcs_dist_wcs"]
    dist = data["wcs_dist"]
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(dist.n_pix, 3)).astype(np.float32)
    px = PixelData(dist, n_value=3, units=u.K)
    px.set_numpy(arr)
    path = str(tmp_path / "wcs_sky.h5")
    write_wcs_hdf5(px, path, meta)

    scanner = ops.ScanWCSMap(
        file=path, pixel_pointing=pw, stokes_weights=weights
    )
    scanner.apply(data)
    ob = data.obs[0]
    tod = ob.detdata["signal"].numpy()
    pix = np.asarray(ob.detdata["pixels"][0])
    wts = np.asarray(ob.detdata["weights"][0])
    ok = pix[0] >= 0
    if ok:
        expect = np.sum(arr[pix[0]] * wts[0])
        np.testing.assert_allclose(tod[0, 0], expect, rtol=1e-4)
    assert np.isfinite(tod).all()


def test_hwpss_model_removal():
    data = create_satellite_data(
        n_pix=1, obs_time=Quantity(10.0, u.minute), hwp_rpm=60.0
    )
    ob = data.obs[0]
    chi = np.asarray(ob.shared["hwp_angle"])
    n_det = len(ob.local_detectors)
    hwpss = 2.0 * np.cos(2 * chi) + 1.0 * np.sin(4 * chi)
    rng = np.random.default_rng(2)
    noise = rng.normal(size=(n_det, len(chi))).astype(np.float32) * 0.01
    ob.detdata.create("signal", units=u.K)
    ob.detdata["signal"].data = (hwpss[None, :] + noise).astype(np.float32)
    ops.HWPSynchronousModel(harmonics=4, save_model=True, relcal_fixed=True).apply(data)
    out = ob.detdata["signal"].numpy()
    assert out.std() < 0.05
    assert "hwpss_model" in ob
    assert "hwpss_relcal" in ob
    # equal input amplitude -> equal relative gains
    gains = list(ob["hwpss_relcal"].values())
    np.testing.assert_allclose(gains, 1.0, atol=0.05)


def test_t2p_and_demod_common_mode():
    data = create_satellite_data(
        n_pix=2, obs_time=Quantity(10.0, u.minute), hwp_rpm=60.0
    )
    ops.DefaultNoiseModel().apply(data)
    det_pointing = ops.PointingDetectorSimple()
    weights = ops.StokesWeights(
        mode="IQU", detector_pointing=det_pointing, hwp_angle="hwp_angle"
    )
    ob = data.obs[0]
    n_det = len(ob.local_detectors)
    rng = np.random.default_rng(3)
    ob.detdata.create("signal", units=u.K)
    ob.detdata["signal"].data = rng.normal(
        size=(n_det, ob.n_local_samples)
    ).astype(np.float32)
    demod = ops.Demodulate(stokes_weights=weights, nskip=3)
    demod.apply(data)
    ddata = demod.demod_data
    dob = ddata.obs[0]
    # inject known T->P leakage
    field = dob.detdata["signal"]
    parents = [d[len("demod0_"):] for d in dob.local_detectors if d.startswith("demod0_")]
    sig = field.numpy().copy()
    names = list(dob.local_detectors)
    for p in parents:
        i0 = names.index(f"demod0_{p}")
        ir = names.index(f"demod4r_{p}")
        sig[ir] += 0.3 * sig[i0]
    field.data = sig
    before = np.abs(np.corrcoef(sig)[0, 1])
    ops.T2PFilter().apply(ddata)
    out = field.numpy()
    for p in parents:
        i0 = names.index(f"demod0_{p}")
        ir = names.index(f"demod4r_{p}")
        c = np.corrcoef(out[i0], out[ir])[0, 1]
        assert abs(c) < 0.05
    # common-mode filter runs and reduces demod4r common mode
    ops.DemodCommonModeFilter().apply(ddata)
    r_rows = [names.index(d) for d in names if d.startswith("demod4r_")]
    resid = field.numpy()[r_rows].mean(axis=0)
    assert np.abs(resid).max() < 1e-4
