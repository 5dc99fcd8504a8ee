"""End-to-end binned map-making tests.

The key physics check (mirroring reference tests/ops_mapmaker_utils.py and
ops_sim_tod_noise map tests): scan a known sky map into TOD, bin it back,
and recover the input in all well-conditioned pixels.
"""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.pixels import PixelData, covariance_apply, covariance_invert
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data


def _pointing_ops(nside=16):
    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(
        nside=nside, detector_pointing=det_pointing, create_dist="pixel_dist"
    )
    weights = ops.StokesWeights(mode="IQU", detector_pointing=det_pointing)
    return det_pointing, pixels, weights


def test_covariance_and_hits():
    data = create_satellite_data(n_pix=3, obs_time=Quantity(20.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    det_pointing, pixels, weights = _pointing_ops()
    cov_and_hits = ops.CovarianceAndHits(
        pixel_dist="pixel_dist",
        pixel_pointing=pixels,
        stokes_weights=weights,
        rcond_threshold=1e-6,
    )
    cov_and_hits.apply(data)
    hits = data["hits"].numpy()[:, 0]
    assert hits.sum() == 6 * data.obs[0].n_local_samples
    cov = data["covariance"].numpy()
    rcond = data["rcond"].numpy()[:, 0]
    # covariance nonzero exactly where rcond passes
    solved = rcond > 0
    assert np.all(cov[solved, 0] > 0)
    assert np.all(cov[~solved].sum(axis=1) == 0)
    # a decent fraction of hit pixels are solvable with 20 min of scanning
    assert solved.sum() > 0


def test_scan_and_bin_recovers_input_map():
    """Scan a synthetic IQU map into signal, bin it, compare."""
    nside = 16
    n_pix = 12 * nside * nside
    data = create_satellite_data(
        n_pix=7, obs_time=Quantity(30.0, u.minute), hwp_rpm=6.0
    )
    ops.DefaultNoiseModel().apply(data)
    det_pointing, pixels, weights = _pointing_ops(nside)

    # build pointing products + covariance first
    cov_and_hits = ops.CovarianceAndHits(
        pixel_dist="pixel_dist",
        pixel_pointing=pixels,
        stokes_weights=weights,
        rcond_threshold=1e-4,
    )
    cov_and_hits.apply(data)

    # fake sky: smooth I, small Q/U
    rng = np.random.default_rng(42)
    fake = np.zeros((n_pix, 3), dtype=np.float32)
    fake[:, 0] = rng.normal(10.0, 1.0, n_pix)
    fake[:, 1] = rng.normal(0.0, 0.1, n_pix)
    fake[:, 2] = rng.normal(0.0, 0.1, n_pix)
    sky = PixelData(data["pixel_dist"], n_value=3, units=u.K)
    sky.set_numpy(fake)
    data["fake_sky"] = sky

    # scan map -> TOD (signal starts at zero)
    scanner = ops.ScanMap(map_key="fake_sky", det_data="signal")
    scanner.apply(data)

    # bin the map back
    binner = ops.BinMap(
        pixel_dist="pixel_dist",
        covariance="covariance",
        binned="binned",
        det_data="signal",
        pixel_pointing=pixels,
        stokes_weights=weights,
    )
    binner.apply(data)

    binned = data["binned"].numpy()
    rcond = data["rcond"].numpy()[:, 0]
    good = rcond > 1e-2
    assert good.sum() > 100
    # noiseless scan+bin must reproduce the input map in solved pixels
    np.testing.assert_allclose(
        binned[good, 0], fake[good, 0], rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(binned[good, 1], fake[good, 1], atol=2e-3)
    np.testing.assert_allclose(binned[good, 2], fake[good, 2], atol=2e-3)


def test_binned_map_bitwise_stable():
    """Repeated binning of identical data gives identical maps (no atomics)."""
    data = create_satellite_data(n_pix=3, obs_time=Quantity(10.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    det_pointing, pixels, weights = _pointing_ops()
    cov_and_hits = ops.CovarianceAndHits(
        pixel_dist="pixel_dist", pixel_pointing=pixels, stokes_weights=weights
    )
    cov_and_hits.apply(data)
    binner = ops.BinMap(
        pixel_dist="pixel_dist",
        covariance="covariance",
        binned="binned",
        pixel_pointing=pixels,
        stokes_weights=weights,
    )
    binner.apply(data)
    m1 = data["binned"].numpy().copy()
    del data._internal["binned"]
    binner.apply(data)
    m2 = data["binned"].numpy()
    np.testing.assert_array_equal(m1, m2)


def test_noise_weight():
    data = create_satellite_data(n_pix=1, obs_time=Quantity(5.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ob = data.obs[0]
    n_det = len(ob.local_detectors)
    ob.detdata.create("signal", units=u.K)
    ob.detdata["signal"].data = np.ones(
        (n_det, ob.n_local_samples), dtype=np.float32
    )
    ops.NoiseWeight().apply(data)
    nse = ob["noise_model"]
    for det in ob.local_detectors:
        w = nse.detector_weight(det).value
        got = np.asarray(ob.detdata["signal"][det])
        np.testing.assert_allclose(got, w, rtol=1e-5)
