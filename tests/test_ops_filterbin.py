"""FilterBin and observation matrix tests."""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.pixels import PixelData
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from test_ops_ground import create_ground_data


def _setup(nside=8, duration_s=600.0, n_pix=2):
    data = create_ground_data(n_pix=n_pix, duration_s=duration_s)
    ops.DefaultNoiseModel().apply(data)
    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(
        nside=nside, detector_pointing=det_pointing, create_dist="pixel_dist"
    )
    weights = ops.StokesWeights(mode="IQU", detector_pointing=det_pointing)
    binner = ops.BinMap(
        pixel_dist="pixel_dist", pixel_pointing=pixels, stokes_weights=weights
    )
    ops.Pipeline(operators=[pixels, weights]).apply(data)
    return data, binner


def test_filterbin_produces_maps():
    data, binner = _setup()
    ops.SimNoise().apply(data)
    fb = ops.FilterBin(
        name="fb",
        binning=binner,
        poly_filter_order=1,
        ground_filter_order=3,
    )
    fb.apply(data)
    assert "fb_map" in data
    assert "fb_binmap" in data
    assert np.isfinite(data["fb_map"].numpy()).all()
    # filtering reduces large-scale noise power in the TOD
    # (weak check: filtered map differs from binned map)
    assert not np.allclose(data["fb_map"].numpy(), data["fb_binmap"].numpy())


def test_filterbin_obs_matrix_unbiased():
    """The observation matrix applied to the input sky reproduces the
    filtered+binned map of a noiseless sky scan."""
    nside = 8
    n_pix = 12 * nside * nside
    data, binner = _setup(nside=nside, duration_s=300.0, n_pix=1)

    rng = np.random.default_rng(5)
    sky = rng.normal(size=(n_pix, 3)).astype(np.float32)
    sky[:, 1:] *= 0.1
    px = PixelData(data["pixel_dist"], n_value=3, units=u.K)
    px.set_numpy(sky)
    data["input_sky"] = px
    ops.ScanMap(map_key="input_sky", det_data="signal").apply(data)

    fb = ops.FilterBin(
        name="fbm",
        binning=binner,
        poly_filter_order=1,
        ground_filter_order=2,
        write_obs_matrix=True,
    )
    fb.apply(data)
    obsmat = data["obs_matrix"]
    fmap = data["fbm_map"].numpy()

    predicted = (obsmat @ np.pad(
        sky, ((0, obsmat.shape[0] // 3 - n_pix), (0, 0))
    ).reshape(-1)).reshape(-1, 3)[:n_pix]
    rcond = data["fbm_rcond"].numpy()[:, 0]
    good = rcond > 1e-2
    np.testing.assert_allclose(
        predicted[good], fmap[good], atol=5e-3
    )
