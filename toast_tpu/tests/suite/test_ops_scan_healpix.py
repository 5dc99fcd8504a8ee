"""File-based map scanning tests."""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.pixels import (
    PixelData,
    PixelDistribution,
    read_healpix_fits,
    write_healpix_fits,
    write_healpix_hdf5,
)
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data

NSIDE = 16
NPIX = 12 * NSIDE * NSIDE


def _write_map(tmp_path, fmt="h5"):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(NPIX, 3)).astype(np.float32)
    dist = PixelDistribution(n_pix=NPIX)
    px = PixelData(dist, n_value=3, units=u.K)
    px.set_numpy(arr)
    path = str(tmp_path / f"sky.{fmt}")
    if fmt == "h5":
        write_healpix_hdf5(px, path, nest=True)
    else:
        write_healpix_fits(px, path, nest=True)
    return path, arr


def test_fits_map_roundtrip(tmp_path):
    path, arr = _write_map(tmp_path, fmt="fits")
    loaded = read_healpix_fits(path, nest=True)
    np.testing.assert_allclose(loaded.numpy(), arr, rtol=1e-6)
    # ordering conversion
    loaded_ring = read_healpix_fits(path, nest=False)
    from toast_tpu.math import healpix as hpx

    pix = np.arange(NPIX)
    np.testing.assert_allclose(
        loaded_ring.numpy()[hpx.nest2ring(NSIDE, pix)], arr, rtol=1e-6
    )


@pytest.mark.parametrize("fmt", ["h5", "fits"])
def test_scan_healpix_map(tmp_path, fmt):
    path, arr = _write_map(tmp_path, fmt=fmt)
    data = create_satellite_data(n_pix=2, obs_time=Quantity(10.0, u.minute))
    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(nside=NSIDE, detector_pointing=det_pointing)
    weights = ops.StokesWeights(mode="IQU", detector_pointing=det_pointing)
    scanner = ops.ScanHealpixMap(
        file=path, pixel_pointing=pixels, stokes_weights=weights
    )
    scanner.apply(data)
    ob = data.obs[0]
    tod = ob.detdata["signal"].numpy()
    assert np.isfinite(tod).all()
    # cross-check one sample by hand
    pix = np.asarray(ob.detdata["pixels"][0])
    wts = np.asarray(ob.detdata["weights"][0])
    expect = np.sum(arr[pix[0]] * wts[0])
    np.testing.assert_allclose(tod[0, 0], expect, rtol=1e-5)


def test_scan_healpix_mask(tmp_path):
    # mask: flag southern hemisphere pixels
    from toast_tpu.math import healpix as hpx

    dist = PixelDistribution(n_pix=NPIX)
    mask = PixelData(dist, n_value=1, dtype=np.float32)
    vec = hpx.nest2vec(NSIDE, np.arange(NPIX))
    mask.set_numpy((vec[:, 2] < 0).astype(np.float32)[:, None])
    path = str(tmp_path / "mask.h5")
    write_healpix_hdf5(mask, path, nest=True)

    data = create_satellite_data(n_pix=1, obs_time=Quantity(10.0, u.minute))
    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(nside=NSIDE, detector_pointing=det_pointing)
    masker = ops.ScanHealpixMask(file=path, pixel_pointing=pixels)
    masker.apply(data)
    ob = data.obs[0]
    flags = ob.detdata["flags"].numpy()
    pix = np.asarray(ob.detdata["pixels"].data)
    south = vec[:, 2][pix] < 0
    assert np.all((flags != 0) == south)


def test_interpolate_healpix(tmp_path):
    # smooth map: interpolation should track the underlying function
    from toast_tpu.math import healpix as hpx

    dist = PixelDistribution(n_pix=NPIX)
    px = PixelData(dist, n_value=1, units=u.K)
    vec = hpx.ring2vec(NSIDE, np.arange(NPIX))
    px.set_numpy(vec[:, 2].astype(np.float32)[:, None])  # map = z coordinate
    path = str(tmp_path / "smooth.h5")
    write_healpix_hdf5(px, path, nest=False)

    data = create_satellite_data(n_pix=1, obs_time=Quantity(5.0, u.minute))
    det_pointing = ops.PointingDetectorSimple()
    interp = ops.InterpolateHealpixMap(file=path, detector_pointing=det_pointing)
    interp.apply(data)
    ob = data.obs[0]
    tod = ob.detdata["signal"].numpy()
    from toast_tpu.math import qarray as qa

    quats = np.asarray(ob.detdata["quats"].data)
    z = qa.rotate(quats, np.array([0.0, 0.0, 1.0]))[..., 2]
    np.testing.assert_allclose(tod, z, atol=0.05)
