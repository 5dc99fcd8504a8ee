"""Native SimConviqt: FITS alm round trip + convolution vs SimTotalconvolve."""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.io.alm_fits import read_alm_fits, write_alm_fits
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data

LMAX = 8


def _random_alm(rng, lmax, mmax):
    alm = np.zeros((lmax + 1, mmax + 1), dtype=complex)
    for l in range(lmax + 1):
        alm[l, 0] = rng.normal()
        for m in range(1, min(l, mmax) + 1):
            alm[l, m] = (rng.normal() + 1j * rng.normal()) / np.sqrt(2)
    return alm


def test_alm_fits_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    alm = _random_alm(rng, LMAX, LMAX)
    path = str(tmp_path / "alm.fits")
    write_alm_fits(path, alm)
    got, mmax = read_alm_fits(path)
    assert mmax == LMAX
    np.testing.assert_allclose(got, alm, rtol=0, atol=1e-14)
    # truncated mmax layout round-trips too
    b = _random_alm(rng, LMAX, 3)
    path2 = str(tmp_path / "blm.fits")
    write_alm_fits(path2, b, mmax=3)
    got2, mmax2 = read_alm_fits(path2)
    assert mmax2 == 3
    np.testing.assert_allclose(got2, b, atol=1e-14)


def test_sim_conviqt_matches_totalconvolve(tmp_path):
    """SimConviqt (file-driven) equals SimTotalconvolve (key-driven) on the
    same asymmetric beam."""
    rng = np.random.default_rng(2)
    data = create_satellite_data(n_pix=1, obs_time=Quantity(1.0, u.minute))
    ops.PointingDetectorSimple().apply(data)
    alm = _random_alm(rng, LMAX, LMAX)
    blm = _random_alm(rng, LMAX, 3)
    skyf = str(tmp_path / "sky.fits")
    beamf = str(tmp_path / "beam.fits")
    write_alm_fits(skyf, alm)
    write_alm_fits(beamf, blm, mmax=3)

    ops.SimConviqt(
        sky_file=skyf, beam_file=beamf, det_data="conviqt", zero=True
    ).apply(data)

    beam_padded = np.zeros((LMAX + 1, LMAX + 1), dtype=complex)
    beam_padded[:, :4] = blm
    data["sky_alm"] = {"T": alm}
    data["beam_alm"] = {"T": beam_padded}
    ops.SimTotalconvolve(
        alm="sky_alm", beam="beam_alm", det_data="totc", pol=False
    ).apply(data)

    ob = data.obs[0]
    a = ob.detdata["conviqt"].numpy()
    b = ob.detdata["totc"].numpy()
    assert np.std(a) > 0
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
