"""ScanAlm operator tests: TOD from a_lm against direct Y_lm evaluation at
each sample's pointing (scipy oracle) and an analytic polarized quadrupole."""

import numpy as np
from scipy.special import sph_harm_y

import jax.numpy as jnp

from toast_tpu import ops
from toast_tpu.math import qarray as qa
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data


def _pointing_angles(ob):
    quats = np.asarray(ob.detdata["quats"].data, dtype=np.float64)
    vd = qa.rotate(quats, np.broadcast_to([0.0, 0.0, 1.0], quats.shape[:-1] + (3,)))
    theta = np.arccos(np.clip(vd[..., 2], -1, 1))
    phi = np.arctan2(vd[..., 1], vd[..., 0])
    return theta, phi


def test_scan_alm_temperature_matches_direct():
    data = create_satellite_data(n_pix=2, obs_time=Quantity(2.0, u.minute))
    ops.PointingDetectorSimple().apply(data)

    lmax = 8
    rng = np.random.default_rng(17)
    alm = (
        rng.normal(size=(lmax + 1, lmax + 1))
        + 1j * rng.normal(size=(lmax + 1, lmax + 1))
    )
    m = np.arange(lmax + 1)
    alm[m[None, :] > m[:, None]] = 0.0
    alm[:, 0] = alm[:, 0].real
    data["sky_alm"] = {"T": alm}

    ops.ScanAlm(alm="sky_alm", det_data="signal", pol=False, oversample=16).apply(data)

    ob = data.obs[0]
    got = ob.detdata["signal"].numpy()
    theta, phi = _pointing_angles(ob)
    want = np.zeros_like(theta)
    for l in range(lmax + 1):
        for mm in range(l + 1):
            y = sph_harm_y(l, mm, theta, phi)
            contrib = alm[l, mm] * y
            want += contrib.real if mm == 0 else 2.0 * contrib.real
    scale = np.std(want)
    assert np.max(np.abs(got - want)) < 2e-3 * scale


def test_scan_alm_polarized_quadrupole():
    """Pure E (2,0): Q(theta) = -(1/8) sqrt(30/pi) sin^2(theta), U = 0;
    detector sees I + wQ Q + wU U."""
    data = create_satellite_data(
        n_pix=2, obs_time=Quantity(2.0, u.minute), hwp_rpm=6.0
    )
    det_pointing = ops.PointingDetectorSimple()
    weights = ops.StokesWeights(
        mode="IQU", detector_pointing=det_pointing, hwp_angle="hwp_angle"
    )
    ops.Pipeline(operators=[det_pointing, weights]).apply(data)

    lmax = 4
    aE = np.zeros((lmax + 1, lmax + 1), dtype=np.complex128)
    aT = np.zeros_like(aE)
    data["sky_alm"] = {"T": aT, "E": aE.copy()}
    data["sky_alm"]["E"][2, 0] = 1.0

    ops.ScanAlm(alm="sky_alm", det_data="signal", pol=True, oversample=16).apply(data)

    ob = data.obs[0]
    got = ob.detdata["signal"].numpy()
    theta, _ = _pointing_angles(ob)
    wts = np.asarray(ob.detdata["weights"].data, dtype=np.float64)
    Q = -(1.0 / 8.0) * np.sqrt(30.0 / np.pi) * np.sin(theta) ** 2
    want = wts[..., 1] * Q  # U = 0, T = 0
    assert np.max(np.abs(got - want)) < 2e-3 * np.std(Q)


def test_sim_totalconvolve_symmetric_beam():
    """Native SimTotalconvolve with a symmetric beam equals ScanAlm with
    the equivalent b_l smoothing; asymmetric beams raise."""
    import pytest

    data = create_satellite_data(n_pix=1, obs_time=Quantity(1.0, u.minute))
    ops.PointingDetectorSimple().apply(data)
    lmax = 8
    rng = np.random.default_rng(3)
    alm = rng.normal(size=(lmax + 1, lmax + 1)) + 1j * rng.normal(
        size=(lmax + 1, lmax + 1)
    )
    m = np.arange(lmax + 1)
    alm[m[None, :] > m[:, None]] = 0.0
    alm[:, 0] = alm[:, 0].real
    data["sky_alm"] = {"T": alm}

    from toast_tpu.math.sht import gaussian_beam

    bl = gaussian_beam(lmax, np.radians(15.0))
    # beam alm of a symmetric beam: b_l0 = bl * sqrt((2l+1)/4pi)
    beam_alm = np.zeros((lmax + 1, lmax + 1), dtype=np.complex128)
    ell = np.arange(lmax + 1)
    beam_alm[:, 0] = bl * np.sqrt((2 * ell + 1) / (4 * np.pi))
    data["beam_alm"] = {"T": beam_alm}

    ops.SimTotalconvolve(
        alm="sky_alm", beam="beam_alm", det_data="conv", pol=False
    ).apply(data)
    ops.ScanAlm(
        alm="sky_alm", det_data="smooth", fwhm=Quantity(15.0, u.deg), pol=False
    ).apply(data)
    ob = data.obs[0]
    np.testing.assert_allclose(
        ob.detdata["conv"].numpy(),
        ob.detdata["smooth"].numpy(),
        rtol=1e-4,
        atol=1e-5,
    )

    # an asymmetric beam takes the full 4-pi convolution path and must
    # agree with the direct convolution-cube sampling at the detector
    # pointings (the cube itself is oracle-verified in
    # tests/test_beam_convolve.py)
    asym = beam_alm.copy()
    asym[3, 2] = 0.7 - 0.2j
    asym[5, 1] = 0.4 + 0.3j
    data["beam_asym"] = {"T": asym}
    ops.SimTotalconvolve(
        alm="sky_alm", beam="beam_asym", det_data="aconv", pol=False
    ).apply(data)
    import jax.numpy as jnp

    from toast_tpu.math.beam_convolve import (
        convolution_grids,
        convolve_samples,
        euler_zyz_from_quat,
    )

    grids_re, grids_im = convolution_grids(
        alm, asym[:, :3], lmax, 2, n_theta=4 * (lmax + 1),
        n_phi=8 * (lmax + 1),
    )
    quats = ob.detdata["quats"].data
    phi, theta, psi = euler_zyz_from_quat(quats)
    want = np.asarray(convolve_samples(grids_re, grids_im, theta, phi, psi))
    got = ob.detdata["aconv"].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # the asymmetric result differs from any psi-independent scan
    assert np.abs(got - ob.detdata["conv"].numpy()).max() > 1e-3


def test_scan_alm_beam_smoothing_reduces_power():
    """A 5-degree beam must suppress l=8 structure strongly."""
    data = create_satellite_data(n_pix=1, obs_time=Quantity(1.0, u.minute))
    ops.PointingDetectorSimple().apply(data)
    lmax = 8
    alm = np.zeros((lmax + 1, lmax + 1), dtype=np.complex128)
    alm[8, 3] = 3.0 + 1.0j
    data["sky_alm"] = {"T": alm}
    ops.ScanAlm(alm="sky_alm", det_data="raw").apply(data)
    ops.ScanAlm(alm="sky_alm", det_data="smooth", fwhm=Quantity(20.0, u.deg)).apply(data)
    ob = data.obs[0]
    raw = ob.detdata["raw"].numpy()
    smooth = ob.detdata["smooth"].numpy()
    from toast_tpu.math.sht import gaussian_beam

    bl = gaussian_beam(lmax, np.radians(20.0))[8]
    np.testing.assert_allclose(
        np.std(smooth), bl * np.std(raw), rtol=0.05
    )
