"""Spherical-harmonic synthesis tests: spin-0 against scipy oracles,
spin-2 against analytic sY_lm, power-spectrum recovery, and the scaled
recurrence at high (l, m)."""

import numpy as np
import pytest
from scipy.special import sph_harm_y

import jax.numpy as jnp

from toast_tpu.math import sht


def _direct_T(alm, lmax, theta, phi):
    """Direct spin-0 synthesis via scipy Y_lm (m >= 0 + conjugates)."""
    out = np.zeros(theta.shape, dtype=np.complex128)
    for l in range(lmax + 1):
        for m in range(0, l + 1):
            y = sph_harm_y(l, m, theta, phi)
            a = alm[l, m]
            out += a * y
            if m > 0:
                out += np.conj(a) * np.conj(y) * 1.0
    return out.real


def test_ring_coeffs_spin0_matches_scipy():
    lmax = 12
    rng = np.random.default_rng(3)
    alm = (
        rng.normal(size=(lmax + 1, lmax + 1))
        + 1j * rng.normal(size=(lmax + 1, lmax + 1))
    )
    m_idx = np.arange(lmax + 1)
    alm[m_idx[None, :] > m_idx[:, None]] = 0.0
    alm[:, 0] = alm[:, 0].real

    theta = np.array([0.3, 0.7, 1.1, np.pi / 2, 2.2, 2.9])
    F = np.asarray(sht.ring_coeffs(jnp.asarray(alm), jnp.asarray(theta), lmax))
    # oracle: F_m(theta) = sum_l a_lm Lambda_lm(theta), with
    # Lambda_lm = Y_lm(theta, 0)
    for it, th in enumerate(theta):
        for m in range(lmax + 1):
            want = sum(
                alm[l, m] * sph_harm_y(l, m, th, 0.0)
                for l in range(m, lmax + 1)
            )
            np.testing.assert_allclose(
                F[it, m], complex(want), rtol=2e-4, atol=1e-5
            )


def test_grid_synthesis_spin0_matches_direct():
    lmax = 8
    rng = np.random.default_rng(11)
    alm = (
        rng.normal(size=(lmax + 1, lmax + 1))
        + 1j * rng.normal(size=(lmax + 1, lmax + 1))
    )
    m_idx = np.arange(lmax + 1)
    alm[m_idx[None, :] > m_idx[:, None]] = 0.0
    alm[:, 0] = alm[:, 0].real

    n_theta, n_phi = 24, 48
    grid = np.asarray(sht.synthesize_grid_T(jnp.asarray(alm), lmax, n_theta, n_phi))
    theta = np.pi * (np.arange(n_theta) + 0.5) / n_theta
    phi = 2 * np.pi * np.arange(n_phi) / n_phi
    TT, PP = np.meshgrid(theta, phi, indexing="ij")
    want = _direct_T(alm, lmax, TT, PP)
    np.testing.assert_allclose(grid, want, rtol=1e-3, atol=2e-4)


def test_spin2_quadrupole_analytic():
    """Pure E (l=2, m=0): Q + iU = -aE 2Y_20, with
    2Y_20 = (1/8) sqrt(30/pi) sin^2(theta) (real), so U = 0 and
    Q = -(1/8) sqrt(30/pi) sin^2 theta."""
    lmax = 4
    aE = np.zeros((lmax + 1, lmax + 1), dtype=np.complex128)
    aB = np.zeros_like(aE)
    aE[2, 0] = 1.0
    n_theta, n_phi = 16, 32
    Q, U = sht.synthesize_grid_pol(
        jnp.asarray(aE), jnp.asarray(aB), lmax, n_theta, n_phi
    )
    Q = np.asarray(Q)
    U = np.asarray(U)
    theta = np.pi * (np.arange(n_theta) + 0.5) / n_theta
    wantQ = -(1.0 / 8.0) * np.sqrt(30.0 / np.pi) * np.sin(theta) ** 2
    np.testing.assert_allclose(Q, wantQ[:, None] * np.ones((1, n_phi)),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(U, 0.0, atol=1e-5)


def test_spin2_power_integral():
    """Spin-2 orthonormality: for a single (l=2, m=1) E mode,
    integral over the sphere of (Q^2 + U^2) = integral |P+|^2
    = |c_{2,1}|^2 + |c_{2,-1}|^2 = 2 |aE_{2,1}|^2."""
    lmax = 2
    aE = np.zeros((3, 3), dtype=np.complex128)
    aB = np.zeros_like(aE)
    aE[2, 1] = 1.0 + 0.5j
    n_theta, n_phi = 12, 24
    Q, U = sht.synthesize_grid_pol(
        jnp.asarray(aE), jnp.asarray(aB), lmax, n_theta, n_phi
    )
    theta = np.pi * (np.arange(n_theta) + 0.5) / n_theta
    w = np.sin(theta) * (np.pi / n_theta) * (2 * np.pi / n_phi)
    power = np.sum((np.asarray(Q) ** 2 + np.asarray(U) ** 2) * w[:, None])
    want = 2.0 * abs(aE[2, 1]) ** 2
    np.testing.assert_allclose(power, want, rtol=2e-3)


def test_power_spectrum_recovery():
    """Grid variance of a synthesized GRF matches sum (2l+1) C_l / 4 pi."""
    lmax = 64
    ell = np.arange(lmax + 1, dtype=np.float64)
    cl = 1000.0 * np.exp(-0.5 * ((ell - 20.0) / 10.0) ** 2)
    alms = sht.synalm({"TT": cl}, lmax, seed=5)
    n_theta, n_phi = 256, 512
    grid = np.asarray(sht.synthesize_grid_T(jnp.asarray(alms["T"]), lmax,
                                            n_theta, n_phi))
    theta = np.pi * (np.arange(n_theta) + 0.5) / n_theta
    w = np.sin(theta)
    var = np.sum(grid**2 * w[:, None]) / (np.sum(w) * n_phi)
    want = np.sum((2 * ell + 1) * cl) / (4 * np.pi)
    # single realization: cosmic variance ~ sqrt(2 / n_modes) ~ 7%
    assert abs(var - want) / want < 0.25


def test_high_l_m_scaled_recurrence():
    """The scaled recurrence survives deep sin^m underflow (scipy itself
    returns NaN at l=900): check orthonormality
    2 pi * int |Lambda_lm|^2 sin(theta) d theta = 1 for (l=900, m=600),
    and that Lambda vanishes deep inside the classically forbidden region
    sin(theta) << m/l."""
    lmax = 900
    m = 600
    alm = np.zeros((lmax + 1, lmax + 1), dtype=np.complex128)
    alm[900, m] = 1.0
    n_theta = 4096
    theta = np.pi * (np.arange(n_theta) + 0.5) / n_theta
    F = np.asarray(sht.ring_coeffs(jnp.asarray(alm), jnp.asarray(theta), lmax))
    lam = F[:, m].real
    norm = 2 * np.pi * np.sum(lam**2 * np.sin(theta)) * (np.pi / n_theta)
    assert abs(norm - 1.0) < 2e-2, norm
    # forbidden region: theta where sin(theta) < 0.5 * m/l
    forbidden = np.sin(theta) < 0.5 * (m / 900.0)
    assert np.max(np.abs(lam[forbidden])) < 1e-6
    # allowed region has O(sqrt(l)) oscillating values
    assert np.max(np.abs(lam)) > 1.0


def test_healpix_synthesis_matches_direct():
    lmax = 6
    rng = np.random.default_rng(21)
    alm = (
        rng.normal(size=(lmax + 1, lmax + 1))
        + 1j * rng.normal(size=(lmax + 1, lmax + 1))
    )
    m_idx = np.arange(lmax + 1)
    alm[m_idx[None, :] > m_idx[:, None]] = 0.0
    alm[:, 0] = alm[:, 0].real
    nside = 16
    T = np.asarray(sht.synthesize_healpix(alm, lmax, nside, oversample=8))
    from toast_tpu.math.healpix import ring2ang

    pix = np.arange(12 * nside * nside)
    theta, phi = ring2ang(nside, pix)
    want = _direct_T(alm, lmax, np.asarray(theta), np.asarray(phi))
    err = np.abs(T - want)
    assert np.max(err) < 5e-3 * np.std(want) + 1e-4
