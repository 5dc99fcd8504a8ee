"""Asymmetric 4-pi beam convolution vs an exact Wigner-D oracle.

The oracle evaluates T(R) = sum_{l m m'} a_lm conj(b_lm') D^l_{mm'}(R)
with d^l(theta) = expm(-i theta Jy) computed exactly in the |l, m> basis
(scipy matrix exponential) — no shared code with the implementation.
"""

import numpy as np
import pytest
from scipy.linalg import expm

import jax.numpy as jnp

from toast_tpu.math import qarray as qa
from toast_tpu.math.beam_convolve import (
    convolution_grids,
    convolve_samples,
    euler_zyz_from_quat,
)

LMAX = 8
MMAX = 3


def _wigner_d(l, theta):
    """Exact d^l_{m m'}(theta) matrix, indices m, m' in [-l, l]."""
    m = np.arange(-l, l + 1)
    # <l m'|Jy|l m>: Jy = (J+ - J-) / 2i
    cp = np.sqrt(l * (l + 1) - m * (m + 1))  # raises m -> m+1
    cm = np.sqrt(l * (l + 1) - m * (m - 1))  # lowers m -> m-1
    Jy = np.zeros((2 * l + 1, 2 * l + 1), dtype=complex)
    for i, mm in enumerate(m):
        if i + 1 < len(m):
            Jy[i + 1, i] = cp[i] / 2j
        if i - 1 >= 0:
            Jy[i - 1, i] = -cm[i] / 2j
    return expm(-1j * theta * Jy)


def _full_alm(dense, lmax):
    """(lmax+1, lmax+1) m>=0 array -> dict[(l, m)] over all m (real field)."""
    out = {}
    for l in range(lmax + 1):
        for m in range(0, l + 1):
            out[(l, m)] = dense[l, m]
            if m > 0:
                out[(l, -m)] = (-1) ** m * np.conj(dense[l, m])
    return out


def _oracle(alm_dense, blm_dense, lmax, mmax, phi, theta, psi):
    a = _full_alm(alm_dense, lmax)
    b = _full_alm(
        np.pad(blm_dense, ((0, 0), (0, lmax - mmax))), lmax
    )
    total = 0.0 + 0.0j
    for l in range(lmax + 1):
        d = _wigner_d(l, theta)
        for mi, m in enumerate(range(-l, l + 1)):
            for mpi, mp in enumerate(range(-l, l + 1)):
                if abs(mp) > mmax:
                    continue
                D = np.exp(-1j * m * phi) * d[mi, mpi] * np.exp(-1j * mp * psi)
                total += a[(l, m)] * np.conj(b[(l, mp)]) * D
    return total


@pytest.fixture(scope="module")
def alm_blm():
    rng = np.random.default_rng(11)
    alm = np.zeros((LMAX + 1, LMAX + 1), dtype=complex)
    blm = np.zeros((LMAX + 1, MMAX + 1), dtype=complex)
    for l in range(LMAX + 1):
        alm[l, 0] = rng.normal()
        blm[l, 0] = rng.normal()
        for m in range(1, l + 1):
            alm[l, m] = (rng.normal() + 1j * rng.normal()) / np.sqrt(2)
            if m <= MMAX:
                blm[l, m] = (rng.normal() + 1j * rng.normal()) / np.sqrt(2)
    return alm, blm


def test_convolution_matches_wigner_oracle(alm_blm):
    alm, blm = alm_blm
    rng = np.random.default_rng(3)
    n = 12
    phis = rng.uniform(0, 2 * np.pi, n)
    thetas = rng.uniform(0.2, np.pi - 0.2, n)
    psis = rng.uniform(0, 2 * np.pi, n)

    grids_re, grids_im = convolution_grids(
        alm, blm, LMAX, MMAX, n_theta=128, n_phi=256
    )
    got = np.asarray(
        convolve_samples(
            grids_re,
            grids_im,
            jnp.asarray(thetas, jnp.float32),
            jnp.asarray(phis, jnp.float32),
            jnp.asarray(psis, jnp.float32),
        )
    )
    want = np.array(
        [
            _oracle(alm, blm, LMAX, MMAX, p, t, s)
            for p, t, s in zip(phis, thetas, psis)
        ]
    )
    assert np.abs(want.imag).max() < 1e-8  # real sky x real beam
    scale = np.abs(want.real).max()
    assert np.abs(got - want.real).max() / scale < 2e-3, (
        np.abs(got - want.real).max(),
        scale,
    )


def test_symmetric_beam_reduces_to_scan(alm_blm):
    """With b_lm' = delta_m'0 b_l0 the convolution equals the smoothed-sky
    scan a_lm b_l0 sqrt(4pi/(2l+1)) at psi-independent pointings."""
    alm, blm = alm_blm
    bsym = np.zeros_like(blm)
    bsym[:, 0] = blm[:, 0].real
    rng = np.random.default_rng(7)
    n = 8
    phis = rng.uniform(0, 2 * np.pi, n)
    thetas = rng.uniform(0.3, np.pi - 0.3, n)
    psis = rng.uniform(0, 2 * np.pi, n)
    grids_re, grids_im = convolution_grids(
        alm, bsym, LMAX, 0, n_theta=128, n_phi=256
    )
    got = np.asarray(
        convolve_samples(
            grids_re, grids_im,
            jnp.asarray(thetas, jnp.float32),
            jnp.asarray(phis, jnp.float32),
            jnp.asarray(psis, jnp.float32),
        )
    )
    # psi must not matter for a symmetric beam
    got2 = np.asarray(
        convolve_samples(
            grids_re, grids_im,
            jnp.asarray(thetas, jnp.float32),
            jnp.asarray(phis, jnp.float32),
            jnp.zeros(n, jnp.float32),
        )
    )
    np.testing.assert_allclose(got, got2, atol=1e-6)
    want = np.array(
        [
            _oracle(alm, bsym, LMAX, 0, p, t, 0.0).real
            for p, t in zip(phis, thetas)
        ]
    )
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-3


def test_euler_angles_from_quat():
    """zyz Euler extraction inverts quaternion composition."""
    rng = np.random.default_rng(5)
    phis = rng.uniform(0, 2 * np.pi, 16)
    thetas = rng.uniform(0.1, np.pi - 0.1, 16)
    psis = rng.uniform(-np.pi, np.pi, 16)
    ZAXIS = np.array([0.0, 0.0, 1.0])
    YAXIS = np.array([0.0, 1.0, 0.0])
    quats = qa.mult(
        qa.mult(
            np.stack([np.asarray(qa.rotation(ZAXIS, p)) for p in phis]),
            np.stack([np.asarray(qa.rotation(YAXIS, t)) for t in thetas]),
        ),
        np.stack([np.asarray(qa.rotation(ZAXIS, s)) for s in psis]),
    )
    phi2, theta2, psi2 = (np.asarray(x) for x in euler_zyz_from_quat(
        jnp.asarray(quats, jnp.float32)
    ))
    np.testing.assert_allclose(theta2, thetas, atol=1e-5)
    np.testing.assert_allclose(
        np.mod(phi2 - phis + np.pi, 2 * np.pi) - np.pi, 0.0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.mod(psi2 - psis + np.pi, 2 * np.pi) - np.pi, 0.0, atol=1e-4
    )
