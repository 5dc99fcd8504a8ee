"""Pallas SHT recurrence kernel: equivalence with the XLA-scan path.

On CPU the kernel runs in interpreter mode; on TPU the same code compiles
to a Mosaic kernel that keeps all recurrence state in VMEM (the XLA scan
round-trips its carries through HBM every step).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toast_tpu.math import sht
from toast_tpu.math.sht_pallas import ring_coeffs_pallas

_INTERPRET = jax.default_backend() == "cpu"


@pytest.mark.parametrize("spin", [0, 2, -2])
def test_pallas_ring_coeffs_matches_scan(spin):
    rng = np.random.default_rng(7)
    lmax = 48
    alm = rng.normal(size=(lmax + 1, lmax + 1)) + 1j * rng.normal(
        size=(lmax + 1, lmax + 1)
    )
    m = np.arange(lmax + 1)
    alm[m[None, :] > m[:, None]] = 0.0
    alm[:, 0] = alm[:, 0].real
    theta = np.linspace(0.03, 3.1, 100)

    ref = np.asarray(
        sht.ring_coeffs(jnp.asarray(alm), jnp.asarray(theta), lmax, spin=spin)
    )
    got = np.asarray(
        ring_coeffs_pallas(
            jnp.asarray(alm), jnp.asarray(theta), lmax, spin, _INTERPRET
        )
    )
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 1e-4


def test_pallas_ring_coeffs_high_m_scaling():
    """The in-kernel exponent tracking survives deep sin^m underflow."""
    lmax = 300
    m = 200
    alm = np.zeros((lmax + 1, lmax + 1), dtype=np.complex128)
    alm[300, m] = 1.0
    n_theta = 512
    theta = np.pi * (np.arange(n_theta) + 0.5) / n_theta
    got = np.asarray(
        ring_coeffs_pallas(jnp.asarray(alm), jnp.asarray(theta), lmax, 0, _INTERPRET)
    )
    lam = got[:, m].real
    norm = 2 * np.pi * np.sum(lam**2 * np.sin(theta)) * (np.pi / n_theta)
    assert abs(norm - 1.0) < 2e-2, norm
