"""HWP-synchronous-signal (HWPSS) fitting helpers.

Rebuild of ``src/toast/hwp_utils.py``: build harmonic design matrices in the
HWP angle and fit per-detector HWPSS coefficients, optionally with slow time
drift of the harmonic amplitudes.
"""

from __future__ import annotations

import numpy as np


def hwpss_samples(n, chi, order, drift_order=0):
    """Design matrix of HWPSS harmonics with optional polynomial drift.

    Columns: for each harmonic k=1..order, (cos k chi, sin k chi) times
    Legendre time polynomials P_0..P_drift_order.
    """
    t = np.linspace(-1.0, 1.0, n)
    tpolys = [np.ones(n)]
    if drift_order >= 1:
        tpolys.append(t)
    for p in range(1, drift_order):
        tpolys.append(
            ((2 * p + 1) * t * tpolys[p] - p * tpolys[p - 1]) / (p + 1)
        )
    cols = []
    for k in range(1, order + 1):
        ck = np.cos(k * chi)
        sk = np.sin(k * chi)
        for tp in tpolys:
            cols.append(ck * tp)
            cols.append(sk * tp)
    return np.stack(cols, axis=-1)


def hwpss_compute_coeff(chi, signal, good, order, drift_order=0):
    """Least-squares HWPSS coefficients for one detector."""
    n = len(signal)
    basis = hwpss_samples(n, chi, order, drift_order)
    w = good.astype(np.float64)
    ata = (basis * w[:, None]).T @ basis
    atd = (basis * w[:, None]).T @ signal
    ata += 1e-12 * np.eye(ata.shape[0])
    return np.linalg.solve(ata, atd)


def hwpss_build_model(chi, coeff, n, order, drift_order=0):
    """Evaluate the fitted HWPSS model."""
    basis = hwpss_samples(n, chi, order, drift_order)
    return basis @ coeff
