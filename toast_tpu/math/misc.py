"""Miscellaneous numerical helpers.

TPU-native equivalents of the reference's ``_libtoast/math_misc.cpp``
(notably ``integrate_simpson``, ``math_misc.cpp:54``) used by bandpass
integration.  These run on the host (numpy, f64) — band integrals are
tiny per-detector reductions evaluated once at setup, not hot kernels.
"""

from __future__ import annotations

import numpy as np

__all__ = ["integrate_simpson", "simpson_weights"]


def simpson_weights(x):
    """Composite-Simpson quadrature weights for samples at ``x``.

    Supports non-uniform spacing: each pair of adjacent intervals is fit
    with the exact three-point (non-uniform) Simpson rule; a trailing odd
    interval uses the corrected trapezoid from the last parabola.  For
    ``len(x) < 3`` falls back to the trapezoid rule.  Returns ``w`` such
    that ``integral(f) ~= sum(w * f(x))``.
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if n == 0:
        return np.zeros(0)
    if n == 1:
        return np.zeros(1)
    w = np.zeros(n)
    if n == 2:
        h = x[1] - x[0]
        return np.array([0.5 * h, 0.5 * h])
    # pairs of intervals [x0,x1,x2], possibly with one interval left over
    i = 0
    while i + 2 < n or (i + 2 == n):
        if i + 2 > n - 1:
            break
        h0 = x[i + 1] - x[i]
        h1 = x[i + 2] - x[i + 1]
        s = h0 + h1
        # exact non-uniform Simpson coefficients
        w[i] += s * (2.0 * h0 - h1) / (6.0 * h0)
        w[i + 1] += s**3 / (6.0 * h0 * h1)
        w[i + 2] += s * (2.0 * h1 - h0) / (6.0 * h1)
        i += 2
    if i == n - 2:
        # one interval remains: corrected trapezoid using the last three
        # points (reference handles even counts the same way)
        h0 = x[i] - x[i - 1]
        h1 = x[i + 1] - x[i]
        w[i + 1] += h1 * (2.0 * h1 + 3.0 * h0) / (6.0 * (h0 + h1))
        w[i] += h1 * (h1 + 3.0 * h0) / (6.0 * h0)
        w[i - 1] -= h1**3 / (6.0 * h0 * (h0 + h1))
    return w


def integrate_simpson(x, f):
    """Integrate tabulated ``f(x)`` with composite Simpson quadrature.

    Mirrors the reference ``integrate_simpson`` (``math_misc.cpp:54``),
    including non-uniform abscissae and even sample counts.
    """
    x = np.asarray(x, dtype=np.float64)
    f = np.asarray(f, dtype=np.float64)
    return float(np.sum(simpson_weights(x) * f))
