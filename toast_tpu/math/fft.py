"""FFT helpers (rebuild of ``src/toast/fft.py`` on top of XLA).

The reference maintains a C++ plan store over FFTW/MKL/cuFFT
(``src/libtoast/src/toast_math_fft*.cpp``) because CPU FFT wants cached
plans.  On TPU, ``jnp.fft.rfft``/``irfft`` compile to XLA FFT HLOs that are
planned once per shape by the compiler, so no plan store is needed — we keep
thin batched wrappers plus the convolution helper used by templates and the
time-constant operator.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def rfft(data, axis=-1):
    """Real-to-half-complex forward FFT (unnormalized, like FFTW)."""
    return jnp.fft.rfft(data, axis=axis)


def irfft(fdata, n, axis=-1):
    """Half-complex-to-real inverse FFT.

    Matches FFTW's unnormalized backward transform (the reference scales
    by 1/n afterwards where needed); ``jnp.fft.irfft`` already includes
    the 1/n normalization, so this is the *normalized* inverse.
    """
    return jnp.fft.irfft(fdata, n=n, axis=axis)


def convolve(data, kernel_f, axis=-1):
    """Circular convolution of real data with a real frequency-domain kernel."""
    n = data.shape[axis]
    return jnp.fft.irfft(jnp.fft.rfft(data, axis=axis) * kernel_f, n=n, axis=axis)


def next_fast_fft_length(n):
    """Smallest 5-smooth number >= n (XLA FFT is efficient for 2,3,5 radices)."""
    n = int(n)
    if n <= 1:
        return 1
    best = 1 << (n - 1).bit_length()
    f5 = 1
    while f5 < best:
        f35 = f5
        while f35 < best:
            # round up the power of two factor
            rem = -(-n // f35)
            p2 = 1 << max(0, (rem - 1).bit_length())
            total = f35 * p2
            if n <= total < best:
                best = total
            f35 *= 3
        f5 *= 5
    return best


def interpolate_psd(freq, psd, interp_freq):
    """Log-log interpolate a PSD onto a new frequency grid (numpy, host).

    Mirrors the reference behavior in ``toast_tod_simnoise.cpp``: PSDs are
    interpolated in log-log space with clamping at the boundaries, and
    non-positive PSD bins are handled by flooring to a tiny value.
    """
    freq = np.asarray(freq, dtype=np.float64)
    psd = np.asarray(psd, dtype=np.float64)
    interp_freq = np.asarray(interp_freq, dtype=np.float64)
    tiny = 1e-300
    pos = freq > 0
    lf = np.log10(freq[pos])
    lp = np.log10(np.maximum(psd[pos], tiny))
    lout = np.interp(
        np.log10(np.maximum(interp_freq, freq[pos][0] * 1e-6)), lf, lp
    )
    out = 10.0**lout
    out[interp_freq <= 0] = 0.0
    return out
