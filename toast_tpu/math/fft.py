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

from functools import partial

import jax
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
    return irfft_batched(fdata, n, axis=axis)


def irfft_batched(fdata, n, axis=-1):
    """irfft with sublane-aligned batch padding.

    The TPU backend's batched complex irfft can emit a spurious all-NaN
    row for non-multiple-of-8 batch shapes (position-dependent, not
    content-dependent — see ops/kernels/simnoise.py).  2-D batches are
    padded with zero rows to 8-row alignment and sliced back; zeros
    transform to zeros, so padding never changes results.
    """
    if getattr(fdata, "ndim", 1) == 2 and axis in (-1, 1):
        rows = fdata.shape[0]
        pad = (-rows) % 8
        if pad:
            fdata = jnp.concatenate(
                [fdata, jnp.zeros((pad, fdata.shape[1]), fdata.dtype)], axis=0
            )
            return jnp.fft.irfft(fdata, n=n, axis=-1)[:rows]
    return jnp.fft.irfft(fdata, n=n, axis=axis)


def convolve(data, kernel_f, axis=-1):
    """Circular convolution of real data with a real frequency-domain kernel."""
    n = data.shape[axis]
    return irfft_batched(jnp.fft.rfft(data, axis=axis) * kernel_f, n, axis=axis)


def fourier_filter_freqs(n, rate):
    """Frequency grid (Hz) on which a :func:`filter_fourier` kernel must
    be evaluated for data of length n at the given sample rate."""
    return np.fft.rfftfreq(n, 1.0 / rate)


# ---------------------------------------------------------------------------
# Any-length circular FFT via Bluestein's chirp-z transform.
#
# XLA lowers non-power-of-two FFTs on TPU to an n x n DFT *matmul*
# (observed: a length-178572 irfft tried to allocate f32[178572, 178572] =
# 127 GB).  Bluestein expresses a length-n DFT as a circular convolution of
# length m = next_pow2(2n-1), computed with three power-of-two FFTs.  The
# chirp phases need j^2 precision, so the constants are built on the host
# in float64 and cached per (n, direction).
# ---------------------------------------------------------------------------

_BLUESTEIN_CACHE: dict = {}


def _bluestein_consts(n, inverse):
    key = (n, inverse)
    hit = _BLUESTEIN_CACHE.get(key)
    if hit is not None:
        return hit
    j = np.arange(n, dtype=np.float64)
    sign = 1.0 if inverse else -1.0
    # exact phase via integer j^2 mod 2n (float64 loses j^2 beyond 2^53)
    j2 = (np.arange(n, dtype=np.int64) ** 2) % (2 * n)
    ang = sign * np.pi * j2 / n
    w = np.exp(1j * ang)  # w[j] = exp(sign*i*pi*j^2/n)
    m = 1 << int(np.ceil(np.log2(max(2 * n - 1, 2))))
    b = np.zeros(m, dtype=np.complex128)
    b[:n] = np.conj(w)
    b[m - n + 1 :] = np.conj(w)[1:n][::-1]
    fb = np.fft.fft(b)
    consts = (
        m,
        jnp.asarray(w.real.astype(np.float32)),
        jnp.asarray(w.imag.astype(np.float32)),
        jnp.asarray(fb.real.astype(np.float32)),
        jnp.asarray(fb.imag.astype(np.float32)),
    )
    if len(_BLUESTEIN_CACHE) > 16:
        _BLUESTEIN_CACHE.clear()
    _BLUESTEIN_CACHE[key] = consts
    return consts


@partial(jax.jit, static_argnames=("n", "m"))
def _bluestein_core(x_re, x_im, w_re, w_im, fb_re, fb_im, n, m):
    x = x_re + 1j * x_im
    w = w_re + 1j * w_im
    a = jnp.zeros(x.shape[:-1] + (m,), dtype=jnp.complex64)
    a = a.at[..., :n].set(x * w)
    fa = jnp.fft.fft(a, axis=-1)
    y = jnp.fft.ifft(fa * (fb_re + 1j * fb_im), axis=-1)[..., :n]
    return y * w


def fft_anylen(x_re, x_im, n, inverse=False):
    """Length-n complex DFT of (..., n) data via Bluestein (TPU-safe).

    Returns the complex result; callers keep it inside jit-composable
    expressions (real/imag parts) so complex buffers never cross program
    boundaries.  The inverse includes no 1/n normalization.
    """
    m, w_re, w_im, fb_re, fb_im = _bluestein_consts(n, inverse)
    return _bluestein_core(x_re, x_im, w_re, w_im, fb_re, fb_im, n, m)


@partial(jax.jit, static_argnames=("n",))
def _filter_fourier_pow2(tod, k_re, k_im, n):
    fd = jnp.fft.rfft(tod, axis=-1) * (k_re + 1j * k_im)
    return irfft_batched(fd, n, axis=-1)


@partial(jax.jit, static_argnames=("n", "m"))
def _filter_fourier_bluestein(
    tod, k_re, k_im, wf_re, wf_im, fbf_re, fbf_im, wi_re, wi_im, fbi_re, fbi_im, n, m
):
    # forward DFT (full length-n complex spectrum of the real data)
    fx = _bluestein_core(tod, jnp.zeros_like(tod), wf_re, wf_im, fbf_re, fbf_im, n, m)
    # expand the rfft-grid filter to the full hermitian spectrum
    # (kernel may be shared (nh,) or per-detector (n_det, nh))
    nh = n // 2 + 1
    k = k_re + 1j * k_im
    idx = jnp.arange(n)
    mirror = jnp.where(idx < nh, idx, n - idx)
    km = k[..., mirror]
    kfull = jnp.where(idx < nh, km, jnp.conj(km))
    if kfull.ndim == 1:
        kfull = kfull[None, :]
    fy = fx * kfull
    y = _bluestein_core(fy.real, fy.imag, wi_re, wi_im, fbi_re, fbi_im, n, m)
    return y.real / n


def filter_fourier(tod, kernel_f):
    """Apply a circular frequency-domain filter to (n_det, n) real data.

    The kernel is evaluated on ``rfftfreq(n, 1/rate)`` (see
    :func:`fourier_filter_freqs`).  Power-of-two lengths use the native
    rfft/irfft; any other length uses the Bluestein transform — XLA would
    otherwise lower it to an n x n DFT matmul on TPU.  One jitted program,
    with the (possibly complex) filter passed as a real/imaginary float
    pair: complex buffers never cross an XLA program boundary (the
    remote-TPU runtime cannot transfer them).
    """
    n = int(tod.shape[-1])
    k = np.asarray(kernel_f)
    if k.shape[-1] != n // 2 + 1:
        raise ValueError(
            f"filter kernel has {k.shape[-1]} bins; expected {n // 2 + 1} "
            "(evaluate it on fourier_filter_freqs(n, rate))"
        )
    k_re = jnp.asarray(np.ascontiguousarray(k.real, dtype=np.float32))
    if np.iscomplexobj(k):
        k_im = jnp.asarray(np.ascontiguousarray(k.imag, dtype=np.float32))
    else:
        k_im = jnp.zeros_like(k_re)
    if n & (n - 1) == 0:
        return _filter_fourier_pow2(tod, k_re, k_im, n)
    mf, wf_re, wf_im, fbf_re, fbf_im = _bluestein_consts(n, inverse=False)
    mi, wi_re, wi_im, fbi_re, fbi_im = _bluestein_consts(n, inverse=True)
    return _filter_fourier_bluestein(
        tod, k_re, k_im, wf_re, wf_im, fbf_re, fbf_im,
        wi_re, wi_im, fbi_re, fbi_im, n, mf,
    )


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
