"""Non-uniform FFT (type 1 and type 2) and flag-gap convolution.

Rebuild of the reference's non-uniform path (``ref:src/toast/fft.py:487``
``AlgorithmNonUniform``), which delegates to finufft for convolving
Fourier-domain kernels with flag-gapped timestreams.  Here the NUFFT is
implemented natively with Dutt-Rokhlin / Greengard-Lee Gaussian gridding:

* type 1 (nonuniform points -> Fourier modes): spread each sample onto a
  2x-oversampled uniform grid with a truncated Gaussian (one scatter-add
  per spreading offset — a static, vectorized loop), FFT, deconvolve the
  Gaussian transform.
* type 2 (Fourier modes -> nonuniform points): the adjoint — deconvolve,
  inverse FFT, gather-interpolate with the same Gaussian.

Everything is jit-compiled array code; accuracy ~1e-6 relative (Msp=12
spreading points each side), validated against direct DFT sums in tests.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

_MSP = 12  # spreading half-width (Gaussian tail < 1e-6 relative)
_R = 2  # oversampling ratio


def _grid_params(n_modes):
    mr = _R * int(n_modes)
    tau = np.pi * _MSP / (n_modes**2 * _R * (_R - 0.5))
    return mr, tau


@partial(jax.jit, static_argnums=(2,))
def nufft1(x, c, n_modes):
    """Type-1 NUFFT: F_k = sum_j c_j exp(-i k x_j), k = -N/2 .. N/2-1.

    Args:
        x: (n,) sample locations in [-pi, pi).
        c: (n,) complex (or real) strengths.
        n_modes: number of output modes N (static).

    Returns:
        (N,) complex64 Fourier coefficients, k ascending from -N/2.
    """
    mr, tau = _grid_params(n_modes)
    h = 2.0 * jnp.pi / mr
    c = c.astype(jnp.complex64)
    m0 = jnp.round(x / h).astype(jnp.int32)
    # spread with a truncated Gaussian: static loop over offsets
    grid_r = jnp.zeros(mr, jnp.float32)
    grid_i = jnp.zeros(mr, jnp.float32)
    cr = jnp.real(c)
    ci = jnp.imag(c)
    for dm in range(-_MSP, _MSP + 1):
        m = m0 + dm
        w = jnp.exp(-((x - m * h) ** 2) / (4.0 * tau)).astype(jnp.float32)
        idx = jnp.mod(m, mr)
        grid_r = grid_r.at[idx].add(cr * w)
        grid_i = grid_i.at[idx].add(ci * w)
    grid = jax.lax.complex(grid_r, grid_i)
    # FFT convention: F_k = sum_m grid_m exp(-i k m h)
    fk_all = jnp.fft.fft(grid)
    k = jnp.arange(-(n_modes // 2), n_modes - n_modes // 2)
    fk = fk_all[jnp.mod(k, mr)]
    # deconvolve the Gaussian: its transform is sqrt(pi/tau) exp(-k^2 tau)
    # G_k of the spreading Gaussian is 2 sqrt(pi tau) e^{-k^2 tau};
    # the Riemann-sum relation brings a 1/h (see Greengard-Lee 2004)
    corr = (h / (2.0 * jnp.sqrt(jnp.pi * tau))).astype(jnp.float32)
    deconv = corr * jnp.exp(tau * k.astype(jnp.float32) ** 2)
    return fk * deconv.astype(jnp.complex64)


@jax.jit
def nufft2(x, fk):
    """Type-2 NUFFT: c_j = sum_k F_k exp(+i k x_j) (adjoint convention).

    Args:
        x: (n,) sample locations in [-pi, pi).
        fk: (N,) complex coefficients, k ascending from -N/2.

    Returns:
        (n,) complex64 values at the sample locations.
    """
    n_modes = fk.shape[0]
    mr, tau = _grid_params(n_modes)
    h = 2.0 * jnp.pi / mr
    k = jnp.arange(-(n_modes // 2), n_modes - n_modes // 2)
    # G_k of the spreading Gaussian is 2 sqrt(pi tau) e^{-k^2 tau};
    # the Riemann-sum relation brings a 1/h (see Greengard-Lee 2004)
    corr = (h / (2.0 * jnp.sqrt(jnp.pi * tau))).astype(jnp.float32)
    deconv = corr * jnp.exp(tau * k.astype(jnp.float32) ** 2)
    pre = fk.astype(jnp.complex64) * deconv.astype(jnp.complex64)
    grid_f = jnp.zeros(mr, jnp.complex64).at[jnp.mod(k, mr)].set(pre)
    # inverse transform to the oversampled grid: g_m = sum_k F~_k e^{ikmh}
    grid = jnp.fft.ifft(grid_f) * mr
    gr = jnp.real(grid)
    gi = jnp.imag(grid)
    m0 = jnp.round(x / h).astype(jnp.int32)
    out_r = jnp.zeros(x.shape, jnp.float32)
    out_i = jnp.zeros(x.shape, jnp.float32)
    for dm in range(-_MSP, _MSP + 1):
        m = m0 + dm
        w = jnp.exp(-((x - m * h) ** 2) / (4.0 * tau)).astype(jnp.float32)
        idx = jnp.mod(m, mr)
        out_r = out_r + gr[idx] * w
        out_i = out_i + gi[idx] * w
    return jax.lax.complex(out_r, out_i)


def convolve_nonuniform(signal, good, kernel_freq, kernel, rate, deconvolve=False):
    """Convolve a Fourier-domain kernel with a flag-gapped stream
    (reference ``AlgorithmNonUniform`` purpose, ``fft.py:487``).

    Good samples are treated as non-uniform points on the circle; the
    type-1 NUFFT evaluates their spectrum without ringing from the gaps,
    the kernel (interpolated to the mode frequencies) is applied, and the
    type-2 transform evaluates the result back at the sample times.
    Round-trip normalization against a constant stream removes the local
    density weighting, as the reference does with its norm buffer.

    Args:
        signal: (n,) stream.
        good: (n,) bool, True where valid.
        kernel_freq: (m,) frequencies [Hz] of the kernel samples.
        kernel: (m,) complex kernel values.
        rate: sample rate [Hz].
        deconvolve: divide by the kernel instead of multiplying.

    Returns:
        (n,) filtered stream (values at flagged samples interpolated).
    """
    signal = np.asarray(signal, dtype=np.float64)
    n = len(signal)
    n_modes = 1 << int(np.ceil(np.log2(max(n, 2))))
    dt = 1.0 / rate
    times = dt * np.arange(n)
    tspan = times[-1] + dt
    x_all = (times * (2.0 * np.pi / tspan) - np.pi).astype(np.float32)
    gsel = np.asarray(good, dtype=bool)
    x = x_all[gsel]

    # mode frequencies of the scaled circle
    k = np.arange(-(n_modes // 2), n_modes - n_modes // 2)
    freq = np.abs(k) / tspan
    kern = np.interp(freq, kernel_freq, np.real(kernel)) + 1j * np.interp(
        freq, kernel_freq, np.imag(kernel)
    )
    if deconvolve:
        mag = np.abs(kern)
        floor = 1.0e-5 * max(mag.max(), 1e-30)
        kern = np.conj(kern) / np.maximum(mag, floor) ** 2

    kern_j = jnp.asarray(kern.astype(np.complex64))
    xj = jnp.asarray(x)

    def roundtrip(vals):
        fk = nufft1(xj, jnp.asarray(vals.astype(np.complex64)), n_modes)
        out = nufft2(jnp.asarray(x_all), fk * kern_j)
        return np.asarray(jnp.real(out), dtype=np.float64)

    filtered = roundtrip(signal[gsel])
    norm = roundtrip(np.ones(gsel.sum()))
    out = np.zeros(n)
    nz = np.abs(norm) > 1e-3 * np.abs(norm).max()
    out[nz] = filtered[nz] / norm[nz]
    return out
