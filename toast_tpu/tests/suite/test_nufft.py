"""Non-uniform FFT tests: direct-DFT oracles and flag-gap convolution."""

import numpy as np

import jax.numpy as jnp

from toast_tpu.math.nufft import convolve_nonuniform, nufft1, nufft2


def test_nufft1_matches_direct():
    rng = np.random.default_rng(0)
    n, N = 300, 64
    x = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    c = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    F = np.asarray(nufft1(jnp.asarray(x), jnp.asarray(c), N))
    k = np.arange(-N // 2, N - N // 2)
    direct = np.array([np.sum(c * np.exp(-1j * kk * x)) for kk in k])
    assert np.abs(F - direct).max() / np.abs(direct).max() < 1e-4


def test_nufft2_matches_direct():
    rng = np.random.default_rng(1)
    n, N = 257, 48
    x = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    fk = (rng.normal(size=N) + 1j * rng.normal(size=N)).astype(np.complex64)
    v = np.asarray(nufft2(jnp.asarray(x), jnp.asarray(fk)))
    k = np.arange(-N // 2, N - N // 2)
    direct = np.array([np.sum(fk * np.exp(1j * k * xx)) for xx in x])
    assert np.abs(v - direct).max() / np.abs(direct).max() < 1e-4


def test_convolve_nonuniform_identity_kernel():
    """A unit kernel round-trips the signal (including through gaps)."""
    rng = np.random.default_rng(2)
    n, rate = 2000, 10.0
    t = np.arange(n) / rate
    sig = np.sin(2 * np.pi * 0.1 * t) + 0.3 * np.sin(2 * np.pi * 0.7 * t)
    good = np.ones(n, dtype=bool)
    good[800:900] = False
    kf = np.linspace(0, rate, 50)
    kern = np.ones(50, dtype=np.complex128)
    out = convolve_nonuniform(sig, good, kf, kern, rate)
    err = np.abs(out[good] - sig[good])
    assert np.quantile(err, 0.95) < 0.02
    # the gap is filled smoothly (bounded values)
    assert np.abs(out[~good]).max() < 2.0


def test_convolve_nonuniform_lowpass_no_gap_ringing():
    """A low-pass kernel applied across a gap attenuates the high band
    without blowing up at the gap edges (the finufft use case)."""
    rng = np.random.default_rng(3)
    n, rate = 4096, 10.0
    t = np.arange(n) / rate
    lo = np.sin(2 * np.pi * 0.05 * t)
    hi = 0.5 * np.sin(2 * np.pi * 2.0 * t)
    sig = lo + hi
    good = np.ones(n, dtype=bool)
    good[2000:2200] = False
    kf = np.array([0.0, 0.5, 1.0, 5.0])
    kern = np.array([1.0, 1.0, 0.0, 0.0], dtype=np.complex128)
    out = convolve_nonuniform(sig, good, kf, kern, rate)
    sel = good.copy()
    sel[:200] = sel[-200:] = False  # ignore circular boundary
    resid = out[sel] - lo[sel]
    assert np.sqrt(np.mean(resid**2)) < 0.1
