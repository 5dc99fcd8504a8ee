"""FFT helper tests."""

import numpy as np

import jax.numpy as jnp

from toast_tpu.math import fft


def test_rfft_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 256)).astype(np.float32)
    f = fft.rfft(jnp.asarray(x))
    back = fft.irfft(f, 256)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


def test_rfft_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 128)).astype(np.float32)
    got = np.asarray(fft.rfft(jnp.asarray(x)))
    expected = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(got, expected, atol=1e-3)


def test_convolve_delta():
    """Convolving with a flat kernel (delta in time) is identity."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 64)).astype(np.float32)
    kernel = jnp.ones(33, dtype=jnp.complex64)
    out = fft.convolve(jnp.asarray(x), kernel)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)


def test_next_fast_fft_length():
    assert fft.next_fast_fft_length(1) == 1
    assert fft.next_fast_fft_length(7) == 8
    assert fft.next_fast_fft_length(8) == 8
    assert fft.next_fast_fft_length(9) == 9
    assert fft.next_fast_fft_length(17) == 18
    assert fft.next_fast_fft_length(1000) == 1000
    for n in [3, 100, 769, 12345]:
        m = fft.next_fast_fft_length(n)
        assert m >= n
        k = m
        for p in (2, 3, 5):
            while k % p == 0:
                k //= p
        assert k == 1


def test_interpolate_psd():
    freq = np.array([0.001, 0.01, 0.1, 1.0, 10.0])
    psd = freq**-2
    out = fft.interpolate_psd(freq, psd, np.array([0.05, 0.5, 5.0]))
    np.testing.assert_allclose(out, np.array([0.05, 0.5, 5.0]) ** -2, rtol=1e-10)
    # zero frequency maps to zero
    out = fft.interpolate_psd(freq, psd, np.array([0.0, 0.01]))
    assert out[0] == 0.0


def test_filter_fourier_bluestein_odd_length():
    """Any-length circular filter matches numpy's circular FFT filter
    (TPU lowers non-pow2 FFTs to a DFT matmul; we use Bluestein)."""
    import numpy as np

    from toast_tpu.math.fft import filter_fourier, fourier_filter_freqs

    rng = np.random.default_rng(2)
    for n in (3001, 178571 // 97, 4096):  # odd, odd, pow2
        tod = rng.normal(size=(3, n)).astype(np.float32)
        freqs = fourier_filter_freqs(n, 10.0)
        # complex per-detector kernel (time-constant-like)
        taus = np.array([0.05, 0.1, 0.2])
        H = 1.0 / (1.0 + 2.0j * np.pi * freqs[None, :] * taus[:, None])
        got = np.asarray(filter_fourier(tod, H))
        nh = n // 2 + 1
        want = np.fft.irfft(np.fft.rfft(tod, axis=-1) * H, n=n, axis=-1)
        assert np.allclose(got, want, atol=5e-4), (n, np.abs(got - want).max())
        # real shared kernel
        k = np.exp(-freqs)
        got2 = np.asarray(filter_fourier(tod, k))
        want2 = np.fft.irfft(np.fft.rfft(tod, axis=-1) * k, n=n, axis=-1)
        assert np.allclose(got2, want2, atol=5e-4)
