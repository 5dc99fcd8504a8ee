"""SimNoise tests: PSD recovery, reproducibility (reference tests/ops_sim_tod_noise.py)."""

import numpy as np

from toast_tpu import ops
from toast_tpu.ops.kernels.simnoise import (
    fft_length,
    interpolate_psd_loglog,
    sim_noise_batch,
)
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from helpers import create_satellite_data


def test_fft_length():
    assert fft_length(100, 2) == 256
    # power-of-two sample counts use exactly oversample * samples (the
    # reference's strict inequality would quadruple the transform)
    assert fft_length(128, 2) == 256
    assert fft_length(5, 1) == 8


def test_interpolate_psd():
    freq = np.array([1e-5, 1e-3, 0.1, 1.0, 5.0])
    psd = 1.0 / freq
    interp_freq = np.fft.rfftfreq(1024, 1.0 / 10.0)
    out = interpolate_psd_loglog(freq, psd, interp_freq)
    assert out[0] == 0.0
    # mid-range matches the power law
    sel = (interp_freq > 0.2) & (interp_freq < 2.0)
    np.testing.assert_allclose(out[sel], 1.0 / interp_freq[sel], rtol=0.1)


def test_white_noise_statistics():
    """Flat PSD in, white noise with matching variance out."""
    rate = 10.0
    n = 4096
    net2 = 0.01  # K^2 s
    freq = np.linspace(1e-5, rate / 2, 100)
    psds = np.full((3, 100), net2)
    out = np.asarray(
        sim_noise_batch(0, 1, 2, 3, [10, 20, 30], rate, 0, n, freq, psds)
    )
    assert out.shape == (3, n)
    # variance of white noise = PSD * rate (one-sided, integrated to Nyquist
    # = NET^2 * rate)
    expect_var = net2 * rate
    for i in range(3):
        assert abs(np.var(out[i]) / expect_var - 1.0) < 0.15
    # streams are independent
    corr = np.corrcoef(out)
    assert abs(corr[0, 1]) < 0.1


def test_noise_reproducible():
    rate = 10.0
    freq = np.linspace(1e-5, rate / 2, 50)
    psds = np.full((1, 50), 0.01)
    a = np.asarray(sim_noise_batch(0, 1, 2, 3, [7], rate, 0, 512, freq, psds))
    b = np.asarray(sim_noise_batch(0, 1, 2, 3, [7], rate, 0, 512, freq, psds))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(sim_noise_batch(1, 1, 2, 3, [7], rate, 0, 512, freq, psds))
    assert not np.allclose(a, c)


def test_sim_noise_psd_recovery():
    """Simulated noise periodogram matches the model PSD (statistical)."""
    data = create_satellite_data(n_pix=1, obs_time=Quantity(60.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ob = data.obs[0]
    nse = ob["noise_model"]
    rate = 10.0
    for det in ob.local_detectors[:2]:
        tod = np.asarray(ob.detdata["signal"][det], dtype=np.float64)
        n = len(tod)
        assert np.std(tod) > 0
        # periodogram
        f = np.fft.rfftfreq(n, 1 / rate)
        p = np.abs(np.fft.rfft(tod)) ** 2 / (rate * n)
        # compare high-frequency plateau to NET^2
        sel = f > 1.0
        net2 = nse.NET(det).to_value(u.K_sqrt_s) ** 2
        # mean (not median) of the periodogram: chi^2_2 bins have
        # median = ln2 * mean.  The generator convention (matching the
        # reference) gives sample variance = PSD * rate, so the plateau of
        # |rfft|^2/(rate n) equals NET^2 directly.
        plateau = np.mean(p[sel])
        assert abs(plateau / net2 - 1.0) < 0.2, (plateau, net2)


def test_sim_noise_accumulates():
    data = create_satellite_data(n_pix=1, obs_time=Quantity(5.0, u.minute))
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    ob = data.obs[0]
    first = ob.detdata["signal"].numpy().copy()
    ops.SimNoise().apply(data)
    second = ob.detdata["signal"].numpy()
    np.testing.assert_allclose(second, 2 * first, rtol=1e-4, atol=1e-8)


def test_deferred_finite_guard():
    """Queued non-finite counts raise at the next drain point, batched."""
    import jax.numpy as jnp
    import pytest

    from toast_tpu.utils import guards

    guards.drain_checks()  # settle anything pending from other tests
    guards.defer_check("clean", jnp.asarray(0, jnp.int32))
    guards.drain_checks()  # zero count: no error
    guards.defer_check("dirty stream", jnp.asarray(3, jnp.int32))
    guards.defer_check("clean2", jnp.asarray(0, jnp.int32))
    with pytest.raises(RuntimeError, match="dirty stream: 3"):
        guards.drain_checks()
    guards.drain_checks()  # queue was cleared by the raising drain
