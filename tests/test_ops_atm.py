"""Atmosphere simulation statistical tests (SURVEY: validated statistically,
not numerically vs the CHOLMOD reference)."""

import numpy as np
import pytest

from toast_tpu import ops
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity

from test_ops_ground import create_ground_data


def _make(duration_s=600.0, n_pix=7, gain=3e-4):
    data = create_ground_data(n_pix=n_pix, duration_s=duration_s)
    ob = data.obs[0]
    ob.detdata.create("signal", units=u.K)
    atm = ops.SimAtmosphere(gain=gain, add_loading=False)
    atm.apply(data)
    return data, ob


def test_atm_reproducible():
    data1, ob1 = _make(duration_s=120.0, n_pix=1)
    data2, ob2 = _make(duration_s=120.0, n_pix=1)
    np.testing.assert_array_equal(
        ob1.detdata["signal"].numpy(), ob2.detdata["signal"].numpy()
    )


def test_atm_correlated_between_detectors():
    data, ob = _make(duration_s=300.0)
    tod = ob.detdata["signal"].numpy().astype(np.float64)
    tod = tod - tod.mean(axis=1, keepdims=True)
    corr = np.corrcoef(tod)
    off = corr[np.triu_indices_from(corr, k=1)]
    # atmosphere is a common structure: neighboring detectors highly
    # correlated
    assert off.mean() > 0.5


def test_atm_red_spectrum():
    """Temporal PSD is steep (Kolmogorov-like), not white."""
    data, ob = _make(duration_s=600.0, n_pix=1)
    tod = ob.detdata["signal"].numpy()[0].astype(np.float64)
    tod -= tod.mean()
    f = np.fft.rfftfreq(len(tod), 0.1)
    p = np.abs(np.fft.rfft(tod)) ** 2
    lo = (f > 0.01) & (f < 0.05)
    hi = (f > 1.0) & (f < 4.0)
    assert p[lo].mean() > 30 * p[hi].mean()


def test_atm_scales_with_pwv_and_airmass():
    data, ob = _make(duration_s=120.0, n_pix=1)
    rms1 = ob.detdata["signal"].numpy().std()
    # double the pwv -> double the signal
    data2 = create_ground_data(n_pix=1, duration_s=120.0)
    ob2 = data2.obs[0]
    w = ob2.telescope.site.weather
    w._pwv = Quantity(w.pwv.to_value(u.mm) * 2.0, u.mm)
    ob2.detdata.create("signal", units=u.K)
    ops.SimAtmosphere(gain=3e-4, add_loading=False).apply(data2)
    rms2 = ob2.detdata["signal"].numpy().std()
    assert abs(rms2 / rms1 - 2.0) < 0.2
