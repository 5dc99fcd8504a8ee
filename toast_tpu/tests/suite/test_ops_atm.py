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


def test_atm_screen_spatial_slope_kolmogorov():
    """The 2-D screen power spectrum follows the von Karman slope -11/3 in
    the inertial range (ref toast_atm_sim.cpp:28 Kolmogorov spectrum)."""
    from toast_tpu.ops.sim_atm import kolmogorov_screen

    n = 512
    dtheta = 1.0e-3
    scr = np.asarray(
        kolmogorov_screen(n, dtheta, l0_rad=n * dtheta, key=(1, 2))
    ).astype(np.float64)
    f2 = np.abs(np.fft.fft2(scr)) ** 2
    kx = np.fft.fftfreq(n, dtheta)
    kk = np.hypot(kx[:, None], kx[None, :])
    # azimuthal average in log-spaced annuli within the inertial range
    kmin, kmax = 4 / (n * dtheta), 0.25 / dtheta
    edges = np.logspace(np.log10(kmin), np.log10(kmax), 12)
    kcen, pk = [], []
    for lo, hi in zip(edges[:-1], edges[1:]):
        sel = (kk >= lo) & (kk < hi)
        if sel.sum() > 8:
            kcen.append(np.sqrt(lo * hi))
            pk.append(f2[sel].mean())
    slope = np.polyfit(np.log(kcen), np.log(pk), 1)[0]
    assert abs(slope - (-11.0 / 3.0)) < 0.35, slope


def test_atm_temporal_psd_slope():
    """A staring detector through the advected frozen screen sees a
    temporal PSD with the Kolmogorov 1-D slope ~ -8/3 in the inertial
    range (Taylor frozen-flow hypothesis)."""
    data, ob = _make(duration_s=600.0, n_pix=1)
    tod = ob.detdata["signal"].numpy()[0].astype(np.float64)
    tod -= tod.mean()
    n = len(tod)
    rate = 1.0 / np.median(np.diff(np.asarray(ob.shared["times"])))
    psd = np.abs(np.fft.rfft(tod * np.hanning(n))) ** 2
    f = np.fft.rfftfreq(n, 1.0 / rate)
    sel = (f > 0.05) & (f < 1.0)
    slope = np.polyfit(np.log(f[sel]), np.log(psd[sel]), 1)[0]
    assert -4.0 < slope < -1.7, slope


def test_atm_detector_correlation_decreases_with_separation():
    """Pair correlation falls with focalplane angular separation
    (ref: the covariance model of toast_atm_sim.cpp)."""
    data, ob = _make(duration_s=300.0, n_pix=19)
    fp = ob.telescope.focalplane
    from toast_tpu.math import qarray as qa

    tod = ob.detdata["signal"].numpy().astype(np.float64)
    tod -= tod.mean(axis=1, keepdims=True)
    corr = np.corrcoef(tod)
    quats = np.array([fp[d]["quat"] for d in ob.local_detectors])
    vecs = qa.rotate(quats, np.broadcast_to([0.0, 0.0, 1.0], quats.shape[:-1] + (3,)))
    seps, cors = [], []
    nd = len(ob.local_detectors)
    for i in range(nd):
        for j in range(i + 1, nd):
            cosang = np.clip(np.dot(vecs[i], vecs[j]), -1, 1)
            seps.append(np.arccos(cosang))
            cors.append(corr[i, j])
    seps = np.array(seps)
    cors = np.array(cors)
    close = cors[seps < np.quantile(seps, 0.2)].mean()
    far = cors[seps > np.quantile(seps, 0.8)].mean()
    assert close > far


def test_atm_band_absorption_and_loading():
    """Higher-frequency bands see more atmosphere: absorption and loading
    increase from 90 to 150 to 280 GHz, and loading grows with pwv
    (ref toast_atm_utils.cpp:82-203 capability)."""
    from toast_tpu.ops.atm_utils import (
        atm_absorption_coefficient,
        atm_atmospheric_loading,
        band_averaged,
    )

    vals = [
        band_averaged(
            lambda nu: atm_absorption_coefficient(5000.0, 270.0, 0, 1.0, nu),
            bc,
            0.25 * bc,
        )
        for bc in (90.0, 150.0, 280.0)
    ]
    assert vals[0] < vals[1] < vals[2]
    assert 0.005 < vals[0] < 0.05
    loads = [
        atm_atmospheric_loading(5000.0, 270.0, 0, pwv, 150.0) for pwv in (0.5, 2.0, 6.0)
    ]
    assert loads[0] < loads[1] < loads[2]
    assert loads[2] < 270.0

    # the operator picks the band up from the focalplane: a 280 GHz array
    # sees a larger atmosphere signal than a 90 GHz array
    amps = {}
    for bc in (90.0, 280.0):
        data = create_ground_data(n_pix=1, duration_s=120.0)
        ob = data.obs[0]
        fp = ob.telescope.focalplane
        fp.detector_data["bandcenter"][:] = bc
        ob.detdata.create("signal", units=u.K)
        ops.SimAtmosphere(add_loading=False).apply(data)
        amps[bc] = np.std(ob.detdata["signal"].numpy())
    assert amps[280.0] > 2.0 * amps[90.0]


def test_atm_cache_and_polarization(tmp_path):
    """Screen realizations round-trip through the disk cache, and the
    polarization option perturbs the signal by the expected magnitude."""
    import os

    data1 = create_ground_data(n_pix=1, duration_s=120.0)
    data1.obs[0].detdata.create("signal", units=u.K)
    ops.SimAtmosphere(add_loading=False, cache_dir=str(tmp_path)).apply(data1)
    cached = [f for f in os.listdir(tmp_path) if f.startswith("atm_")]
    assert len(cached) == 1
    data2 = create_ground_data(n_pix=1, duration_s=120.0)
    data2.obs[0].detdata.create("signal", units=u.K)
    ops.SimAtmosphere(add_loading=False, cache_dir=str(tmp_path)).apply(data2)
    np.testing.assert_array_equal(
        data1.obs[0].detdata["signal"].numpy(),
        data2.obs[0].detdata["signal"].numpy(),
    )

    # polarized atmosphere: the reference's constant-fraction Q coupling
    # (ref:ops/sim_tod_atm_observe.py:461) — tod_pol = tod * (wI + pf*wQ)
    data3 = create_ground_data(n_pix=1, duration_s=120.0)
    ob3 = data3.obs[0]
    ob3.detdata.create("signal", units=u.K)
    dp = ops.PointingDetectorSimple(boresight="boresight_azel")
    wop = ops.StokesWeights(mode="IQU", detector_pointing=dp)
    pf = 0.2
    ops.SimAtmosphere(
        add_loading=False, polarization_fraction=pf, cache_dir=str(tmp_path),
        detector_weights=wop,
    ).apply(data3)
    a = data1.obs[0].detdata["signal"].numpy()
    b = ob3.detdata["signal"].numpy()
    w = np.asarray(ob3.detdata[wop.weights].data)
    expect = a * (w[..., 0] + pf * w[..., 1])
    np.testing.assert_allclose(b, expect, rtol=1e-5, atol=1e-7)
    assert np.abs(b - a).max() / np.abs(a).max() > 0.001


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


def test_atm_inner_scale_damps_high_k():
    """A large inner (dissipation) scale suppresses high-frequency power
    (Tatarskii cutoff — the role of the reference's lmin draw,
    ref sim_tod_atm.py:116-123)."""
    def hi_power(lmin_m):
        data = create_ground_data(n_pix=1, duration_s=300.0)
        ob = data.obs[0]
        ob.detdata.create("signal", units=u.K)
        ops.SimAtmosphere(
            gain=3e-4,
            add_loading=False,
            lmin_center=Quantity(lmin_m, u.meter),
            lmin_sigma=Quantity(0.0, u.meter),
        ).apply(data)
        tod = ob.detdata["signal"].numpy()[0].astype(np.float64)
        tod -= tod.mean()
        f = np.fft.rfftfreq(len(tod), 0.1)
        p = np.abs(np.fft.rfft(tod)) ** 2
        return p[(f > 1.0) & (f < 4.0)].mean()

    assert hi_power(0.01) > 3.0 * hi_power(60.0)


def test_atm_wind_dist_rerealizes_screens():
    """Restricting the frozen-turbulence validity distance re-realizes the
    screens mid-observation (ref wind_dist, sim_tod_atm.py:152): the
    signal differs from the single-realization run after the first chunk
    but matches it (exactly) before."""
    def run(wind_dist_m):
        data = create_ground_data(n_pix=1, duration_s=600.0)
        ob = data.obs[0]
        ob.detdata.create("signal", units=u.K)
        ops.SimAtmosphere(
            gain=3e-4,
            add_loading=False,
            wind_dist=Quantity(wind_dist_m, u.meter),
            fade_time=Quantity(10.0, u.s),
        ).apply(data)
        return data, ob.detdata["signal"].numpy()[0].astype(np.float64)

    _, frozen = run(1.0e8)           # one realization for the whole obs
    _, chunked = run(500.0)          # several independent chunks
    _, chunked2 = run(500.0)
    # chunked realizations are reproducible ...
    np.testing.assert_array_equal(chunked, chunked2)
    # ... differ from the frozen run (new screens mid-observation) ...
    assert np.abs(frozen - chunked).max() > 1e-7
    # ... and the crossfade keeps the stream continuous: the largest
    # sample-to-sample jump of the chunked run stays comparable to the
    # frozen run's (no realization-switch discontinuity)
    assert np.abs(np.diff(chunked)).max() < 5.0 * np.abs(np.diff(frozen)).max()


def test_atm_coarse_sample_rate_interpolates():
    """Simulating at a lower rate and interpolating preserves the
    low-frequency structure (ref sample_rate, sim_tod_atm.py:162)."""
    def run(rate):
        data = create_ground_data(n_pix=1, duration_s=300.0)
        ob = data.obs[0]
        ob.detdata.create("signal", units=u.K)
        kw = {}
        if rate is not None:
            kw["sample_rate"] = Quantity(rate, u.Hz)
        ops.SimAtmosphere(gain=3e-4, add_loading=False, **kw).apply(data)
        return ob.detdata["signal"].numpy()[0].astype(np.float64)

    full = run(None)
    coarse = run(2.0)  # data rate is 10 Hz -> stride 5
    assert full.shape == coarse.shape
    # low-pass both to the coarse Nyquist and compare
    f = np.fft.rfftfreq(len(full), 0.1)
    keep = f < 0.5
    def lp(x):
        X = np.fft.rfft(x - x.mean())
        X[~keep] = 0
        return np.fft.irfft(X, len(x))
    a, b = lp(full), lp(coarse)
    rho = np.corrcoef(a, b)[0, 1]
    assert rho > 0.98, rho


def test_atm_cache_only_and_reuse(tmp_path):
    """cache_only generates screens without observing; a later run reuses
    them bit-exactly (ref cache_dir/cache_only, sim_tod_atm.py:177-190)."""
    cache = str(tmp_path / "atmcache")

    data = create_ground_data(n_pix=1, duration_s=120.0)
    ob = data.obs[0]
    ob.detdata.create("signal", units=u.K)
    ops.SimAtmosphere(
        gain=3e-4, add_loading=False, cache_dir=cache, cache_only=True
    ).apply(data)
    assert np.all(ob.detdata["signal"].numpy() == 0)
    import glob
    assert glob.glob(cache + "/atm_*.npz")

    ops.SimAtmosphere(
        gain=3e-4, add_loading=False, cache_dir=cache
    ).apply(data)
    cached = ob.detdata["signal"].numpy().copy()

    data2 = create_ground_data(n_pix=1, duration_s=120.0)
    ob2 = data2.obs[0]
    ob2.detdata.create("signal", units=u.K)
    ops.SimAtmosphere(gain=3e-4, add_loading=False).apply(data2)
    np.testing.assert_allclose(
        cached, ob2.detdata["signal"].numpy(), rtol=0, atol=1e-6
    )


def test_atm_option_surface(tmp_path):
    """Reference option-surface traits: view/flags masking, zmax screen
    cut, field_of_view margin, xstep refinement, debug dumps
    (ref:ops/sim_tod_atm.py:40-215)."""
    data = create_ground_data(n_pix=1, duration_s=120.0)
    ob = data.obs[0]
    n = ob.n_local_samples
    ob.detdata.create("signal", units=u.K)

    # a view covering only the first half of the samples
    from toast_tpu.models.intervals import IntervalList

    times = np.asarray(ob.shared["times"])
    half = IntervalList(times, samplespans=[(0, n // 2 - 1)])
    ob.intervals["first_half"] = half

    out = tmp_path / "atm_debug"
    atm = ops.SimAtmosphere(
        gain=3e-4,
        add_loading=False,
        view="first_half",
        zmax=Quantity(2500.0, u.meter),
        field_of_view=Quantity(10.0, u.deg),
        n_bandpass_freqs=11,
        xstep=Quantity(30.0, u.meter),
        output_dir=str(out),
        debug_tod=True,
        debug_spectrum=True,
    )
    atm.apply(data)
    sig = ob.detdata["signal"].numpy()
    # samples outside the view stay exactly zero, inside are nonzero
    assert np.all(sig[:, n // 2:] == 0.0)
    assert np.any(sig[:, : n // 2] != 0.0)
    # debug products written
    import os

    files = os.listdir(out)
    assert any(f.startswith("atm_tod_") for f in files)
    assert any(f.startswith("atm_screens_") for f in files)

    # shared-flag masking: flag a tail region and check it is zeroed
    data2 = create_ground_data(n_pix=1, duration_s=120.0)
    ob2 = data2.obs[0]
    ob2.detdata.create("signal", units=u.K)
    flags = np.zeros(ob2.n_local_samples, dtype=np.uint8)
    flags[-100:] = 1
    ob2.shared.set("flags", flags)
    atm2 = ops.SimAtmosphere(
        gain=3e-4, add_loading=False, shared_flag_mask=1
    )
    atm2.apply(data2)
    sig2 = ob2.detdata["signal"].numpy()
    assert np.all(sig2[:, -100:] == 0.0)
    assert np.any(sig2[:, :-100] != 0.0)
