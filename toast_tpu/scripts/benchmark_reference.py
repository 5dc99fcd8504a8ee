"""Reproduce the reference benchmark cases and validate output statistics.

The reference ships expected outputs for its benchmark workflows
(``ref:src/toast/_aux/benchmarks/stats.json``, checked by
``ref:scripts/benchmarking_utilities.py:883``).  This module rebuilds the
*satellite* benchmark configuration with our operator stack and compares
total map hits and map RMS against those bundled values.

Configuration reproduced from ``ref:scripts/toast_benchmark_satellite.py``
(hardcoded args at :154-168) and ``benchmarking_utilities.py``:

* 100 Hz sampling, hexagon focalplane with width 10 deg, NET 50 uK sqrt(s),
  fmin 1e-5 Hz (fknee 0.05 Hz / alpha 1 defaults), built at the hexagon
  size from ``make_focalplane`` (:651) then truncated to n_detector
* one-hour observations, precession period 50 min, spin period 10 min,
  SimSatellite defaults (spin angle 30 deg, precession angle 65 deg)
* nside 1024 NESTED pixelization, nside_submap 16
* input sky: Gaussian random field with the exact T/E spectra of
  ``create_input_maps`` (:686), 3 arcmin beam — synthesized with our
  native SHT (the realization differs from healpy's seeded one, so RMS is
  compared to tolerance; hits are geometry-only and compared exactly)
* MapMaker with offset baselines (default 10000 s step -> one baseline
  per observation) and rcond thresholds 1e-6 (the tiny-case override,
  ``toast_benchmark_satellite.py:322``)

Case sizes (``benchmarking_utilities.py:402``): tiny = 12 detectors x 1
observation, xsmall = 138 detectors x 1 observation.

Statistics are computed the way the reference does (``ref:pixels.py:972``):
mean/std over all pixels of *locally-hit submaps* of the destriped map,
and the total of the hit map.
"""

from __future__ import annotations

import json
import math
import sys
import time
from datetime import datetime, timezone

import numpy as np

# Expected outputs, copied from ref:src/toast/_aux/benchmarks/stats.json
# (also recorded in BASELINE.md).
SATELLITE_EXPECTED = {
    "tiny": {
        "totalhits": 4320000,
        "rms_I": 7.407852082899325,
        "rms_Q": 0.41916328165172373,
        "rms_U": 0.4161516955249392,
        "n_detector": 12,
        "n_obs": 1,
        # ref:scripts/toast_benchmark_satellite.py:318 lifts the rcond
        # cut to 1e-6 for tiny only (the default 1e-3 would cut everything)
        "rcond": 1.0e-6,
    },
    "xsmall": {
        "totalhits": 49680000,
        "rms_I": 17.653306987512835,
        "rms_Q": 0.993140637242038,
        "rms_U": 0.9928140202652976,
        "n_detector": 138,
        "n_obs": 1,
        # non-tiny cases keep the reference default thresholds
        # (ref:scripts/toast_benchmark_satellite.py:122)
        "rcond": 1.0e-3,
    },
}

# Ground benchmark expected outputs (same stats.json, "ground" block).
# Case sizing follows ref:benchmarking_utilities.py:select_distribution for
# a tiny (5e6-sample) job: one observation (the first CES, capped at
# ces_max_time = 1200 s -> 120001 samples at 100 Hz) and detectors added
# two at a time while n_det * samples <= 5e6 -> 40 detectors.
GROUND_EXPECTED = {
    "tiny": {
        "totalhits": 4692640,
        "rms_I": 4.288589272510856,
        "rms_Q": 0.2883310243187944,
        "rms_U": 0.28506926605174054,
        "n_detector": 40,
        "rcond": 1.0e-3,
    },
}

# RMS tolerance: the sky realization necessarily differs (healpy's seeded
# synfast stream is not reproducible without healpy), so agreement is
# limited by cosmic variance of the observed region — ~1% for the
# l<~150 temperature spectrum, ~0.3% for the l~500 E spectrum — plus
# beam/pixelization systematics.  On top of that, the Q/I and U/I
# ratios only approximately cancel the rcond-coverage factor (see
# validate_satellite_case): the marginal pixels at a deep conditioning
# cut carry disproportionate Q/U variance, so a few-percent residual
# coverage effect remains (measured Q 6.1% / U 4.7% at 53k vs the
# reference's 56k passing pixels).  8% validates the amplitude chain.
RMS_RTOL = 0.08


def reference_input_spectra(lmax):
    """The exact fake-sky spectra of ``create_input_maps``
    (``ref:scripts/benchmarking_utilities.py:697-713``)."""
    ell = np.arange(lmax + 1, dtype=np.float64)
    sig = 50.0
    tspec = (1.0 / (sig * np.sqrt(2.0 * np.pi))) * np.exp(
        -0.5 * (ell - 30.0) ** 2 / sig**2
    )
    tspec *= 2000.0
    sig = 100.0
    espec = (1.0 / (sig * np.sqrt(2.0 * np.pi))) * np.exp(
        -0.5 * (ell - 500.0) ** 2 / sig**2
    )
    espec *= 1.0
    return tspec, espec


def make_input_sky(nside, lmax=1024, seed=123456789, fwhm_arcmin=3.0):
    """Native-SHT equivalent of ``create_input_maps``: IQU HEALPix map
    (NESTED ordering to match the pipeline's default pixelization).

    lmax 1024 truncates the reference's 3*nside-1: both spectra carry no
    power beyond l ~ 900 (gaussians centered at 30/500 with sigma 50/100),
    so the truncation changes the map rms by < 0.1%.
    """
    import jax.numpy as jnp

    from ..math import sht
    from ..math.healpix import nest2ang

    # one-time cache: the input sky is deterministic in (nside, lmax, seed)
    import os
    import tempfile

    cache = os.path.join(
        tempfile.gettempdir(),
        f"toast_tpu_input_sky_n{nside}_l{lmax}_s{seed}.npy",
    )
    if os.path.exists(cache):
        return np.load(cache)

    if os.environ.get("TOAST_TPU_SKY_SUBPROCESS") != "0":
        # The axon TPU tunnel intermittently fails one of the large SHT
        # programs and then poisons the in-process device state.  Run the
        # (deterministic) synthesis in a fresh subprocess with retries; it
        # writes the cache file on success.
        import subprocess
        import sys as _sys

        code = (
            # sky synthesis is one-time setup: run it on the CPU backend,
            # where the JAX SHT is reliable (the axon tunnel intermittently
            # drops large transfers) and still takes only a couple minutes
            "import os; os.environ['TOAST_TPU_SKY_SUBPROCESS']='0';"
            "import jax; jax.config.update('jax_platforms', 'cpu');"
            "from toast_tpu.scripts.benchmark_reference import make_input_sky;"
            f"make_input_sky({nside}, lmax={lmax}, seed={seed}, "
            f"fwhm_arcmin={fwhm_arcmin})"
        )
        last = None
        for _ in range(3):
            proc = subprocess.run(
                [_sys.executable, "-c", code],
                capture_output=True,
                text=True,
                # nside 4096 (the ground benchmark) interpolates 201M
                # pixel centers on one core — give it room
                timeout=1800 if nside <= 2048 else 7200,
            )
            if proc.returncode == 0 and os.path.exists(cache):
                return np.load(cache)
            last = (proc.stdout or "")[-500:] + (proc.stderr or "")[-500:]
        raise RuntimeError(f"input sky synthesis failed 3x:\n{last}")

    tspec, espec = reference_input_spectra(lmax)
    beam = sht.gaussian_beam(lmax, np.radians(fwhm_arcmin / 60.0))
    alms = sht.synalm({"TT": tspec, "EE": espec}, lmax, seed=seed)
    aT = alms["T"] * beam[:, None]
    aE = alms["E"] * beam[:, None]
    aB = np.zeros_like(aE)

    import jax

    n_theta = 2 * (lmax + 1)
    n_phi = 2 * n_theta
    # Chunked synthesis: the Legendre recurrence runs on device in short
    # ring batches (the axon tunnel intermittently fails D2H reads issued
    # after multi-second programs), the phi synthesis and pixel-center
    # interpolation run host-side in numpy — all one-time setup work.
    thetas = np.pi * (np.arange(n_theta) + 0.5) / n_theta
    chunk = 256
    split = jax.jit(lambda c: (jnp.real(c), jnp.imag(c)))

    def ring_coeffs_host(alm, spin):
        alm_j = jnp.asarray(alm.astype(np.complex64))
        out = np.empty((n_theta, lmax + 1), dtype=np.complex128)
        for s0 in range(0, n_theta, chunk):
            th = thetas[s0 : s0 + chunk]
            pad = chunk - len(th)
            th_j = jnp.asarray(
                np.pad(th, (0, pad), constant_values=np.pi / 2), jnp.float32
            )
            F = sht.ring_coeffs(alm_j, th_j, lmax, spin=spin)
            fr, fi = split(F)
            jax.block_until_ready((fr, fi))
            fr = np.asarray(fr)[: len(th)]
            fi = np.asarray(fi)[: len(th)]
            out[s0 : s0 + len(th)] = fr + 1j * fi
        return out

    def ring_ifft_host(C, phi0=0.0):
        """Host twin of sht._ring_ifft: S = Re sum_m C_m e^{im phi}."""
        n_half = n_phi // 2 + 1
        X = np.zeros((C.shape[0], n_half), dtype=np.complex128)
        X[:, : C.shape[1]] = C * (0.5 * n_phi)
        X[:, 0] = np.real(C[:, 0]) * n_phi
        return np.fft.irfft(X, n=n_phi, axis=-1)

    GT = ring_coeffs_host(aT, 0)
    scale = np.where(np.arange(lmax + 1) > 0, 2.0, 1.0)
    T_grid = ring_ifft_host(GT * scale)
    del GT
    Fp = ring_coeffs_host(-(aE + 1j * aB), 2)
    Fm = ring_coeffs_host(-(aE - 1j * aB), -2)
    Cq = Fp + Fm
    Cq[:, 0] = Fp[:, 0]
    Q_grid = ring_ifft_host(Cq)
    Cu = -1j * (Fp - Fm)
    Cu[:, 0] = -1j * Fp[:, 0]
    U_grid = ring_ifft_host(Cu)
    del Fp, Fm, Cq, Cu

    n_pix = 12 * nside * nside
    out = np.empty((n_pix, 3), dtype=np.float32)
    # float32 grids + chunked pixel-center interpolation: at nside 4096
    # the full-map float64 vectorized path peaks over 30 GB and takes
    # tens of minutes on one core; chunks keep it flat and cache-friendly
    grids = tuple(
        g.astype(np.float32) for g in (T_grid, Q_grid, U_grid)
    )
    del T_grid, Q_grid, U_grid
    chunk_px = 1 << 24
    for s0 in range(0, n_pix, chunk_px):
        pix = np.arange(s0, min(s0 + chunk_px, n_pix), dtype=np.int64)
        theta, phi = nest2ang(nside, pix)
        for col, grid in enumerate(grids):
            out[s0 : s0 + len(pix), col] = sht.grid_interpolate_np(
                grid, theta, phi
            )
    np.save(cache, out)
    return out


def make_benchmark_focalplane(n_detector, sample_rate_hz=100.0, width_deg=10.0):
    """``make_focalplane`` (:651): hexagon sized by the ring formula, then
    truncated to the first n_detector rows."""
    from ..models import fake_hexagon_focalplane
    from ..utils import units as u
    from ..utils.units import Quantity

    ring = (
        math.ceil(math.sqrt((n_detector - 2) / 6)) if n_detector > 2 else 0
    )
    n_pixel = 1 + 3 * ring * (ring + 1)
    fp = fake_hexagon_focalplane(
        n_pix=n_pixel,
        width=Quantity(width_deg, u.deg),
        sample_rate=Quantity(sample_rate_hz, u.Hz),
        psd_net=Quantity(50.0e-6, u.K_sqrt_s),
        psd_fmin=Quantity(1.0e-5, u.Hz),
    )
    if 2 * n_pixel != n_detector:
        fp.detector_data = {k: v[:n_detector] for k, v in fp.detector_data.items()}
        fp._index = {d: i for i, d in enumerate(fp.detector_data["name"])}
    return fp


def _float64_statistics_map(data, pixels, weights, nside, rcond, mask=None):
    """Host float64 binning of the (destriped) signal over all observations.

    The reference accumulates its maps in double precision throughout; at a
    deep rcond threshold a float32 zmap (relative error ~1e-7, amplified by
    the inverse condition number) corrupts Q/U at marginally conditioned
    pixels by tens of Kelvin.  ``mask`` (a shared-flag bit mask) excludes
    flagged samples — the reference binner masks nonscience flags
    (ref:ops/mapmaker_binning.py:82), which matters for ground scans where
    turnarounds are flagged.
    """
    from ..models.defaults import default_values as defaults
    from ..ops.filterbin import _tri_invert, _tri_matvec

    n_pix_tot = 12 * nside * nside
    z64 = np.zeros((n_pix_tot, 3))
    inv64 = np.zeros((n_pix_tot, 6))
    rows = [0, 0, 0, 1, 1, 2]
    cols = [0, 1, 2, 1, 2, 2]
    if mask is None:
        mask = defaults.shared_mask_nonscience
    for ob in data.obs:
        nse = ob["noise_model"]
        dets = ob.local_detectors
        pixd = np.asarray(ob.detdata[pixels.pixels].data)
        wtsd = np.asarray(ob.detdata[weights.weights].data, dtype=np.float64)
        sigd = np.asarray(ob.detdata["signal"].data, dtype=np.float64)
        shared_good = np.ones(ob.n_local_samples, dtype=bool)
        if defaults.shared_flags in ob.shared:
            sf = np.asarray(ob.shared[defaults.shared_flags])
            shared_good = (sf.astype(np.uint32) & np.uint32(mask)) == 0
        for i, det in enumerate(dets):
            w = float(nse.detector_weight(det).value)
            p = pixd[i]
            good = (p >= 0) & shared_good
            pg = p[good]
            np.add.at(z64, pg, (w * sigd[i, good, None]) * wtsd[i, good])
            for t, (r, c) in enumerate(zip(rows, cols)):
                np.add.at(
                    inv64[:, t], pg, w * wtsd[i, good, r] * wtsd[i, good, c]
                )
    hit_sel = inv64[:, 0] > 0
    cov64 = np.zeros_like(inv64)
    cov64[hit_sel] = _tri_invert(inv64[hit_sel], 3, rcond)
    final_map64 = np.zeros((n_pix_tot, 3))
    final_map64[hit_sel] = _tri_matvec(cov64[hit_sel], z64[hit_sel])
    return final_map64


def run_satellite_case(case="tiny", nside=1024, lmax=1024, out=None, log=print):
    """Run the satellite benchmark case; returns (results, expected)."""
    from .. import ops
    from ..models import (
        Data,
        SpaceSite,
        Telescope,
        create_satellite_schedule,
    )
    from ..parallel import Comm
    from ..pixels import PixelData
    from ..templates import Offset
    from ..utils import units as u
    from ..utils.units import Quantity

    expected = SATELLITE_EXPECTED[case]
    n_det = expected["n_detector"]
    n_obs = expected["n_obs"]

    fp = make_benchmark_focalplane(n_det)
    tele = Telescope("satellite", focalplane=fp, site=SpaceSite("space"))

    # One-hour observations.  The bundled stats correspond to 360000
    # samples per detector per observation (totalhits / n_det); the
    # current reference code computes 1 + int(rate * duration) samples, so
    # target the recorded count with a duration just under one hour.
    obs_seconds = 3599.995
    schedule = create_satellite_schedule(
        prefix="",
        mission_start=datetime(2027, 1, 1, tzinfo=timezone.utc),
        observation_time=Quantity(obs_seconds, u.second),
        gap_time=Quantity(0.0, u.second),
        num_observations=n_obs,
        prec_period=Quantity(50.0, u.minute),
        spin_period=Quantity(10.0, u.minute),
    )

    comm = Comm()
    data = Data(comm)
    t0 = time.perf_counter()

    # input sky (native synfast equivalent) — synthesized first, before the
    # pointing pipeline populates device state
    sky_vals = make_input_sky(nside, lmax=lmax)
    log(f"[bench-ref] input sky synthesized ({time.perf_counter()-t0:.1f}s)")

    ops.SimSatellite(
        name="sim_satellite", telescope=tele, schedule=schedule
    ).apply(data)
    n_samp = data.obs[0].n_local_samples
    total_samples = n_det * sum(ob.n_local_samples for ob in data.obs)
    log(f"[bench-ref] {case}: {n_det} dets x {n_samp} samples x {n_obs} obs")

    ops.DefaultNoiseModel().apply(data)

    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(
        nside=nside,
        nside_submap=16,
        nest=True,
        detector_pointing=det_pointing,
        create_dist="pix_dist",
    )
    weights = ops.StokesWeights(mode="IQU", detector_pointing=det_pointing)
    ops.Pipeline(operators=[pixels, weights]).apply(data)
    import jax

    jax.block_until_ready(data.obs[0].detdata["weights"].data)
    log(f"[bench-ref] pointing expanded ({time.perf_counter()-t0:.1f}s)")

    sky = PixelData(data["pix_dist"], n_value=3, units=u.K)
    sky.set_numpy(sky_vals)
    data["input_sky"] = sky
    ops.ScanMap(map_key="input_sky", det_data="signal").apply(data)
    jax.block_until_ready(data.obs[0].detdata["signal"].data)
    log(f"[bench-ref] sky scanned ({time.perf_counter()-t0:.1f}s)")
    ops.SimNoise().apply(data)
    jax.block_until_ready(data.obs[0].detdata["signal"].data)
    log(f"[bench-ref] noise simulated ({time.perf_counter()-t0:.1f}s)")

    binner = ops.BinMap(
        pixel_dist="pix_dist", pixel_pointing=pixels, stokes_weights=weights
    )
    tmpl = Offset()  # default 10000 s step -> one baseline per observation
    mapper = ops.MapMaker(
        name="mapmaker",
        binning=binner,
        template_matrix=ops.TemplateMatrix(templates=[tmpl]),
        solve_rcond_threshold=f"{expected['rcond']:.0e}",
        map_rcond_threshold=f"{expected['rcond']:.0e}",
        write_binmap=False,
    )
    log(f"[bench-ref] mapmaker starting ({time.perf_counter()-t0:.1f}s)")
    mapper.apply(data)
    runtime = time.perf_counter() - t0
    log(f"[bench-ref] mapmaker done ({runtime:.1f}s)")

    final_map64 = _float64_statistics_map(
        data, pixels, weights, nside, expected["rcond"]
    )
    log(f"[bench-ref] float64 statistics map done ({time.perf_counter()-t0:.1f}s)")

    # Stats the reference way (ref:pixels.py:972: mean/std over stored
    # pixels, zeros included).  The bundled values match full-map
    # statistics: expected rms_I/rms_Q both equal the full-sky spectrum rms
    # (111 K / 6.31 K at lmax 1024) diluted by the same sqrt(rcond-passing
    # pixel fraction) over ALL 12 nside^2 pixels.
    hits = data["mapmaker_hits"].numpy()
    results = {
        "totalhits": int(hits.sum()),
        "rms_I": float(np.std(final_map64[:, 0])),
        "mean_Q": float(np.mean(final_map64[:, 1])),
        "rms_Q": float(np.std(final_map64[:, 1])),
        "mean_U": float(np.mean(final_map64[:, 2])),
        "rms_U": float(np.std(final_map64[:, 2])),
        "n_pass_rcond": int(np.count_nonzero(final_map64[:, 0])),
        "total_samples": int(total_samples),
        "runtime_s": round(runtime, 2),
    }
    return results, expected


def validate_satellite_case(case="tiny", nside=1024, log=print):
    """Run + compare to the bundled reference stats; returns (ok, results).

    Checks:
    * totalhits — exact (pure geometry).
    * rms_I — 2.5% tolerance: with the anti-sun slewed precession axis
      (the reference's geometry, ref:ops/sim_satellite.py:538-546) the
      rcond=1e-6 passing-pixel count reaches ~53k vs the reference's
      ~56k — the residual is the conditioning tail's sensitivity to the
      exact Earth ephemeris (our circular orbit vs astropy; the slew
      rate varies +-3.4% with orbital eccentricity) — and
      rms_I scales with sqrt(n_pass): measured agreement 1.5%.
    * rms_Q/rms_I and rms_U/rms_I — 8% tolerance: these ratios cancel
      the coverage factor and validate the polarization amplitude chain
      (E-mode normalization, spin-2 synthesis, Stokes weights, IQU
      decomposition).  They remain more sensitive than rms_I to WHICH
      marginal pixels pass rcond (marginal pixels carry the noisiest
      Q/U), so the tolerance covers the same ephemeris-level geometry
      residual (measured: Q 6.1%, U 4.7% with both rms biased low,
      consistent with 53k vs 56k passing pixels).
    """
    results, expected = run_satellite_case(case=case, nside=nside, log=log)
    checks = {}
    # hits are geometry-only: exact
    checks["totalhits"] = results["totalhits"] == expected["totalhits"]
    rel_i = abs(results["rms_I"] - expected["rms_I"]) / expected["rms_I"]
    checks["rms_I"] = rel_i < 0.025
    log(
        f"[bench-ref] rms_I: got {results['rms_I']:.5f} expected "
        f"{expected['rms_I']:.5f} (rel {rel_i:.3%}) -> "
        f"{'ok' if checks['rms_I'] else 'FAIL'}"
    )
    for key in ("rms_Q", "rms_U"):
        got_ratio = results[key] / results["rms_I"]
        want_ratio = expected[key] / expected["rms_I"]
        rel = abs(got_ratio - want_ratio) / want_ratio
        checks[key] = rel < RMS_RTOL
        log(
            f"[bench-ref] {key}/rms_I: got {got_ratio:.5f} expected "
            f"{want_ratio:.5f} (rel {rel:.3%}) -> "
            f"{'ok' if checks[key] else 'FAIL'}"
        )
    log(
        f"[bench-ref] totalhits: got {results['totalhits']} expected "
        f"{expected['totalhits']} -> "
        f"{'ok' if checks['totalhits'] else 'FAIL'}"
    )
    ok = all(checks.values())
    results["checks"] = checks
    results["pass"] = ok
    return ok, results


def run_ground_case(case="tiny", nside=4096, lmax=1280, log=print, sky=True, atm=True):
    """Run the ground benchmark case (``ref:scripts/toast_benchmark_ground.py``).

    Configuration follows the reference exactly: the ``get_standard_ground_args``
    site/scan parameters (:597-649), the select_distribution tiny sizing (one
    1200 s CES x 40 detectors), and the full operator chain — SimGround (1 deg/s
    sky-fixed az rate, 1 deg/s^2 turnarounds), median Atacama weather, GRF input
    sky scan at nside 4096, 1/f noise, atmosphere, 5 ms time-constant
    convolution + jittered deconvolution, ground/poly/common-mode filters, and
    the destriping map-maker at rcond 1e-3.

    Known deviations (documented in docs/VALIDATION.md): our scheduler/ephemeris
    stack generates the CES independently (same az range/el/duration), the sky
    and atmosphere realizations differ, and lmax truncates 3*nside-1 = 12287 to
    1280 (the input spectra carry no power beyond l ~ 1000).
    """
    from .. import ops
    from ..models import (
        Data,
        GroundSchedule,
        GroundScan,
        GroundSite,
        Telescope,
    )
    from ..models.schedule import to_utc
    from ..parallel import Comm
    from ..pixels import PixelData
    from ..templates import Offset
    from ..utils import units as u
    from ..utils.units import Quantity

    expected = GROUND_EXPECTED[case]
    n_det = expected["n_detector"]
    t0 = time.perf_counter()

    fp = make_benchmark_focalplane(n_det)
    # get_standard_ground_args: atacama site at -22:57:30 / -67:47:10, 5200 m
    site = GroundSite(
        "atacama",
        lat=Quantity(-(22 + 57 / 60 + 30 / 3600), u.deg),
        lon=Quantity(-(67 + 47 / 60 + 10 / 3600), u.deg),
        alt=Quantity(5200.0, u.meter),
    )
    tele = Telescope("LAT", focalplane=fp, site=site)

    # First CES of the benchmark schedule: HORIZONTAL patch RISING_SCAN_35
    # (az 30..150, el 35) starting at the schedule start, capped at
    # ces_max_time = 1200 s.
    start_ts = datetime(2027, 1, 1, tzinfo=timezone.utc).timestamp()
    scan = GroundScan(
        name="RISING_SCAN_35",
        start=to_utc(start_ts),
        stop=to_utc(start_ts + 1200.0),
        az_min=Quantity(30.0, u.deg),
        az_max=Quantity(150.0, u.deg),
        el=Quantity(35.0, u.deg),
    )
    schedule = GroundSchedule(
        scans=[scan],
        site_name="atacama",
        telescope_name="LAT",
        site_lat=site.lat,
        site_lon=site.lon,
        site_alt=site.alt,
    )

    data = Data(Comm())
    if sky:
        sky_vals = make_input_sky(nside, lmax=lmax)
        log(f"[bench-ref] ground input sky ready ({time.perf_counter()-t0:.1f}s)")

    ops.SimGround(
        name="sim_ground", telescope=tele, schedule=schedule, weather="atacama"
    ).apply(data)
    n_samp = data.obs[0].n_local_samples
    total_samples = n_det * n_samp
    log(f"[bench-ref] ground {case}: {n_det} dets x {n_samp} samples")

    ops.DefaultNoiseModel().apply(data)

    det_pointing_azel = ops.PointingDetectorSimple(
        boresight="boresight_azel", quats="quats_azel"
    )
    det_pointing_radec = ops.PointingDetectorSimple(
        boresight="boresight_radec", quats="quats_radec"
    )
    pixels = ops.PixelsHealpix(
        nside=nside,
        nside_submap=16,
        nest=True,
        detector_pointing=det_pointing_radec,
        create_dist="pix_dist",
    )
    weights = ops.StokesWeights(mode="IQU", detector_pointing=det_pointing_radec)
    ops.Pipeline(operators=[pixels, weights]).apply(data)
    import jax

    jax.block_until_ready(data.obs[0].detdata[weights.weights].data)
    log(f"[bench-ref] ground pointing expanded ({time.perf_counter()-t0:.1f}s)")

    if sky:
        sky_pd = PixelData(data["pix_dist"], n_value=3, units=u.K)
        sky_pd.set_numpy(sky_vals)
        data["input_sky"] = sky_pd
        ops.ScanMap(map_key="input_sky", det_data="signal").apply(data)
        del sky_vals
        log(f"[bench-ref] ground sky scanned ({time.perf_counter()-t0:.1f}s)")

    ops.SimNoise().apply(data)
    if atm:
        ops.SimAtmosphere(detector_pointing=det_pointing_azel).apply(data)
        log(f"[bench-ref] atmosphere simulated ({time.perf_counter()-t0:.1f}s)")
    tau = Quantity(5.0e-3, u.second)
    ops.TimeConstant(tau=tau).apply(data)
    ops.TimeConstant(tau=tau, tau_sigma=0.01, deconvolve=True).apply(data)
    ops.FlagSSO(detector_pointing="quats_azel").apply(data)
    ops.GroundFilter().apply(data)
    ops.PolyFilter().apply(data)
    ops.PolyFilter2D().apply(data)
    ops.CommonModeFilter().apply(data)
    jax.block_until_ready(data.obs[0].detdata["signal"].data)
    log(f"[bench-ref] ground filters applied ({time.perf_counter()-t0:.1f}s)")

    binner = ops.BinMap(
        pixel_dist="pix_dist", pixel_pointing=pixels, stokes_weights=weights
    )
    mapper = ops.MapMaker(
        name="mapmaker",
        binning=binner,
        template_matrix=ops.TemplateMatrix(templates=[Offset()]),
        solve_rcond_threshold=f"{expected['rcond']:.0e}",
        map_rcond_threshold=f"{expected['rcond']:.0e}",
        write_binmap=False,
    )
    mapper.apply(data)
    runtime = time.perf_counter() - t0
    log(f"[bench-ref] ground mapmaker done ({runtime:.1f}s)")

    final_map64 = _float64_statistics_map(
        data, pixels, weights, nside, expected["rcond"]
    )
    log(f"[bench-ref] ground float64 stats done ({time.perf_counter()-t0:.1f}s)")

    hits = data["mapmaker_hits"].numpy()
    results = {
        "totalhits": int(hits.sum()),
        "rms_I": float(np.std(final_map64[:, 0])),
        "mean_Q": float(np.mean(final_map64[:, 1])),
        "rms_Q": float(np.std(final_map64[:, 1])),
        "mean_U": float(np.mean(final_map64[:, 2])),
        "rms_U": float(np.std(final_map64[:, 2])),
        "n_pass_rcond": int(np.count_nonzero(final_map64[:, 0])),
        "total_samples": int(total_samples),
        "runtime_s": round(runtime, 2),
    }
    return results, expected


def validate_ground_case(case="tiny", nside=4096, log=print, atm=True):
    """Run + compare the ground case to the bundled reference stats.

    Checks (tolerances documented in docs/VALIDATION.md):
    * totalhits — 1%: the CES geometry (1200 s at the reference scan rate
      and turnaround acceleration) is deterministic, but the turnaround
      fraction depends on the exact accel-profile implementation.
    * rms_I, rms_Q, rms_U — 30%: the ground map rms mixes filtered sky,
      1/f noise, and an atmosphere realization; unlike the satellite case
      no component is exactly reproducible without healpy/CHOLMOD, so
      this check validates the end-to-end magnitude of the filtered,
      destriped map, not the realization.
    """
    results, expected = run_ground_case(case=case, nside=nside, log=log, atm=atm)
    checks = {}
    # measured: 4,692,680 vs 4,692,640 — exactly one sample per detector,
    # a turnaround boundary-sample convention difference (the reference's
    # CES interpolator generates int(dur*rate) samples vs the
    # observation's 1+int; see ref:ops/sim_ground_utils.py:~205)
    rel_h = abs(results["totalhits"] - expected["totalhits"]) / expected["totalhits"]
    checks["totalhits"] = rel_h < 0.001
    log(
        f"[bench-ref] ground totalhits: got {results['totalhits']} expected "
        f"{expected['totalhits']} (rel {rel_h:.3%}) -> "
        f"{'ok' if checks['totalhits'] else 'FAIL'}"
    )
    for key in ("rms_I", "rms_Q", "rms_U"):
        rel = abs(results[key] - expected[key]) / expected[key]
        checks[key] = rel < 0.30
        log(
            f"[bench-ref] ground {key}: got {results[key]:.5f} expected "
            f"{expected[key]:.5f} (rel {rel:.3%}) -> "
            f"{'ok' if checks[key] else 'FAIL'}"
        )
    ok = all(checks.values())
    results["checks"] = checks
    results["pass"] = ok
    return ok, results


def main():
    import argparse

    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--case",
        default="tiny",
        choices=list(SATELLITE_EXPECTED)
        + [f"ground_{c}" for c in GROUND_EXPECTED],
    )
    parser.add_argument("--nside", type=int, default=1024)
    parser.add_argument(
        "--platform",
        default=None,
        help="Force a JAX platform (e.g. 'cpu').  Output validation checks "
        "correctness, not speed, and the CPU backend is immune to the "
        "remote-TPU tunnel's instability on large one-off compiles.",
    )
    args = parser.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # persistent compile cache: the nside-1024 solver compile is the
    # dominant cost; cache it across runs/retries like bench.py does
    jax.config.update("jax_compilation_cache_dir", "/tmp/toast_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.case.startswith("ground_"):
        ok, results = validate_ground_case(
            case=args.case[len("ground_"):],
            nside=args.nside if args.nside != 1024 else 4096,
        )
    else:
        ok, results = validate_satellite_case(case=args.case, nside=args.nside)
    print(json.dumps(results, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
