"""Atmospheric absorption and loading coefficients.

Tabulated replacement for the reference's libaatm bridge
(``ref:src/libtoast/src/toast_atm_utils.cpp:82-203``:
``atm_get_absorption_coefficient(_vec)`` returns ``1 - exp(-tau_wet)`` for
a zenith line of sight and ``atm_get_atmospheric_loading(_vec)`` the
Rayleigh-Jeans sky temperature).  libaatm runs a full radiative-transfer
model; this module log-interpolates zenith opacity tables anchored to
published values for high, dry sites (ALMA/APEX/South-Pole site studies:
tau_wet/pwv ~ 0.010/mm at 90 GHz, ~0.055/mm at 225 GHz, ~0.18/mm at
345 GHz, with the 183/325/380 GHz water lines; O2 60-GHz complex and
118.75 GHz line for the dry component).  Accuracy is a few tens of
percent — adequate for simulation studies of band-dependent atmospheric
gain, not for calibration-grade transmission work.
"""

from __future__ import annotations

import numpy as np

# Zenith wet opacity per mm of PWV [Np/mm] vs frequency [GHz].
_WET_NU = np.array(
    [
        10, 22.2, 30, 50, 70, 90, 110, 130, 150, 165, 175, 183.3, 191, 200,
        215, 225, 240, 260, 280, 300, 315, 325.2, 335, 345, 360, 380.2, 400,
        430, 460, 500,
    ],
    dtype=np.float64,
)
_WET_KAPPA = np.array(
    [
        0.001, 0.012, 0.004, 0.005, 0.007, 0.010, 0.015, 0.020, 0.026, 0.045,
        0.12, 2.9, 0.14, 0.075, 0.050, 0.055, 0.065, 0.080, 0.100, 0.14, 0.35,
        2.0, 0.30, 0.18, 0.35, 5.0, 0.55, 0.45, 0.70, 1.5,
    ],
    dtype=np.float64,
)

# Zenith dry opacity [Np] at the reference pressure (~5000 m, 54 kPa).
_DRY_NU = np.array(
    [
        10, 30, 45, 52, 56, 60, 64, 68, 75, 90, 105, 112, 116, 118.75, 121,
        126, 140, 160, 200, 250, 300, 350, 400, 500,
    ],
    dtype=np.float64,
)
_DRY_TAU = np.array(
    [
        0.005, 0.010, 0.04, 0.4, 3.0, 8.0, 3.0, 0.4, 0.05, 0.013, 0.012,
        0.05, 0.3, 1.0, 0.3, 0.03, 0.010, 0.009, 0.008, 0.007, 0.007, 0.008,
        0.009, 0.012,
    ],
    dtype=np.float64,
)

_P_REF = 54000.0  # Pa, ~5000 m altitude
_T_REF = 270.0  # K


def _loginterp(freq, nu_tab, val_tab):
    freq = np.atleast_1d(np.asarray(freq, dtype=np.float64))
    logv = np.interp(np.log(freq), np.log(nu_tab), np.log(val_tab))
    return np.exp(logv)


def zenith_wet_opacity(freq_ghz, pwv_mm, pressure_pa=_P_REF, temperature_k=_T_REF):
    """Zenith water-vapor optical depth tau_wet(nu) [Np]."""
    kappa = _loginterp(freq_ghz, _WET_NU, _WET_KAPPA)
    # mild temperature dependence of line strengths
    tfac = (_T_REF / max(float(temperature_k), 150.0)) ** 0.5
    return kappa * pwv_mm * tfac


def zenith_dry_opacity(freq_ghz, pressure_pa=_P_REF, temperature_k=_T_REF):
    """Zenith dry-air optical depth tau_dry(nu) [Np]; collision-induced
    O2 opacity scales ~quadratically with pressure."""
    tau = _loginterp(freq_ghz, _DRY_NU, _DRY_TAU)
    pfac = float(pressure_pa) / _P_REF
    return tau * pfac**2


def _pressure_from_altitude(altitude_m):
    """Barometric pressure [Pa] at the given altitude."""
    return 101325.0 * np.exp(-altitude_m / 8400.0)


def atm_absorption_coefficient(altitude, temperature, pressure, pwv, freq):
    """Dimensionless zenith absorption 1 - exp(-tau_wet)
    (reference ``toast_atm_utils.cpp:82``).

    Args mirror the reference: altitude [m], temperature [K],
    pressure [Pa] (0/None -> barometric from altitude), pwv [mm],
    freq [GHz] (scalar or array).
    """
    if not pressure:
        pressure = _pressure_from_altitude(altitude)
    tau = zenith_wet_opacity(freq, pwv, pressure, temperature)
    out = 1.0 - np.exp(-tau)
    return float(out[0]) if np.isscalar(freq) else out


def atm_absorption_coefficient_vec(
    altitude, temperature, pressure, pwv, freqmin, freqmax, nfreq
):
    """Vectorized absorption over a frequency grid
    (reference ``toast_atm_utils.cpp:104``)."""
    freqs = np.linspace(freqmin, freqmax, int(nfreq))
    return atm_absorption_coefficient(altitude, temperature, pressure, pwv, freqs)


def atm_atmospheric_loading(altitude, temperature, pressure, pwv, freq):
    """Zenith Rayleigh-Jeans sky temperature [K]
    (reference ``toast_atm_utils.cpp:132``): T_atm (1 - exp(-tau_total))
    with an effective atmospheric temperature below the surface value.
    """
    if not pressure:
        pressure = _pressure_from_altitude(altitude)
    tau = zenith_wet_opacity(freq, pwv, pressure, temperature) + zenith_dry_opacity(
        freq, pressure, temperature
    )
    t_eff = 0.95 * float(temperature)
    out = t_eff * (1.0 - np.exp(-tau))
    return float(out[0]) if np.isscalar(freq) else out


def atm_atmospheric_loading_vec(
    altitude, temperature, pressure, pwv, freqmin, freqmax, nfreq
):
    freqs = np.linspace(freqmin, freqmax, int(nfreq))
    return atm_atmospheric_loading(altitude, temperature, pressure, pwv, freqs)


def band_averaged(fn, bandcenter_ghz, bandwidth_ghz, nstep=31, **kwargs):
    """Top-hat band average of a spectral function fn(freq array)."""
    lo = bandcenter_ghz - 0.5 * bandwidth_ghz
    hi = bandcenter_ghz + 0.5 * bandwidth_ghz
    freqs = np.linspace(lo, hi, nstep)
    vals = fn(freqs, **kwargs)
    return float(np.trapezoid(vals, freqs) / (hi - lo))
