"""Ground scan simulation utilities.

Rebuild of ``src/toast/ops/sim_ground_utils.py`` (``simulate_ces_scan:458``,
``scan_profile/scan_between:39,92``, ``simulate_elnod:125``,
``oscillate_el/step_el:206,361``, ``add_solar_intervals:756``): kinematic
constant-elevation scan generation with acceleration-limited turnarounds,
scan-state intervals, and Sun avoidance intervals (using the built-in solar
ephemeris instead of pyephem).

All profiles are generated vectorized on the host in float64 — this is
per-observation shared data, not the hot path.
"""

from __future__ import annotations

import numpy as np

from ..math import coordinates as coords


def simulate_ces_scan(
    times,
    az_min,
    az_max,
    scan_rate,
    scan_accel,
    start_with="leftright",
    cosecant_modulation=False,
    el=None,
):
    """Constant-elevation scan: az(t), velocity, and state segmentation.

    Kinematics: constant-rate sweeps between az_min and az_max joined by
    constant-acceleration turnarounds that overshoot symmetrically (like
    the reference ``sim_ground_utils.py:458``).

    Args:
        times: (n,) timestamps in seconds.
        az_min/az_max: scan endpoints in radians (az_max > az_min).
        scan_rate: az angular rate (rad/s, positive).
        scan_accel: turnaround acceleration (rad/s^2, positive).

    Returns:
        dict with az, az_vel, and boolean masks scanning / turnaround /
        leftright (moving toward +az) plus sample spans per state.
    """
    times = np.asarray(times, dtype=np.float64)
    t = times - times[0]
    throw = az_max - az_min
    if throw <= 0:
        raise ValueError("az_max must exceed az_min")
    t_scan = throw / scan_rate
    t_turn = 2.0 * scan_rate / scan_accel
    t_cycle = 2.0 * (t_scan + t_turn)

    phase = np.mod(t, t_cycle)
    az = np.empty_like(phase)
    vel = np.empty_like(phase)

    # segment A: left->right sweep
    in_a = phase < t_scan
    az[in_a] = az_min + scan_rate * phase[in_a]
    vel[in_a] = scan_rate
    # segment B: turnaround at az_max
    tau = phase - t_scan
    in_b = (phase >= t_scan) & (phase < t_scan + t_turn)
    az[in_b] = az_max + scan_rate * tau[in_b] - 0.5 * scan_accel * tau[in_b] ** 2
    vel[in_b] = scan_rate - scan_accel * tau[in_b]
    # segment C: right->left sweep
    tau = phase - (t_scan + t_turn)
    in_c = (phase >= t_scan + t_turn) & (phase < 2 * t_scan + t_turn)
    az[in_c] = az_max - scan_rate * tau[in_c]
    vel[in_c] = -scan_rate
    # segment D: turnaround at az_min
    tau = phase - (2 * t_scan + t_turn)
    in_d = phase >= 2 * t_scan + t_turn
    az[in_d] = az_min - scan_rate * tau[in_d] + 0.5 * scan_accel * tau[in_d] ** 2
    vel[in_d] = -scan_rate + scan_accel * tau[in_d]

    if start_with == "rightleft":
        # mirror: swap sweep direction
        az = az_min + az_max - az
        vel = -vel

    scanning = in_a | in_c
    turnaround = in_b | in_d
    leftright = in_a | in_b  # moving right or turning at the right edge

    def spans(mask):
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            return []
        breaks = np.nonzero(np.diff(idx) > 1)[0]
        starts = np.concatenate([[idx[0]], idx[breaks + 1]])
        stops = np.concatenate([idx[breaks], [idx[-1]]])
        return list(zip(starts, stops))

    return {
        "az": az,
        "az_vel": vel,
        "scanning": scanning,
        "turnaround": turnaround,
        "leftright": leftright,
        "spans_scanning": spans(scanning),
        "spans_turnaround": spans(turnaround),
        "spans_scan_leftright": spans(in_a if start_with == "leftright" else in_c),
        "spans_scan_rightleft": spans(in_c if start_with == "leftright" else in_a),
        "spans_turn_leftright": spans(in_b if start_with == "leftright" else in_d),
        "spans_turn_rightleft": spans(in_d if start_with == "leftright" else in_b),
        "spans_throw_leftright": spans(
            (in_a | in_b) if start_with == "leftright" else (in_c | in_d)
        ),
        "spans_throw_rightleft": spans(
            (in_c | in_d) if start_with == "leftright" else (in_a | in_b)
        ),
    }


def oscillate_el(times, el_mid, amplitude, period):
    """Sinusoidal elevation modulation (reference ``:206``)."""
    t = np.asarray(times, dtype=np.float64)
    return el_mid + amplitude * np.sin(2.0 * np.pi * (t - t[0]) / period)


def step_el(times, el_start, step, step_time):
    """Discrete elevation steps every step_time (reference ``:361``)."""
    t = np.asarray(times, dtype=np.float64)
    nstep = ((t - t[0]) / step_time).astype(np.int64)
    return el_start + nstep * step


def simulate_elnod(times, rate, el_start, nods):
    """Elevation-nod profile at the start of an observation
    (reference ``:125``): el moves through the list of nod offsets."""
    t = np.asarray(times, dtype=np.float64)
    el = np.full_like(t, el_start)
    if not nods:
        return el, np.zeros_like(t, dtype=bool)
    nod_time = (t[-1] - t[0]) / len(nods)
    mask = np.zeros_like(t, dtype=bool)
    for i, nod in enumerate(nods):
        sel = (t - t[0] >= i * nod_time) & (t - t[0] < (i + 1) * nod_time)
        el[sel] = el_start + nod
        mask |= sel
    return el, mask


def add_solar_intervals(site, times, az_bore, el_bore, sun_close_distance_rad):
    """Sun-up and Sun-close sample spans (reference ``:756``)."""
    times = np.asarray(times, dtype=np.float64)
    # sample the sun hourly-scale motion sparsely, interpolate
    nstep = max(2, int((times[-1] - times[0]) / 60.0) + 1)
    tvec = np.linspace(times[0], times[-1], nstep)
    az_sun_s, el_sun_s = coords.sun_azel(site, tvec)
    az_sun = np.interp(times, tvec, np.unwrap(az_sun_s))
    el_sun = np.interp(times, tvec, el_sun_s)
    sun_up = el_sun > 0
    cos_dist = np.sin(el_bore) * np.sin(el_sun) + np.cos(el_bore) * np.cos(
        el_sun
    ) * np.cos(az_bore - az_sun)
    sun_close = sun_up & (cos_dist > np.cos(sun_close_distance_rad))

    def spans(mask):
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            return []
        breaks = np.nonzero(np.diff(idx) > 1)[0]
        starts = np.concatenate([[idx[0]], idx[breaks + 1]])
        stops = np.concatenate([idx[breaks], [idx[-1]]])
        return list(zip(starts, stops))

    return spans(sun_up), spans(sun_close)
