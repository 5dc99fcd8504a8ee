"""Ground observing simulation.

Rebuild of ``src/toast/ops/sim_ground.py:61`` (``SimGround``): creates
observations from a :class:`~toast_tpu.models.schedule.GroundSchedule` with
constant-elevation azimuth scans, acceleration-limited turnarounds, Az/El
and RA/Dec boresight quaternions, scan-state intervals, turnaround flags,
Sun avoidance intervals, HWP angle, and per-observation simulated weather.
"""

from __future__ import annotations

import numpy as np

from ..config.traits import Bool, Instance, Int, Quantity, Unicode
from ..math import coordinates as coords
from ..math import qarray as qa
from ..models import Observation, Session
from ..models.defaults import default_values as defaults
from ..models.weather import SimWeather
from ..parallel.dist import distribute_discrete
from ..utils import units as u
from ..utils.timing import function_timer
from ..utils.units import Quantity as Qty
from .operator import Operator
from .sim_ground_utils import (
    add_solar_intervals,
    oscillate_el,
    simulate_ces_scan,
    simulate_elnod,
)

ZAXIS = np.array([0.0, 0.0, 1.0])


class SimGround(Operator):
    """Simulate ground-based constant-elevation scanning observations."""

    telescope = Instance(klass=object, allow_none=True, help="Telescope instance")
    schedule = Instance(klass=object, allow_none=True, help="GroundSchedule")
    scan_rate_az = Quantity(Qty(1.0, u.deg), help="Az scan rate (per second)")
    fix_rate_on_sky = Bool(
        True,
        help="If True, scan_rate_az is a sky rate and the mount azimuth "
        "rate is scan_rate_az / cos(el) (ref:ops/sim_ground.py:148)",
    )
    scan_accel_az = Quantity(
        Qty(1.0, u.deg), help="Az acceleration in turnarounds (per second^2)"
    )
    hwp_rpm = Quantity(None, allow_none=True, help="HWP rotation rate in RPM")
    hwp_angle = Unicode(None, allow_none=True, help="Shared key for HWP angle")
    times = Unicode(defaults.times)
    shared_flags = Unicode(defaults.shared_flags)
    azimuth = Unicode(defaults.azimuth)
    elevation = Unicode(defaults.elevation)
    boresight_azel = Unicode(defaults.boresight_azel)
    boresight_radec = Unicode(defaults.boresight_radec)
    position = Unicode(defaults.position)
    velocity = Unicode(defaults.velocity)
    weather = Unicode(None, allow_none=True, help="Weather model name (e.g. atacama)")
    realization = Int(0, help="Realization index (weather draws)")
    turnaround_mask = Int(
        defaults.shared_mask_unstable_scanrate, help="Flag bits for turnarounds"
    )
    sun_angle_min = Quantity(
        Qty(30.0, u.deg), help="Minimum Sun avoidance distance"
    )
    detset_key = Unicode(None, allow_none=True)
    track_azimuth = Bool(False, help="Unused (API compatibility)")
    # elevation modulation (reference ops/sim_ground.py:172-198)
    scan_cosecant_modulation = Bool(
        False, help="Modulate the az scan rate as 1/sin(az) for uniform depth"
    )
    el_mod_step = Quantity(
        Qty(0.0, u.deg),
        help="Step elevation by this amount after each left-right scan pair",
    )
    el_mod_rate = Quantity(
        Qty(0.0, u.Hz), help="Continuously modulate elevation at this rate"
    )
    el_mod_amplitude = Quantity(
        Qty(1.0, u.deg), help="Range of the continuous elevation modulation"
    )
    el_mod_sine = Bool(
        False, help="Sine-wave elevation modulation instead of triangle"
    )
    # el-nods (reference ops/sim_ground.py:265-271)
    elnod_start = Bool(False, help="Perform an el-nod before the scan")
    elnod_end = Bool(False, help="Perform an el-nod after the scan")
    elnods = Unicode(
        "", help="Comma-separated relative el-nod offsets in degrees"
    )

    @function_timer
    def _exec(self, data, detectors=None, **kwargs):
        if self.telescope is None or self.schedule is None:
            raise RuntimeError("telescope and schedule traits must be set")
        focalplane = self.telescope.focalplane
        site = self.telescope.site
        rate_hz = focalplane.sample_rate.to_value(u.Hz)
        comm = data.comm

        scan_samples = [
            1 + int(rate_hz * (sc.stop_timestamp - sc.start_timestamp))
            for sc in self.schedule.scans
        ]
        groupdist = distribute_discrete(scan_samples, comm.ngroups)
        off, n_scans = groupdist[comm.group]

        det_sets = None
        if self.detset_key is not None:
            col = focalplane.column(self.detset_key)
            seen = {}
            for d, v in zip(focalplane.detectors, col):
                seen.setdefault(v, []).append(d)
            det_sets = list(seen.values())

        for idx in range(off, off + n_scans):
            scan = self.schedule.scans[idx]
            n_samp = scan_samples[idx]
            session = Session(scan.name, start=scan.start, end=scan.stop)
            ob = Observation(
                comm,
                self.telescope,
                n_samp,
                name=f"{scan.name}_{int(scan.start_timestamp)}",
                session=session,
                detector_sets=det_sets,
            )
            times = scan.start_timestamp + np.arange(n_samp) / rate_hz
            ob.shared.create_column(self.times, (n_samp,))
            ob.shared.set(self.times, times)

            # azimuth profile with turnarounds
            rate_az = self.scan_rate_az.to_value(u.rad)
            if self.fix_rate_on_sky:
                rate_az = rate_az / max(np.cos(scan.el.to_value(u.rad)), 1e-6)
            ces = simulate_ces_scan(
                times,
                scan.az_min.to_value(u.rad),
                scan.az_max.to_value(u.rad),
                rate_az,
                self.scan_accel_az.to_value(u.rad),
                cosecant_modulation=self.scan_cosecant_modulation,
            )
            el = np.full(n_samp, scan.el.to_value(u.rad))

            # elevation modulation (reference sim_ground.py:172-198)
            el_rate = self.el_mod_rate.to_value(u.Hz)
            if el_rate > 0:
                amp = self.el_mod_amplitude.to_value(u.rad)
                if self.el_mod_sine:
                    el = oscillate_el(times, el[0], amp, 1.0 / el_rate)
                else:
                    # triangle wave of the same period and range
                    phase = ((times - times[0]) * el_rate) % 1.0
                    el = el + amp * (2.0 * np.abs(2.0 * phase - 1.0) - 1.0)
            step_rad = self.el_mod_step.to_value(u.rad)
            if step_rad != 0.0:
                # step after each left-right scan pair
                pair_count = np.zeros(n_samp, dtype=np.int64)
                for lo, hi in ces["spans_scan_leftright"]:
                    pair_count[hi + 1 :] += 1
                el = el + step_rad * pair_count

            # el-nods (reference sim_ground_utils.py:125 simulate_elnod)
            nods = [
                np.radians(float(x))
                for x in self.elnods.split(",")
                if x.strip()
            ]
            elnod_flags = np.zeros(n_samp, dtype=bool)
            if nods and (self.elnod_start or self.elnod_end):
                nod_len = max(1, int(len(nods) * 2.0 * rate_hz))
                if self.elnod_start:
                    seg = slice(0, min(nod_len, n_samp))
                    el_seg, mask = simulate_elnod(
                        times[seg], rate_hz, el[0], nods
                    )
                    el[seg] = el_seg
                    elnod_flags[seg] |= mask
                if self.elnod_end:
                    seg = slice(max(0, n_samp - nod_len), n_samp)
                    el_seg, mask = simulate_elnod(
                        times[seg], rate_hz, el[-1], nods
                    )
                    el[seg] = el_seg
                    elnod_flags[seg] |= mask
            ob.shared.create_column(self.azimuth, (n_samp,))
            ob.shared.set(self.azimuth, ces["az"])
            ob.shared.create_column(self.elevation, (n_samp,))
            ob.shared.set(self.elevation, el)

            # flags: mark turnarounds
            flags = np.zeros(n_samp, dtype=np.uint8)
            flags[ces["turnaround"]] |= self.turnaround_mask
            ob.shared.create_column(self.shared_flags, (n_samp,), dtype=np.uint8)
            ob.shared.set(self.shared_flags, flags)

            # boresight quaternions
            bore_azel = coords.azel_quat(ces["az"], el)
            if scan.boresight_angle.to_value(u.rad) != 0:
                rot = qa.rotation(ZAXIS, scan.boresight_angle.to_value(u.rad))
                bore_azel = qa.mult(bore_azel, rot)
            bore_radec = coords.azel_to_radec(site, times, bore_azel)
            ob.shared.create_column(self.boresight_azel, (n_samp, 4))
            ob.shared.set(self.boresight_azel, bore_azel)
            ob.shared.create_column(self.boresight_radec, (n_samp, 4))
            ob.shared.set(self.boresight_radec, bore_radec)

            # HWP
            if self.hwp_angle is not None and self.hwp_rpm is not None:
                rpm = float(self.hwp_rpm.value)
                ang = (2.0 * np.pi * rpm / 60.0 * (times - times[0])) % (
                    2.0 * np.pi
                )
                ob.shared.create_column(self.hwp_angle, (n_samp,))
                ob.shared.set(self.hwp_angle, ang)

            # site motion
            ob.shared.create_column(self.position, (n_samp, 3))
            ob.shared.create_column(self.velocity, (n_samp, 3))
            ob.shared.set(self.position, site.position(times))
            ob.shared.set(self.velocity, site.velocity(times))

            # scan-state intervals
            dv = defaults
            for name, key in (
                (dv.scanning_interval, "spans_scanning"),
                (dv.turnaround_interval, "spans_turnaround"),
                (dv.scan_leftright_interval, "spans_scan_leftright"),
                (dv.scan_rightleft_interval, "spans_scan_rightleft"),
                (dv.turn_leftright_interval, "spans_turn_leftright"),
                (dv.turn_rightleft_interval, "spans_turn_rightleft"),
                (dv.throw_leftright_interval, "spans_throw_leftright"),
                (dv.throw_rightleft_interval, "spans_throw_rightleft"),
            ):
                ob.intervals.create(name, samplespans=ces[key])
            ob.intervals.create(
                dv.throw_interval,
                samplespans=ces["spans_throw_leftright"]
                + ces["spans_throw_rightleft"],
            )
            if elnod_flags.any():
                idx_el = np.nonzero(elnod_flags)[0]
                bounds = np.nonzero(np.diff(idx_el) > 1)[0]
                starts = np.concatenate([[idx_el[0]], idx_el[bounds + 1]])
                stops = np.concatenate([idx_el[bounds], [idx_el[-1]]])
                ob.intervals.create(
                    dv.elnod_interval,
                    samplespans=list(zip(starts, stops)),
                )

            # solar intervals + flags
            sun_up, sun_close = add_solar_intervals(
                site, times, ces["az"], el, self.sun_angle_min.to_value(u.rad)
            )
            ob.intervals.create(dv.sun_up_interval, samplespans=sun_up)
            ob.intervals.create(dv.sun_close_interval, samplespans=sun_close)
            if sun_up:
                f = np.asarray(ob.shared[self.shared_flags]).copy()
                for first, last in sun_up:
                    f[first : last + 1] |= dv.shared_mask_sun_up
                for first, last in sun_close:
                    f[first : last + 1] |= dv.shared_mask_sun_close
                ob.shared.set(self.shared_flags, f)

            # weather
            if self.weather is not None:
                ob.telescope.site.weather = SimWeather(
                    time=times[0],
                    name=self.weather,
                    site_uid=site.uid,
                    realization=self.realization,
                )

            data.obs.append(ob)

    def _provides(self):
        shared = [
            self.times,
            self.shared_flags,
            self.azimuth,
            self.elevation,
            self.boresight_azel,
            self.boresight_radec,
            self.position,
            self.velocity,
        ]
        if self.hwp_angle is not None:
            shared.append(self.hwp_angle)
        return {
            "global": [],
            "meta": [],
            "detdata": [],
            "shared": shared,
            "intervals": [
                defaults.scanning_interval,
                defaults.turnaround_interval,
                defaults.throw_interval,
                defaults.sun_up_interval,
                defaults.sun_close_interval,
            ],
        }
