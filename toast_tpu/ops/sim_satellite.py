"""Satellite observing simulation.

Rebuild of ``src/toast/ops/sim_satellite.py`` (``satellite_scanning:30``,
``SimSatellite:186``): generates per-observation telescope data — timestamps,
spinning/precessing boresight quaternions in ecliptic coordinates, HWP
angle, satellite position/velocity — and distributes observations across
process groups.

Boresight composition (relative rotations, matching the reference):
``satrot * Rz(prec_phase) * Rx(prec_angle) * Rz(spin_phase) * Rx(spin_angle)
* Rz(pi/2)``; ``SimSatellite`` slews the precession axis along the
anti-sun direction per sample (``q_prec``), while bare
``satellite_scanning`` defaults to a fixed ecliptic X axis
(``satrot = Ry(pi/2)``).  Generation runs vectorized in float64 on the host
(it is per-observation, detector-independent, and precision-sensitive);
the per-detector expansion happens on device in the pointing operators.
"""

from __future__ import annotations

import numpy as np

from ..config.traits import Bool, Instance, Int, Quantity, Unicode
from ..math import qarray as qa
from ..models import Data, Observation, Session
from ..models.defaults import default_values as defaults
from ..parallel.dist import distribute_discrete
from ..utils import units as u
from ..utils.misc import name_UID, rate_from_times
from ..utils.timing import function_timer
from ..utils.units import Quantity as Qty
from .operator import Operator

XAXIS = np.array([1.0, 0.0, 0.0])
YAXIS = np.array([0.0, 1.0, 0.0])
ZAXIS = np.array([0.0, 0.0, 1.0])


@function_timer
def satellite_scanning(
    n_samp,
    sample_rate_hz,
    sample_offset=0,
    q_prec=None,
    spin_period_s=60.0,
    spin_angle_rad=np.radians(85.0),
    prec_period_s=0.0,
    prec_angle_rad=0.0,
):
    """Generate boresight quaternions (n_samp, 4), float64, vectorized."""
    idx = np.arange(n_samp, dtype=np.float64) + float(sample_offset)

    if q_prec is None:
        satrot = qa.rotation(YAXIS, np.pi / 2)[None, :]
    else:
        q_prec = np.asarray(q_prec, dtype=np.float64)
        satrot = q_prec.reshape(-1, 4)

    if prec_period_s > 0:
        prec_phase = idx / (prec_period_s * sample_rate_hz)
        prec_phase = 2.0 * np.pi * (prec_phase - np.floor(prec_phase))
    else:
        prec_phase = np.zeros(n_samp)
    precrot = qa.rotation(ZAXIS, prec_phase)
    precopen = qa.rotation(XAXIS, prec_angle_rad)[None, :]

    if spin_period_s > 0:
        spin_phase = idx / (spin_period_s * sample_rate_hz)
        spin_phase = 2.0 * np.pi * (spin_phase - np.floor(spin_phase))
    else:
        spin_phase = np.zeros(n_samp)
    spinrot = qa.rotation(ZAXIS, spin_phase)
    spinopen = qa.rotation(XAXIS, spin_angle_rad)[None, :]
    fprot = qa.rotation(ZAXIS, 0.5 * np.pi)[None, :]

    return qa.mult(
        satrot,
        qa.mult(precrot, qa.mult(precopen, qa.mult(spinrot, qa.mult(spinopen, fprot)))),
    )


class SimSatellite(Operator):
    """Create observations of a spinning, precessing satellite.

    Reference ``ops/sim_satellite.py:186``.
    """

    telescope = Instance(klass=object, allow_none=True, help="Telescope instance")
    schedule = Instance(klass=object, allow_none=True, help="SatelliteSchedule")
    spin_angle = Quantity(Qty(30.0, u.deg), help="Boresight-spin axis opening angle")
    prec_angle = Quantity(
        Qty(65.0, u.deg), help="Spin-precession axis opening angle"
    )
    hwp_rpm = Quantity(None, allow_none=True, help="HWP rotation rate in RPM")
    hwp_angle = Unicode(
        None, allow_none=True, help="Shared key for HWP angle (None to disable)"
    )
    times = Unicode(defaults.times, help="Shared key for timestamps")
    shared_flags = Unicode(defaults.shared_flags, help="Shared key for common flags")
    boresight = Unicode(defaults.boresight_radec, help="Shared key for boresight")
    position = Unicode(defaults.position, help="Shared key for position")
    velocity = Unicode(defaults.velocity, help="Shared key for velocity")
    distribute_time = Bool(
        False, help="Distribute observation sampling over time (else detectors)"
    )
    detset_key = Unicode(
        None, allow_none=True, help="Focalplane column for detector sets"
    )

    def _exec(self, data, detectors=None, **kwargs):
        if self.telescope is None:
            raise RuntimeError("telescope trait must be set before exec")
        if self.schedule is None:
            raise RuntimeError("schedule trait must be set before exec")

        focalplane = self.telescope.focalplane
        rate_hz = focalplane.sample_rate.to_value(u.Hz)
        comm = data.comm

        # assign scans to process groups weighted by their sample counts
        scan_samples = [
            1 + int(rate_hz * (sc.stop_timestamp - sc.start_timestamp))
            for sc in self.schedule.scans
        ]
        groupdist = distribute_discrete(scan_samples, comm.ngroups)
        off, n_scans = groupdist[comm.group]

        # mission-global sample offset for each scan (continuous spin phase)
        scan_offsets = np.concatenate([[0], np.cumsum(scan_samples)[:-1]])

        det_sets = None
        if self.detset_key is not None:
            col = focalplane.column(self.detset_key)
            det_sets = []
            seen = {}
            for d, v in zip(focalplane.detectors, col):
                seen.setdefault(v, []).append(d)
            det_sets = list(seen.values())

        for idx in range(off, off + n_scans):
            scan = self.schedule.scans[idx]
            n_samp = scan_samples[idx]
            session = Session(
                scan.name,
                start=scan.start,
                end=scan.stop,
            )
            ob = Observation(
                comm,
                self.telescope,
                n_samp,
                name=f"{scan.name}_{int(scan.start_timestamp)}",
                session=session,
                detector_sets=det_sets,
            )

            times = scan.start_timestamp + np.arange(n_samp) / rate_hz
            ob.shared.create_column(self.times, (n_samp,), dtype=np.float64)
            ob.shared.set(self.times, times)
            ob.shared.create_column(self.shared_flags, (n_samp,), dtype=np.uint8)

            site = self.telescope.site
            pos = site.position(times)
            # precession axis = anti-sun direction: the normalized site
            # position, continuously slewed (~1 deg/day) as the satellite
            # orbits (reference ``ops/sim_satellite.py:538-546``).  The
            # scan frame is ecliptic, the ephemeris equatorial.
            pos_ecl = qa.rotate(qa.equ2ecl()[None, :], pos)
            prec_axis = pos_ecl / np.linalg.norm(pos_ecl, axis=1, keepdims=True)
            q_prec = qa.from_vectors(
                np.broadcast_to(ZAXIS, prec_axis.shape), prec_axis
            )

            bore = satellite_scanning(
                n_samp,
                rate_hz,
                sample_offset=scan_offsets[idx],
                q_prec=q_prec,
                spin_period_s=scan.spin_period.to_value(u.second),
                spin_angle_rad=self.spin_angle.to_value(u.rad),
                prec_period_s=scan.prec_period.to_value(u.second),
                prec_angle_rad=self.prec_angle.to_value(u.rad),
            )
            ob.shared.create_column(self.boresight, (n_samp, 4), dtype=np.float64)
            ob.shared.set(self.boresight, bore)

            if self.hwp_angle is not None and self.hwp_rpm is not None:
                rpm = float(self.hwp_rpm.value)
                ang = (
                    2.0
                    * np.pi
                    * rpm
                    / 60.0
                    * (times - times[0] + scan_offsets[idx] / rate_hz)
                ) % (2.0 * np.pi)
                ob.shared.create_column(self.hwp_angle, (n_samp,), dtype=np.float64)
                ob.shared.set(self.hwp_angle, ang)

            ob.shared.create_column(self.position, (n_samp, 3), dtype=np.float64)
            ob.shared.create_column(self.velocity, (n_samp, 3), dtype=np.float64)
            ob.shared.set(self.position, pos)
            ob.shared.set(self.velocity, site.velocity(times))

            data.obs.append(ob)

    def _provides(self):
        prov = {
            "shared": [
                self.times,
                self.shared_flags,
                self.boresight,
                self.position,
                self.velocity,
            ]
        }
        if self.hwp_angle is not None:
            prov["shared"].append(self.hwp_angle)
        return {
            "global": [],
            "meta": [],
            "detdata": [],
            "shared": prov["shared"],
            "intervals": [],
        }
