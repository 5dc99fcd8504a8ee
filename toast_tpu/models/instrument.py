"""Instrument model: sites, focalplane, telescope, session, bandpass.

Rebuild of ``src/toast/instrument.py`` (``Site:56``, ``GroundSite:191``,
``SpaceSite:354``, ``Bandpass:461``, ``Focalplane:682``, ``Session:1096``,
``Telescope:1252``) without astropy: detector tables are plain column
dictionaries of numpy arrays, units come from :mod:`toast_tpu.utils.units`,
and site positions use lightweight built-in ephemeris approximations
(sufficient for dipole/aberration simulation; documented accuracy ~1e-3).
"""

from __future__ import annotations

import numpy as np

from ..utils import units as u
from ..utils.misc import name_UID
from ..utils.units import Quantity
from ..math import qarray as qa


class Site:
    """Observation location base class."""

    def __init__(self, name, uid=None):
        self.name = name
        self.uid = name_UID(name) if uid is None else uid

    def position(self, times):
        """Solar-system barycentric position (m), shape (n, 3)."""
        raise NotImplementedError

    def velocity(self, times):
        """Solar-system barycentric velocity (m/s), shape (n, 3)."""
        raise NotImplementedError

    def __eq__(self, other):
        return isinstance(other, Site) and self.name == other.name

    def __hash__(self):
        return hash(self.name)

    def __repr__(self):
        return f"<{type(self).__name__} '{self.name}'>"


_H_PLANCK = 6.62607015e-34
_K_BOLTZ = 1.380649e-23
_T_CMB = 2.72548
_C_LIGHT_M = 299792458.0
_AU = 1.495978707e11  # m
_YEAR = 365.25 * 86400.0
_EARTH_ORBIT_V = 2.0 * np.pi * _AU / _YEAR  # ~29.8 km/s


def _earth_orbit(times):
    """Circular-orbit Earth ephemeris in ecliptic-aligned equatorial frame.

    Approximation: circular orbit in the ecliptic plane, J2000 epoch phase
    referenced to perihelion ~Jan 3.  Good to ~2% (eccentricity) — adequate
    for simulated orbital dipole studies; not for real-data reduction.
    """
    t = np.atleast_1d(np.asarray(times, dtype=np.float64))
    # phase zero at 2000-01-01 12:00 UTC (unix 946728000); ecliptic longitude
    # of Earth at that epoch ~100.46 deg
    phase = 2.0 * np.pi * ((t - 946728000.0) / _YEAR) + np.radians(100.46)
    x_ecl = np.stack(
        [np.cos(phase), np.sin(phase), np.zeros_like(phase)], axis=-1
    )
    v_ecl = np.stack(
        [-np.sin(phase), np.cos(phase), np.zeros_like(phase)], axis=-1
    )
    # rotate ecliptic -> equatorial
    q = qa.inv(qa.equ2ecl())
    pos = qa.rotate(q, x_ecl) * _AU
    vel = qa.rotate(q, v_ecl) * _EARTH_ORBIT_V
    return pos, vel


class GroundSite(Site):
    """Telescope site on the Earth."""

    def __init__(self, name, lat, lon, alt, uid=None, weather=None):
        super().__init__(name, uid=uid)
        self.lat = Quantity(lat, u.deg) if not isinstance(lat, Quantity) else lat
        self.lon = Quantity(lon, u.deg) if not isinstance(lon, Quantity) else lon
        self.alt = Quantity(alt, u.meter) if not isinstance(alt, Quantity) else alt
        self.weather = weather

    def earth_position(self):
        """Geocentric position (m) assuming spherical Earth."""
        r = 6371000.0 + self.alt.to_value(u.meter)
        lat = self.lat.to_value(u.rad)
        lon = self.lon.to_value(u.rad)
        return r * np.array(
            [np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon), np.sin(lat)]
        )

    def position(self, times):
        pos, _vel = _earth_orbit(times)
        return pos

    def velocity(self, times):
        _pos, vel = _earth_orbit(times)
        return vel

    def __eq__(self, other):
        return (
            isinstance(other, GroundSite)
            and self.name == other.name
            and self.lat == other.lat
            and self.lon == other.lon
        )

    def __hash__(self):
        return hash((self.name, float(self.lat.value), float(self.lon.value)))


class SpaceSite(Site):
    """Satellite at roughly the Earth-Sun L2 / Earth orbit."""

    def position(self, times):
        pos, _vel = _earth_orbit(times)
        return pos

    def velocity(self, times):
        _pos, vel = _earth_orbit(times)
        return vel


class Bandpass:
    """Top-hat (or tabulated) detector bandpass.

    Reference ``instrument.py:461``: band integration weights for unit
    conversion and atmospheric absorption.  Stores per-detector center and
    width; provides an integration grid.
    """

    def __init__(self, bandcenters, bandwidths, nstep=101):
        self.centers = bandcenters  # dict det -> Quantity (GHz)
        self.widths = bandwidths
        self.nstep = nstep

    def dets(self):
        return list(self.centers.keys())

    def get_range(self, det):
        c = self.centers[det].to_value(u.GHz)
        w = self.widths[det].to_value(u.GHz)
        return (
            Quantity(c - 0.5 * w, u.GHz),
            Quantity(c + 0.5 * w, u.GHz),
        )

    def bins(self, det):
        """Integration grid + normalized composite-Simpson weights.

        The reference integrates band quantities with ``integrate_simpson``
        (``_libtoast/math_misc.cpp:54``); the weights here are the same
        quadrature expressed as per-node coefficients, normalized so that
        a constant integrand averages to itself.
        """
        from ..math.misc import simpson_weights

        lo, hi = self.get_range(det)
        freqs = np.linspace(
            lo.to_value(u.GHz), hi.to_value(u.GHz), self.nstep
        )
        weights = simpson_weights(freqs)
        weights = weights / np.sum(weights)
        return freqs, weights

    def center_frequency(self, det, alpha=None):
        return self.centers[det]

    def kcmb2krj(self, det):
        """Thermodynamic (CMB) to Rayleigh-Jeans temperature factor."""
        freqs, weights = self.bins(det)
        x = _H_PLANCK * freqs * 1e9 / (_K_BOLTZ * _T_CMB)
        g = x**2 * np.exp(x) / np.expm1(x) ** 2
        return float(np.sum(weights * g) / np.sum(weights))

    def kcmb2jysr(self, det):
        """Thermodynamic temperature to Jy/sr conversion factor."""
        freqs, weights = self.bins(det)
        nu = freqs * 1e9
        x = _H_PLANCK * nu / (_K_BOLTZ * _T_CMB)
        g = x**2 * np.exp(x) / np.expm1(x) ** 2
        # dB/dT in RJ: 2 nu^2 k / c^2 -> Jy/sr per K_RJ
        rj = 2.0 * nu**2 * _K_BOLTZ / _C_LIGHT_M**2 * 1e26
        return float(np.sum(weights * g * rj) / np.sum(weights))


class Focalplane:
    """Table of detector properties plus sampling metadata.

    ``detector_data`` is a dict of equal-length numpy arrays (columns), with
    required column ``name`` and ``quat`` (n_det, 4).  Optional columns used
    by operators: ``gamma`` (pol angle, rad), ``pol_leakage`` (epsilon),
    ``psd_fmin/psd_fknee/psd_alpha/psd_net``, ``bandcenter/bandwidth``,
    ``fwhm``, ``pixel``, ``pol``.
    """

    def __init__(
        self,
        detector_data=None,
        sample_rate=None,
        field_of_view=None,
        thinfp=None,
    ):
        if detector_data is None:
            detector_data = {"name": np.array([], dtype=object)}
        self.detector_data = detector_data
        if thinfp is not None and thinfp > 1:
            keep = slice(0, len(detector_data["name"]), int(thinfp))
            self.detector_data = {
                k: v[keep] for k, v in detector_data.items()
            }
        self.sample_rate = (
            Quantity(sample_rate, u.Hz)
            if not isinstance(sample_rate, Quantity) and sample_rate is not None
            else sample_rate
        )
        self.field_of_view = field_of_view
        self._index = {
            d: i for i, d in enumerate(self.detector_data["name"])
        }

    @property
    def detectors(self):
        return list(self.detector_data["name"])

    @property
    def n_detectors(self):
        return len(self.detector_data["name"])

    def __len__(self):
        return self.n_detectors

    def __contains__(self, det):
        return det in self._index

    def __getitem__(self, det):
        i = self._index[det]
        return {k: v[i] for k, v in self.detector_data.items()}

    def detector_index(self, det):
        return self._index[det]

    def column(self, key, default=None):
        if key in self.detector_data:
            return self.detector_data[key]
        return default

    @property
    def detector_quats(self):
        return np.asarray(self.detector_data["quat"], dtype=np.float64)

    def bandpass(self):
        if "bandcenter" not in self.detector_data:
            return None
        centers = {}
        widths = {}
        for i, d in enumerate(self.detector_data["name"]):
            centers[d] = Quantity(
                float(self.detector_data["bandcenter"][i]), u.GHz
            )
            widths[d] = Quantity(
                float(self.detector_data["bandwidth"][i]), u.GHz
            )
        return Bandpass(centers, widths)

    def __eq__(self, other):
        if not isinstance(other, Focalplane):
            return NotImplemented
        return self.detectors == other.detectors and (
            self.sample_rate == other.sample_rate
        )

    def __repr__(self):
        return (
            f"<Focalplane {self.n_detectors} dets @ "
            f"{self.sample_rate} >"
        )

    # -- HDF5 round trip ---------------------------------------------------
    def save_hdf5(self, handle, comm=None):
        import h5py

        grp = handle.create_group("focalplane") if isinstance(
            handle, h5py.File
        ) else handle
        if self.sample_rate is not None:
            grp.attrs["sample_rate_hz"] = self.sample_rate.to_value(u.Hz)
        if self.field_of_view is not None:
            grp.attrs["field_of_view_deg"] = self.field_of_view.to_value(u.deg)
        for k, v in self.detector_data.items():
            arr = np.asarray(v)
            if arr.dtype == object or arr.dtype.kind in "US":
                arr = np.array([str(x) for x in v], dtype="S64")
            grp.create_dataset(k, data=arr)

    @classmethod
    def load_hdf5(cls, handle, comm=None):
        import h5py

        grp = handle["focalplane"] if "focalplane" in handle else handle
        data = {}
        for k in grp.keys():
            arr = np.asarray(grp[k])
            if arr.dtype.kind == "S":
                arr = np.array([x.decode() for x in arr], dtype=object)
            data[k] = arr
        sample_rate = None
        if "sample_rate_hz" in grp.attrs:
            sample_rate = Quantity(float(grp.attrs["sample_rate_hz"]), u.Hz)
        fov = None
        if "field_of_view_deg" in grp.attrs:
            fov = Quantity(float(grp.attrs["field_of_view_deg"]), u.deg)
        return cls(detector_data=data, sample_rate=sample_rate, field_of_view=fov)


class Session:
    """A contiguous data-taking session (reference ``instrument.py:1096``)."""

    def __init__(self, name, uid=None, start=None, end=None):
        self.name = name
        self.uid = name_UID(name) if uid is None else uid
        self.start = start
        self.end = end

    def __eq__(self, other):
        return isinstance(other, Session) and self.name == other.name

    def __hash__(self):
        return hash(self.name)

    def __repr__(self):
        return f"<Session '{self.name}' {self.start} - {self.end}>"


class Telescope:
    """A focalplane at a site."""

    def __init__(self, name, uid=None, focalplane=None, site=None):
        self.name = name
        self.uid = name_UID(name) if uid is None else uid
        self.focalplane = focalplane
        self.site = site

    def __eq__(self, other):
        return (
            isinstance(other, Telescope)
            and self.name == other.name
            and self.site == other.site
            and self.focalplane == other.focalplane
        )

    def __repr__(self):
        return f"<Telescope '{self.name}' site={self.site} fp={self.focalplane}>"
