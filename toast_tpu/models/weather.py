"""Atmospheric weather model.

Rebuild of ``src/toast/weather.py`` (``Weather:20``, ``SimWeather:385``).

The reference draws each weather variable by inverse-CDF sampling from
bundled MERRA-2 tables: per site, per month (12) and UTC hour (24), a
101-point quantile vector for each of nine MERRA-2 variables
(``ref:src/toast/weather.py:500-553``).  Those HDF5 tables are not
redistributable here, so this module SYNTHESIZES tables of the same
structure from published site climatologies (APEX/ALMA radiometer
statistics for Chajnantor, South Pole station records): analytic
lognormal / normal quantile functions whose medians carry the seasonal
and diurnal cycles.  The sampling machinery — month/hour table lookup,
counter-based uniform draw keyed by (site_uid, realization) with
counters (variable index, hour-of-era), ``np.interp`` on the quantile
grid, PWV truncation, ``median_weather`` — matches the reference
exactly, and tables in the reference's HDF5 format can be loaded with
``file=`` / :func:`read_weather` in place of the synthesized ones.
"""

from __future__ import annotations

import datetime
from collections import OrderedDict

import numpy as np

from ..math import rng as toast_rng
from ..utils import units as u
from ..utils.misc import name_UID
from ..utils.units import Quantity


class Weather:
    """Base weather: fixed values provided by the user or data files."""

    def __init__(
        self,
        time=None,
        ice_water=None,
        liquid_water=None,
        pwv=None,
        humidity=None,
        surface_pressure=None,
        surface_temperature=None,
        air_temperature=None,
        west_wind=None,
        south_wind=None,
    ):
        self.time = time
        self._ice_water = ice_water
        self._liquid_water = liquid_water
        self._pwv = pwv
        self._humidity = humidity
        self._surface_pressure = surface_pressure
        self._surface_temperature = surface_temperature
        self._air_temperature = air_temperature
        self._west_wind = west_wind
        self._south_wind = south_wind

    @property
    def ice_water(self):
        return self._ice_water

    @property
    def liquid_water(self):
        return self._liquid_water

    @property
    def pwv(self):
        return self._pwv

    @property
    def humidity(self):
        return self._humidity

    @property
    def surface_pressure(self):
        return self._surface_pressure

    @property
    def surface_temperature(self):
        return self._surface_temperature

    @property
    def air_temperature(self):
        return self._air_temperature

    @property
    def west_wind(self):
        return self._west_wind

    @property
    def south_wind(self):
        return self._south_wind

    def __repr__(self):
        return (
            f"<{type(self).__name__} pwv={self.pwv} T={self.air_temperature} "
            f"P={self.surface_pressure}>"
        )


# ---------------------------------------------------------------------------
# synthesized quantile tables
# ---------------------------------------------------------------------------

_NSTEP = 101
_PROBSTRT = 0.002
_PROBSTOP = 0.998

# MERRA-2 variable names in the reference's table order
# (ref:src/toast/weather.py:513-522)
_VARS = ("TQI", "TQL", "TQV", "QV10M", "PS", "TS", "T10M", "U10M", "V10M")


def _lognormal_q(p, median, sigma_ln):
    """Quantiles of a lognormal with the given median and log-sigma."""
    from math import sqrt

    # inverse error function via the probit relation
    z = sqrt(2.0) * _erfinv(2.0 * np.asarray(p) - 1.0)
    return median * np.exp(sigma_ln * z)


def _normal_q(p, mean, sigma):
    from math import sqrt

    z = sqrt(2.0) * _erfinv(2.0 * np.asarray(p) - 1.0)
    return mean + sigma * z


def _erfinv(x):
    """Vectorized inverse error function (Winitzki's approximation then
    one Newton step — |rel err| < 1e-6 over (-1, 1), plenty for weather
    quantiles)."""
    x = np.clip(np.asarray(x, dtype=np.float64), -0.999999, 0.999999)
    a = 0.147
    ln1mx2 = np.log1p(-x * x)
    t1 = 2.0 / (np.pi * a) + ln1mx2 / 2.0
    y = np.sign(x) * np.sqrt(np.sqrt(t1 * t1 - ln1mx2 / a) - t1)
    # Newton refinement: f(y) = erf(y) - x
    from math import pi, sqrt

    # vectorized erf via numpy (no scipy dependency)
    erf_y = np.vectorize(_erf_scalar)(y)
    y = y - (erf_y - x) * np.exp(y * y) * sqrt(pi) / 2.0
    return y


def _erf_scalar(v):
    import math

    return math.erf(float(v))


# Published-climatology anchors.  Each entry is a callable
# (month 0-11, hour 0-23) -> quantile curve over the probability grid.
# Seasonal phase: cos(2 pi m / 12) peaks in January (austral summer);
# diurnal phase: local mid-afternoon peak expressed in UTC.
def _site_builders(name):
    two_pi = 2.0 * np.pi

    def season(m, amp):  # peaks January
        return amp * np.cos(two_pi * m / 12.0)

    if name == "atacama":
        # Chajnantor plateau (~5060 m): APEX radiometer statistics.
        # PWV median ~1.1 mm overall; ~0.6 mm austral winter (Jul),
        # ~2.2 mm summer (Jan-Feb); lognormal spread ~0.55.  Afternoon
        # convective moistening ~+15% (peak ~19 UT = 15 local).
        utc_peak = 19.0

        def diurnal(h, amp):
            return amp * np.cos(two_pi * (h - utc_peak) / 24.0)

        return {
            "TQI": lambda m, h, p: _lognormal_q(p, 0.001, 1.0),
            "TQL": lambda m, h, p: _lognormal_q(p, 0.003, 1.0),
            "TQV": lambda m, h, p: _lognormal_q(
                p,
                1.10 * np.exp(0.65 * np.cos(two_pi * m / 12.0))
                * (1.0 + 0.15 * np.cos(two_pi * (h - utc_peak) / 24.0)),
                0.55,
            ),
            "QV10M": lambda m, h, p: _lognormal_q(
                p, 2.0e-3 * np.exp(0.5 * np.cos(two_pi * m / 12.0)), 0.6
            ),
            "PS": lambda m, h, p: _normal_q(
                p, 55600.0 + season(m, 120.0), 230.0
            ),
            "TS": lambda m, h, p: _normal_q(
                p, 271.5 + season(m, 3.5) + diurnal(h, 6.0), 3.0
            ),
            "T10M": lambda m, h, p: _normal_q(
                p, 271.0 + season(m, 3.5) + diurnal(h, 4.5), 2.8
            ),
            "U10M": lambda m, h, p: _normal_q(
                p, 4.0 + diurnal(h, 2.5) - season(m, 1.0), 3.0
            ),
            "V10M": lambda m, h, p: _normal_q(p, -0.5, 2.5),
        }
    if name == "south_pole":
        # Amundsen-Scott (2835 m): PWV median ~0.32 mm (~0.18 winter,
        # ~0.46 summer); strong seasonal temperature cycle (-28 C summer,
        # -60 C winter), essentially no diurnal cycle (polar day/night).
        return {
            "TQI": lambda m, h, p: _lognormal_q(p, 0.0005, 1.0),
            "TQL": lambda m, h, p: _lognormal_q(p, 0.0005, 1.0),
            "TQV": lambda m, h, p: _lognormal_q(
                p, 0.32 * np.exp(0.45 * np.cos(two_pi * m / 12.0)), 0.35
            ),
            "QV10M": lambda m, h, p: _lognormal_q(
                p, 2.5e-4 * np.exp(0.8 * np.cos(two_pi * m / 12.0)), 0.5
            ),
            "PS": lambda m, h, p: _normal_q(
                p, 68100.0 + season(m, 600.0), 900.0
            ),
            "TS": lambda m, h, p: _normal_q(
                p, 229.0 + season(m, 17.0), 5.5
            ),
            "T10M": lambda m, h, p: _normal_q(
                p, 230.0 + season(m, 16.0), 5.0
            ),
            "U10M": lambda m, h, p: _normal_q(p, 4.5, 2.5),
            "V10M": lambda m, h, p: _normal_q(p, 3.0, 2.0),
        }
    # generic mid-latitude high site
    return {
        "TQI": lambda m, h, p: _lognormal_q(p, 0.002, 1.0),
        "TQL": lambda m, h, p: _lognormal_q(p, 0.005, 1.0),
        "TQV": lambda m, h, p: _lognormal_q(
            p, 2.0 * np.exp(0.5 * np.cos(two_pi * m / 12.0)), 0.6
        ),
        "QV10M": lambda m, h, p: _lognormal_q(p, 3.0e-3, 0.6),
        "PS": lambda m, h, p: _normal_q(p, 70000.0, 800.0),
        "TS": lambda m, h, p: _normal_q(
            p,
            276.0
            + season(m, 6.0)
            + 4.0 * np.cos(two_pi * (h - 19.0) / 24.0),
            5.0,
        ),
        "T10M": lambda m, h, p: _normal_q(
            p,
            275.0
            + season(m, 6.0)
            + 3.0 * np.cos(two_pi * (h - 19.0) / 24.0),
            5.0,
        ),
        "U10M": lambda m, h, p: _normal_q(p, 3.0, 2.5),
        "V10M": lambda m, h, p: _normal_q(p, 2.0, 2.5),
    }


_TABLE_CACHE = {}


def build_site_tables(name):
    """Synthesize a reference-structured weather table for a site.

    Returns the same nested dict :func:`read_weather` produces from the
    reference's HDF5 files: ``table[month]["prob"]`` (the probability
    grid) and ``table[month]["data"][var]`` of shape (24, NSTEP) — one
    inverse-CDF quantile row per UTC hour.
    """
    if name in _TABLE_CACHE:
        return _TABLE_CACHE[name]
    builders = _site_builders(name)
    prob = np.linspace(_PROBSTRT, _PROBSTOP, _NSTEP)
    table = OrderedDict()
    for m in range(12):
        month_data = OrderedDict()
        month_data["PROBSTRT"] = _PROBSTRT
        month_data["PROBSTOP"] = _PROBSTOP
        month_data["NSTEP"] = _NSTEP
        month_data["prob"] = prob.copy()
        data = OrderedDict()
        for var in _VARS:
            rows = np.empty((24, _NSTEP), dtype=np.float64)
            for h in range(24):
                q = np.asarray(builders[var](m, h, prob), dtype=np.float64)
                # quantile rows must be monotone for np.interp
                rows[h] = np.maximum.accumulate(q)
            data[var] = rows
        month_data["data"] = data
        table[m] = month_data
    _TABLE_CACHE[name] = table
    return table


def read_weather(file):
    """Load a weather table in the reference's HDF5 format
    (``ref:src/toast/weather.py:300-351``)."""
    import h5py

    with open(file, "rb") as pf:
        with h5py.File(pf, "r") as hf:
            result = OrderedDict()
            for mn in range(12):
                month_data = OrderedDict()
                month = f"month_{mn:02d}"
                for k, v in hf[month].attrs.items():
                    month_data[k] = v
                month_data["prob"] = np.linspace(
                    month_data["PROBSTRT"],
                    month_data["PROBSTOP"],
                    int(month_data["NSTEP"]),
                )
                month_data["data"] = OrderedDict(
                    (dname, np.array(dat)) for dname, dat in hf[month].items()
                )
                result[mn] = month_data
    return result


class SimWeather(Weather):
    """Simulated weather from month x hour quantile tables.

    Mirrors the reference ``SimWeather`` (``ref:src/toast/weather.py:385``):
    every variable is drawn by inverse-CDF sampling of the site's
    month/hour quantile row, with the uniform deviate keyed by
    ``(site_uid, realization)`` and counters ``(variable index,
    hour-of-era)`` so draws are reproducible and time-correlated draws
    of the same observation agree across operators.

    ``time`` accepts a UTC ``datetime`` or a POSIX timestamp float.
    ``file`` loads a reference-format HDF5 table instead of the
    synthesized climatology.
    """

    def __init__(
        self,
        time=None,
        name="default",
        file=None,
        site_uid=None,
        realization=0,
        max_pwv=None,
        median_weather=False,
    ):
        super().__init__(time=time)
        if file is not None:
            self._data = read_weather(file)
            self.name = str(file)
        else:
            self.name = name if name in ("atacama", "south_pole") else "default"
            self._data = build_site_tables(self.name)
        self.site_uid = site_uid if site_uid is not None else name_UID(self.name)
        self.realization = int(realization)
        self.median_weather = bool(median_weather)
        self._max_pwv = max_pwv
        if max_pwv is not None:
            self._truncate_distributions(
                "TQV",
                max_pwv.to_value(u.mm)
                if isinstance(max_pwv, Quantity)
                else float(max_pwv),
            )
        self._varindex = {v: i for i, v in enumerate(self._data[0]["data"])}
        self.set(time=time)

    @property
    def max_pwv(self):
        return self._max_pwv

    def _truncate_distributions(self, name, max_value):
        """Clip a variable's quantile rows at ``max_value`` by probability
        renormalization (ref ``weather.py:446-457``)."""
        for month in range(12):
            prob = self._data[month]["prob"]
            for hour in range(24):
                cdf = self._data[month]["data"][name][hour]
                ind = cdf <= max_value
                if np.sum(ind) < 2:
                    raise RuntimeError(
                        f"Cannot truncate {name} to <= {max_value}"
                    )
                self._data[month]["data"][name][hour] = np.interp(
                    prob, prob[ind] / np.amax(prob[ind]), cdf[ind]
                )

    def set(self, time=None, realization=None, site_uid=None):
        """(Re-)set the draw epoch and redraw every variable."""
        if time is not None:
            self.time = time
            if isinstance(time, datetime.datetime):
                dt = time
            else:
                dt = datetime.datetime.fromtimestamp(
                    float(time or 0.0), tz=datetime.timezone.utc
                )
            self._date = dt
            self._doy = dt.timetuple().tm_yday
            self._year = dt.year
            self._hour = dt.hour
            # month definition used by the tables (ref weather.py:478)
            self._month = min(11, int((self._doy - 1) // 30.5))
        if realization is not None:
            self.realization = int(realization)
        if site_uid is not None:
            self.site_uid = site_uid
        self._draw_values()

    def _draw(self, name):
        counter1 = self._varindex[name]
        counter2 = (self._year * 366 + self._doy) * 24 + self._hour
        if self.median_weather:
            x = 0.5
        else:
            x = float(
                toast_rng.random(
                    1,
                    sampler="uniform_01",
                    key=(
                        int(self.site_uid) & 0xFFFFFFFFFFFFFFFF,
                        int(self.realization),
                    ),
                    counter=(counter1, counter2),
                )[0]
            )
        prob = self._data[self._month]["prob"]
        cdf = self._data[self._month]["data"][name][self._hour]
        return float(np.interp(x, prob, cdf))

    def _draw_values(self):
        self._ice_water = Quantity(self._draw("TQI"), u.mm)
        self._liquid_water = Quantity(self._draw("TQL"), u.mm)
        self._pwv = Quantity(self._draw("TQV"), u.mm)
        self._humidity = float(self._draw("QV10M"))
        self._surface_pressure = Quantity(
            self._draw("PS"), u.kg / (u.meter * u.s**2)
        )
        self._surface_temperature = Quantity(self._draw("TS"), u.K)
        self._air_temperature = Quantity(self._draw("T10M"), u.K)
        self._west_wind = Quantity(self._draw("U10M"), u.meter / u.s)
        self._south_wind = Quantity(self._draw("V10M"), u.meter / u.s)

    def __eq__(self, other):
        return (
            isinstance(other, SimWeather)
            and self.name == other.name
            and self._year == other._year
            and self._month == other._month
            and self._hour == other._hour
            and self.site_uid == other.site_uid
            and self.realization == other.realization
            and self.median_weather == other.median_weather
        )

    def __repr__(self):
        return (
            f"<SimWeather '{self.name}' month={self._month} "
            f"hour={self._hour} uid={self.site_uid} "
            f"realization={self.realization} pwv={self.pwv}>"
        )
