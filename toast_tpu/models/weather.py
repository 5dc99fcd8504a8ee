"""Atmospheric weather model.

Rebuild of ``src/toast/weather.py`` (``Weather:20``, ``SimWeather:385``).
The reference samples monthly distributions from bundled MERRA-2 HDF5
tables; those data files are not redistributable here, so ``SimWeather``
draws from parametric (lognormal / gaussian) distributions fit to typical
site conditions (Atacama, South Pole), seeded by the counter-based RNG so
realizations are reproducible.
"""

from __future__ import annotations

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


# (median, sigma) parametric site climatologies
_SITE_PARAMS = {
    "atacama": {
        "pwv_mm": (1.0, 0.8),  # lognormal-ish
        "air_temp_K": (270.0, 5.0),
        "pressure_pa": (55000.0, 500.0),
        "humidity": (0.2, 0.1),
        "west_wind_ms": (3.0, 2.0),
        "south_wind_ms": (1.0, 2.0),
    },
    "south_pole": {
        "pwv_mm": (0.3, 0.2),
        "air_temp_K": (230.0, 10.0),
        "pressure_pa": (68000.0, 600.0),
        "humidity": (0.1, 0.05),
        "west_wind_ms": (4.0, 2.0),
        "south_wind_ms": (2.0, 2.0),
    },
    "default": {
        "pwv_mm": (2.0, 1.5),
        "air_temp_K": (275.0, 8.0),
        "pressure_pa": (70000.0, 800.0),
        "humidity": (0.3, 0.15),
        "west_wind_ms": (3.0, 2.0),
        "south_wind_ms": (2.0, 2.0),
    },
}


class SimWeather(Weather):
    """Reproducible synthetic weather draws for a site."""

    def __init__(self, time=None, name="default", site_uid=None, realization=0,
                 max_pwv=None, median_weather=False):
        super().__init__(time=time)
        self.name = name if name in _SITE_PARAMS else "default"
        self.site_uid = site_uid if site_uid is not None else name_UID(name)
        self.realization = realization
        params = _SITE_PARAMS[self.name]

        counter = int(time if isinstance(time, (int, float)) else 0) & 0xFFFFFFFF
        draws = toast_rng.random(
            8,
            key=(int(self.site_uid) & 0xFFFFFFFFFFFFFFFF, int(self.realization)),
            counter=(0, counter),
            sampler="gaussian",
        )
        if median_weather:
            draws = np.zeros(8)

        # Seasonal + diurnal modulation of the climatology medians: the
        # reference samples month/hour-specific MERRA-2 distributions
        # (ref weather.py:385); here the monthly and diurnal cycles are
        # parametric.  Southern-hemisphere sites (all bundled ones) are
        # driest in austral winter (Jul) and coldest then; the diurnal
        # temperature peak is mid-afternoon local time.
        from datetime import datetime, timezone

        tval = time if isinstance(time, (int, float)) else 0.0
        dt = datetime.fromtimestamp(float(tval or 0.0), tz=timezone.utc)
        month_phase = 2.0 * np.pi * (dt.month - 1 + dt.day / 30.0) / 12.0
        hour_phase = 2.0 * np.pi * (dt.hour + dt.minute / 60.0) / 24.0
        # Jul (month 7) minimum: cos peaks at Jan -> multiply pwv by
        # (1 + 0.4 cos) gives max in Jan (austral summer, wettest)
        season_wet = 1.0 + 0.4 * np.cos(month_phase)
        season_temp = 4.0 * np.cos(month_phase)  # Kelvin swing
        diurnal_temp = 3.0 * np.cos(hour_phase - 2.0 * np.pi * 18.0 / 24.0)
        params = dict(params)
        pmed, psig = params["pwv_mm"]
        params["pwv_mm"] = (pmed * season_wet, psig)
        tmed, tsig = params["air_temp_K"]
        params["air_temp_K"] = (tmed + season_temp + diurnal_temp, tsig)

        def draw(i, med, sig, positive=True, lognormal=False):
            if lognormal:
                val = med * np.exp(0.5 * draws[i] * sig / med)
            else:
                val = med + draws[i] * sig
            if positive:
                val = abs(val)
            return val

        pwv = draw(0, *params["pwv_mm"], lognormal=True)
        if max_pwv is not None:
            pwv = min(pwv, max_pwv.to_value(u.mm) if isinstance(max_pwv, Quantity) else max_pwv)
        self._pwv = Quantity(pwv, u.mm)
        self._air_temperature = Quantity(draw(1, *params["air_temp_K"]), u.K)
        self._surface_temperature = Quantity(draw(2, *params["air_temp_K"]), u.K)
        self._surface_pressure = Quantity(
            draw(3, *params["pressure_pa"]), u.kg / (u.meter * u.s**2)
        )
        self._humidity = float(np.clip(draw(4, *params["humidity"]), 0.0, 1.0))
        self._west_wind = Quantity(draw(5, *params["west_wind_ms"], positive=False), u.meter / u.s)
        self._south_wind = Quantity(draw(6, *params["south_wind_ms"], positive=False), u.meter / u.s)
        self._ice_water = Quantity(0.0, u.mm)
        self._liquid_water = Quantity(abs(draws[7]) * 0.01, u.mm)
