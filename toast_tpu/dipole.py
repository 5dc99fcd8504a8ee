"""CMB dipole math (rebuild of ``src/toast/dipole.py``)."""

from .ops.sim_sky import SOLAR_SPEED_MS, T_CMB_K, dipole_tod, _solar_velocity_equ

solar_velocity_equatorial = _solar_velocity_equ
dipole = dipole_tod
