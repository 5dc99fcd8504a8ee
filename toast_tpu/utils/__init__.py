"""Utility layer: units, logging, timing, environment, misc helpers."""

from . import units
from .environment import Environment
from .logging import Logger
from .misc import (
    SetDict,
    import_from_name,
    memreport,
    name_UID,
    object_fullname,
    rate_from_times,
)
from .timing import jax_profile, GlobalTimers, Timer, dump, function_timer, gather_timers
from .units import Quantity, Unit, quantity_from_string, unit_from_string
