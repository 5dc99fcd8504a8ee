"""Data model layer: observations, instrument, noise, schedules, intervals."""

from .data import Data
from .defaults import default_values, set_default_values
from .instrument import (
    Bandpass,
    Focalplane,
    GroundSite,
    Session,
    Site,
    SpaceSite,
    Telescope,
)
from .instrument_sim import (
    fake_boresight_focalplane,
    fake_hexagon_focalplane,
    fake_rhombihex_focalplane,
)
from .intervals import IntervalList, interval_dtype
from .noise import AnalyticNoise, Noise
from .observation import Observation
from .observation_data import (
    DetDataManager,
    DetectorData,
    IntervalsManager,
    SharedDataManager,
)
from .schedule import (
    GroundScan,
    GroundSchedule,
    SatelliteScan,
    SatelliteSchedule,
    Schedule,
    create_satellite_schedule,
)
