"""Test fixtures mirroring the reference helpers (``tests/helpers/``):
synthetic telescopes, satellite data, and exact-hit pixelization."""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np

from toast_tpu.models import (
    Data,
    Observation,
    Session,
    SpaceSite,
    Telescope,
    create_satellite_schedule,
    fake_hexagon_focalplane,
)
from toast_tpu.parallel import Comm
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity


def create_space_telescope(n_pix=1, sample_rate=Quantity(10.0, u.Hz)):
    fp = fake_hexagon_focalplane(
        n_pix=n_pix,
        sample_rate=sample_rate,
        psd_net=Quantity(0.05, u.K_sqrt_s),
        psd_fmin=Quantity(1.0e-5, u.Hz),
        psd_fknee=Quantity(sample_rate.to_value(u.Hz) / 2000.0, u.Hz),
        psd_alpha=1.0,
    )
    return Telescope("test_space", focalplane=fp, site=SpaceSite("L2"))


def create_satellite_data(
    n_pix=1,
    sample_rate=Quantity(10.0, u.Hz),
    obs_time=Quantity(10.0, u.minute),
    n_observation=1,
    hwp_rpm=None,
):
    """Satellite Data with boresight/noise-model populated via SimSatellite."""
    from toast_tpu import ops

    comm = Comm()
    data = Data(comm)
    tele = create_space_telescope(n_pix=n_pix, sample_rate=sample_rate)
    schedule = create_satellite_schedule(
        prefix="test_",
        mission_start=datetime(2023, 2, 23, tzinfo=timezone.utc),
        observation_time=obs_time,
        gap_time=Quantity(0.0, u.minute),
        num_observations=n_observation,
        prec_period=Quantity(10.0, u.minute),
        spin_period=Quantity(2.0, u.minute),
    )
    sim = ops.SimSatellite(
        name="sim_satellite",
        telescope=tele,
        schedule=schedule,
        hwp_angle="hwp_angle" if hwp_rpm else None,
        hwp_rpm=Quantity(float(hwp_rpm), u.dimensionless) if hwp_rpm else None,
    )
    sim.apply(data)
    return data
