"""Minimal fully-inline ground simulation + map-making example.

Rebuild of ``workflows/toast_sim_ground_simple.py:1-197``: telescope
pointing from a ground schedule, elevation-weighted noise, atmosphere,
and a destriped map — all operators specified inline.  Synthetic
focalplane/schedule fallbacks are generated when files are omitted.
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime, timedelta, timezone

import toast_tpu
from toast_tpu import ops
from toast_tpu.models import (
    Data,
    GroundSchedule,
    GroundSite,
    Telescope,
    fake_hexagon_focalplane,
)
from toast_tpu.parallel import Comm
from toast_tpu.templates import Offset
from toast_tpu.utils import Logger
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity


def _fallback_schedule():
    from toast_tpu.schedule_sim_ground import Patch, build_schedule

    start = datetime(2027, 3, 1, tzinfo=timezone.utc)
    return build_schedule(
        patches=[
            Patch("patch", 1.0, [(40, -50), (60, -50), (60, -30), (40, -30)])
        ],
        start=start,
        stop=start + timedelta(hours=2),
    )


def main(opts=None):
    log = Logger.get()
    parser = argparse.ArgumentParser(
        description="Simple ground simulation example"
    )
    parser.add_argument("--focalplane", default=None, help="Focalplane HDF5 file")
    parser.add_argument("--schedule", default=None, help="Ground schedule file")
    parser.add_argument(
        "--weather", default=None, help="Weather site name (default: schedule site)"
    )
    parser.add_argument("--out_dir", default="toast_tpu_sim_ground_simple")
    args = parser.parse_args(opts)

    os.makedirs(args.out_dir, exist_ok=True)

    if args.focalplane is not None:
        import h5py

        from toast_tpu.models import Focalplane

        with h5py.File(args.focalplane, "r") as f:
            focalplane = Focalplane.load_hdf5(f)
    else:
        focalplane = fake_hexagon_focalplane(
            n_pix=7, sample_rate=Quantity(10.0, u.Hz)
        )

    if args.schedule is not None:
        schedule = GroundSchedule.read(args.schedule)
    else:
        schedule = _fallback_schedule()

    site = GroundSite(
        getattr(schedule, "site_name", "atacama") or "atacama",
        lat=Quantity(-22.96, u.deg),
        lon=Quantity(-67.79, u.deg),
        alt=Quantity(5200.0, u.meter),
    )
    telescope = Telescope(
        getattr(schedule, "telescope_name", "ground") or "ground",
        focalplane=focalplane,
        site=site,
    )

    weather = args.weather
    if weather is None:
        weather = (getattr(schedule, "site_name", None) or "atacama").lower()

    data = Data(Comm())

    # --- Simulate -----------------------------------------------------
    sim_ground = ops.SimGround(
        telescope=telescope, schedule=schedule, weather=weather
    )
    sim_ground.apply(data)

    default_model = ops.DefaultNoiseModel()
    default_model.apply(data)

    det_pointing_azel = ops.PointingDetectorSimple(
        boresight="boresight_azel", quats="quats_azel"
    )
    det_pointing_radec = ops.PointingDetectorSimple(
        boresight="boresight_radec", quats="quats_radec"
    )

    elevation_model = ops.ElevationNoise(
        noise_model=default_model.noise_model,
        out_model="el_weighted_model",
        detector_pointing=det_pointing_azel,
    )
    elevation_model.apply(data)

    pixel_pointing = ops.PixelsHealpix(
        nside=256, detector_pointing=det_pointing_radec, create_dist="pixel_dist"
    )
    weights = ops.StokesWeights(mode="IQU", detector_pointing=det_pointing_radec)

    sim_noise = ops.SimNoise(noise_model=elevation_model.out_model)
    sim_noise.apply(data)

    sim_atm = ops.SimAtmosphere(detector_pointing=det_pointing_azel)
    sim_atm.apply(data)

    # --- Reduce -------------------------------------------------------
    binner = ops.BinMap(
        pixel_dist="pixel_dist",
        pixel_pointing=pixel_pointing,
        stokes_weights=weights,
        noise_model=elevation_model.out_model,
    )
    template_matrix = ops.TemplateMatrix(templates=[Offset()])
    mapmaker = ops.MapMaker(
        name="mapmaker",
        det_data=sim_noise.det_data,
        binning=binner,
        template_matrix=template_matrix,
        output_dir=args.out_dir,
    )
    mapmaker.apply(data)
    log.info(f"Wrote map products to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
