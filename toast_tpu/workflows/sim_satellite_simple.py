"""Minimal fully-inline satellite simulation + map-making example.

Rebuild of ``workflows/toast_sim_satellite_simple.py:1-137``: every
operator is specified directly in the script (no config files / CLI trait
options) — the starting point for interactively hacking on a use case.
Only the focalplane and schedule come from files; synthetic fallbacks are
generated when they are omitted (a convenience the reference script lacks,
since it ships separate generator CLIs).
"""

from __future__ import annotations

import argparse
import os

import toast_tpu
from toast_tpu import ops
from toast_tpu.models import (
    Data,
    SatelliteSchedule,
    SpaceSite,
    Telescope,
    create_satellite_schedule,
    fake_hexagon_focalplane,
)
from toast_tpu.parallel import Comm
from toast_tpu.templates import Offset
from toast_tpu.utils import Logger
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity


def main(opts=None):
    log = Logger.get()
    parser = argparse.ArgumentParser(
        description="Simple satellite simulation example"
    )
    parser.add_argument("--focalplane", default=None, help="Focalplane HDF5 file")
    parser.add_argument("--schedule", default=None, help="Observing schedule file")
    parser.add_argument("--out_dir", default="toast_tpu_sim_satellite_simple")
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
        schedule = SatelliteSchedule.read(args.schedule)
    else:
        schedule = create_satellite_schedule(
            prefix="sim_",
            observation_time=Quantity(10.0, u.minute),
            num_observations=2,
            prec_period=Quantity(50.0, u.minute),
            spin_period=Quantity(10.0, u.minute),
        )

    site = SpaceSite(getattr(schedule, "site_name", "space") or "space")
    telescope = Telescope(
        getattr(schedule, "telescope_name", "satellite") or "satellite",
        focalplane=focalplane,
        site=site,
    )

    data = Data(Comm())

    # --- Simulate -----------------------------------------------------
    sim_satellite = ops.SimSatellite(telescope=telescope, schedule=schedule)
    sim_satellite.apply(data)

    default_model = ops.DefaultNoiseModel()
    default_model.apply(data)

    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(
        nside=512, detector_pointing=det_pointing, create_dist="pixel_dist"
    )
    weights = ops.StokesWeights(mode="IQU", detector_pointing=det_pointing)

    sim_noise = ops.SimNoise(noise_model=default_model.noise_model)
    sim_noise.apply(data)

    # --- Reduce -------------------------------------------------------
    binner = ops.BinMap(
        pixel_dist="pixel_dist",
        pixel_pointing=pixels,
        stokes_weights=weights,
        noise_model=default_model.noise_model,
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
