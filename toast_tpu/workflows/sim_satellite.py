"""Satellite simulation + reduction workflow.

Rebuild of ``workflows/toast_sim_satellite.py``: configure operators from
defaults/config files/CLI, simulate observing + signal + noise, then reduce
with the destriping map-maker.

Run with ``python -m toast_tpu.workflows.sim_satellite --help``.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import toast_tpu
from toast_tpu import ops
from toast_tpu.config import parse_config
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
from toast_tpu.utils import GlobalTimers, Logger, Timer, dump, gather_timers, jax_profile
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity


def load_instrument_and_schedule(args, comm):
    """Focalplane + schedule from files, or synthetic fallbacks."""
    import h5py

    if args.focalplane is not None:
        with h5py.File(args.focalplane, "r") as f:
            from toast_tpu.models import Focalplane

            focalplane = Focalplane.load_hdf5(f)
    else:
        focalplane = fake_hexagon_focalplane(
            n_pix=args.n_pix,
            sample_rate=Quantity(args.sample_rate, u.Hz),
            psd_fknee=Quantity(0.05, u.Hz),
        )
    if args.schedule is not None:
        schedule = SatelliteSchedule.read(args.schedule)
    else:
        schedule = create_satellite_schedule(
            prefix="sim_",
            observation_time=Quantity(args.obs_minutes, u.minute),
            num_observations=args.n_obs,
            prec_period=Quantity(50.0, u.minute),
            spin_period=Quantity(10.0, u.minute),
        )
    telescope = Telescope(
        "satellite", focalplane=focalplane, site=SpaceSite("space")
    )
    return telescope, schedule


def simulate_data(job, args, data):
    log = Logger.get()
    timer = Timer()
    timer.start()
    ops_ns = job.operators

    ops_ns.sim_satellite.apply(data)
    log.info_rank("Simulated telescope pointing", timer=timer)
    ops_ns.default_model.apply(data)
    if args.input_map is not None:
        ops_ns.scan_map.file = args.input_map
        ops_ns.scan_map.apply(data)
        log.info_rank("Scanned input map", timer=timer)
    ops_ns.sim_noise.apply(data)
    log.info_rank("Simulated noise", timer=timer)
    if ops_ns.convolve_time_constant.enabled:
        ops_ns.convolve_time_constant.apply(data)
        log.info_rank("Convolved time constant", timer=timer)
    return


def reduce_data(job, args, data):
    log = Logger.get()
    timer = Timer()
    timer.start()
    ops_ns = job.operators
    if ops_ns.deconvolve_time_constant.enabled:
        ops_ns.deconvolve_time_constant.apply(data)
        log.info_rank("Deconvolved time constant", timer=timer)
    ops_ns.mapmaker.binning = ops_ns.binner
    ops_ns.mapmaker.template_matrix = ops.TemplateMatrix(
        templates=[job.templates.baselines]
    )
    ops_ns.mapmaker.output_dir = args.out_dir
    if ops_ns.madam.enabled:
        # parameter-translation bridge onto the native destriper
        ops_ns.madam.params = ops.madam_params_from_mapmaker(ops_ns.mapmaker)
        ops_ns.madam.pixel_pointing = ops_ns.pixels
        ops_ns.madam.stokes_weights = ops_ns.weights
        ops_ns.madam.apply(data)
        log.info_rank("Madam-bridge map-making complete", timer=timer)
    else:
        with jax_profile():  # captures an XLA trace when TOAST_JAX_TRACE is set
            ops_ns.mapmaker.apply(data)
        log.info_rank("Map-making complete", timer=timer)


def main(opts=None):
    log = Logger.get()
    gt = GlobalTimers.get()
    gt.start("toast_sim_satellite (total)")

    # operator instances whose traits become CLI options
    operators = [
        ops.SimSatellite(name="sim_satellite"),
        ops.DefaultNoiseModel(name="default_model"),
        ops.ScanHealpixMap(name="scan_map"),
        ops.SimNoise(name="sim_noise"),
        ops.TimeConstant(name="convolve_time_constant", enabled=False),
        ops.TimeConstant(
            name="deconvolve_time_constant", deconvolve=True, enabled=False
        ),
        ops.PointingDetectorSimple(name="det_pointing"),
        ops.PixelsHealpix(name="pixels", nside=64),
        ops.StokesWeights(name="weights", mode="IQU"),
        ops.BinMap(name="binner"),
        ops.MapMaker(name="mapmaker"),
        ops.Madam(name="madam", enabled=False),
        ops.SaveHDF5(name="save_hdf5", enabled=False),
        ops.MemoryCounter(name="mem_count"),
    ]
    templates = [Offset(name="baselines", step_time=Quantity(60.0, u.second))]

    parser = argparse.ArgumentParser(description="Satellite simulation pipeline")
    parser.add_argument("--focalplane", default=None, help="Focalplane HDF5 file")
    parser.add_argument("--schedule", default=None, help="Schedule file")
    parser.add_argument("--input_map", default=None, help="Sky map to scan")
    parser.add_argument("--out_dir", default="toast_sim_satellite_out")
    parser.add_argument("--n_pix", type=int, default=7)
    parser.add_argument("--n_obs", type=int, default=2)
    parser.add_argument("--obs_minutes", type=float, default=30.0)
    parser.add_argument("--sample_rate", type=float, default=10.0)
    config, args, jobargs = parse_config(
        parser, operators=operators, templates=templates, opts=opts
    )

    import types

    from toast_tpu.config import create_from_config

    job = create_from_config(config)
    comm = Comm()
    telescope, schedule = load_instrument_and_schedule(args, comm)
    job.operators.sim_satellite.telescope = telescope
    job.operators.sim_satellite.schedule = schedule
    job.operators.det_pointing.boresight = "boresight_radec"
    job.operators.pixels.detector_pointing = job.operators.det_pointing
    job.operators.weights.detector_pointing = job.operators.det_pointing
    job.operators.binner.pixel_pointing = job.operators.pixels
    job.operators.binner.stokes_weights = job.operators.weights
    job.operators.scan_map.pixel_pointing = job.operators.pixels
    job.operators.scan_map.stokes_weights = job.operators.weights

    data = Data(comm)
    simulate_data(job, args, data)
    if job.operators.save_hdf5.enabled:
        job.operators.save_hdf5.volume = f"{args.out_dir}/data"
        job.operators.save_hdf5.apply(data)
    reduce_data(job, args, data)

    gt.stop_all()
    results = gather_timers()
    if args.out_dir is not None:
        import os

        os.makedirs(args.out_dir, exist_ok=True)
        dump(results, f"{args.out_dir}/timing")
    log.info("Workflow completed")
    return data


if __name__ == "__main__":
    main()
