"""Ground simulation + reduction workflow.

Rebuild of ``ref:workflows/toast_sim_ground.py`` (1017 LoC) with the full
operator roster: simulate ground observing (CES scans, elevation-scaled
noise, atmosphere, scan-synchronous signal, catalogs, systematics), apply
TOD flagging and filters, and reduce with the destriping map-maker,
filter-and-bin, cross-linking and cadence maps.  Every operator is
configurable from TOML/CLI via the trait system; most systematics default
to disabled, mirroring the reference workflow's switches.

Run with ``python -m toast_tpu.workflows.sim_ground --help``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from toast_tpu import ops
from toast_tpu.config import parse_config
from toast_tpu.models import (
    Data,
    GroundSchedule,
    GroundSite,
    Telescope,
    fake_hexagon_focalplane,
)
from toast_tpu.parallel import Comm
from toast_tpu.schedule_sim_ground import Patch, build_schedule
from toast_tpu.templates import Offset
from toast_tpu.utils import (
    GlobalTimers,
    Logger,
    Timer,
    dump,
    gather_timers,
    jax_profile,
)
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity


def load_instrument_and_schedule(args, comm):
    import h5py

    if args.focalplane is not None:
        with h5py.File(args.focalplane, "r") as f:
            from toast_tpu.models import Focalplane

            focalplane = Focalplane.load_hdf5(f)
    else:
        focalplane = fake_hexagon_focalplane(
            n_pix=args.n_pix,
            sample_rate=Quantity(args.sample_rate, u.Hz),
            psd_fknee=Quantity(0.1, u.Hz),
        )
    site = GroundSite(
        "atacama",
        Quantity(-22.958, u.deg),
        Quantity(-67.786, u.deg),
        Quantity(5200.0, u.meter),
    )
    if args.schedule is not None:
        schedule = GroundSchedule.read(args.schedule)
    else:
        from datetime import datetime, timedelta, timezone

        from toast_tpu.math import coordinates as coords

        start = datetime(2023, 6, 15, tzinfo=timezone.utc)
        # default patch: centered on the meridian at the start time so it is
        # immediately visible
        lst_deg = np.degrees(
            coords.gmst_rad(np.array([start.timestamp()]))[0]
        ) + site.lon.to_value(u.deg)
        ra0 = lst_deg % 360.0
        patches = [
            Patch(
                "patch0",
                1.0,
                [
                    (ra0 - 10, 20.0),
                    (ra0 + 10, 20.0),
                    (ra0 + 10, 10.0),
                    (ra0 - 10, 10.0),
                ],
            )
        ]
        schedule = build_schedule(
            telescope_name="ground",
            site_name=site.name,
            site_lat=site.lat,
            site_lon=site.lon,
            site_alt=site.alt,
            start=start,
            stop=start + timedelta(hours=args.hours),
            patches=patches,
            ces_max_time=Quantity(args.ces_minutes, u.minute),
        )
    telescope = Telescope("ground", focalplane=focalplane, site=site)
    return telescope, schedule


def simulate_data(job, args, data):
    """Simulation phase (ref toast_sim_ground.py simulate_data)."""
    log = Logger.get()
    o = job.operators
    timer = Timer()
    timer.start()

    o.sim_ground.apply(data)
    log.info_rank("Simulated ground observing", timer=timer)
    o.default_model.apply(data)
    o.elevation_model.apply(data)

    if o.sim_atmosphere.enabled:
        o.sim_atmosphere.apply(data)
        log.info_rank("Simulated atmosphere", timer=timer)
    if o.sim_sss.enabled:
        o.sim_sss.apply(data)
        log.info_rank("Simulated scan-synchronous signal", timer=timer)
    if o.sim_catalog.enabled:
        o.sim_catalog.apply(data)
        log.info_rank("Simulated point-source catalog", timer=timer)
    if args.input_map is not None:
        o.scan_map.file = args.input_map
        o.scan_map.apply(data)
        log.info_rank("Scanned input sky", timer=timer)
    if o.scan_mask.enabled and o.scan_mask.file is not None:
        o.scan_mask.apply(data)

    o.sim_noise.apply(data)
    log.info_rank("Simulated noise", timer=timer)

    # instrument systematics
    if o.gain_scrambler.enabled:
        o.gain_scrambler.apply(data)
    if o.time_constant.enabled:
        o.time_constant.apply(data)
    if o.yield_cut.enabled:
        o.yield_cut.apply(data)

    # flagging
    if o.flag_sso.enabled:
        o.flag_sso.apply(data)
    if o.statistics_raw.enabled:
        o.statistics_raw.apply(data)
    return data


def reduce_data(job, args, data):
    """Reduction phase (ref toast_sim_ground.py reduce_data)."""
    log = Logger.get()
    o = job.operators
    timer = Timer()
    timer.start()

    if o.deconvolve_time_constant.enabled:
        o.deconvolve_time_constant.apply(data)

    # TOD filters
    if o.polyfilter.enabled:
        o.polyfilter.apply(data)
        log.info_rank("Poly-filtered", timer=timer)
    if o.polyfilter2d.enabled:
        o.polyfilter2d.apply(data)
    if o.common_mode_filter.enabled:
        o.common_mode_filter.apply(data)
    if o.groundfilter.enabled:
        o.groundfilter.apply(data)
        log.info_rank("Ground-filtered", timer=timer)
    if o.hwpfilter.enabled:
        o.hwpfilter.apply(data)
    if o.statistics_filtered.enabled:
        o.statistics_filtered.apply(data)

    # HWP lock-in demodulation: replaces the data set with demodulated
    # I/Q/U streams; downstream binning switches to the demod weights
    if o.demodulate.enabled:
        o.demodulate.stokes_weights = o.weights
        o.demodulate.apply(data)
        data = o.demodulate.demod_data
        o.binner.stokes_weights = o.weights_demod
        log.info_rank("Demodulated", timer=timer)

    # map products
    if o.crosslinking.enabled:
        o.crosslinking.pixel_pointing = o.pixels
        o.crosslinking.output_dir = args.out_dir
        o.crosslinking.apply(data)
    if o.cadence_map.enabled:
        o.cadence_map.pixel_pointing = o.pixels
        o.cadence_map.output_dir = args.out_dir
        o.cadence_map.apply(data)

    if o.mapmaker.enabled:
        o.mapmaker.binning = o.binner
        o.mapmaker.template_matrix = ops.TemplateMatrix(
            templates=[job.templates.baselines]
        )
        o.mapmaker.output_dir = args.out_dir
        with jax_profile():  # XLA trace when TOAST_JAX_TRACE is set
            o.mapmaker.apply(data)
        log.info_rank("Map-making complete", timer=timer)

    if o.filterbin.enabled:
        o.filterbin.binning = o.binner
        o.filterbin.output_dir = args.out_dir
        o.filterbin.apply(data)
        log.info_rank("Filter/bin complete", timer=timer)

    if o.noise_estim.enabled:
        o.noise_estim.output_dir = args.out_dir
        o.noise_estim.apply(data)

    if o.mem_count.enabled:
        o.mem_count.apply(data)
    if o.save_hdf5.enabled:
        o.save_hdf5.volume = os.path.join(args.out_dir, "data")
        o.save_hdf5.apply(data)
    return data


def main(opts=None):
    log = Logger.get()
    gt = GlobalTimers.get()
    gt.start("toast_sim_ground (total)")

    # The reference workflow's configurable operator roster
    # (ref:workflows/toast_sim_ground.py:120-250)
    operators = [
        ops.SimGround(name="sim_ground", weather="atacama"),
        ops.DefaultNoiseModel(name="default_model"),
        ops.ElevationNoise(name="elevation_model", noise_a=1.0, noise_c=0.5),
        ops.SimAtmosphere(name="sim_atmosphere", enabled=False),
        ops.SimScanSynchronousSignal(name="sim_sss", enabled=False),
        ops.SimCatalog(name="sim_catalog", enabled=False),
        ops.ScanHealpixMap(name="scan_map"),
        ops.ScanHealpixMask(name="scan_mask", enabled=False),
        ops.SimNoise(name="sim_noise"),
        ops.GainScrambler(name="gain_scrambler", enabled=False),
        ops.TimeConstant(name="time_constant", enabled=False),
        ops.TimeConstant(
            name="deconvolve_time_constant", deconvolve=True, enabled=False
        ),
        ops.YieldCut(name="yield_cut", enabled=False),
        ops.FlagSSO(name="flag_sso", enabled=False),
        ops.Statistics(name="statistics_raw", enabled=False),
        ops.PointingDetectorSimple(name="det_pointing"),
        ops.PixelsHealpix(name="pixels", nside=64),
        ops.StokesWeights(name="weights", mode="IQU"),
        ops.PolyFilter(name="polyfilter", enabled=False),
        ops.PolyFilter2D(name="polyfilter2d", enabled=False),
        ops.CommonModeFilter(name="common_mode_filter", enabled=False),
        ops.GroundFilter(name="groundfilter", enabled=False),
        ops.HWPFilter(name="hwpfilter", enabled=False),
        ops.Statistics(name="statistics_filtered", enabled=False),
        ops.Demodulate(name="demodulate", enabled=False),
        ops.StokesWeightsDemod(name="weights_demod"),
        ops.CrossLinking(name="crosslinking", enabled=False),
        ops.CadenceMap(name="cadence_map", enabled=False),
        ops.BinMap(name="binner"),
        ops.MapMaker(name="mapmaker"),
        ops.FilterBin(name="filterbin", enabled=False),
        ops.NoiseEstim(name="noise_estim", enabled=False),
        ops.MemoryCounter(name="mem_count", enabled=False),
        ops.SaveHDF5(name="save_hdf5", enabled=False),
    ]
    templates = [Offset(name="baselines", step_time=Quantity(30.0, u.second))]

    parser = argparse.ArgumentParser(description="Ground simulation pipeline")
    parser.add_argument("--focalplane", default=None)
    parser.add_argument("--schedule", default=None)
    parser.add_argument("--input_map", default=None)
    parser.add_argument("--out_dir", default="toast_sim_ground_out")
    parser.add_argument("--n_pix", type=int, default=7)
    parser.add_argument("--hours", type=float, default=2.0)
    parser.add_argument("--ces_minutes", type=float, default=15.0)
    parser.add_argument("--sample_rate", type=float, default=10.0)
    config, args, jobargs = parse_config(
        parser, operators=operators, templates=templates, opts=opts
    )

    from toast_tpu.config import create_from_config

    job = create_from_config(config)
    o = job.operators
    comm = Comm()
    telescope, schedule = load_instrument_and_schedule(args, comm)
    o.sim_ground.telescope = telescope
    o.sim_ground.schedule = schedule
    o.det_pointing.boresight = "boresight_radec"
    o.pixels.detector_pointing = o.det_pointing
    o.weights.detector_pointing = o.det_pointing
    o.binner.pixel_pointing = o.pixels
    o.binner.stokes_weights = o.weights
    o.scan_map.pixel_pointing = o.pixels
    o.scan_map.stokes_weights = o.weights
    o.scan_mask.pixel_pointing = o.pixels

    data = Data(comm)
    simulate_data(job, args, data)
    # reduce_data may swap in a new Data set (demodulation)
    data = reduce_data(job, args, data)

    gt.stop_all()
    if args.out_dir is not None:
        os.makedirs(args.out_dir, exist_ok=True)
        dump(gather_timers(), f"{args.out_dir}/timing")
    log.info("Workflow completed")
    return data


if __name__ == "__main__":
    main()
