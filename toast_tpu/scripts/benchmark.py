"""Benchmark entry points.

Rebuilds of ``toast_benchmark_satellite`` / ``toast_benchmark_ground`` and
the validation logic of ``scripts/benchmarking_utilities.py``: fixed case
sizes, the science metric ``total_samples / (n_nodes x runtime)``, and
output-statistics reporting.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# total-sample case sizes (reference benchmarking_utilities.py:402-413)
CASE_SAMPLES = {
    "tiny": 5e6,
    "xsmall": 5e7,
    "small": 5e8,
    "medium": 5e9,
    "large": 5e10,
    "xlarge": 5e11,
    "heroic": 5e12,
}


def science_metric(total_samples, n_nodes, runtime_s):
    """samples / (node x second) — reference ``benchmarking_utilities.py:828``."""
    return total_samples / (n_nodes * runtime_s)


def compare_output_stats(name, hits, rms, expected, rtol=0.1):
    """Compare run statistics to recorded references
    (reference ``benchmarking_utilities.py:883``)."""
    ok = True
    if "hits" in expected and hits != expected["hits"]:
        print(f"{name}: hits {hits} != expected {expected['hits']}")
        ok = False
    for comp, key in enumerate(("rms_I", "rms_Q", "rms_U")):
        if key in expected and comp < len(rms):
            # NaN must fail: every comparison with NaN is False, so an
            # explicit finite check is required
            if not (np.isfinite(rms[comp]) and np.isfinite(expected[key])):
                print(f"{name}: {key} non-finite ({rms[comp]} vs {expected[key]})")
                ok = False
                continue
            rel = abs(rms[comp] - expected[key]) / expected[key]
            if rel > rtol:
                print(f"{name}: {key} {rms[comp]:.5f} vs {expected[key]} ({rel:.1%})")
                ok = False
    return ok


def _build_satellite_case(case, n_det, sample_rate, nside):
    from datetime import datetime, timezone

    from toast_tpu import ops
    from toast_tpu.models import (
        Data,
        SpaceSite,
        Telescope,
        create_satellite_schedule,
        fake_hexagon_focalplane,
    )
    from toast_tpu.parallel import Comm
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    total_samples = CASE_SAMPLES[case]
    samples_per_det = int(total_samples / n_det)
    total_minutes = samples_per_det / sample_rate / 60.0
    n_obs = max(1, int(np.ceil(total_minutes / 60.0)))
    obs_minutes = total_minutes / n_obs

    fp = fake_hexagon_focalplane(
        n_pix=(n_det + 1) // 2,
        sample_rate=Quantity(sample_rate, u.Hz),
        psd_net=Quantity(0.05, u.K_sqrt_s),
        psd_fknee=Quantity(0.05, u.Hz),
    )
    fp.detector_data = {k: v[:n_det] for k, v in fp.detector_data.items()}
    fp._index = {d: i for i, d in enumerate(fp.detector_data["name"])}
    telescope = Telescope("bench_sat", focalplane=fp, site=SpaceSite("space"))
    schedule = create_satellite_schedule(
        prefix="bench_",
        mission_start=datetime(2023, 1, 1, tzinfo=timezone.utc),
        observation_time=Quantity(obs_minutes, u.minute),
        num_observations=n_obs,
        prec_period=Quantity(50.0, u.minute),
        spin_period=Quantity(10.0, u.minute),
    )
    return telescope, schedule, n_det * samples_per_det


def benchmark_satellite(opts=None):
    """Satellite benchmark at a chosen case size."""
    import jax

    from toast_tpu import ops
    from toast_tpu.models import Data
    from toast_tpu.parallel import Comm
    from toast_tpu.templates import Offset
    from toast_tpu.utils import units as u
    from toast_tpu.utils.units import Quantity

    parser = argparse.ArgumentParser()
    parser.add_argument("--case", default="tiny", choices=list(CASE_SAMPLES))
    parser.add_argument("--nside", type=int, default=256)
    parser.add_argument("--sample_rate", type=float, default=50.0)
    parser.add_argument("--n_detector", type=int, default=64)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument(
        "--stats_file",
        default=None,
        help="Regression stats (reference stats.json analog): validate "
        "against this file if it exists, otherwise record it",
    )
    args = parser.parse_args(opts)

    telescope, schedule, total_samples = _build_satellite_case(
        args.case, args.n_detector, args.sample_rate, args.nside
    )
    comm = Comm()
    data = Data(comm)

    t0 = time.perf_counter()
    ops.SimSatellite(
        name="sim_satellite", telescope=telescope, schedule=schedule
    ).apply(data)
    ops.DefaultNoiseModel().apply(data)
    ops.SimNoise().apply(data)
    det_pointing = ops.PointingDetectorSimple()
    pixels = ops.PixelsHealpix(
        nside=args.nside, detector_pointing=det_pointing, create_dist="pixel_dist"
    )
    weights = ops.StokesWeights(mode="IQU", detector_pointing=det_pointing)
    binner = ops.BinMap(
        pixel_dist="pixel_dist", pixel_pointing=pixels, stokes_weights=weights
    )
    tm = ops.TemplateMatrix(
        templates=[Offset(step_time=Quantity(60.0, u.second))]
    )
    mapper = ops.MapMaker(
        name="bench",
        binning=binner,
        template_matrix=tm,
        iter_min=args.iters,
        iter_max=args.iters,
        solve_rcond_threshold="1e-3",
        map_rcond_threshold="1e-3",
        write_binmap=False,
    )
    mapper.apply(data)
    jax.block_until_ready(data["bench_map"].data)
    runtime = time.perf_counter() - t0

    hits = int(data["bench_hits"].numpy().sum())
    m = data["bench_map"].numpy()
    rms = [float(np.sqrt(np.mean(m[:, i] ** 2))) for i in range(m.shape[1])]
    metric = science_metric(total_samples, 1, runtime)
    print(
        json.dumps(
            {
                "case": args.case,
                "total_samples": total_samples,
                "runtime_s": round(runtime, 2),
                "science_metric": round(metric, 1),
                "hits": hits,
                "rms": rms,
            }
        )
    )
    # stats.json-style output validation (reference
    # benchmarking_utilities.py:883 checks vs _aux/benchmarks/stats.json):
    # deterministic RNG makes the outputs exactly reproducible, so the
    # first run records and later runs regress against it
    if args.stats_file is not None:
        import os

        key = f"satellite_{args.case}"
        if os.path.exists(args.stats_file):
            with open(args.stats_file) as f:
                recorded = json.load(f)
            if key in recorded:
                ok = compare_output_stats(key, hits, rms, recorded[key])
                if not ok:
                    print(f"{key}: output statistics REGRESSED", file=sys.stderr)
                    return 1
                print(f"{key}: output statistics match recorded values")
                return 0
        recorded = {}
        if os.path.exists(args.stats_file):
            with open(args.stats_file) as f:
                recorded = json.load(f)
        recorded[key] = {
            "hits": hits,
            "rms_I": rms[0],
            "rms_Q": rms[1] if len(rms) > 1 else None,
            "rms_U": rms[2] if len(rms) > 2 else None,
        }
        recorded[key] = {k: v for k, v in recorded[key].items() if v is not None}
        with open(args.stats_file, "w") as f:
            json.dump(recorded, f, indent=2)
        print(f"{key}: recorded output statistics to {args.stats_file}")
    return 0


def benchmark_ground(opts=None):
    """Ground benchmark at a chosen case size."""
    from toast_tpu.workflows.sim_ground import main as ground_main

    parser = argparse.ArgumentParser()
    parser.add_argument("--case", default="tiny", choices=list(CASE_SAMPLES))
    parser.add_argument("--sample_rate", type=float, default=50.0)
    parser.add_argument("--n_pix", type=int, default=32)
    args = parser.parse_args(opts)
    total_samples = CASE_SAMPLES[args.case]
    n_det = 2 * args.n_pix
    hours = total_samples / n_det / args.sample_rate / 3600.0
    t0 = time.perf_counter()
    ground_main(
        [
            "--hours", str(hours),
            "--n_pix", str(args.n_pix),
            "--sample_rate", str(args.sample_rate),
            "--out_dir", "bench_ground_out",
        ]
    )
    runtime = time.perf_counter() - t0
    metric = science_metric(total_samples, 1, runtime)
    print(json.dumps({"case": args.case, "runtime_s": round(runtime, 2),
                      "science_metric": round(metric, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(benchmark_satellite())
