"""Console entry points.

Rebuilds of the reference script CLIs (``pyproject.toml:68-95``):
``toast_env``, ``toast_fake_focalplane``, ``toast_fake_telescope``,
``toast_satellite_schedule``, ``toast_ground_schedule``,
``toast_healpix_coadd``, ``toast_healpix_convert``, ``toast_healpix_compare``,
``toast_map_stats``, ``toast_timing_plot``, ``toast_config_verify``,
``toast_obsmatrix_combine``/``coadd``, ``toast_volume_reindex``,
``toast_run``, ``toast_mini``.

Each is runnable as ``python -m toast_tpu.scripts.cli <command> [args]``.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def toast_env(opts=None):
    """Print the runtime environment (reference ``toast_env``)."""
    from ..utils.environment import Environment

    print(Environment.get())
    return 0


def toast_fake_focalplane(opts=None):
    """Write a synthetic hexagonal focalplane to HDF5."""
    import h5py

    from ..models import fake_hexagon_focalplane
    from ..utils import units as u
    from ..utils.units import Quantity

    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="focalplane.h5")
    parser.add_argument("--n_pix", type=int, default=7)
    parser.add_argument("--sample_rate", type=float, default=10.0)
    parser.add_argument("--fov_deg", type=float, default=5.0)
    parser.add_argument("--psd_net", type=float, default=0.05)
    parser.add_argument("--psd_fknee", type=float, default=0.05)
    args = parser.parse_args(opts)
    fp = fake_hexagon_focalplane(
        n_pix=args.n_pix,
        width=Quantity(args.fov_deg, u.deg),
        sample_rate=Quantity(args.sample_rate, u.Hz),
        psd_net=Quantity(args.psd_net, u.K_sqrt_s),
        psd_fknee=Quantity(args.psd_fknee, u.Hz),
    )
    with h5py.File(args.out, "w") as f:
        fp.save_hdf5(f)
    print(f"Wrote {fp.n_detectors} detectors to {args.out}")
    return 0


toast_fake_telescope = toast_fake_focalplane


def toast_satellite_schedule(opts=None):
    """Generate a satellite schedule file."""
    from ..models import create_satellite_schedule
    from ..utils import units as u
    from ..utils.units import Quantity

    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="schedule.txt")
    parser.add_argument("--num_obs", type=int, default=10)
    parser.add_argument("--obs_minutes", type=float, default=60.0)
    parser.add_argument("--gap_minutes", type=float, default=0.0)
    parser.add_argument("--prec_minutes", type=float, default=50.0)
    parser.add_argument("--spin_minutes", type=float, default=10.0)
    args = parser.parse_args(opts)
    sch = create_satellite_schedule(
        prefix="sat_",
        observation_time=Quantity(args.obs_minutes, u.minute),
        gap_time=Quantity(args.gap_minutes, u.minute),
        num_observations=args.num_obs,
        prec_period=Quantity(args.prec_minutes, u.minute),
        spin_period=Quantity(args.spin_minutes, u.minute),
    )
    sch.write(args.out)
    print(f"Wrote {len(sch)} scans to {args.out}")
    return 0


def toast_ground_schedule(opts=None):
    """Generate a ground schedule (reference ``toast_ground_schedule``)."""
    from ..schedule_sim_ground import run_scheduler

    sch = run_scheduler(opts)
    print(f"Wrote {len(sch)} scans")
    return 0


def _load_map(path, nest=True):
    from ..pixels.io_healpix import read_healpix_fits, read_healpix_hdf5

    if str(path).endswith((".h5", ".hdf5")):
        return read_healpix_hdf5(path, nest=nest)
    return read_healpix_fits(path, nest=nest)


def toast_healpix_coadd(opts=None):
    """Coadd maps (optionally inverse-covariance weighted sum)."""
    from ..pixels.io_healpix import write_healpix_hdf5

    parser = argparse.ArgumentParser()
    parser.add_argument("inputs", nargs="+")
    parser.add_argument("--out", default="coadd.h5")
    args = parser.parse_args(opts)
    total = None
    for path in args.inputs:
        m = _load_map(path)
        if total is None:
            total = m
        else:
            total.data = total.data + m.data
    write_healpix_hdf5(total, args.out)
    print(f"Coadded {len(args.inputs)} maps -> {args.out}")
    return 0


def toast_healpix_convert(opts=None):
    """Convert between FITS and HDF5 map formats."""
    from ..pixels.io_healpix import write_healpix_fits, write_healpix_hdf5

    parser = argparse.ArgumentParser()
    parser.add_argument("input")
    parser.add_argument("--out", required=True)
    args = parser.parse_args(opts)
    m = _load_map(args.input)
    if args.out.endswith((".h5", ".hdf5")):
        write_healpix_hdf5(m, args.out)
    else:
        write_healpix_fits(m, args.out)
    print(f"Converted {args.input} -> {args.out}")
    return 0


def toast_healpix_compare(opts=None):
    """Compare two maps; exit nonzero if they differ beyond tolerance."""
    parser = argparse.ArgumentParser()
    parser.add_argument("map1")
    parser.add_argument("map2")
    parser.add_argument("--rtol", type=float, default=1e-5)
    parser.add_argument("--atol", type=float, default=1e-8)
    args = parser.parse_args(opts)
    m1 = _load_map(args.map1).numpy()
    m2 = _load_map(args.map2).numpy()
    if m1.shape != m2.shape:
        print(f"shape mismatch: {m1.shape} vs {m2.shape}")
        return 1
    close = np.allclose(m1, m2, rtol=args.rtol, atol=args.atol)
    diff = np.abs(m1 - m2).max()
    print(f"max |diff| = {diff:g} -> {'MATCH' if close else 'DIFFER'}")
    return 0 if close else 1


def toast_map_stats(opts=None):
    """Print per-component map statistics (reference ``toast_map_stats``)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("inputs", nargs="+")
    parser.add_argument("--json", action="store_true")
    args = parser.parse_args(opts)
    for path in args.inputs:
        m = _load_map(path)
        stats = m.stats()
        if args.json:
            print(json.dumps({path: stats}))
        else:
            print(path)
            for comp, s in stats.items():
                print(
                    f"  comp {comp}: mean {s['mean']:.6g} rms {s['rms']:.6g} "
                    f"min {s['min']:.6g} max {s['max']:.6g} nonzero {s['nonzero']}"
                )
    return 0


def toast_timing_plot(opts=None):
    """Plot a timing dump (reference ``toast_timing_plot``)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("timing_json")
    parser.add_argument("--out", default="timing.png")
    args = parser.parse_args(opts)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(args.timing_json) as f:
        results = json.load(f)
    names = sorted(results.keys(), key=lambda k: -results[k]["mean"])[:30]
    vals = [results[k]["mean"] for k in names]
    fig, ax = plt.subplots(figsize=(8, 0.3 * len(names) + 1))
    ax.barh(range(len(names)), vals)
    ax.set_yticks(range(len(names)))
    ax.set_yticklabels(names, fontsize=6)
    ax.set_xlabel("seconds")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"Wrote {args.out}")
    return 0


def toast_config_verify(opts=None):
    """Parse and re-dump configuration files (reference ``toast_config_verify``)."""
    from ..config import dump_config, load_config, merge_config

    parser = argparse.ArgumentParser()
    parser.add_argument("configs", nargs="+")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(opts)
    conf = {}
    for path in args.configs:
        conf = merge_config(conf, load_config(path))
    if args.out:
        dump_config(args.out, conf)
        print(f"Merged config written to {args.out}")
    else:
        print(json.dumps(conf, indent=2, default=str))
    return 0


def toast_obsmatrix_coadd(opts=None):
    """Coadd observation matrices (reference ``toast_obsmatrix_coadd``)."""
    import scipy.sparse as sp

    parser = argparse.ArgumentParser()
    parser.add_argument("inputs", nargs="+")
    parser.add_argument("--out", default="obsmatrix_coadd.npz")
    args = parser.parse_args(opts)
    total = None
    for path in args.inputs:
        m = sp.load_npz(path)
        total = m if total is None else total + m
    sp.save_npz(args.out, total)
    print(f"Coadded {len(args.inputs)} matrices -> {args.out}")
    return 0


toast_obsmatrix_combine = toast_obsmatrix_coadd


def toast_volume_reindex(opts=None):
    """Rebuild a volume's sqlite index (reference ``toast_volume_reindex``)."""
    from ..io.volume import index_volume

    parser = argparse.ArgumentParser()
    parser.add_argument("volume")
    args = parser.parse_args(opts)
    db = index_volume(args.volume)
    print(f"Reindexed {args.volume} -> {db}")
    return 0


def toast_mini(opts=None):
    """Self-contained mini-app (reference ``scripts/toast_mini.py:152``)."""
    from ..workflows.sim_satellite import main as sat_main

    argv = opts if opts is not None else []
    return sat_main(
        ["--n_obs", "1", "--obs_minutes", "10", "--pixels.nside", "32"] + list(argv)
    )


def toast_run(opts=None):
    """Generic config-driven pipeline runner (reference ``toast_run``)."""
    from ..config import create_from_config, load_config
    from ..models import Data
    from ..parallel import Comm

    parser = argparse.ArgumentParser()
    parser.add_argument("config")
    args = parser.parse_args(opts)
    conf = load_config(args.config)
    job = create_from_config(conf)
    data = Data(Comm())
    for name in vars(job.operators):
        op = getattr(job.operators, name)
        if getattr(op, "enabled", True):
            op.apply(data)
    return 0


def _benchmark_satellite(opts=None):
    from .benchmark import benchmark_satellite

    return benchmark_satellite(opts)


def _benchmark_ground(opts=None):
    from .benchmark import benchmark_ground

    return benchmark_ground(opts)


_COMMANDS = {
    "env": toast_env,
    "fake_focalplane": toast_fake_focalplane,
    "fake_telescope": toast_fake_telescope,
    "satellite_schedule": toast_satellite_schedule,
    "ground_schedule": toast_ground_schedule,
    "healpix_coadd": toast_healpix_coadd,
    "healpix_convert": toast_healpix_convert,
    "healpix_compare": toast_healpix_compare,
    "map_stats": toast_map_stats,
    "timing_plot": toast_timing_plot,
    "config_verify": toast_config_verify,
    "obsmatrix_coadd": toast_obsmatrix_coadd,
    "obsmatrix_combine": toast_obsmatrix_combine,
    "volume_reindex": toast_volume_reindex,
    "mini": toast_mini,
    "benchmark_satellite": _benchmark_satellite,
    "benchmark_ground": _benchmark_ground,
    "run": toast_run,
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m toast_tpu.scripts.cli <command> [args]")
        print("commands:", ", ".join(sorted(_COMMANDS)))
        return 0
    cmd = sys.argv[1]
    if cmd not in _COMMANDS:
        print(f"unknown command '{cmd}'. commands: {', '.join(sorted(_COMMANDS))}")
        return 1
    return _COMMANDS[cmd](sys.argv[2:])


if __name__ == "__main__":
    sys.exit(main())
