"""Schedule analysis / manipulation command-line tools.

Rebuilds of the reference schedule utilities
(``ref:src/toast/scripts/toast_analyze_schedule.py``,
``toast_project_schedule.py``, ``toast_gapfill_schedule.py``,
``toast_overlap_schedule.py``) plus ``toast_config_compare`` and
``toast_benchmark_ground_setup``.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..models.schedule import GroundSchedule
from ..utils import units as u


def _scan_footprint_pixels(schedule, scan, nside, n_t=32, n_az=64):
    """HEALPix (NEST) pixels swept by one CES scan (sparse sampling)."""
    from ..math import coordinates as coords
    from ..math.healpix import ang2nest
    from ..models.instrument import GroundSite

    site = GroundSite(
        schedule.site_name,
        schedule.site_lat,
        schedule.site_lon,
        schedule.site_alt,
    )
    from ..math import qarray as qa

    t0 = scan.start.timestamp()
    t1 = scan.stop.timestamp()
    ts = np.linspace(t0, t1, n_t)
    azs = np.linspace(
        scan.az_min.to_value(u.rad), scan.az_max.to_value(u.rad), n_az
    )
    el = scan.el.to_value(u.rad)
    tt, aa = np.meshgrid(ts, azs, indexing="ij")
    quats_azel = coords.azel_quat(aa.ravel(), np.full(tt.size, el))
    quats_radec = coords.azel_to_radec(site, tt.ravel(), quats_azel)
    ra, dec, _ = qa.to_lonlat_angles(quats_radec)
    theta = np.pi / 2 - dec
    return np.unique(ang2nest(nside, theta, ra % (2 * np.pi)))


def toast_analyze_schedule(opts=None):
    """Print observing statistics of a ground schedule
    (ref toast_analyze_schedule.py)."""
    parser = argparse.ArgumentParser(description="Analyze a ground schedule")
    parser.add_argument("schedule")
    args = parser.parse_args(opts)
    sched = GroundSchedule.read(args.schedule)
    scans = sched.scans
    if not scans:
        print("Schedule is empty")
        return 0
    total_s = sum((s.stop - s.start).total_seconds() for s in scans)
    span_s = (scans[-1].stop - scans[0].start).total_seconds()
    by_patch = {}
    els = []
    for s in scans:
        dt = (s.stop - s.start).total_seconds()
        by_patch[s.name] = by_patch.get(s.name, 0.0) + dt
        els.append(s.el.to_value(u.deg))
    gaps = [
        (scans[i + 1].start - scans[i].stop).total_seconds()
        for i in range(len(scans) - 1)
    ]
    print(f"Schedule: {len(scans)} scans over {span_s/86400:.2f} days")
    print(f"  observing time: {total_s/3600:.2f} h "
          f"(efficiency {100*total_s/max(span_s,1):.1f}%)")
    print(f"  elevation: min {min(els):.1f} max {max(els):.1f} "
          f"mean {np.mean(els):.1f} deg")
    if gaps:
        print(f"  gaps: total {sum(gaps)/3600:.2f} h, longest {max(gaps)/60:.1f} min")
    print("  per-patch time:")
    for name, dt in sorted(by_patch.items(), key=lambda kv: -kv[1]):
        print(f"    {name:20s} {dt/3600:8.2f} h")
    return 0


def toast_project_schedule(opts=None):
    """Project a schedule's scans onto a HEALPix hit map
    (ref toast_project_schedule.py)."""
    parser = argparse.ArgumentParser(description="Project schedule to a hitmap")
    parser.add_argument("schedule")
    parser.add_argument("--nside", type=int, default=64)
    parser.add_argument("--out", default="schedule_hits.h5")
    args = parser.parse_args(opts)
    sched = GroundSchedule.read(args.schedule)
    n_pix = 12 * args.nside**2
    hits = np.zeros(n_pix, dtype=np.int64)
    for scan in sched.scans:
        pix = _scan_footprint_pixels(sched, scan, args.nside)
        hits[pix] += 1
    from ..pixels import PixelData, PixelDistribution
    from ..pixels.io_healpix import write_healpix_hdf5

    dist = PixelDistribution(n_pix=n_pix, n_submap=max(12, n_pix // 1024))
    pd = PixelData(dist, dtype=np.int32, n_value=1)
    pd.set_numpy(hits[:, None].astype(np.int32))
    write_healpix_hdf5(pd, args.out, nest=True)
    print(f"Wrote {args.out}: {int((hits > 0).sum())} / {n_pix} pixels hit")
    return 0


def toast_overlap_schedule(opts=None):
    """Report scans overlapping a target sky region
    (ref toast_overlap_schedule.py)."""
    parser = argparse.ArgumentParser(
        description="Find schedule scans overlapping a target region"
    )
    parser.add_argument("schedule")
    parser.add_argument(
        "--target",
        required=True,
        help="Target region 'ra_deg,dec_deg,radius_deg' or a healpix "
        "mask file (.h5)",
    )
    parser.add_argument("--nside", type=int, default=64)
    args = parser.parse_args(opts)
    sched = GroundSchedule.read(args.schedule)
    n_pix = 12 * args.nside**2

    if args.target.endswith(".h5"):
        from ..pixels.io_healpix import read_healpix_hdf5

        mask_map = read_healpix_hdf5(args.target)
        mask = np.asarray(mask_map.numpy()[:, 0] > 0)
    else:
        from ..math.healpix import nest2ang

        ra0, dec0, rad = [np.radians(float(x)) for x in args.target.split(",")]
        theta, phi = nest2ang(args.nside, np.arange(n_pix))
        dec = np.pi / 2 - theta
        cosd = np.sin(dec0) * np.sin(dec) + np.cos(dec0) * np.cos(dec) * np.cos(
            phi - ra0
        )
        mask = np.arccos(np.clip(cosd, -1, 1)) < rad

    print(f"{'scan':24s} {'start':20s} {'overlap%':>8s}")
    n_over = 0
    for scan in sched.scans:
        pix = _scan_footprint_pixels(sched, scan, args.nside)
        frac = mask[pix].mean() if len(pix) else 0.0
        if frac > 0:
            n_over += 1
            print(
                f"{scan.name:24s} {scan.start.isoformat()[:19]:20s} "
                f"{100*frac:8.1f}"
            )
    print(f"{n_over} of {len(sched.scans)} scans overlap the target")
    return 0


def toast_gapfill_schedule(opts=None):
    """Fill gaps in one schedule with entries from another
    (ref toast_gapfill_schedule.py)."""
    parser = argparse.ArgumentParser(
        description="Fill schedule gaps from a second schedule"
    )
    parser.add_argument("primary")
    parser.add_argument("filler")
    parser.add_argument("--out", default="gapfilled_schedule.txt")
    parser.add_argument(
        "--min_gap_s", type=float, default=600.0, help="Only fill gaps this long"
    )
    args = parser.parse_args(opts)
    primary = GroundSchedule.read(args.primary)
    filler = GroundSchedule.read(args.filler)

    merged = list(primary.scans)
    added = 0
    for i in range(len(primary.scans) - 1):
        gap_start = primary.scans[i].stop
        gap_stop = primary.scans[i + 1].start
        if (gap_stop - gap_start).total_seconds() < args.min_gap_s:
            continue
        for cand in filler.scans:
            if cand.start >= gap_start and cand.stop <= gap_stop:
                merged.append(cand)
                added += 1
    merged.sort(key=lambda s: s.start)
    out = GroundSchedule(
        scans=merged,
        site_name=primary.site_name,
        telescope_name=primary.telescope_name,
        site_lat=primary.site_lat,
        site_lon=primary.site_lon,
        site_alt=primary.site_alt,
    )
    out.write(args.out)
    print(f"Added {added} filler scans; wrote {args.out}")
    return 0


def toast_config_compare(opts=None):
    """Diff two config files (ref toast_config_compare.py)."""
    from ..config import load_config

    parser = argparse.ArgumentParser(description="Compare two config files")
    parser.add_argument("config_a")
    parser.add_argument("config_b")
    args = parser.parse_args(opts)
    a = load_config(args.config_a)
    b = load_config(args.config_b)

    def flatten(d, prefix=""):
        out = {}
        for k, v in d.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                out.update(flatten(v, key + "/"))
            else:
                out[key] = v
        return out

    fa, fb = flatten(a), flatten(b)
    only_a = sorted(set(fa) - set(fb))
    only_b = sorted(set(fb) - set(fa))
    diff = sorted(k for k in set(fa) & set(fb) if fa[k] != fb[k])
    for k in only_a:
        print(f"- {k} = {fa[k]}")
    for k in only_b:
        print(f"+ {k} = {fb[k]}")
    for k in diff:
        print(f"~ {k}: {fa[k]} -> {fb[k]}")
    if not (only_a or only_b or diff):
        print("Configs are identical")
        return 0
    return 1


def toast_benchmark_ground_setup(opts=None):
    """Create the input files for the ground benchmark
    (ref toast_benchmark_ground_setup.py): a schedule and an input sky."""
    parser = argparse.ArgumentParser(description="Ground benchmark setup")
    parser.add_argument("--out_dir", default="bench_ground_inputs")
    parser.add_argument("--nside", type=int, default=256)
    parser.add_argument("--hours", type=float, default=24.0)
    args = parser.parse_args(opts)
    import os
    from datetime import datetime, timedelta, timezone

    from ..schedule_sim_ground import Patch, build_schedule
    os.makedirs(args.out_dir, exist_ok=True)
    start = datetime(2027, 1, 1, tzinfo=timezone.utc)
    patches = [
        Patch(
            "bench_patch",
            1.0,
            [(30.0, -50.0), (70.0, -50.0), (70.0, -20.0), (30.0, -20.0)],
        )
    ]
    schedule = build_schedule(
        patches=patches,
        start=start,
        stop=start + timedelta(hours=args.hours),
        partial_visibility=True,
    )
    sched_path = os.path.join(args.out_dir, "schedule.txt")
    schedule.write(sched_path)

    # fake input sky with the reference benchmark spectra
    from .benchmark_reference import make_input_sky

    sky = make_input_sky(args.nside, lmax=min(2 * args.nside, 512), seed=987654321)
    from ..pixels import PixelData, PixelDistribution
    from ..pixels.io_healpix import write_healpix_hdf5

    n_pix = 12 * args.nside**2
    dist = PixelDistribution(n_pix=n_pix, n_submap=max(12, n_pix // 4096))
    pd = PixelData(dist, n_value=3, units=u.K)
    pd.set_numpy(sky)
    map_path = os.path.join(args.out_dir, f"input_sky_nside{args.nside}.h5")
    write_healpix_hdf5(pd, map_path, nest=True)
    print(f"Wrote {sched_path} ({len(schedule.scans)} scans) and {map_path}")
    return 0


def toast_merge_timings(opts=None):
    """Merge timing.csv files under a directory tree
    (ref toast_merge_timings.py)."""
    import csv
    import glob
    import os

    parser = argparse.ArgumentParser(description="Merge timing.csv files")
    parser.add_argument("--root", default=".")
    parser.add_argument("--out", default="merged_timing.csv")
    args = parser.parse_args(opts)
    merged = {}
    files = glob.glob(os.path.join(args.root, "**", "timing.csv"), recursive=True)
    for path in files:
        with open(path) as f:
            for row in csv.DictReader(f):
                name = row.get("name") or row.get("Timer")
                val = row.get("mean") or row.get("Mean Time") or row.get("seconds")
                if name is None or val is None:
                    continue
                merged.setdefault(name, []).append(float(val))
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "count", "mean", "min", "max"])
        for name, vals in sorted(merged.items()):
            w.writerow(
                [name, len(vals), np.mean(vals), np.min(vals), np.max(vals)]
            )
    print(f"Merged {len(files)} files -> {args.out} ({len(merged)} timers)")
    return 0


def toast_plot_healpix(opts=None):
    """Plot a healpix map file (ref toast_plot_healpix.py)."""
    parser = argparse.ArgumentParser(description="Plot a healpix map")
    parser.add_argument("mapfile")
    parser.add_argument("--comp", type=int, default=0)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(opts)
    from ..pixels.io_healpix import read_healpix_hdf5
    from ..vis import plot_healpix_map

    pd = read_healpix_hdf5(args.mapfile)
    out = args.out or (args.mapfile.rsplit(".", 1)[0] + ".png")
    plot_healpix_map(pd, out, comp=args.comp)
    print(f"Wrote {out}")
    return 0


def toast_plot_wcs(opts=None):
    """Plot a flat-sky WCS map file (ref toast_plot_wcs.py)."""
    parser = argparse.ArgumentParser(description="Plot a WCS projection map")
    parser.add_argument("mapfile")
    parser.add_argument("--comp", type=int, default=0)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(opts)
    from ..pixels.io_wcs import read_wcs_fits, read_wcs_hdf5
    from ..vis import plot_wcs_map

    if args.mapfile.endswith((".fits", ".fit")):
        pd, wcs_meta = read_wcs_fits(args.mapfile)
    else:
        pd, wcs_meta = read_wcs_hdf5(args.mapfile)
    out = args.out or (args.mapfile.rsplit(".", 1)[0] + ".png")
    plot_wcs_map(pd, wcs_meta, out, comp=args.comp)
    print(f"Wrote {out}")
    return 0


def toast_hdf5_to_spt3g(opts=None):
    """SPT3G conversion requires the spt3g package (gated like the
    reference; ref toast_hdf5_to_spt3g.py)."""
    print(
        "toast_tpu_hdf5_to_spt3g: the 'spt3g' package is not available in "
        "this environment",
        file=sys.stderr,
    )
    return 1
