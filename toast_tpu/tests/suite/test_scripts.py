"""CLI tool tests: schedule analysis/projection/overlap/gapfill,
config compare, timing merge (reference script roster, SURVEY §2.9)."""

import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pytest

from toast_tpu.schedule_sim_ground import Patch, build_schedule
from toast_tpu.scripts import schedule_tools as st
from toast_tpu.utils import units as u
from toast_tpu.utils.units import Quantity


@pytest.fixture(scope="module")
def sched_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("sched")
    start = datetime(2023, 6, 1, tzinfo=timezone.utc)
    sched = build_schedule(
        patches=[
            Patch("p1", 1.0, [(40, -50), (60, -50), (60, -30), (40, -30)])
        ],
        start=start,
        stop=start + timedelta(hours=12),
        partial_visibility=True,
    )
    f = os.path.join(path, "sched_a.txt")
    sched.write(f)
    return f


def test_analyze_schedule(sched_file, capsys):
    assert st.toast_analyze_schedule([sched_file]) == 0
    out = capsys.readouterr().out
    assert "observing time" in out and "p1" in out


def test_project_schedule(sched_file, tmp_path):
    out = os.path.join(tmp_path, "hits.h5")
    assert st.toast_project_schedule(
        [sched_file, "--nside", "32", "--out", out]
    ) == 0
    from toast_tpu.pixels.io_healpix import read_healpix_hdf5

    hits = read_healpix_hdf5(out)
    assert hits.numpy().sum() > 0


def test_overlap_schedule(sched_file, capsys):
    assert st.toast_overlap_schedule(
        [sched_file, "--target", "50,-40,15", "--nside", "32"]
    ) == 0
    out = capsys.readouterr().out
    assert "overlap the target" in out


def test_gapfill_schedule(sched_file, tmp_path):
    out = os.path.join(tmp_path, "merged.txt")
    assert st.toast_gapfill_schedule([sched_file, sched_file, "--out", out]) == 0
    assert os.path.exists(out)


def test_config_compare(tmp_path, capsys):
    a = os.path.join(tmp_path, "a.toml")
    b = os.path.join(tmp_path, "b.toml")
    open(a, "w").write("[operators.sim]\nclass = 'X'\nnside = 64\n")
    open(b, "w").write("[operators.sim]\nclass = 'X'\nnside = 128\n")
    assert st.toast_config_compare([a, b]) == 1
    assert "nside" in capsys.readouterr().out
    open(b, "w").write("[operators.sim]\nclass = 'X'\nnside = 64\n")
    assert st.toast_config_compare([a, b]) == 0


def test_merge_timings(tmp_path):
    sub = os.path.join(tmp_path, "run1")
    os.makedirs(sub)
    with open(os.path.join(sub, "timing.csv"), "w") as f:
        f.write("name,mean\nop_a,1.5\nop_b,0.5\n")
    out = os.path.join(tmp_path, "merged.csv")
    assert st.toast_merge_timings(["--root", str(tmp_path), "--out", out]) == 0
    body = open(out).read()
    assert "op_a" in body and "op_b" in body


def test_run_scheduler_cli_options(tmp_path):
    """The scheduler CLI accepts the reference option set (operational
    days, elevation grid, avoidance altitudes, boresight rotation)."""
    from toast_tpu.models.schedule import GroundSchedule
    from toast_tpu.schedule_sim_ground import run_scheduler

    out = str(tmp_path / "sched.txt")
    sched = run_scheduler(
        [
            "--start", "2023-01-10 00:00:00",
            "--stop", "2023-01-20 00:00:00",
            "--patch", "p1,1.0,30,-30,50,-45",
            "--patch", "p2,1.0,120,-30,140,-45",
            "--operational-days", "2",
            "--timezone", "-4",
            "--elevations", "30,40,50,60",
            "--boresight-angle-step", "30 deg",
            "--sun-avoidance-altitude", "-10 deg",
            "--moon-avoidance-angle", "5 deg",
            "--partial-visibility",
            "--elevation-balance",
            "--out", out,
        ]
    )
    assert len(sched.scans) > 0
    days = {
        int((s.start_timestamp - 4 * 3600.0) // 86400) for s in sched.scans
    }
    assert len(days) <= 2
    # schedule round-trips through the text format
    loaded = GroundSchedule.read(out)
    assert len(loaded.scans) == len(sched.scans)
