"""Benchmark-case geometry smoke tests.

The full reference-stats validations (`toast_tpu.scripts.benchmark_reference`)
run as CLI cases (minutes each); these tests pin the fast, deterministic
parts — case sizing and the ground scan geometry whose hit count matches
the reference bundled stats to one boundary sample per detector.
"""

import numpy as np
import pytest


def test_ground_tiny_hits_geometry():
    from toast_tpu.scripts.benchmark_reference import run_ground_case

    res, exp = run_ground_case(sky=False, atm=False, nside=256, log=lambda *_: None)
    # one CES x 40 detectors; measured offset is exactly one sample per
    # detector (reference CES interpolator boundary convention)
    assert res["total_samples"] == 40 * 120001
    assert abs(res["totalhits"] - exp["totalhits"]) <= 40, (
        res["totalhits"], exp["totalhits"],
    )


def test_satellite_case_sizing():
    from toast_tpu.scripts.benchmark_reference import (
        SATELLITE_EXPECTED,
        make_benchmark_focalplane,
    )

    for case, exp in SATELLITE_EXPECTED.items():
        fp = make_benchmark_focalplane(exp["n_detector"])
        assert len(fp.detectors) == exp["n_detector"]
        # totalhits = n_det x 360000 samples x n_obs, exactly
        assert exp["totalhits"] == exp["n_detector"] * 360000 * exp["n_obs"]
