"""Distribution math tests (mirrors reference tests/dist.py intent)."""

import numpy as np
import pytest

from toast_tpu.parallel.dist import (
    DistRange,
    distribute_discrete,
    distribute_samples,
    distribute_uniform,
)


def _check_complete(dist, total):
    covered = 0
    for off, n in dist:
        if n > 0:
            assert off == covered
            covered = off + n
    assert covered == total


def test_uniform_basic():
    dist = distribute_uniform(10, 3)
    _check_complete(dist, 10)
    assert [d.n_elem for d in dist] == [4, 3, 3]
    dist = distribute_uniform(9, 3)
    assert [d.n_elem for d in dist] == [3, 3, 3]


def test_uniform_more_groups_than_items():
    dist = distribute_uniform(2, 4)
    _check_complete(dist, 2)
    assert sum(d.n_elem for d in dist) == 2


def test_uniform_breaks():
    dist = distribute_uniform(100, 4, breaks=[37])
    _check_complete(dist, 100)
    # a group boundary must exist exactly at 37
    assert any(d.offset == 37 for d in dist)


def test_discrete_balanced():
    sizes = [10] * 8
    dist = distribute_discrete(sizes, 4)
    _check_complete(dist, 8)
    assert [d.n_elem for d in dist] == [2, 2, 2, 2]


def test_discrete_uneven():
    sizes = [100, 1, 1, 1, 1, 100]
    dist = distribute_discrete(sizes, 2)
    _check_complete(dist, 6)
    loads = [sum(sizes[d.offset : d.offset + d.n_elem]) for d in dist]
    assert max(loads) <= 104  # optimal bottleneck


def test_discrete_one_per_group():
    dist = distribute_discrete([5, 5, 5], 3)
    assert dist == [DistRange(0, 1), DistRange(1, 1), DistRange(2, 1)]
    dist = distribute_discrete([5, 0, 5], 3)
    assert dist[1].n_elem == 0


def test_discrete_breaks():
    dist = distribute_discrete([10] * 10, 3, breaks=[5])
    _check_complete(dist, 10)
    assert any(d.offset == 5 for d in dist)


def test_discrete_too_many_breaks():
    with pytest.raises(RuntimeError):
        distribute_discrete([1] * 10, 2, breaks=[2, 4, 6])


def test_samples_detsets():
    dets = [f"d{i}" for i in range(8)]
    detsets = [dets[0:4], dets[4:8]]
    dist_dets, dist_detsets, dist_samples, _ = distribute_samples(
        4, dets, 1000, detranks=2, detsets=detsets
    )
    assert len(dist_dets) == 4
    # rows get whole detsets
    assert dist_dets[0] == dets[0:4]
    assert dist_dets[2] == dets[4:8]
    # columns split samples evenly
    assert dist_samples[0] == DistRange(0, 500)
    assert dist_samples[1] == DistRange(500, 500)


def test_samples_sampsets():
    dets = ["a", "b"]
    sampsets = [[100, 100], [150], [250], [400]]
    dist_dets, _, dist_samples, dist_chunks = distribute_samples(
        2, dets, 1000, detranks=1, sampsets=sampsets
    )
    _check_complete(dist_samples, 1000)
    # chunk boundaries respect sample sets
    for rng in dist_samples:
        assert rng.offset in (0, 200, 350, 600, 1000)


def test_samples_serial():
    dets = ["a", "b", "c"]
    dist_dets, _, dist_samples, _ = distribute_samples(1, dets, 100)
    assert dist_dets == [dets]
    assert dist_samples == [DistRange(0, 100)]
