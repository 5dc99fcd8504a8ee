"""Run-compressed statistics vs a numpy oracle.

Pins the split pointing/TOD statistic passes (fused_solver) against direct
per-run sums, including flagged samples, multi-detector layouts and
baseline-boundary run splitting."""

import numpy as np
import pytest

import jax.numpy as jnp

from toast_tpu.ops.kernels.fused_solver import (
    _merge_stats,
    prepare_fused_plan,
    run_stats_pointing,
    run_stats_tod,
)


@pytest.mark.parametrize("seed", [0, 3])
def test_run_stats_match_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    n_det, n_samp = 3, 4096
    step = 600
    n_base = -(-n_samp // step)
    nnz = 3
    N = n_det * n_samp

    # scanning-like pixels: short runs of repeated values
    runs = rng.integers(1, 9, size=N)
    vals = rng.integers(0, 500, size=N)
    pix = np.repeat(vals, runs)[:N].astype(np.int32).reshape(n_det, n_samp)
    tod = rng.normal(size=(n_det, n_samp)).astype(np.float32)
    wts = rng.normal(size=(n_det, n_samp, nnz)).astype(np.float32)
    good = (rng.random((n_det, n_samp)) > 0.1).astype(np.float32)
    dw = rng.uniform(0.5, 2.0, n_det).astype(np.float32)
    wg = good * dw[:, None]

    plan = prepare_fused_plan(jnp.asarray(pix), n_samp, step, n_base, n_det)
    pt = run_stats_pointing(
        jnp.asarray(wts.reshape(-1, nnz)),
        jnp.asarray(wg.reshape(-1)),
        jnp.asarray(good.reshape(-1)),
        plan["bounds1"], plan["order"], plan["good_sorted"],
    )
    td = run_stats_tod(
        jnp.asarray(tod.reshape(-1)),
        jnp.asarray(wts.reshape(-1, nnz)),
        jnp.asarray(wg.reshape(-1)),
        plan["bounds1"], plan["order"], plan["good_sorted"],
    )
    groups = _merge_stats(pt, td, nnz)
    cols = np.concatenate([np.asarray(g) for g in groups], axis=-1)

    # numpy oracle: run boundaries at pixel changes, detector rows and
    # baseline boundaries; per-run sums of the 15 statistics
    pixf = pix.reshape(-1).astype(np.int64)
    idx = np.arange(N)
    change = np.ones(N, bool)
    change[1:] = pixf[1:] != pixf[:-1]
    change |= (idx % n_samp) % step == 0
    run_id = np.cumsum(change) - 1
    n_runs = run_id[-1] + 1

    wgf = wg.reshape(-1).astype(np.float64)
    gf = good.reshape(-1).astype(np.float64)
    tf = tod.reshape(-1).astype(np.float64)
    wf = wts.reshape(-1, nnz).astype(np.float64)

    def seg(v):
        out = np.zeros(n_runs)
        np.add.at(out, run_id, v)
        return out

    oracle_cols = []
    for i in range(nnz):
        oracle_cols.append(seg(wgf * wf[:, i]))          # W
    oracle_cols.append(seg(wgf))                          # n
    for i in range(nnz):
        oracle_cols.append(seg(wgf * tf * wf[:, i]))      # y
    oracle_cols.append(seg(wgf * tf))                     # z
    for i in range(nnz):
        for j in range(i, nnz):
            oracle_cols.append(seg(wgf * wf[:, i] * wf[:, j]))  # tri
    oracle_cols.append(seg(gf))                           # hits
    oracle = np.stack(oracle_cols, axis=-1)

    # map oracle runs to the plan's pixel-sorted order: run r starts at
    # the r-th change position in time order
    starts_time = np.flatnonzero(change)
    order = np.asarray(plan["order"])[: plan["n_runs_b"]]
    starts_plan = np.asarray(plan["starts"])
    got_valid = np.asarray(plan["good_sorted"])
    n_runs_b = plan["n_runs_b"]
    assert plan["n_runs"] == n_runs

    # for each sorted slot, the time-order run index
    time_run_of_slot = np.full(n_runs_b, -1)
    start_to_run = {int(s): r for r, s in enumerate(starts_time)}
    for slot in range(n_runs_b):
        s = int(starts_plan[order[slot]])
        if s < N:
            time_run_of_slot[slot] = start_to_run[s]

    valid = time_run_of_slot >= 0
    assert valid.sum() == n_runs
    np.testing.assert_allclose(
        cols[valid][:, : oracle.shape[1]],
        oracle[time_run_of_slot[valid]],
        rtol=2e-5,
        atol=2e-4,
    )
    # masked (fill/flagged) rows are exactly zero
    assert np.all(cols[~got_valid] == 0.0)


def test_run_stats_pointing_split_pass_equivalence():
    """The memory-capped 4-column split sweep equals the single sweep."""
    rng = np.random.default_rng(1)
    n_det, n_samp = 2, 2048
    step, nnz = 512, 3
    n_base = -(-n_samp // step)
    N = n_det * n_samp
    pix = np.repeat(
        rng.integers(0, 200, N // 4 + 1), 4
    )[:N].astype(np.int32).reshape(n_det, n_samp)
    wts = rng.normal(size=(N, nnz)).astype(np.float32)
    good = np.ones(N, np.float32)
    wg = np.ones(N, np.float32)
    plan = prepare_fused_plan(jnp.asarray(pix), n_samp, step, n_base, n_det)
    args = (
        jnp.asarray(wts), jnp.asarray(wg), jnp.asarray(good),
        plan["bounds1"], plan["order"], plan["good_sorted"],
    )
    one = run_stats_pointing(*args, split=False)
    many = run_stats_pointing(*args, split=True)
    assert len(one) == len(many)
    for a, b in zip(one, many):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
