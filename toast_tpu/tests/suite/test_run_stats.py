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


def test_pad_plan_for_stack_solve_equivalence():
    """Solving with plans padded to a shared bucket equals solving each at
    its natural bucket (multi-obs stacking correctness)."""
    from toast_tpu.ops.kernels.fused_solver import (
        accumulate_global_cov,
        fused_offset_solve_multi,
        pad_plan_for_stack,
        run_stats_pointing as rsp,
        run_stats_tod as rst,
    )

    rng = np.random.default_rng(7)
    n_det, n_samp = 2, 2048
    step, nnz = 512, 3
    n_base = -(-n_samp // step)
    N = n_det * n_samp
    n_pix = 1024

    def make_obs(run_len):
        reps = rng.integers(1, run_len + 1, size=N)
        vals = rng.integers(0, n_pix, size=N)
        pix = np.repeat(vals, reps)[:N].astype(np.int32).reshape(
            n_det, n_samp
        )
        tod = rng.normal(size=(n_det, n_samp)).astype(np.float32)
        wts = rng.normal(size=(N, nnz)).astype(np.float32)
        return pix, tod, wts

    # one rapidly-changing obs (runs ~ samples), one slow (long runs):
    # different natural buckets force the padding path
    obs = [make_obs(1), make_obs(16)]
    good = np.ones(N, np.float32)
    wg = np.ones(N, np.float32)

    def stats_for(pix, tod, wts, runs_bucket=None, hit_bucket=None):
        plan = prepare_fused_plan(
            jnp.asarray(pix), n_samp, step, n_base, n_det,
            runs_bucket=runs_bucket, hit_bucket=hit_bucket,
        )
        pt = rsp(
            jnp.asarray(wts), jnp.asarray(wg), jnp.asarray(good),
            plan["bounds1"], plan["order"], plan["good_sorted"],
        )
        td = rst(
            jnp.asarray(tod.reshape(-1)), jnp.asarray(wts), jnp.asarray(wg),
            plan["bounds1"], plan["order"], plan["good_sorted"],
        )
        return plan, pt, td

    def solve(plans, pts, tds, pad):
        n_tri = nnz * (nnz + 1) // 2
        invnpp = jnp.zeros((n_pix, n_tri), jnp.float32)
        hits = jnp.zeros((n_pix,), jnp.float32)
        W_r, n_r, h_r, y_r, z_r = [], [], [], [], []
        for plan, pt, td in zip(plans, pts, tds):
            invnpp, hits = accumulate_global_cov(
                pt, plan["hit_bounds"], plan["hit_valid"], plan["hit_pix"],
                invnpp, hits, nnz=nnz,
            )

            def col(groups, i):
                return groups[i // 4][:, i % 4]

            W_r.append(jnp.stack([col(pt, i) for i in range(nnz)], -1))
            n_r.append(col(pt, nnz))
            h_r.append(col(pt, nnz + 1 + n_tri))
            y_r.append(jnp.stack([col(td, i) for i in range(nnz)], -1))
            z_r.append(col(td, nnz))
        NB = max(p["n_runs_b"] for p in plans)
        NHB = min(max(p["n_hit_b"] for p in plans), NB)
        if pad:
            plans = [pad_plan_for_stack(p, NB, NHB) for p in plans]
            W_r = [jnp.pad(w, ((0, NB - w.shape[0]), (0, 0))) for w in W_r]
            n_r = [jnp.pad(v, (0, NB - v.shape[0])) for v in n_r]
            h_r = [jnp.pad(v, (0, NB - v.shape[0])) for v in h_r]
            y_r = [jnp.pad(w, ((0, NB - w.shape[0]), (0, 0))) for w in y_r]
            z_r = [jnp.pad(v, (0, NB - v.shape[0])) for v in z_r]

        def stack(key):
            return jnp.stack([p[key] for p in plans])

        out = fused_offset_solve_multi(
            jnp.stack(W_r), jnp.stack(n_r), jnp.stack(h_r),
            jnp.stack(y_r), jnp.stack(z_r),
            invnpp, hits,
            stack("amp_sorted"), stack("hit_bounds"), stack("hit_valid"),
            stack("hit_pix"), stack("hit_starts"), stack("rank_block"),
            jnp.float32(1e-3), jnp.float32(0.5),
            jnp.asarray(
                np.tile(
                    np.r_[
                        np.full(n_base - 1, step),
                        [n_samp - (n_base - 1) * step],
                    ],
                    n_det,
                ).astype(np.float32)
            ),
            n_pix, plans[0]["n_hi"], n_det * n_base, 40, jnp.float32(1e-12),
            nnz=nnz, use_pallas_reduce=False,
        )
        return np.asarray(out[0]), np.asarray(out[6]), np.asarray(out[7])

    # natural buckets differ -> the reference result uses explicit shared
    # buckets built by prepare_fused_plan itself
    plans_a, pts_a, tds_a = zip(*(stats_for(*o) for o in obs))
    NB = max(p["n_runs_b"] for p in plans_a)
    NHB = min(max(p["n_hit_b"] for p in plans_a), NB)
    assert len({p["n_runs_b"] for p in plans_a}) > 1  # buckets really differ
    plans_b, pts_b, tds_b = zip(
        *(stats_for(*o, runs_bucket=NB, hit_bucket=NHB) for o in obs)
    )
    amps_pad, zr_pad, zc_pad = solve(list(plans_a), list(pts_a), list(tds_a), pad=True)
    amps_ref, zr_ref, zc_ref = solve(list(plans_b), list(pts_b), list(tds_b), pad=False)
    np.testing.assert_allclose(amps_pad, amps_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(zr_pad, zr_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(zc_pad, zc_ref, rtol=1e-4, atol=1e-4)


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
