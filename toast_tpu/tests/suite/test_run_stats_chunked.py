"""Chunked statistics sweep == one-shot sweep.

The chunked path (fused_solver._run_stats_chunked) exists so observations
past ~3e7 samples fit HBM (the reference handles long observations by
sample-axis distribution, ref:src/toast/dist.py:205); it must be
numerically equivalent to the proven one-shot blocked prefix sweep up to
f32 partial-sum reassociation at chunk edges.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from toast_tpu.ops.kernels.fused_solver import (
    _make_chunk_plan,
    prepare_fused_plan,
    run_stats_pointing,
    run_stats_tod,
)


def _random_case(rng, n_det, n_samp, n_pix, mean_run, step):
    # pixel streams with geometric run lengths (scanning-like revisits)
    pix = np.empty((n_det, n_samp), np.int32)
    for d in range(n_det):
        pos = 0
        while pos < n_samp:
            ln = 1 + rng.geometric(1.0 / mean_run)
            pix[d, pos : pos + ln] = rng.integers(0, n_pix)
            pos += ln
    # a few flagged (negative) pixels exercise the good mask
    bad = rng.random((n_det, n_samp)) < 0.01
    pix[bad] = -1
    tod = rng.standard_normal((n_det, n_samp)).astype(np.float32)
    wts = rng.standard_normal((n_det, n_samp, 3)).astype(np.float32)
    good = (~bad).astype(np.float32)
    wg = good * rng.uniform(0.5, 2.0, (n_det, 1)).astype(np.float32)
    plan = prepare_fused_plan(jnp.asarray(pix), n_samp, step, 4, n_det)
    return plan, tod, wts, wg, good


@pytest.mark.parametrize("chunk_samples", [2048, 4096 + 512])
@pytest.mark.parametrize("mean_run", [3, 40])
def test_chunked_equals_oneshot(chunk_samples, mean_run):
    rng = np.random.default_rng(1234 + chunk_samples + mean_run)
    n_det, n_samp = 3, 7000  # N=21000: several chunks + a partial tail
    plan, tod, wts, wg, good = _random_case(
        rng, n_det, n_samp, n_pix=50, mean_run=mean_run, step=1000
    )
    N = n_det * n_samp
    chunks = _make_chunk_plan(
        plan["bounds1"], N, plan["n_runs"], chunk_samples=chunk_samples
    )
    assert chunks is not None and chunks["n_full"] >= 2

    args = (
        jnp.asarray(tod).reshape(-1),
        jnp.asarray(wts).reshape(-1, 3),
        jnp.asarray(wg * np.ones((1, n_samp), np.float32)).reshape(-1),
    )
    key = (plan["bounds1"], plan["order"], plan["good_sorted"])
    td_one = run_stats_tod(*args, *key)
    td_chk = run_stats_tod(*args, *key, chunks=chunks)
    for a, b in zip(td_one, td_chk):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-4
        )

    pt_args = (
        args[1],
        args[2],
        jnp.asarray(good).reshape(-1),
    )
    pt_one = run_stats_pointing(*pt_args, *key)
    pt_chk = run_stats_pointing(*pt_args, *key, chunks=chunks)
    for a, b in zip(pt_one, pt_chk):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-4
        )


def test_chunked_no_tail():
    """Exact chunk-multiple length: the tail branch must be skipped."""
    rng = np.random.default_rng(99)
    n_det, n_samp = 2, 4096
    plan, tod, wts, wg, good = _random_case(
        rng, n_det, n_samp, n_pix=30, mean_run=5, step=512
    )
    N = n_det * n_samp
    chunks = _make_chunk_plan(
        plan["bounds1"], N, plan["n_runs"], chunk_samples=2048
    )
    assert chunks["tail"] == 0 and chunks["n_full"] == 4
    args = (
        jnp.asarray(tod).reshape(-1),
        jnp.asarray(wts).reshape(-1, 3),
        jnp.asarray(wg * np.ones((1, n_samp), np.float32)).reshape(-1),
    )
    key = (plan["bounds1"], plan["order"], plan["good_sorted"])
    td_one = run_stats_tod(*args, *key)
    td_chk = run_stats_tod(*args, *key, chunks=chunks)
    for a, b in zip(td_one, td_chk):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-4
        )
