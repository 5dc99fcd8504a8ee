"""Pallas amplitude-reduction kernel vs the XLA one-hot formulation and a
float64 oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from toast_tpu.ops.kernels.fused_solver import amp_reduce
from toast_tpu.ops.kernels.pallas_reduce import amp_reduce_pallas


@pytest.mark.parametrize("n_amp", [60, 600, 5632])
def test_amp_reduce_pallas_matches_oracle(n_amp):
    rng = np.random.default_rng(5)
    n_runs_b = 16384
    n_hi = -(-n_amp // 128)
    v = (rng.normal(size=n_runs_b) * 100.0).astype(np.float32)
    amp = rng.integers(0, n_amp, n_runs_b).astype(np.int32)

    got = np.asarray(
        amp_reduce_pallas(
            jnp.asarray(v), jnp.asarray(amp), n_hi, n_amp, interpret=True
        )
    )
    want = np.zeros(n_amp, np.float64)
    np.add.at(want, amp, v.astype(np.float64))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-6

    xla = np.asarray(
        amp_reduce(
            jnp.asarray(v)[:, None],
            jnp.asarray(amp) // 128,
            jnp.asarray(amp) % 128,
            n_hi,
            n_amp,
        )
    )[:, 0]
    assert np.abs(xla - want).max() / scale < 1e-6


def test_amp_reduce_pallas_empty_amplitudes():
    """Amplitudes with no runs reduce to exactly zero."""
    n_amp, n_runs_b = 300, 2048
    n_hi = -(-n_amp // 128)
    v = np.ones(n_runs_b, np.float32)
    amp = np.zeros(n_runs_b, np.int32)  # everything lands on amplitude 0
    got = np.asarray(
        amp_reduce_pallas(
            jnp.asarray(v), jnp.asarray(amp), n_hi, n_amp, interpret=True
        )
    )
    assert got[0] == n_runs_b
    assert np.all(got[1:] == 0.0)
