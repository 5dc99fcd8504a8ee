#!/usr/bin/env python
"""Microbenchmark: fused-solver PCG iteration components on the TPU.

Times each building block of the per-iteration matvec at production
shape (64 det x 524288 samp -> ~6.3M runs), each inside a 10-step
``fori_loop`` in ONE jit so dispatch/RTT amortizes out:

  expand_xla     amp_expand (one-hot matmul, HIGHEST)
  expand_gather  plain a[ids] XLA gather
  expand_pallas  amp_expand_pallas (VMEM-table MXU gather)
  reduce_pallas  amp_reduce_pallas (current default)
  bin_runs       segment_sum_sorted runs->hits
  hit_expand     expand_hit_to_runs hits->runs
  elementwise    the per-run streaming math of one matvec

Run:  python scripts/bench_iter_kernel.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(n_det=64, n_samp=524288, mean_run=5.3):
    import jax
    import jax.numpy as jnp

    from toast_tpu.ops.kernels.fused_solver import (
        _LOW,
        amp_expand,
        expand_hit_to_runs,
        prepare_fused_plan,
        segment_sum_sorted,
    )
    from toast_tpu.ops.kernels.pallas_reduce import (
        amp_expand_pallas,
        amp_reduce_pallas,
    )

    N = n_det * n_samp
    rng = np.random.default_rng(0)
    n_runs_target = int(N / mean_run)
    lens = rng.geometric(1.0 / mean_run, size=n_runs_target + 100000)
    ids = np.repeat(
        rng.integers(0, 12 * 512 * 512, size=lens.shape[0]), lens
    )[:N].astype(np.int64)
    pixels = jnp.asarray(ids.reshape(n_det, n_samp))
    step = 6000
    n_base = -(-n_samp // step)
    plan = prepare_fused_plan(pixels, n_samp, step, n_base, n_det)
    n_runs_b = plan["n_runs_b"]
    n_amp, n_hi = plan["n_amp"], plan["n_hi"]
    n_hit_b = plan["n_hit_b"]
    print(
        f"n_runs_b={n_runs_b} n_amp={n_amp} n_hi={n_hi} n_hit_b={n_hit_b}",
        file=sys.stderr,
    )

    amp_sorted = plan["amp_sorted"]
    amp_hi = amp_sorted // _LOW
    amp_lo = amp_sorted % _LOW
    a = jnp.asarray(rng.standard_normal(n_amp).astype(np.float32))
    v_runs = jnp.asarray(rng.standard_normal(n_runs_b).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((n_runs_b, 3)).astype(np.float32))
    vals_hit = jnp.asarray(rng.standard_normal((n_hit_b, 3)).astype(np.float32))

    def loop(f):
        def run(x):
            def body(i, c):
                return f(c * (1.0 + 1e-7 * i))

            return jax.lax.fori_loop(0, 10, body, x)

        return jax.jit(run)

    cases = {
        "expand_xla": (
            loop(
                lambda a_: a_
                + 1e-20 * jnp.sum(amp_expand(a_, amp_hi, amp_lo, n_hi))
            ),
            a,
        ),
        "expand_gather": (
            loop(lambda a_: a_ + 1e-20 * jnp.sum(a_[amp_sorted])),
            a,
        ),
        "expand_pallas": (
            loop(
                lambda a_: a_
                + 1e-20 * jnp.sum(amp_expand_pallas(a_, amp_sorted, n_hi))
            ),
            a,
        ),
        "reduce_pallas": (
            loop(
                lambda v: v
                + 1e-20
                * jnp.sum(amp_reduce_pallas(v, amp_sorted, n_hi, n_amp))
            ),
            v_runs,
        ),
        "bin_runs": (
            loop(
                lambda w: w
                + 1e-20
                * jnp.sum(segment_sum_sorted(w, plan["hit_bounds"]))
            ),
            W,
        ),
        "hit_expand": (
            loop(
                lambda vh: vh
                + 1e-20
                * jnp.sum(
                    expand_hit_to_runs(
                        vh,
                        plan["hit_starts"],
                        plan["hit_valid"],
                        plan["rank_block"],
                        n_runs_b,
                    )
                )
            ),
            vals_hit,
        ),
        "elementwise": (
            loop(
                lambda w: w
                + 1e-20 * jnp.sum(w * jnp.sum(W * w, axis=1, keepdims=True))
            ),
            W,
        ),
    }

    for name, (f, x) in cases.items():
        try:
            r = f(x)
            jax.block_until_ready(r)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f(x))
                best = min(best, time.perf_counter() - t0)
            print(f"{name:16s}: {best/10*1e3:8.3f} ms/iter")
        except Exception as e:
            print(f"{name:16s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main(
        n_det=int(sys.argv[1]) if len(sys.argv) > 1 else 64,
        n_samp=int(sys.argv[2]) if len(sys.argv) > 2 else 524288,
    )
