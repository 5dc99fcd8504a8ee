#!/usr/bin/env python
"""Microbenchmark: run_stats_tod gather strategies on the live TPU.

The per-realization statistics pass is gather-bound (PROFILE_r03/r04:
~4.6 ns/sample at 64x524288, vs ~0.03 ns/sample of pure streaming
traffic).  This times the production kernel against candidate layouts:

  A. current: (n_blocks, k, B) blocked prefix + 2D bounds gather
     + row reorder gather
  B. per-column flat prefix: k separate 1D gathers at bounds + k 1D
     reorder gathers
  C. sorted-bounds: per-column flat prefix gathered DIRECTLY at
     pixel-sorted run bounds (bounds1[order], bounds1[order+1] are
     plan constants) — no reorder pass at all

Run on the TPU:  python scripts/bench_stats_kernel.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(n_det=64, n_samp=524288, mean_run=5.3):
    import jax
    import jax.numpy as jnp

    from toast_tpu.ops.kernels.fused_solver import (
        _STAT_BLOCK,
        prepare_fused_plan,
        run_stats_tod,
    )

    N = n_det * n_samp
    rng = np.random.default_rng(0)
    # synthetic pixel stream with realistic run-length statistics
    n_runs_target = int(N / mean_run)
    lens = rng.geometric(1.0 / mean_run, size=n_runs_target + 100000)
    ids = np.repeat(
        rng.integers(0, 12 * 512 * 512, size=lens.shape[0]), lens
    )[:N].astype(np.int64)
    pixels = jnp.asarray(ids.reshape(n_det, n_samp))

    step = 6000
    n_base = -(-n_samp // step)
    plan = prepare_fused_plan(pixels, n_samp, step, n_base, n_det)
    print(
        f"n_runs={plan['n_runs']} n_runs_b={plan['n_runs_b']} "
        f"n_hit={plan['n_hit']}",
        file=sys.stderr,
    )

    tod = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    wts = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))
    wg = jnp.asarray(rng.random(N).astype(np.float32))
    bounds1, order, good_sorted = (
        plan["bounds1"], plan["order"], plan["good_sorted"]
    )
    n_runs_b = plan["n_runs_b"]
    B = _STAT_BLOCK
    n_blocks = -(-N // B)
    NP = n_blocks * B

    # plan-side constants for variant C
    srt_lo = bounds1[order]
    srt_hi = bounds1[jnp.minimum(order + 1, n_runs_b)]
    bdry = (jnp.arange(n_blocks, dtype=jnp.int32) + 1) * B
    r_of_b = jnp.searchsorted(bounds1, bdry, side="left").astype(jnp.int32) - 1
    r_of_b = jnp.where(bdry <= N, jnp.clip(r_of_b, 0, n_runs_b - 1), n_runs_b)
    # inverse permutation: time-run -> sorted position
    inv_order = (
        jnp.zeros((n_runs_b + 1,), dtype=jnp.int32)
        .at[order]
        .set(jnp.arange(n_runs_b, dtype=jnp.int32))
    )
    r_of_b_sorted = inv_order[jnp.minimum(r_of_b, n_runs_b - 1)]
    r_of_b_sorted = jnp.where(r_of_b >= n_runs_b, n_runs_b, r_of_b_sorted)

    def flat_prefix(c):
        x = jnp.pad(c, (0, NP - N)).reshape(n_blocks, B)
        local = jnp.cumsum(x, axis=-1)
        return local.reshape(-1), local[:, -1]

    def variant_b(tod, wts, wg):
        wgt = wg * tod
        cols = [wgt * wts[:, i] for i in range(3)] + [wgt]
        safe = jnp.clip(bounds1 - 1, 0, NP - 1)
        at_start = (bounds1 % B == 0)
        outs = []
        for c in cols:
            p, bs = flat_prefix(c)
            loc = jnp.where(at_start, 0.0, p[safe])
            s = loc[1:] - loc[:-1]
            corr = jax.ops.segment_sum(
                bs, r_of_b, num_segments=n_runs_b + 1,
                indices_are_sorted=True,
            )[:n_runs_b]
            outs.append(jnp.where(good_sorted, (s + corr)[order], 0.0))
        return jnp.stack(outs, axis=-1)

    def variant_c(tod, wts, wg):
        wgt = wg * tod
        cols = [wgt * wts[:, i] for i in range(3)] + [wgt]
        lo_safe = jnp.clip(srt_lo - 1, 0, NP - 1)
        hi_safe = jnp.clip(srt_hi - 1, 0, NP - 1)
        lo_z = (srt_lo % B == 0)
        hi_z = (srt_hi % B == 0)
        outs = []
        for c in cols:
            p, bs = flat_prefix(c)
            lo = jnp.where(lo_z, 0.0, p[lo_safe])
            hi = jnp.where(hi_z, 0.0, p[hi_safe])
            corr = jax.ops.segment_sum(
                bs,
                r_of_b_sorted,
                num_segments=n_runs_b + 1,
                indices_are_sorted=False,
                unique_indices=True,
            )[:n_runs_b]
            outs.append(jnp.where(good_sorted, hi - lo + corr, 0.0))
        return jnp.stack(outs, axis=-1)

    fa = jax.jit(
        lambda t, w, g: jnp.stack(
            run_stats_tod(t, w, g, bounds1, order, good_sorted), axis=-1
        )
    )
    fb = jax.jit(variant_b)
    fc = jax.jit(variant_c)

    ra = fa(tod, wts, wg)
    rb = fb(tod, wts, wg)
    rc = fc(tod, wts, wg)
    ra0 = np.asarray(ra).reshape(n_runs_b, -1)[:, :4]
    for name, r in (("B", rb), ("C", rc)):
        d = np.abs(np.asarray(r) - ra0).max()
        scale = np.abs(ra0).max()
        print(f"variant {name}: max abs diff {d:.3e} (scale {scale:.3e})",
              file=sys.stderr)

    for name, f in (("A current", fa), ("B flatcol", fb), ("C sorted", fc)):
        # vary tod content to defeat any accidental caching
        best = 1e9
        for it in range(5):
            t2 = tod * (1.0 + 0.001 * it)
            r = f(t2, wts, wg)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            r = f(t2 * 1.0001, wts, wg)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        print(
            f"{name}: {best*1e3:8.2f} ms  ({best/N*1e9:6.3f} ns/samp)"
        )


if __name__ == "__main__":
    main(
        n_det=int(sys.argv[1]) if len(sys.argv) > 1 else 64,
        n_samp=int(sys.argv[2]) if len(sys.argv) > 2 else 524288,
    )
