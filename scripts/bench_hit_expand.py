#!/usr/bin/env python
"""Microbenchmark: expand_hit_to_runs / segment_sum_sorted internals.

Times each internal piece of the two per-iteration hot kernels at the
flagship shape (128 det x 2^20 samp -> ~29M runs), plus candidate
layout fixes:

  scatter         the .at[hit_starts].add(dv) first-difference scatter
  prefix_nbk      prefix_blocked as shipped: einsum nbk,bc->nck (k minor)
  prefix_knb      transposed: einsum knb,bc->knc (k batch-major)
  prefix_nb_x3    k separate (n_blocks, B) x (B, B) plain matmuls
  hit_expand      current expand_hit_to_runs end to end
  hit_expand_v2   scatter + transposed prefix
  seg_sum         current segment_sum_sorted end to end
  seg_sum_v2      transposed-prefix segment sum

Run:  python scripts/bench_hit_expand.py [n_det] [n_samp]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(name, f, *args):
    import jax

    try:
        r = f(*args)
        jax.block_until_ready(r)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:16s}: {best/10*1e3:8.3f} ms/iter", flush=True)
    except Exception as e:
        print(f"{name:16s}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def main(n_det=128, n_samp=2**20, mean_run=5.3):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from toast_tpu.ops.kernels.fused_solver import (
        _STAT_BLOCK,
        expand_hit_to_runs,
        prepare_fused_plan,
    )
    from toast_tpu.ops.kernels.mapkernels import (
        _SEG_BLOCK,
        _twosum,
        prefix_blocked,
        segment_sum_sorted,
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
    n_hit_b = plan["n_hit_b"]
    print(
        f"n_runs_b={n_runs_b} n_hit_b={n_hit_b} "
        f"STAT_BLOCK={_STAT_BLOCK} SEG_BLOCK={_SEG_BLOCK}",
        file=sys.stderr,
    )

    k = 3
    vals_hit = jnp.asarray(rng.standard_normal((n_hit_b, k)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((n_runs_b, k)).astype(np.float32))
    hit_starts = plan["hit_starts"]
    hit_valid = plan["hit_valid"]
    rank_block = plan["rank_block"]
    hit_bounds = plan["hit_bounds"]

    def loop(f):
        def run(x):
            def body(i, c):
                return f(c * (1.0 + 1e-7 * i))

            return jax.lax.fori_loop(0, 10, body, x)

        return jax.jit(run)

    # --- pieces ---
    B = _STAT_BLOCK
    n_blocks = n_runs_b // B

    def scatter_only(vh):
        prev = jnp.concatenate(
            [jnp.zeros((1, k), vh.dtype), vh[:-1]], axis=0
        )
        dv = jnp.where(hit_valid[:, None], vh - prev, 0.0)
        return (
            jnp.zeros((n_runs_b + 1, k), dtype=vh.dtype)
            .at[jnp.minimum(hit_starts, n_runs_b)]
            .add(dv)[:n_runs_b]
        )

    x_blocked = jnp.asarray(
        rng.standard_normal((n_blocks, B, k)).astype(np.float32)
    )

    def prefix_knb(x):
        tri = jnp.triu(jnp.ones((B, B), x.dtype))
        xt = jnp.moveaxis(x, -1, 0)  # (k, n_blocks, B)
        out = jnp.einsum(
            "knb,bc->knc", xt, tri, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.moveaxis(out, 0, -1)

    def prefix_nb_x3(x):
        tri = jnp.triu(jnp.ones((B, B), x.dtype))
        outs = [
            jnp.dot(x[:, :, c], tri, precision=jax.lax.Precision.HIGHEST)
            for c in range(x.shape[-1])
        ]
        return jnp.stack(outs, axis=-1)

    def hit_expand_v2(vh):
        diffs = scatter_only(vh)
        x = diffs.reshape(n_blocks, B, k).at[:, 0, :].set(0.0)
        seed = vh[jnp.minimum(rank_block, vh.shape[0] - 1)]
        return (seed[:, None, :] + prefix_knb(x)).reshape(n_runs_b, k)

    # transposed-prefix segment sum
    SB = _SEG_BLOCK

    def seg_sum_v2(sv):
        n = sv.shape[0]
        nb = -(-n // SB)
        pad = nb * SB - n
        x = jnp.pad(sv, ((0, pad), (0, 0))).reshape(nb, SB, k)
        local = prefix_knb(x)
        block_sums = local[:, -1, :]

        def combine(a, b):
            s, e = _twosum(a[0], b[0])
            return s, e + a[1] + b[1]

        hi, lo = jax.lax.associative_scan(
            combine, (block_sums, jnp.zeros_like(block_sums)), axis=0
        )
        zero = jnp.zeros((1, k), dtype=sv.dtype)
        ex_hi = jnp.concatenate([zero, hi], axis=0)
        ex_lo = jnp.concatenate([zero, lo], axis=0)
        b = hit_bounds
        blk = b // SB
        off = b % SB
        loc = jnp.where(
            (off == 0)[..., None],
            jnp.zeros((b.shape[0], k), sv.dtype),
            local[jnp.minimum(blk, nb - 1), jnp.maximum(off, 1) - 1],
        )
        hi_b, lo_b, loc_b = ex_hi[blk], ex_lo[blk], loc
        return (
            (hi_b[1:] - hi_b[:-1])
            + (lo_b[1:] - lo_b[:-1])
            + (loc_b[1:] - loc_b[:-1])
        )

    eps = 1e-20
    bench("scatter", loop(lambda vh: vh + eps * jnp.sum(scatter_only(vh))), vals_hit)
    bench(
        "prefix_nbk",
        loop(lambda x: x + eps * jnp.sum(prefix_blocked(x, axis=1))),
        x_blocked,
    )
    bench("prefix_knb", loop(lambda x: x + eps * jnp.sum(prefix_knb(x))), x_blocked)
    bench(
        "prefix_nb_x3",
        loop(lambda x: x + eps * jnp.sum(prefix_nb_x3(x))),
        x_blocked,
    )
    bench(
        "hit_expand",
        loop(
            lambda vh: vh
            + eps
            * jnp.sum(
                expand_hit_to_runs(
                    vh, hit_starts, hit_valid, rank_block, n_runs_b
                )
            )
        ),
        vals_hit,
    )
    bench(
        "hit_expand_v2",
        loop(lambda vh: vh + eps * jnp.sum(hit_expand_v2(vh))),
        vals_hit,
    )
    bench(
        "seg_sum",
        loop(lambda w: w + eps * jnp.sum(segment_sum_sorted(w, hit_bounds))),
        W,
    )
    bench("seg_sum_v2", loop(lambda w: w + eps * jnp.sum(seg_sum_v2(w))), W)

    # correctness cross-checks (single call, small tolerance)
    a = expand_hit_to_runs(vals_hit, hit_starts, hit_valid, rank_block, n_runs_b)
    b = hit_expand_v2(vals_hit)
    print(
        "hit_expand max|diff| =", float(jnp.max(jnp.abs(a - b))), file=sys.stderr
    )
    c = segment_sum_sorted(W, hit_bounds)
    d = seg_sum_v2(W)
    print(
        "seg_sum   max|diff| =", float(jnp.max(jnp.abs(c - d))), file=sys.stderr
    )


if __name__ == "__main__":
    main(
        n_det=int(sys.argv[1]) if len(sys.argv) > 1 else 128,
        n_samp=int(sys.argv[2]) if len(sys.argv) > 2 else 2**20,
    )
