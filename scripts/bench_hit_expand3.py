#!/usr/bin/env python
"""Round 3: windowed Pallas kernels for the per-iteration run<->hit ops.

Pixel-sorted runs mean a block of B runs touches a CONTIGUOUS window of
hits (measured: <= 83 hits per 512 runs at flagship).  So both hot ops
become streaming window kernels:

  hit->runs expand: per block, one-hot (B, WIN) x window (WIN, KP) MXU
  runs->hits segsum: transposed one-hot + a shift-register VMEM
    accumulator carried across the sequential grid (handles hits that
    straddle block boundaries exactly)

Variants timed at flagship shape, with bitwise/ulp correctness checks.

Run:  python scripts/bench_hit_expand3.py [n_det] [n_samp]
"""

import sys
import time
from functools import partial

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
        print(f"{name:20s}: {best/10*1e3:8.3f} ms/iter", flush=True)
        return r
    except Exception as e:
        print(
            f"{name:20s}: FAILED {type(e).__name__}: {str(e)[:300]}",
            flush=True,
        )
        return None


def main(n_det=128, n_samp=2**20, mean_run=5.3):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from toast_tpu.ops.kernels.fused_solver import (
        expand_hit_to_runs,
        prepare_fused_plan,
    )
    from toast_tpu.ops.kernels.mapkernels import segment_sum_sorted

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
    k = 3
    KP = 8
    hit_starts = plan["hit_starts"]
    hit_valid = plan["hit_valid"]
    hit_bounds = plan["hit_bounds"]
    print(f"n_runs_b={n_runs_b} n_hit_b={n_hit_b}", file=sys.stderr)

    vals_hit = jnp.asarray(rng.standard_normal((n_hit_b, k)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((n_runs_b, k)).astype(np.float32))

    @jax.jit
    def make_rank():
        ones = jnp.where(hit_valid, 1, 0).astype(jnp.int32)
        cnt = (
            jnp.zeros((n_runs_b + 1,), jnp.int32)
            .at[jnp.minimum(hit_starts, n_runs_b)]
            .add(ones)[:n_runs_b]
        )
        return jnp.cumsum(cnt) - 1

    rank = jax.block_until_ready(make_rank())

    def win_plan(B):
        nb = n_runs_b // B
        r2 = rank.reshape(nb, B)
        ws = (r2[:, 0] // 8) * 8
        rl = (r2 - ws[:, None]).astype(jnp.int32)
        wmax = int(jax.device_get(jnp.max(rl))) + 1
        WIN = -(-(wmax + 1) // 8) * 8
        return nb, ws.astype(jnp.int32), rl, WIN

    # ---------------- expand (hits -> runs) ----------------
    def make_expand(B):
        nb, ws, rl, WIN = win_plan(B)
        print(f"expand B={B}: WIN={WIN}", file=sys.stderr)

        def kern(ws_ref, rl_ref, win_ref, out_ref):
            rl_ = rl_ref[:]                  # (B,)
            win = win_ref[:]                 # (WIN, KP)
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (B, WIN), 1)
                == rl_[:, None]
            ).astype(jnp.bfloat16)
            w1 = win.astype(jnp.bfloat16)
            r1 = win - w1.astype(jnp.float32)
            w2 = r1.astype(jnp.bfloat16)
            w3 = (r1 - w2.astype(jnp.float32)).astype(jnp.bfloat16)
            m = jnp.concatenate([w1, w2, w3], axis=1)
            o = jnp.dot(
                oh, m, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            out_ref[:] = o[:, :KP] + o[:, KP : 2 * KP] + o[:, 2 * KP :]

        @jax.jit
        def run(vh):
            vhp = jnp.pad(vh, ((0, WIN), (0, KP - vh.shape[1])))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((None, B), lambda b, ws_: (b, 0)),
                    pl.BlockSpec(
                        (pl.Element(WIN), KP), lambda b, ws_: (ws_[b], 0)
                    ),
                ],
                out_specs=pl.BlockSpec((B, KP), lambda b, ws_: (b, 0)),
            )
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((n_runs_b, KP), jnp.float32),
                grid_spec=grid_spec,
            )(ws, rl, vhp)
            return out[:, :k]

        return run

    # f32-direct variant (no split): is an exact f32 matmul available?
    def make_expand_f32(B):
        nb, ws, rl, WIN = win_plan(B)

        def kern(ws_ref, rl_ref, win_ref, out_ref):
            rl_ = rl_ref[:]
            win = win_ref[:]
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (B, WIN), 1)
                == rl_[:, None]
            ).astype(jnp.float32)
            out_ref[:] = jnp.dot(
                oh, win, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        @jax.jit
        def run(vh):
            vhp = jnp.pad(vh, ((0, WIN), (0, KP - vh.shape[1])))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((None, B), lambda b, ws_: (b, 0)),
                    pl.BlockSpec(
                        (pl.Element(WIN), KP), lambda b, ws_: (ws_[b], 0)
                    ),
                ],
                out_specs=pl.BlockSpec((B, KP), lambda b, ws_: (b, 0)),
            )
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((n_runs_b, KP), jnp.float32),
                grid_spec=grid_spec,
            )(ws, rl, vhp)
            return out[:, :k]

        return run

    # ---------------- segsum (runs -> hits) ----------------
    def make_segsum(B):
        nb, ws, rl, WIN = win_plan(B)
        print(f"segsum B={B}: WIN={WIN}", file=sys.stderr)
        n_shift = max(1, (WIN // 8 - 1)).bit_length()

        def kern(ws_ref, rl_ref, v_ref, out_ref, acc_ref):
            b = pl.program_id(0)
            rl_ = rl_ref[:]                  # (B,)
            v = v_ref[:]                     # (B, KP) f32
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (WIN, B), 0)
                == rl_[None, :]
            ).astype(jnp.bfloat16)
            v1 = v.astype(jnp.bfloat16)
            r1 = v - v1.astype(jnp.float32)
            v2 = r1.astype(jnp.bfloat16)
            v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
            m = jnp.concatenate([v1, v2, v3], axis=1)  # (B, 3KP)
            o = jnp.dot(
                oh, m, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            part = o[:, :KP] + o[:, KP : 2 * KP] + o[:, 2 * KP :]

            # shift previous accumulator window down by (ws[b]-ws[b-1])
            # rows (multiple of 8) via log2 static rolls + selects
            prev_ws = jnp.where(b > 0, ws_ref[jnp.maximum(b - 1, 0)], ws_ref[0])
            shift = jnp.where(b > 0, ws_ref[b] - prev_ws, 0)
            q = shift // 8
            # scratch persists across the sequential grid but starts
            # uninitialized: zero it on the first step
            acc = jnp.where(b == 0, 0.0, acc_ref[:])
            for s in range(n_shift):
                step_rows = 8 * (1 << s)
                rolled = pltpu.roll(acc, -step_rows, 0)
                rows = jax.lax.broadcasted_iota(jnp.int32, (WIN, KP), 0)
                rolled = jnp.where(rows < WIN - step_rows, rolled, 0.0)
                acc = jnp.where((q & (1 << s)) > 0, rolled, acc)
            acc = acc + part
            acc_ref[:] = acc
            out_ref[:] = acc

        @jax.jit
        def run(v_runs):
            vp = jnp.pad(v_runs, ((0, 0), (0, KP - v_runs.shape[1])))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((None, B), lambda b, ws_: (b, 0)),
                    pl.BlockSpec((B, KP), lambda b, ws_: (b, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (pl.Element(WIN), KP), lambda b, ws_: (ws_[b], 0)
                ),
                scratch_shapes=[pltpu.VMEM((WIN, KP), jnp.float32)],
            )
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(
                    (n_hit_b + WIN, KP), jnp.float32
                ),
                grid_spec=grid_spec,
            )(ws, rl, vp)
            return out[:n_hit_b, :k]

        return run

    def loop(f):
        def run(x):
            def body(i, c):
                return f(c * (1.0 + 1e-7 * i))

            return jax.lax.fori_loop(0, 10, body, x)

        return jax.jit(run)

    eps = 1e-20
    ref_expand = expand_hit_to_runs(
        vals_hit, hit_starts, hit_valid, plan["rank_block"], n_runs_b
    )
    ref_seg = segment_sum_sorted(W, hit_bounds)
    gather_ref = vals_hit[rank]

    for B in (1024, 2048):
        f = make_expand(B)
        bench(
            f"win_expand_{B}",
            loop(lambda vh, f=f: vh + eps * jnp.sum(f(vh))),
            vals_hit,
        )
        try:
            got = jax.device_get(f(vals_hit))
            print(
                f"  win_expand_{B} vs gather max|diff| =",
                np.max(np.abs(got - np.asarray(jax.device_get(gather_ref)))),
                file=sys.stderr,
            )
        except Exception as e:
            print("  check failed:", str(e)[:200], file=sys.stderr)

    f32e = make_expand_f32(1024)
    bench(
        "win_expand_f32",
        loop(lambda vh: vh + eps * jnp.sum(f32e(vh))),
        vals_hit,
    )
    try:
        got = jax.device_get(f32e(vals_hit))
        print(
            "  win_expand_f32 vs gather max|diff| =",
            np.max(np.abs(got - np.asarray(jax.device_get(gather_ref)))),
            file=sys.stderr,
        )
    except Exception as e:
        print("  f32 check failed:", str(e)[:200], file=sys.stderr)

    for B in (1024, 2048):
        f = make_segsum(B)
        bench(
            f"win_segsum_{B}",
            loop(lambda w, f=f: w + eps * jnp.sum(f(w))),
            W,
        )
        try:
            got = jax.device_get(f(W))
            refv = np.asarray(jax.device_get(ref_seg))
            d = np.abs(got - refv)
            rel = d / np.maximum(np.abs(refv), 1e-6)
            print(
                f"  win_segsum_{B}: max|diff|={np.max(d):.3e} "
                f"maxrel={np.max(rel):.3e}",
                file=sys.stderr,
            )
        except Exception as e:
            print("  check failed:", str(e)[:200], file=sys.stderr)


if __name__ == "__main__":
    main(
        n_det=int(sys.argv[1]) if len(sys.argv) > 1 else 128,
        n_samp=int(sys.argv[2]) if len(sys.argv) > 2 else 2**20,
    )
