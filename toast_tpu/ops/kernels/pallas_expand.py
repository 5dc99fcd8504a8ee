"""Pallas TPU kernel: monotone row expansion from a small table.

``out[i] = table[rank[i]]`` where ``rank`` is non-decreasing — the
hit-pixel -> run broadcast at the heart of the fused destriping solver
(``fused_solver.expand_hit_to_runs``).  Measured XLA primitive costs on
v5e make both obvious formulations expensive: a random gather issues
scalar addresses at ~12 ns/row and a scatter-seeded fill costs ~81 ns/row
at the scatter.  But monotone ranks mean each 512-row output block reads
only the table window ``[rank[block start], rank[block start] + 512]`` —
so the expansion is a *block-local* gather, and block-local gathers are
one-hot matmuls on the MXU:

    window = table[base : base + 640]            (dynamic VMEM slice)
    onehot[i, j] = (rank[i] - base == j)         (VPU compares)
    out_block = onehot @ window                  (MXU)

The per-block window start (the segment rank at each block start) is part
of the solver plan, prefetched as scalars.  The whole expansion runs at
MXU/stream speed with zero scalar-issued addresses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 1024  # 1-D i32 operands carry XLA layout T(1024)
_WIN = 1280    # 1024 max in-block rank span + 128 alignment slack + 128


def _expand_kernel(rb_ref, rank_ref, table_ref, out_ref):
    # table is stored transposed (k, n_hit_b): a (N, 4) table resident in
    # VMEM would lane-pad its minor dim 4 -> 128 (32x, hundreds of MB)
    b = pl.program_id(0)
    # lane-dim dynamic slices must start at a multiple of 128
    base = pl.multiple_of((rb_ref[b] // 128) * 128, 128)
    win_t = table_ref[:, pl.ds(base, _WIN)]          # (k, WIN)
    local = rank_ref[:] - base                       # (BLOCK,) lanes
    oh_t = (
        jax.lax.broadcasted_iota(jnp.int32, (_WIN, _BLOCK), 0)
        == local[None, :]
    ).astype(jnp.bfloat16)
    # One single-pass bf16 matmul stays exact: the one-hot factor is
    # exactly representable in bf16, and the float32 payload is split into
    # three bf16 components (8+8+8 mantissa bits) stacked on the sublane
    # dim — the MXU processes up to 128 sublanes either way, so the split
    # triples nothing but the (tiny) row count.  Selected triplets
    # recombine exactly in float32.
    h1 = win_t.astype(jnp.bfloat16)
    r1 = win_t - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)
    k = win_t.shape[0]
    split = jnp.concatenate([h1, h2, h3], axis=0)    # (3k, WIN) bf16
    out3 = jnp.dot(split, oh_t, preferred_element_type=jnp.float32)
    out_t = out3[:k] + out3[k : 2 * k] + out3[2 * k :]
    out_ref[:] = out_t.T


@partial(jax.jit, static_argnames=("n_runs_b",))
def expand_rows_pallas(table, rank_block, rank_sorted, n_runs_b):
    """Monotone expansion ``table[rank_sorted]`` as a Pallas TPU kernel.

    Args:
        table: (n_hit_b, k) float32 rows.
        rank_block: (n_runs_b / 1024,) int32 rank at each output block start.
        rank_sorted: (n_runs_b,) int32 non-decreasing row indices.
        n_runs_b: static output length (multiple of 1024).

    Returns:
        (n_runs_b, k) float32.
    """
    k = table.shape[-1]
    n_blocks = n_runs_b // _BLOCK
    padded = jnp.pad(table.T, ((0, 0), (0, _WIN)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((_BLOCK,), lambda b, rb: (b,)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, k), lambda b, rb: (b, 0)),
    )
    out = pl.pallas_call(
        _expand_kernel,
        out_shape=jax.ShapeDtypeStruct((n_runs_b, k), jnp.float32),
        grid_spec=grid_spec,
    )(rank_block, rank_sorted, padded)
    return out
