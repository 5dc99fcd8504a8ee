"""Pallas TPU kernel: per-amplitude reduction of per-run values.

``out[g] = sum over runs r with amp[r] == g of v[r]`` — the transpose of
the amplitude expansion, the other half of every fused-solver PCG
iteration (``fused_solver.amp_reduce``).

The XLA one-hot einsum formulation materializes the (n_runs, 128)
``one_hot_lo * v`` contraction operand in HBM (~3 GB at production sizes,
~14 ms on v5e); here each 1024-run block builds its one-hot factors in
VMEM and accumulates a resident ``(n_hi, 3*128)`` float32 accumulator via
one bf16 MXU matmul per block — nothing but the inputs ever crosses HBM.

Exactness: the one-hot factors are exactly representable in bf16 and the
float32 payload is split into three bf16 components (8+8+8 mantissa bits)
recombined in float32 after the kernel — the result is bitwise equal to a
float32 gather-sum in block order, and deterministic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 4096  # large blocks amortize grid-step overhead (launch-bound)
_LOW = 128


def _reduce_kernel(amp_ref, val_ref, out_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    amp = amp_ref[:]                       # (block,) int32
    v = val_ref[:]                         # (block,) float32
    block = v.shape[0]
    n_hi = out_ref.shape[0]
    hi = amp // _LOW
    lo = amp - hi * _LOW
    # (BLOCK, 128) payload scattered onto the low lane, then an exact bf16
    # 3-way split (Mosaic only reshapes 32-bit vectors into new minor
    # dims, so mask in f32 first)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (block, _LOW), 1)
    mv = jnp.where(lanes == lo[:, None], v[:, None], jnp.float32(0))
    m1 = mv.astype(jnp.bfloat16)
    r1 = mv - m1.astype(jnp.float32)
    m2 = r1.astype(jnp.bfloat16)
    m3 = (r1 - m2.astype(jnp.float32)).astype(jnp.bfloat16)
    m = jnp.concatenate([m1, m2, m3], axis=1)
    # (n_hi, BLOCK) bf16 one-hot of the high digit
    oh_hi = (
        jax.lax.broadcasted_iota(jnp.int32, (n_hi, block), 0) == hi[None, :]
    ).astype(jnp.bfloat16)
    # precision must be DEFAULT: the package-wide HIGHEST default would
    # request an fp32 contract on bf16 operands, which Mosaic rejects
    # ("Bad lhs type").  One bf16 pass here is exact by construction —
    # one-hot factors and the 3-way split components are bf16 values.
    out_ref[:] += jnp.dot(
        oh_hi, m, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _expand_kernel(amp_ref, tab_ref, out_ref):
    amp = amp_ref[:]                       # (block,) int32
    block = amp.shape[0]
    n_hi = tab_ref.shape[0]
    hi = amp // _LOW
    lo = amp - hi * _LOW
    # (block, n_hi) bf16 one-hot of the high digit: one MXU pass against
    # the VMEM-resident exact-split table gives rows (block, 3*128)
    oh_hi = (
        jax.lax.broadcasted_iota(jnp.int32, (block, n_hi), 1) == hi[:, None]
    ).astype(jnp.bfloat16)
    m = jnp.dot(
        oh_hi, tab_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    lanes = jax.lax.broadcasted_iota(jnp.int32, (block, _LOW), 1)
    sel = lanes == lo[:, None]
    pick = (
        jnp.where(sel, m[:, :_LOW], 0.0)
        + jnp.where(sel, m[:, _LOW : 2 * _LOW], 0.0)
        + jnp.where(sel, m[:, 2 * _LOW :], 0.0)
    )
    out_ref[:] = jnp.sum(pick, axis=1)


@partial(jax.jit, static_argnames=("n_hi", "interpret"))
def amp_expand_pallas(a, amp_sorted, n_hi, interpret=False):
    """``a[amp_sorted]`` — Pallas VMEM-table gather via the MXU.

    The expansion twin of :func:`amp_reduce_pallas`: the amplitude table
    (tiny — n_amp <= tens of thousands) is padded to (n_hi, 128), split
    into three exact bf16 components, and stays VMEM-resident while each
    run block gathers its rows with one bf16 one-hot matmul + lane
    select.  HBM traffic is just the ids in and values out (8 B/run),
    versus the XLA one-hot einsum's materialized (n_runs, 128) operands.
    Exact: one-hot factors and split components are bf16-representable,
    so the recombined float32 equals ``a[amp_sorted]`` bitwise.

    Args:
        a: (n_amp,) float32 amplitudes.
        amp_sorted: (n_runs_b,) int32 ids in [0, n_amp).
        n_hi: static ceil(n_amp / 128).

    Returns:
        (n_runs_b,) float32 ``a[amp_sorted]``.
    """
    n_runs_b = amp_sorted.shape[0]
    a2 = jnp.zeros((n_hi * _LOW,), dtype=a.dtype).at[: a.shape[0]].set(a)
    a2 = a2.reshape(n_hi, _LOW)
    a_1 = a2.astype(jnp.bfloat16)
    r_1 = a2 - a_1.astype(jnp.float32)
    a_2 = r_1.astype(jnp.bfloat16)
    a_3 = (r_1 - a_2.astype(jnp.float32)).astype(jnp.bfloat16)
    tab = jnp.concatenate([a_1, a_2, a_3], axis=1)  # (n_hi, 3*128) bf16
    block = min(_BLOCK, n_runs_b)
    while n_runs_b % block:
        block //= 2
    n_blocks = n_runs_b // block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block,), lambda b: (b,)),
            pl.BlockSpec(tab.shape, lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block,), lambda b: (b,)),
    )
    return pl.pallas_call(
        _expand_kernel,
        out_shape=jax.ShapeDtypeStruct((n_runs_b,), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(amp_sorted, tab)


@partial(jax.jit, static_argnames=("n_hi", "n_amp", "interpret"))
def amp_reduce_pallas(vals, amp_sorted, n_hi, n_amp, interpret=False):
    """sum of ``vals`` per amplitude id — Pallas MXU block accumulation.

    Args:
        vals: (n_runs_b,) float32 per-run values (already masked).
        amp_sorted: (n_runs_b,) int32 amplitude ids in [0, n_amp).
        n_hi: static ceil(n_amp / 128).
        n_amp: static amplitude count.

    Returns:
        (n_amp,) float32 per-amplitude sums.
    """
    n_runs_b = vals.shape[0]
    # largest power-of-two-divided block <= _BLOCK that divides the bucket
    # (buckets are multiples of 512, so this terminates at >= 512 for all
    # production sizes; tiny power-of-two buckets use one whole block)
    block = min(_BLOCK, n_runs_b)
    while n_runs_b % block:
        block //= 2
    n_blocks = n_runs_b // block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block,), lambda b: (b,)),
            pl.BlockSpec((block,), lambda b: (b,)),
        ],
        out_specs=pl.BlockSpec((n_hi, 3 * _LOW), lambda b: (0, 0)),
    )
    acc = pl.pallas_call(
        _reduce_kernel,
        out_shape=jax.ShapeDtypeStruct((n_hi, 3 * _LOW), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(amp_sorted, vals)
    total = acc[:, :_LOW] + acc[:, _LOW : 2 * _LOW] + acc[:, 2 * _LOW :]
    return total.reshape(-1)[:n_amp]
