"""Filtering kernels: masked least-squares template regression.

Rebuilds of the reference filter hot loops
(``src/libtoast/src/toast_tod_filter.cpp``: ``filter_polynomial:18``,
``filter_poly2D_solve:357``, ``bin_proj/bin_invcov:160``) as batched jitted
programs.  All of them reduce to flag-weighted normal equations
``(B^T W B) c = B^T W d`` solved in parallel — the contractions over the
sample (or detector) axis are matmuls that map straight onto the MXU,
replacing the reference's per-interval LAPACK calls.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def legendre_basis(x, order):
    """Legendre polynomials P_0..P_order at x (..., n) -> (..., n, order+1)."""
    polys = [jnp.ones_like(x), x]
    for n in range(1, order):
        polys.append(((2 * n + 1) * x * polys[n] - n * polys[n - 1]) / (n + 1))
    return jnp.stack(polys[: order + 1], axis=-1)


def chebyshev_basis(x, order):
    polys = [jnp.ones_like(x), x]
    for n in range(1, order):
        polys.append(2.0 * x * polys[n] - polys[n - 1])
    return jnp.stack(polys[: order + 1], axis=-1)


@jax.jit
def fit_and_subtract(basis, tod, good):
    """Regress a shared basis out of each detector's timestream.

    Args:
        basis: (n_samp, k) template functions.
        tod: (n_det, n_samp).
        good: (n_det, n_samp) 0/1 sample weights.

    Returns:
        filtered tod (the fit is subtracted only at *all* samples, matching
        the reference behavior of removing the model everywhere).
    """
    wb = good[..., None] * basis[None, :, :]  # (n_det, n_samp, k)
    ata = jnp.einsum("dnk,dnl->dkl", wb, basis[None, :, :] * good[..., None])
    atd = jnp.einsum("dnk,dn->dk", wb, tod)
    k = basis.shape[-1]
    ata = ata + 1.0e-12 * jnp.eye(k, dtype=ata.dtype)[None, :, :]
    coeff = jnp.linalg.solve(ata, atd[..., None])[..., 0]
    model = jnp.einsum("nk,dk->dn", basis, coeff)
    return tod - model


@partial(jax.jit, static_argnames=("order", "max_len"))
def poly_filter_intervals(tod, good, starts, lengths, order, max_len):
    """Per-interval Legendre filtering (reference ``filter_polynomial``).

    Each interval [start, start+length) of every detector gets an
    independent order-``order`` Legendre fit (flag-weighted) subtracted.
    Intervals are padded to ``max_len`` and processed in one batched
    program; out-of-range samples have zero weight.

    Args:
        tod: (n_det, n_samp).
        good: (n_det, n_samp) 0/1 weights.
        starts: (n_int,) int32 interval starts.
        lengths: (n_int,) int32 interval lengths (0 for padding entries).
        order: polynomial order.
        max_len: static maximum interval length.

    Returns:
        filtered tod.
    """
    n_det, n_samp = tod.shape
    k = order + 1
    offs = jnp.arange(max_len, dtype=jnp.int32)
    idx = starts[:, None] + offs[None, :]  # (n_int, max_len)
    inside = offs[None, :] < lengths[:, None]
    idx_safe = jnp.clip(idx, 0, n_samp - 1)

    # x in [-1, 1] over each interval
    denom = jnp.maximum(lengths - 1, 1).astype(jnp.float32)
    x = -1.0 + 2.0 * offs[None, :].astype(jnp.float32) / denom[:, None]
    x = jnp.where(inside, x, 0.0)
    basis = legendre_basis(x, order)  # (n_int, max_len, k)

    seg = tod[:, idx_safe]  # (n_det, n_int, max_len)
    w = good[:, idx_safe] * inside[None, :, :]

    wb = w[..., None] * basis[None, :, :, :]
    ata = jnp.einsum("dimk,diml->dikl", wb, basis[None] * w[..., None])
    atd = jnp.einsum("dimk,dim->dik", wb, seg)
    ata = ata + 1.0e-12 * jnp.eye(k, dtype=ata.dtype)[None, None, :, :]
    coeff = jnp.linalg.solve(ata, atd[..., None])[..., 0]  # (n_det, n_int, k)
    model = jnp.einsum("imk,dik->dim", basis, coeff) * inside[None, :, :]

    # scatter the per-interval models back (intervals are disjoint)
    flat_idx = idx_safe.reshape(-1)
    upd = (model * inside[None]).reshape(n_det, -1)
    out = tod.at[:, flat_idx].add(-upd)
    return out


@jax.jit
def common_mode_subtract(tod, good):
    """Subtract the flag-weighted mean across detectors at each sample."""
    wsum = jnp.sum(good, axis=0)
    mean = jnp.sum(tod * good, axis=0) / jnp.maximum(wsum, 1.0)
    return tod - mean[None, :]


@partial(jax.jit, static_argnames=())
def poly2d_filter(tod, good, templates):
    """Per-sample focalplane-mode regression (reference ``filter_poly2D``).

    Args:
        tod: (n_det, n_samp).
        good: (n_det, n_samp) 0/1 weights.
        templates: (n_det, n_mode) spatial modes evaluated per detector.

    Returns:
        filtered tod.
    """
    n_mode = templates.shape[-1]
    # per-sample normal equations, contracting over detectors (MXU)
    wt = good[:, :, None] * templates[:, None, :]  # (n_det, n_samp, n_mode)
    ata = jnp.einsum("dnk,dnl->nkl", wt, templates[:, None, :] * good[..., None])
    atd = jnp.einsum("dnk,dn->nk", wt, tod)
    ata = ata + 1.0e-12 * jnp.eye(n_mode, dtype=ata.dtype)[None, :, :]
    coeff = jnp.linalg.solve(ata, atd[..., None])[..., 0]  # (n_samp, n_mode)
    model = jnp.einsum("dk,nk->dn", templates, coeff)
    return tod - model * good
