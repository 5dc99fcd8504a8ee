"""Pixel covariance operations: invert, multiply, apply.

Rebuild of ``src/toast/covariance.py:80,179,262`` +
``src/libtoast/src/toast_map_cov.cpp:246-527``.  The diagonal (per-pixel)
block covariance is stored as the packed upper triangle
(nnz*(nnz+1)/2 values per pixel).  Inversion uses a batched eigendecomposition
with an rcond threshold: pixels whose condition number is too poor are
zeroed, exactly like the reference.  Everything is one jitted batched
program over all pixels — the reference's per-submap OpenMP loops become a
single (n_pix, nnz, nnz) ``jnp.linalg.eigh``.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .pixels import PixelData


def _nnz_from_tri(n_tri):
    nnz = int((np.sqrt(8 * n_tri + 1) - 1) / 2)
    if nnz * (nnz + 1) // 2 != n_tri:
        raise ValueError(f"{n_tri} is not a triangle number")
    return nnz


def _tri_indices(nnz):
    rows, cols = [], []
    for i in range(nnz):
        for j in range(i, nnz):
            rows.append(i)
            cols.append(j)
    return np.array(rows), np.array(cols)


@partial(jax.jit, static_argnames=("nnz", "do_rcond"))
def _invert_tri(tri, threshold, nnz, do_rcond=False):
    """Invert packed-triangle matrices with rcond cut.

    tri: (n_pix, n_tri).  Returns (inverted tri, rcond array).
    """
    n_pix = tri.shape[0]
    if nnz == 1:
        val = tri[:, 0]
        good = val > threshold
        inv = jnp.where(good, 1.0 / jnp.where(good, val, 1.0), 0.0)
        rcond = jnp.where(good, 1.0, 0.0)
        return inv[:, None], rcond

    rows, cols = _tri_indices(nnz)
    mat = jnp.zeros((n_pix, nnz, nnz), dtype=jnp.float32)
    mat = mat.at[:, rows, cols].set(tri)
    mat = mat.at[:, cols, rows].set(tri)

    evals, evecs = jnp.linalg.eigh(mat)
    emax = evals[:, -1]
    emin = evals[:, 0]
    rcond = jnp.where(emax > 0, emin / jnp.where(emax > 0, emax, 1.0), 0.0)
    good = (rcond >= threshold) & (emax > 0)

    inv_evals = jnp.where(evals > 0, 1.0 / jnp.where(evals > 0, evals, 1.0), 0.0)
    inv = jnp.einsum("pij,pj,pkj->pik", evecs, inv_evals, evecs)
    inv = jnp.where(good[:, None, None], inv, 0.0)
    inv_tri = inv[:, rows, cols]
    rcond = jnp.where(good, rcond, 0.0)
    return inv_tri, rcond


def covariance_invert(npp, threshold, rcond=None, use_alltoall=False):
    """Invert a diagonal-block pixel covariance in place.

    Args:
        npp: PixelData with n_value = nnz*(nnz+1)/2.
        threshold: rcond threshold below which pixels are zeroed.
        rcond: optional PixelData (n_value=1) to receive the rcond map.
    """
    nnz = _nnz_from_tri(npp.n_value)
    inv_tri, rc = _invert_tri(npp.data, jnp.float32(threshold), nnz)
    npp.data = inv_tri.astype(npp.dtype)
    npp.units = npp.units**-1
    if rcond is not None:
        rcond.data = rc[:, None].astype(rcond.dtype)


@partial(jax.jit, static_argnames=("nnz",))
def _mult_tri(tri1, tri2, nnz):
    rows, cols = _tri_indices(nnz)
    n_pix = tri1.shape[0]

    def expand(t):
        m = jnp.zeros((n_pix, nnz, nnz), dtype=t.dtype)
        m = m.at[:, rows, cols].set(t)
        m = m.at[:, cols, rows].set(t)
        return m

    prod = jnp.einsum("pij,pjk->pik", expand(tri1), expand(tri2))
    return prod[:, rows, cols]


def covariance_multiply(npp1, npp2):
    """npp1 <- npp1 @ npp2 per pixel (both packed triangles)."""
    nnz = _nnz_from_tri(npp1.n_value)
    npp1.data = _mult_tri(npp1.data, npp2.data, nnz).astype(npp1.dtype)
    npp1.units = npp1.units * npp2.units


@partial(jax.jit, static_argnames=("nnz",))
def _apply_tri(tri, vec, nnz):
    rows, cols = _tri_indices(nnz)
    n_pix = tri.shape[0]
    m = jnp.zeros((n_pix, nnz, nnz), dtype=tri.dtype)
    m = m.at[:, rows, cols].set(tri)
    m = m.at[:, cols, rows].set(tri)
    return jnp.einsum("pij,pj->pi", m, vec)


def covariance_apply(npp, m):
    """m <- npp @ m per pixel (covariance times map)."""
    nnz = _nnz_from_tri(npp.n_value)
    if m.n_value != nnz:
        raise ValueError(f"map has {m.n_value} values, covariance expects {nnz}")
    m.data = _apply_tri(npp.data, m.data, nnz).astype(m.dtype)
    m.units = m.units * npp.units
