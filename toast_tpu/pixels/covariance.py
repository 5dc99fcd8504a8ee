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


def _sym3_eigvals(a00, a01, a02, a11, a12, a22):
    """Closed-form (Cardano) eigenvalues of symmetric 3x3 matrices.

    Fully elementwise — maps onto the TPU VPU with no batched-LAPACK loops
    (jnp.linalg.eigh at millions of pixels breaks the TPU compiler and is
    far slower).  Returns (emin, emid, emax).
    """
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.where(p > 0, p, 1.0)
    # det(B) where B = (A - qI)/p
    detb = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    ) / (safe_p * safe_p * safe_p)
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    return e3, e2, e1  # min, mid, max (cos ordering guarantees e3<=e2<=e1)


def _sym3_inv(a00, a01, a02, a11, a12, a22):
    """Adjugate-based inverse of symmetric 3x3 matrices (elementwise)."""
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    safe = jnp.where(det != 0, det, 1.0)
    return (c00 / safe, c01 / safe, c02 / safe, c11 / safe, c12 / safe, c22 / safe), det


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

    if nnz == 3:
        a00, a01, a02, a11, a12, a22 = (tri[:, i] for i in range(6))
        emin, _emid, emax = _sym3_eigvals(a00, a01, a02, a11, a12, a22)
        rcond = jnp.where(emax > 0, emin / jnp.where(emax > 0, emax, 1.0), 0.0)
        (i00, i01, i02, i11, i12, i22), det = _sym3_inv(
            a00, a01, a02, a11, a12, a22
        )
        good = (rcond >= threshold) & (emax > 0) & (det > 0)
        gf = good.astype(tri.dtype)
        inv_tri = jnp.stack(
            [i00 * gf, i01 * gf, i02 * gf, i11 * gf, i12 * gf, i22 * gf], axis=-1
        )
        return inv_tri, jnp.where(good, rcond, 0.0)

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


def _invert_tri_host64(tri, threshold, nnz):
    """Host float64 twin of :func:`_invert_tri` (numpy, same Cardano math).

    Deep rcond thresholds (below ~1e-4) exceed float32's ability to
    separate near-singular pixels: an f32 eigenvalue ratio of 1e-6 carries
    O(1) relative error, so junk inversions leak past the cut.  The
    reference always inverts in C++ doubles (``toast_map_cov.cpp:246``);
    this path restores that accuracy for the pixels that need it.
    """
    tri = np.asarray(tri, dtype=np.float64)
    if nnz == 1:
        val = tri[:, 0]
        good = val > threshold
        inv = np.where(good, 1.0 / np.where(good, val, 1.0), 0.0)
        return inv[:, None], good.astype(np.float64)
    rows, cols = _tri_indices(nnz)
    n_pix = tri.shape[0]
    mat = np.zeros((n_pix, nnz, nnz))
    mat[:, rows, cols] = tri
    mat[:, cols, rows] = tri
    evals = np.linalg.eigvalsh(mat)
    emax = evals[:, -1]
    emin = evals[:, 0]
    rcond = np.where(emax > 0, emin / np.where(emax > 0, emax, 1.0), 0.0)
    good = (rcond >= threshold) & (emax > 0)
    inv = np.zeros_like(mat)
    if good.any():
        inv[good] = np.linalg.inv(mat[good])
    return inv[:, rows, cols], np.where(good, rcond, 0.0)


def covariance_invert(npp, threshold, rcond=None, use_alltoall=False):
    """Invert a diagonal-block pixel covariance in place.

    Thresholds below 1e-4 automatically use the host float64 path — the
    f32 device Cardano cannot resolve condition numbers that deep (the
    reference inverts in doubles throughout).

    Args:
        npp: PixelData with n_value = nnz*(nnz+1)/2.
        threshold: rcond threshold below which pixels are zeroed.
        rcond: optional PixelData (n_value=1) to receive the rcond map.
    """
    nnz = _nnz_from_tri(npp.n_value)
    if float(threshold) < 1.0e-4:
        inv_tri, rc = _invert_tri_host64(
            np.asarray(npp.data), float(threshold), nnz
        )
        npp.data = jnp.asarray(inv_tri.astype(np.float32))
        rc = jnp.asarray(rc.astype(np.float32))
    else:
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
    if nnz == 1:
        return tri * vec
    if nnz == 3:
        a00, a01, a02, a11, a12, a22 = (tri[:, i] for i in range(6))
        v0, v1, v2 = vec[:, 0], vec[:, 1], vec[:, 2]
        return jnp.stack(
            [
                a00 * v0 + a01 * v1 + a02 * v2,
                a01 * v0 + a11 * v1 + a12 * v2,
                a02 * v0 + a12 * v1 + a22 * v2,
            ],
            axis=-1,
        )
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
