"""Asymmetric 4-pi beam convolution (native totalconvolve).

The reference delegates full-sky beam convolution to external libraries
(``ref:src/toast/ops/conviqt.py:31`` via libconviqt,
``ref:src/toast/ops/totalconvolve.py:39`` via ducc0.totalconvolve).  This
module implements the same Wandelt-Gorski factorization natively on the
TPU SHT:

    T(R) = sum_{l m m'} a_lm conj(b_lm') D^l_{m m'}(phi, theta, psi)

with ``R = R_z(phi) R_y(theta) R_z(psi)`` the rotation carrying the beam
frame onto the sky and ``D^l_{mm'} = e^{-im phi} d^l_{mm'}(theta)
e^{-im' psi}``.  For a real sky and a real beam the m' sum collapses onto
m' >= 0:

    T = C_0(theta, phi) + sum_{m'>=1} 2 Re[ e^{-i m' psi} C_m'(theta, phi) ]

and each ``C_m'`` is a complex spin-m' field synthesized in two halves
(m >= 0 and m < 0 of the sky sum) by the spin-weighted ring recurrence:

    C_m' = S1 + conj(S2)
    S1 = sum_{l, m>=0} [conj(a_lm) conj(b_lm') / N_l]          {}_{m'}Y_lm
    S2 = sum_{l, m>0}  [(-1)^{m'} conj(a_lm) b_lm' / N_l]      {}_{-m'}Y_lm

with ``N_l = sqrt((2l+1)/4pi)`` (derived from ``d^l_{mm'} ->
{}_{s}Y_lm`` index symmetries; validated against an exact Wigner-D
oracle in ``tests/test_beam_convolve.py``).  The beam's m'=0 column alone
reproduces the symmetric-beam path of :class:`ops.scan_alm.SimTotalconvolve`.

Per detector sample the convolution is two grid interpolations per beam
mode plus a psi phase sum — pointing-limited, exactly like sky scanning.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .sht import grid_interpolate, synthesize_grid_complex_spin


def convolution_grids(alm, blm, lmax, mmax, n_theta=None, n_phi=None):
    """The (mmax+1) complex ``C_m'`` grids of the convolution cube.

    Args:
        alm: (lmax+1, lmax+1) complex sky multipoles (m >= 0, real field).
        blm: (lmax+1, mmax+1) complex beam multipoles b_{l m'} (m' >= 0,
            real beam pattern).
        lmax: sky/beam band limit.
        mmax: beam azimuthal band limit (static).
        n_theta/n_phi: grid size (default 2x oversampling of lmax).

    Returns:
        (re, im): float32 arrays (mmax+1, n_theta, n_phi).
    """
    alm = jnp.asarray(alm, jnp.complex64)
    blm = jnp.asarray(blm, jnp.complex64)
    if n_theta is None:
        n_theta = max(2 * (lmax + 1), 16)
    if n_phi is None:
        n_phi = 2 * n_theta
    ells = jnp.arange(lmax + 1, dtype=jnp.float32)
    inv_N = jnp.sqrt(4.0 * np.pi / (2.0 * ells + 1.0)).astype(jnp.complex64)
    a_conj = jnp.conj(alm) * inv_N[:, None]

    re_list, im_list = [], []
    m_col = jnp.arange(lmax + 1)
    for mp in range(mmax + 1):
        b_col = blm[:, mp][:, None]
        s1_coef = a_conj * jnp.conj(b_col)
        s1r, s1i = synthesize_grid_complex_spin(
            s1_coef, lmax, mp, n_theta, n_phi
        )
        sign = -1.0 if mp % 2 else 1.0
        s2_coef = jnp.where(
            (m_col > 0)[None, :], sign * a_conj * b_col, 0.0
        )
        s2r, s2i = synthesize_grid_complex_spin(
            s2_coef, lmax, -mp, n_theta, n_phi
        )
        re_list.append(s1r + s2r)
        im_list.append(s1i - s2i)
    return jnp.stack(re_list), jnp.stack(im_list)


@jax.jit
def euler_zyz_from_quat(quats):
    """(phi, theta, psi) with R = Rz(phi) Ry(theta) Rz(psi) from unit
    quaternions (..., 4) in (x, y, z, w) order.

    theta/phi locate the boresight ``R zhat``; psi is the rotation of the
    beam frame about the line of sight, measured from the local e_theta
    axis toward e_phi (``R xhat = cos(psi) e_theta + sin(psi) e_phi``).
    """
    from . import qarray as qa

    zaxis = jnp.asarray([0.0, 0.0, 1.0], dtype=quats.dtype)
    xaxis = jnp.asarray([1.0, 0.0, 0.0], dtype=quats.dtype)
    vd = qa.rotate(quats, jnp.broadcast_to(zaxis, quats.shape[:-1] + (3,)))
    vo = qa.rotate(quats, jnp.broadcast_to(xaxis, quats.shape[:-1] + (3,)))
    theta = jnp.arccos(jnp.clip(vd[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(vd[..., 1], vd[..., 0])
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    e_theta = jnp.stack([ct * cp, ct * sp, -st], axis=-1)
    e_phi = jnp.stack([-sp, cp, jnp.zeros_like(sp)], axis=-1)
    psi = jnp.arctan2(
        jnp.sum(vo * e_phi, axis=-1), jnp.sum(vo * e_theta, axis=-1)
    )
    return phi, theta, psi


@partial(jax.jit, static_argnums=())
def convolve_samples(grids_re, grids_im, theta, phi, psi):
    """Sample the convolution cube: two interpolations per beam mode.

    Args:
        grids_re/grids_im: (mmax+1, n_theta, n_phi) from
            :func:`convolution_grids`.
        theta/phi/psi: per-sample Euler pointing (any matching shape).

    Returns:
        float32 convolved signal of the pointing shape.
    """
    mmax = grids_re.shape[0] - 1
    out = grid_interpolate(grids_re[0], theta, phi)
    for mp in range(1, mmax + 1):
        cr = grid_interpolate(grids_re[mp], theta, phi)
        ci = grid_interpolate(grids_im[mp], theta, phi)
        ang = mp * psi
        out = out + 2.0 * (jnp.cos(ang) * cr + jnp.sin(ang) * ci)
    return out
