"""Pallas TPU kernel for the spherical-harmonic Legendre recurrence.

``sht.ring_coeffs`` evaluates F_m(theta) = sum_l a_lm sLambda_lm(theta)
with a ``lax.scan`` over l carrying five (n_theta, n_m) panels.  XLA keeps
scan carries in HBM, so every step round-trips ~5 panels through HBM:
at lmax 1024 / 2050 rings that is ~170 GB of traffic for ~3e10 VPU flops —
two orders of magnitude away from compute bound.

This kernel runs the whole l-recurrence inside VMEM: the grid tiles the
rings, each program instance holds its (RING_TILE, n_m) recurrence state
in registers/VMEM for all lmax+1 steps, and only the a_lm rows (reused by
every tile) and the final accumulators touch HBM.  The math is identical
to ``sht.ring_coeffs`` (same scaled Wigner-d recurrence, same
power-of-two exponent tracking), asserted by equivalence tests.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_RESCALE_BITS = 40.0
RING_TILE = 64


def _seed_constants(lmax, spin, m_pad):
    """Per-m seed description (host precompute; see sht._seed_log2_and_sign).

    Returns (c_log2, e_cos, e_sin, sign, l0) arrays of length m_pad: the
    seed is  sign * 2^(c_log2 + e_cos*log2 cos(th/2) + e_sin*log2 sin(th/2)).
    """
    from scipy.special import gammaln

    m = np.arange(m_pad, dtype=np.float64)
    s_val = float(int(spin))
    s_abs = abs(int(spin))
    l0 = np.maximum(m, s_abs)

    def log2_sqrt_binom(n, k):
        lg = gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(n - k + 1.0)
        return 0.5 * lg / np.log(2.0)

    with np.errstate(invalid="ignore"):
        # corner 1 (m >= |s|)
        c1 = log2_sqrt_binom(2.0 * m, m - s_val)
        ec1 = m - s_val
        es1 = m + s_val
        s1 = np.where(np.mod(m, 2.0) == 0, 1.0, -1.0)
        # corner 2 (|s| > m)
        sa = float(s_abs)
        c2 = log2_sqrt_binom(2.0 * sa, sa - m)
        if s_val > 0:
            ec2 = sa - m
            es2 = sa + m
            s2 = np.where(np.mod(m, 2.0) == 0, 1.0, -1.0)
        else:
            ec2 = sa + m
            es2 = sa - m
            s2 = np.full_like(m, 1.0 if s_abs % 2 == 0 else -1.0)
    use1 = m >= sa
    c_log2 = np.where(use1, c1, c2) + 0.5 * np.log2(
        (2.0 * l0 + 1.0) / (4.0 * np.pi)
    )
    e_cos = np.where(use1, ec1, ec2)
    e_sin = np.where(use1, es1, es2)
    sign = np.where(use1, s1, s2)
    # padding columns (m > lmax) never activate
    pad = m > lmax
    l0 = np.where(pad, 1e9, l0)
    c_log2 = np.where(pad, 0.0, c_log2)
    return (
        c_log2.astype(np.float32),
        e_cos.astype(np.float32),
        e_sin.astype(np.float32),
        sign.astype(np.float32),
        l0.astype(np.float32),
    )


def _ring_coeffs_kernel(
    theta_ref,
    alm_r_ref,
    alm_i_ref,
    clog_ref,
    ecos_ref,
    esin_ref,
    sign_ref,
    l0_ref,
    out_r_ref,
    out_i_ref,
    *,
    lmax,
    s_val,
):
    theta = theta_ref[:]  # (RT, 1)
    m_pad = out_r_ref.shape[1]
    x = jnp.cos(theta)  # (RT, 1)
    half = 0.5 * theta
    lc = jnp.log2(jnp.maximum(jnp.cos(half), 1e-38))
    ls = jnp.log2(jnp.maximum(jnp.sin(half), 1e-38))

    # TPU iota must be integer-typed
    m_arr = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1).astype(jnp.float32)
    seed_log2 = (
        clog_ref[:].reshape(1, m_pad)
        + ecos_ref[:].reshape(1, m_pad) * lc
        + esin_ref[:].reshape(1, m_pad) * ls
    )
    seed_k = jnp.minimum(jnp.floor(seed_log2 / 64.0), 0.0)
    seed_mant = sign_ref[:].reshape(1, m_pad) * jnp.exp2(
        seed_log2 - 64.0 * seed_k
    )
    l0 = l0_ref[:].reshape(1, m_pad)

    shape = seed_mant.shape

    def step(l, carry):
        lam_prev, lam_curr, k, acc_r, acc_i = carry
        lf = l.astype(jnp.float32)

        is_seed = l0 == lf
        lam_curr = jnp.where(is_seed, seed_mant, lam_curr)
        lam_prev = jnp.where(is_seed, 0.0, lam_prev)
        k = jnp.where(is_seed, seed_k, k)

        active = (l0 <= lf) & (m_arr <= lf)
        lam_val = jnp.where(active, lam_curr * jnp.exp2(64.0 * k), 0.0)
        ar = alm_r_ref[l, :].reshape(1, m_pad)
        ai = alm_i_ref[l, :].reshape(1, m_pad)
        acc_r = acc_r + ar * lam_val
        acc_i = acc_i + ai * lam_val

        # recurrence l -> l+1 (sht._recurrence_step_dyn)
        lp = lf + 1.0
        denom = jnp.maximum(lf, 1.0) * jnp.sqrt(
            jnp.maximum((lp * lp - m_arr * m_arr) * (lp * lp - s_val * s_val), 1e-30)
        )
        pref = jnp.sqrt(2.0 * lf + 3.0) / denom
        a = pref * jnp.sqrt(2.0 * lf + 1.0) * jnp.maximum(lf, 1.0) * lp
        b = pref * jnp.sqrt(2.0 * lf + 1.0) * (m_arr * s_val)
        c = (
            pref
            * lp
            * jnp.sqrt(
                jnp.maximum(
                    (lf * lf - m_arr * m_arr) * (lf * lf - s_val * s_val), 0.0
                )
            )
            / jnp.sqrt(jnp.maximum(2.0 * lf - 1.0, 1.0))
        )
        lam_next = (a * x + b) * lam_curr - c * lam_prev
        lam_next = jnp.where(active, lam_next, 0.0)

        big = jnp.abs(lam_next) > 2.0**_RESCALE_BITS
        small = (jnp.abs(lam_next) < 2.0**-_RESCALE_BITS) & (lam_next != 0.0)
        scale = jnp.where(big, 2.0**-64.0, jnp.where(small, 2.0**64.0, 1.0))
        dk = jnp.where(big, 1.0, jnp.where(small, -1.0, 0.0))
        return (
            lam_curr * scale,
            lam_next * scale,
            k + dk,
            acc_r,
            acc_i,
        )

    zeros = jnp.zeros(shape, jnp.float32)
    init = (zeros, zeros, zeros, zeros, zeros)
    _, _, _, acc_r, acc_i = jax.lax.fori_loop(0, lmax + 1, step, init)
    out_r_ref[:] = jnp.broadcast_to(acc_r, out_r_ref.shape)
    out_i_ref[:] = jnp.broadcast_to(acc_i, out_i_ref.shape)


@partial(jax.jit, static_argnums=(2, 3, 4))
def ring_coeffs_pallas(alm, theta, lmax, spin=0, interpret=False):
    """Pallas twin of :func:`toast_tpu.math.sht.ring_coeffs`.

    Args:
        alm: complex (lmax+1, lmax+1) coefficients.
        theta: (n_theta,) colatitudes.
        lmax: band limit (static).
        spin: integer spin (static).
        interpret: run in interpreter mode (CPU testing).

    Returns:
        complex64 (n_theta, lmax+1).
    """
    n_theta = theta.shape[0]
    m_pad = ((lmax + 1 + 127) // 128) * 128
    rt = RING_TILE
    n_pad = ((n_theta + rt - 1) // rt) * rt

    alm_r = jnp.zeros((lmax + 1, m_pad), jnp.float32)
    alm_r = alm_r.at[:, : lmax + 1].set(jnp.real(alm).astype(jnp.float32))
    alm_i = jnp.zeros((lmax + 1, m_pad), jnp.float32)
    alm_i = alm_i.at[:, : lmax + 1].set(jnp.imag(alm).astype(jnp.float32))

    clog, ecos, esin, sign, l0 = (
        jnp.asarray(v) for v in _seed_constants(lmax, spin, m_pad)
    )
    th = jnp.zeros((n_pad, 1), jnp.float32)
    th = th.at[:n_theta, 0].set(theta.astype(jnp.float32))
    # padding rings: harmless equator evaluation
    th = th.at[n_theta:, 0].set(jnp.pi / 2)

    kernel = partial(_ring_coeffs_kernel, lmax=lmax, s_val=float(int(spin)))
    out_r, out_i = pl.pallas_call(
        kernel,
        grid=(n_pad // rt,),
        in_specs=[
            pl.BlockSpec((rt, 1), lambda i: (i, 0)),
            pl.BlockSpec((lmax + 1, m_pad), lambda i: (0, 0)),
            pl.BlockSpec((lmax + 1, m_pad), lambda i: (0, 0)),
            pl.BlockSpec((m_pad,), lambda i: (0,)),
            pl.BlockSpec((m_pad,), lambda i: (0,)),
            pl.BlockSpec((m_pad,), lambda i: (0,)),
            pl.BlockSpec((m_pad,), lambda i: (0,)),
            pl.BlockSpec((m_pad,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((rt, m_pad), lambda i: (i, 0)),
            pl.BlockSpec((rt, m_pad), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )(th, alm_r, alm_i, clog, ecos, esin, sign, l0)
    return jax.lax.complex(
        out_r[:n_theta, : lmax + 1], out_i[:n_theta, : lmax + 1]
    )
