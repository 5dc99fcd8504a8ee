"""Native spherical-harmonic synthesis (TPU-first SHT).

The reference delegates a_lm sky scanning and beam convolution to external
SHT libraries (``ref:src/toast/ops/scan_alm.py:31`` uses ducc0,
``ref:src/toast/ops/totalconvolve.py:39``).  Neither ducc nor healpy exists
in this environment, and neither is TPU-friendly, so this module implements
harmonic synthesis from scratch as XLA-compilable array code:

* spin-weighted spherical harmonics ``sY_lm`` evaluated by a three-term
  Wigner-d recurrence in ``l``, vectorized over all (ring, m) pairs at once
  (one ``lax.scan`` over ``l`` carrying ``(n_theta, n_m)`` panels — MXU/VPU
  friendly, no per-(l,m) scalar loops),
* dynamic-range tracking: the recurrence carries a per-(ring, m) power-of-
  two exponent so that ``sin(theta)^m``-type underflow (far below float32,
  and below float64 for m of a few hundred) cannot zero out the
  high-``l`` tail — the same technique as libsharp's scaled recurrence,
* ring synthesis over phi via explicit real-part Fourier sums packed into
  a single batched ``irfft``.

Conventions: a_lm arrays are dense complex ``(lmax+1, lmax+1)`` with
``alm[l, m]`` for ``m >= 0`` (real fields; negative m implied by
conjugation).  Polarization follows the HEALPix convention
``Q + iU = -sum (aE + i aB) 2Y_lm``.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# Rescale bound: mantissas are kept within 2^+/-RESCALE_BITS of unity and the
# residual power of two is carried as an integer exponent per (ring, m).
_RESCALE_BITS = 40.0


def _seed_log2_and_sign(m, s, theta):
    """Seed of the l-recurrence: sLambda_{l0,m}(theta) at l0 = max(m, |s|).

    Closed form via Wigner-d corner elements (Varshalovich 4.3.4):
    for m >= |s|:   d^m_{-m,s} = (-1)^(m+s) sqrt(C(2m, m-s))
                                 cos(th/2)^(m-s) (-sin(th/2))^(m+s)  ... sign
    for |s| > m:    corner at j = |s| by the symmetry d^j_{m'm} =
                    (-1)^(m'-m) d^j_{m m'} = d^j_{-m,-m'}.

    Returns (log2|seed|, sign) with the sY normalization
    sLambda = (-1)^m sqrt((2l+1)/4pi) d^l_{-m,s} folded in.
    """
    # All inputs are arrays broadcastable against each other; m >= 0.
    half = 0.5 * theta
    lc = jnp.log2(jnp.maximum(jnp.cos(half), 1e-38))  # log2 cos(th/2) <= 0
    ls = jnp.log2(jnp.maximum(jnp.sin(half), 1e-38))
    s_abs = abs(int(s))
    m = m.astype(jnp.float32)
    l0 = jnp.maximum(m, float(s_abs))

    # log2 of the binomial prefactor sqrt(C(2*l0, l0 - k)) where k = s for
    # the m >= |s| corner and k = m for the |s| > m corner; use lgamma.
    def _log2_sqrt_binom(n, k):
        lg = (
            jax.lax.lgamma(n + 1.0)
            - jax.lax.lgamma(k + 1.0)
            - jax.lax.lgamma(n - k + 1.0)
        )
        return 0.5 * lg / np.log(2.0)

    s_val = float(int(s))
    # Corner 1 (m >= |s|): d^m_{-m,s} = (-1)^(m+s) d^m_{m,-s}
    #   d^m_{m,-s} = sqrt(C(2m, m-s)) cos^(m-s) (-sin)^(m+s)
    log2_c1 = _log2_sqrt_binom(2.0 * m, m - s_val) + (m - s_val) * lc + (
        m + s_val
    ) * ls
    # full sign: (-1)^m [norm] * (-1)^(m+s) * (-1)^(m+s) [from (-sin)^(m+s)]
    #          = (-1)^m * (+1) ... careful: (-sin(th/2))^(m+s) contributes
    # (-1)^(m+s) for th in (0, pi) where sin > 0.
    sign_c1 = jnp.where(jnp.mod(m, 2.0) == 0, 1.0, -1.0)

    # Corner 2 (|s| > m): d^{|s|}_{-m, s}.
    #   s > 0:  d^s_{-m,s} = (-1)^(m+s) d^s_{s,-m}
    #           d^s_{s,-m} = sqrt(C(2s, s-m)) cos^(s-m) (-sin)^(s+m)
    #   s < 0:  d^{|s|}_{-m,s} = d^{|s|}_{-s,m} = sqrt(C(2|s|, |s|-m))
    #           cos^(|s|+... ) — use d^j_{j',..} with j' = -s = |s|:
    #           d^{|s|}_{|s|, m} = sqrt(C(2|s|, |s|-m)) cos^(|s|+m)(-sin)^(|s|-m)
    sa = float(s_abs)
    if s_val > 0:
        log2_c2 = _log2_sqrt_binom(2.0 * sa, sa - m) + (sa - m) * lc + (
            sa + m
        ) * ls
        # (-1)^m [norm] * (-1)^(m+s) [symm] * (-1)^(s+m) [(-sin)^(s+m)]
        sign_c2 = jnp.where(jnp.mod(m, 2.0) == 0, 1.0, -1.0)
    else:
        log2_c2 = _log2_sqrt_binom(2.0 * sa, sa - m) + (sa + m) * lc + (
            sa - m
        ) * ls
        # (-1)^m [norm] * (-1)^(|s|-m) [(-sin)^(|s|-m)]
        sign_c2 = jnp.where(jnp.mod(sa, 2.0) == 0, 1.0, -1.0)

    use_c1 = m >= sa
    log2_mag = jnp.where(use_c1, log2_c1, log2_c2)
    sign = jnp.where(use_c1, sign_c1, sign_c2)
    # normalization sqrt((2 l0 + 1) / 4 pi)
    log2_mag = log2_mag + 0.5 * jnp.log2((2.0 * l0 + 1.0) / (4.0 * np.pi))
    return log2_mag, sign


def ring_coeffs(alm, theta, lmax, spin=0):
    """Dispatch wrapper: the Pallas VMEM-resident kernel when enabled
    (``TOAST_SHT_PALLAS=1`` on a TPU backend), else the XLA scan."""
    import os

    if os.environ.get("TOAST_SHT_PALLAS") == "1" and jax.default_backend() not in (
        "cpu",
    ):
        from .sht_pallas import ring_coeffs_pallas

        return ring_coeffs_pallas(alm, theta, lmax, int(spin), False)
    return _ring_coeffs_scan(alm, theta, lmax, spin)


@partial(jax.jit, static_argnums=(2, 3))
def _ring_coeffs_scan(alm, theta, lmax, spin=0):
    """Per-ring Fourier coefficients F_m(theta) = sum_l a_lm sLambda_lm.

    Args:
        alm: complex array (lmax+1, lmax+1), alm[l, m] for m >= 0.
        theta: (n_theta,) colatitudes in (0, pi).
        lmax: band limit (static).
        spin: integer spin s (static; 0 or +/-2 in practice).

    Returns:
        complex64 array (n_theta, lmax+1).
    """
    n_theta = theta.shape[0]
    n_m = lmax + 1
    x = jnp.cos(theta.astype(jnp.float32))[:, None]  # (n_theta, 1)
    m_arr = jnp.arange(n_m, dtype=jnp.float32)[None, :]  # (1, n_m)
    s_abs = abs(int(spin))
    l0 = jnp.maximum(m_arr, float(s_abs))

    seed_log2, seed_sign = _seed_log2_and_sign(
        m_arr, spin, theta.astype(jnp.float32)[:, None]
    )
    # initial exponent block: keep mantissa within 2^+/-RESCALE_BITS
    seed_k = jnp.floor(seed_log2 / 64.0)
    seed_k = jnp.minimum(seed_k, 0.0)
    seed_mant = seed_sign * jnp.exp2(seed_log2 - 64.0 * seed_k)

    alm_r = jnp.real(alm).astype(jnp.float32)
    alm_i = jnp.imag(alm).astype(jnp.float32)

    shape = (n_theta, n_m)
    init = (
        jnp.zeros(shape, jnp.float32),  # lam_prev (scaled mantissa)
        jnp.zeros(shape, jnp.float32),  # lam_curr
        jnp.zeros(shape, jnp.float32),  # k: value = mant * 2^(64 k)
        jnp.zeros(shape, jnp.float32),  # accum real
        jnp.zeros(shape, jnp.float32),  # accum imag
    )

    def step(carry, l):
        lam_prev, lam_curr, k, acc_r, acc_i = carry
        lf = l.astype(jnp.float32)

        # seed columns whose recurrence starts at this l
        is_seed = l0 == lf
        lam_curr = jnp.where(is_seed, seed_mant, lam_curr)
        lam_prev = jnp.where(is_seed, 0.0, lam_prev)
        k = jnp.where(is_seed, seed_k, k)

        # accumulate a_lm * lambda for active columns (l >= l0, m <= l)
        active = (l0 <= lf) & (m_arr <= lf)
        lam_val = lam_curr * jnp.exp2(64.0 * k)  # underflows to 0 harmlessly
        lam_val = jnp.where(active, lam_val, 0.0)
        acc_r = acc_r + alm_r[l] * lam_val
        acc_i = acc_i + alm_i[l] * lam_val

        # advance the recurrence l -> l+1
        ab, cc = _recurrence_step_dyn(lf, x, m_arr, float(int(spin)))
        lam_next = ab * lam_curr - cc * lam_prev
        lam_next = jnp.where(active, lam_next, 0.0)

        # rescale: keep mantissas in range, track exponent
        big = jnp.abs(lam_next) > 2.0**_RESCALE_BITS
        small = (jnp.abs(lam_next) < 2.0**-_RESCALE_BITS) & (lam_next != 0.0)
        scale = jnp.where(big, 2.0**-64.0, jnp.where(small, 2.0**64.0, 1.0))
        dk = jnp.where(big, 1.0, jnp.where(small, -1.0, 0.0))
        lam_next = lam_next * scale
        lam_c2 = lam_curr * scale
        k = k + dk
        return (lam_c2, lam_next, k, acc_r, acc_i), None

    (_, _, _, acc_r, acc_i), _ = lax.scan(
        step, init, jnp.arange(lmax + 1, dtype=jnp.int32)
    )
    return jax.lax.complex(acc_r, acc_i)


def _recurrence_step_dyn(lf, x, m, s_val):
    """Coefficients of sLambda_{l+1} = (a x + b) sLambda_l - c sLambda_{l-1}.

    Derived from the Wigner-d l-recurrence (Varshalovich 4.8.1) rewritten
    for the sY normalization sqrt((2l+1)/4pi); valid for l >= max(m,|s|,1),
    with the l=0 step (only reachable for m=0, s=0, where
    sLambda_1 = sqrt(3) x sLambda_0) guarded by the max() clamps."""
    lp = lf + 1.0
    denom = jnp.maximum(lf, 1.0) * jnp.sqrt(
        jnp.maximum((lp * lp - m * m) * (lp * lp - s_val * s_val), 1e-30)
    )
    pref = jnp.sqrt(2.0 * lf + 3.0) / denom
    a = pref * jnp.sqrt(2.0 * lf + 1.0) * jnp.maximum(lf, 1.0) * lp
    b = pref * jnp.sqrt(2.0 * lf + 1.0) * (m * s_val)
    c = (
        pref
        * lp
        * jnp.sqrt(jnp.maximum((lf * lf - m * m) * (lf * lf - s_val * s_val), 0.0))
        / jnp.sqrt(jnp.maximum(2.0 * lf - 1.0, 1.0))
    )
    # l = 0 (m=0, s=0): Lambda_1 = sqrt(3) x Lambda_0 — matches a=sqrt(3),
    # b=c=0, which the guarded formulas above already produce.
    return a * x + b, c


def _ring_ifft(cr, ci, n_phi, phi0):
    """Real ring synthesis S_k = Re sum_m C_m e^{i m (phi0 + 2 pi k/n)}.

    cr/ci: real/imag parts of complex coefficients (..., n_m) with each m
    counted ONCE (pack any +/-m doubling into C_m before calling).
    Returns real (..., n_phi).  Everything is computed on real planes and
    assembled with lax.complex only for the final irfft: the axon TPU
    backend lacks several complex kernels (complex scatter in particular).
    """
    n_m = cr.shape[-1]
    m = jnp.arange(n_m, dtype=jnp.float32)
    n_half = n_phi // 2 + 1
    if n_m > n_half:
        raise NotImplementedError(
            "ring synthesis requires n_phi >= 2*lmax+2; oversample the grid"
        )
    ang = m * phi0[..., None]
    cos_a = jnp.cos(ang)
    sin_a = jnp.sin(ang)
    ph_r = cr * cos_a - ci * sin_a
    ph_i = cr * sin_a + ci * cos_a
    scale = jnp.full((n_m,), 0.5 * n_phi, dtype=jnp.float32).at[0].set(n_phi)
    ph_r = ph_r * scale
    ph_i = (ph_i * scale).at[..., 0].set(0.0)
    zpad = [(0, 0)] * (ph_r.ndim - 1) + [(0, n_half - n_m)]
    X = jax.lax.complex(jnp.pad(ph_r, zpad), jnp.pad(ph_i, zpad))
    # TPU batched-irfft quirk: non-multiple-of-8 batch shapes can emit NaN
    # rows (same hazard as ops/kernels/simnoise.py) — pad the ring batch
    pad = (-X.shape[0]) % 8
    if pad and X.ndim == 2:
        Xp = jnp.pad(X, ((0, pad), (0, 0)))
        return jnp.fft.irfft(Xp, n=n_phi, axis=-1)[: X.shape[0]]
    return jnp.fft.irfft(X, n=n_phi, axis=-1)


def _mask_m0(arr, value_at_0):
    """Replace column m=0 (real-plane helper; avoids complex scatter)."""
    n_m = arr.shape[-1]
    keep = (jnp.arange(n_m) > 0).astype(arr.dtype)
    return arr * keep + value_at_0[..., None] * (1.0 - keep)


@partial(jax.jit, static_argnums=(1, 2, 3))
def synthesize_grid_T(alm_T, lmax, n_theta, n_phi):
    """Spin-0 synthesis onto an equiangular (theta, phi) grid.

    theta_i = pi (i + 0.5) / n_theta, phi_k = 2 pi k / n_phi.
    Requires n_phi >= 2 lmax + 2.
    """
    theta = jnp.pi * (jnp.arange(n_theta, dtype=jnp.float32) + 0.5) / n_theta
    G = ring_coeffs(alm_T, theta, lmax, spin=0)
    Gr, Gi = jnp.real(G), jnp.imag(G)
    scale = jnp.where(jnp.arange(lmax + 1) > 0, 2.0, 1.0).astype(jnp.float32)
    phi0 = jnp.zeros((n_theta,), jnp.float32)
    return _ring_ifft(Gr * scale, Gi * scale, n_phi, phi0)


@partial(jax.jit, static_argnums=(2, 3, 4))
def synthesize_grid_pol(alm_E, alm_B, lmax, n_theta, n_phi):
    """Spin-2 synthesis: (Q, U) on the equiangular grid.

    Q + iU = -sum (aE + i aB) 2Y_lm  (HEALPix convention).
    """
    theta = jnp.pi * (jnp.arange(n_theta, dtype=jnp.float32) + 0.5) / n_theta
    c_plus = -(alm_E + 1j * alm_B).astype(jnp.complex64)
    d_minus = -(alm_E - 1j * alm_B).astype(jnp.complex64)
    Fp = ring_coeffs(c_plus, theta, lmax, spin=2)
    Fm = ring_coeffs(d_minus, theta, lmax, spin=-2)
    Fpr, Fpi = jnp.real(Fp), jnp.imag(Fp)
    Fmr, Fmi = jnp.real(Fm), jnp.imag(Fm)
    phi0 = jnp.zeros((n_theta,), jnp.float32)
    # Q = Re F+_0 + sum_{m>0} Re[(F+ + F-)_m e^{im phi}]
    Q = _ring_ifft(
        _mask_m0(Fpr + Fmr, Fpr[:, 0]),
        _mask_m0(Fpi + Fmi, Fpi[:, 0]),
        n_phi,
        phi0,
    )
    # U = Im F+_0 + sum_{m>0} Im[(F+ - F-)_m e^{im phi}]
    #   = Re[-i F+_0 ...]: -i (a + ib) = b - ia
    U = _ring_ifft(
        _mask_m0(Fpi - Fmi, Fpi[:, 0]),
        _mask_m0(-(Fpr - Fmr), -Fpr[:, 0]),
        n_phi,
        phi0,
    )
    return Q, U


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def synthesize_grid_complex_spin(g_alm, lmax, spin, n_theta, n_phi):
    """Complex synthesis ``f = sum_{l, m>=0} g_lm sY_lm`` on the grid.

    Unlike :func:`synthesize_grid_T`, every m is counted ONCE and no
    negative-m conjugate symmetry is assumed — this is the building block
    of the asymmetric-beam convolution data cube, where the m>=0 and m<0
    halves of a complex spin-m' field are synthesized separately.

    Returns (re, im) real float32 grids of shape (n_theta, n_phi).
    """
    theta = jnp.pi * (jnp.arange(n_theta, dtype=jnp.float32) + 0.5) / n_theta
    F = ring_coeffs(g_alm.astype(jnp.complex64), theta, lmax, spin=spin)
    Fr, Fi = jnp.real(F), jnp.imag(F)
    phi0 = jnp.zeros((n_theta,), jnp.float32)
    # re f = Re sum F e^{im phi};  im f = Re sum (-i F) e^{im phi}
    re = _ring_ifft(Fr, Fi, n_phi, phi0)
    im = _ring_ifft(Fi, -Fr, n_phi, phi0)
    return re, im


def _catmull_rom_w(t):
    """Catmull-Rom cubic weights for fractional offset t in [0, 1)."""
    t2 = t * t
    t3 = t2 * t
    w0 = -0.5 * t3 + t2 - 0.5 * t
    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
    w3 = 0.5 * t3 - 0.5 * t2
    return w0, w1, w2, w3


def grid_interpolate_np(grid, theta, phi):
    """Numpy twin of :func:`grid_interpolate` (host-side, for setup paths
    where device gathers are not worth their transfer/flakiness cost)."""
    grid = np.asarray(grid)
    theta = np.asarray(theta, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    n_theta, n_phi = grid.shape[-2], grid.shape[-1]
    ti = theta * (n_theta / np.pi) - 0.5
    i1 = np.floor(ti).astype(np.int64)
    wt = np.clip(ti - i1, 0.0, 1.0)
    tw = _catmull_rom_w(wt)
    pk = (phi % (2.0 * np.pi)) * (n_phi / (2.0 * np.pi))
    k1 = np.floor(pk).astype(np.int64)
    wp = pk - k1
    pw = _catmull_rom_w(wp)
    out = np.zeros(theta.shape, dtype=grid.dtype)
    for dr, a in zip((-1, 0, 1, 2), tw):
        r = i1 + dr
        over = r >= n_theta
        under = r < 0
        r_ref = np.where(under, -1 - r, np.where(over, 2 * n_theta - 1 - r, r))
        shift = np.where(under | over, n_phi // 2, 0)
        row_val = np.zeros_like(out)
        for dc, b in zip((-1, 0, 1, 2), pw):
            c = (k1 + dc + shift) % n_phi
            row_val = row_val + grid[..., r_ref, c] * b
        out = out + row_val * a
    return out


@jax.jit
def grid_interpolate(grid, theta, phi):
    """Bicubic (Catmull-Rom) interpolation of an equiangular-grid map.

    grid: (n_theta, n_phi) from synthesize_grid_*; theta rows at
    pi (i+0.5)/n_theta, phi columns at 2 pi k / n_phi (periodic in phi,
    clamped in theta).  Interpolation error is O((lmax/n_theta)^4) per
    mode — negligible at 2x+ oversampling of the band limit.
    """
    n_theta, n_phi = grid.shape[-2], grid.shape[-1]
    ti = theta * (n_theta / jnp.pi) - 0.5
    i1 = jnp.floor(ti).astype(jnp.int32)
    wt = jnp.clip(ti - i1, 0.0, 1.0)
    tw = _catmull_rom_w(wt)

    pk = (phi % (2.0 * jnp.pi)) * (n_phi / (2.0 * jnp.pi))
    k1 = jnp.floor(pk).astype(jnp.int32)
    wp = pk - k1
    pw = _catmull_rom_w(wp)

    out = 0.0
    for dr, a in zip((-1, 0, 1, 2), tw):
        r = i1 + dr
        # pole reflection: theta -> -theta corresponds to phi -> phi + pi
        # (exact on an equiangular grid with even n_phi)
        over = r >= n_theta
        under = r < 0
        r_ref = jnp.where(under, -1 - r, jnp.where(over, 2 * n_theta - 1 - r, r))
        shift = jnp.where(under | over, n_phi // 2, 0)
        row_val = 0.0
        for dc, b in zip((-1, 0, 1, 2), pw):
            c = (k1 + dc + shift) % n_phi
            row_val = row_val + grid[..., r_ref, c] * b
        out = out + row_val * a
    return out


def synthesize_healpix(alm_T, lmax, nside, alm_E=None, alm_B=None, oversample=2):
    """Synthesize a HEALPix (ring of pixel centers) map from a_lm.

    Evaluates on an oversampled equiangular grid and bilinearly interpolates
    to pixel centers — adequate when the grid oversamples the band limit
    (interpolation error O((lmax/n_theta)^2) per mode).

    Returns (n_pix,) for T-only or (n_pix, 3) IQU.
    """
    from .healpix import ring2ang

    n_theta = max(oversample * (lmax + 1), 16)
    n_phi = 2 * n_theta
    n_pix = 12 * nside * nside
    pix = np.arange(n_pix, dtype=np.int64)
    theta, phi = ring2ang(nside, pix)
    theta = jnp.asarray(theta, jnp.float32)
    phi = jnp.asarray(phi, jnp.float32)

    T_grid = synthesize_grid_T(jnp.asarray(alm_T), lmax, n_theta, n_phi)
    T = grid_interpolate(T_grid, theta, phi)
    if alm_E is None:
        return T
    Q_grid, U_grid = synthesize_grid_pol(
        jnp.asarray(alm_E), jnp.asarray(alm_B), lmax, n_theta, n_phi
    )
    Q = grid_interpolate(Q_grid, theta, phi)
    U = grid_interpolate(U_grid, theta, phi)
    return jnp.stack([T, Q, U], axis=-1)


# -- random alm generation (synfast equivalent) ------------------------------


def synalm(cls, lmax, seed=0):
    """Draw Gaussian random a_lm with the given power spectra.

    Args:
        cls: dict with keys among {"TT", "EE", "BB"} mapping to (lmax+1,)
            spectra (or a single array, treated as TT).
        lmax: band limit.
        seed: numpy seed (host-side setup, mirroring the reference's
            seeded ``healpy.synfast`` input-map generation,
            ``ref:scripts/benchmarking_utilities.py:686``).

    Returns:
        dict of complex128 (lmax+1, lmax+1) arrays.
    """
    if not isinstance(cls, dict):
        cls = {"TT": cls}
    rng = np.random.default_rng(seed)
    out = {}
    ells = np.arange(lmax + 1)
    for key, cl in cls.items():
        cl = np.asarray(cl, dtype=np.float64)
        if cl.shape[0] < lmax + 1:
            cl = np.pad(cl, (0, lmax + 1 - cl.shape[0]))
        amp = np.sqrt(np.maximum(cl[: lmax + 1], 0.0))
        alm = np.zeros((lmax + 1, lmax + 1), dtype=np.complex128)
        # m = 0: real, variance C_l
        alm[:, 0] = rng.normal(size=lmax + 1) * amp
        # m > 0: complex, variance C_l/2 per component
        re = rng.normal(size=(lmax + 1, lmax))
        im = rng.normal(size=(lmax + 1, lmax))
        alm[:, 1:] = (re + 1j * im) * (amp[:, None] / np.sqrt(2.0))
        # zero the unphysical m > l triangle
        mgrid = np.arange(lmax + 1)[None, :]
        lgrid = ells[:, None]
        alm[mgrid > lgrid] = 0.0
        out[key[0] if key in ("TT", "EE", "BB") else key] = alm
    return out


def gaussian_beam(lmax, fwhm_rad):
    """Gaussian beam window function B_l."""
    sigma = fwhm_rad / np.sqrt(8.0 * np.log(2.0))
    ell = np.arange(lmax + 1, dtype=np.float64)
    return np.exp(-0.5 * ell * (ell + 1) * sigma * sigma)
