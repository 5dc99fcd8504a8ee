"""HEALPix pixelization (healpy-free, TPU-native).

Rebuild of the reference HEALPix layer (``src/toast/healpix.py:32-364``,
C++ ``src/toast/_libtoast/ops_pixels_healpix.cpp:42-430``, JAX mirror
``src/toast/jax/math/healpix.py``) implementing the standard HEALPix sphere
tessellation (Górski et al. 2005) in RING and NESTED schemes.

Two paths:

* **numpy (float64/int64)** — host-side oracle and utility path: both
  pixelization directions, ring<->nest conversion, pixel centers.  Used by
  map I/O, degrade, and the test suite.
* **jax (float32/int32)** — the hot device path ``vec2pix_ring_jax`` /
  ``vec2pix_nest_jax``, fully vectorized integer/bit arithmetic that XLA
  maps onto the VPU.  int32 math limits nside to <= 8192 (npix < 2^31),
  which covers all reference benchmark cases; the bit interleave uses
  magic-number spreading instead of the reference's lookup tables because
  TPU prefers arithmetic over gathers.

Supported nside values are powers of two (required by NESTED).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# face rows for nest->ring conversion: ring offset of the southern corner
_JRLL = np.array([2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4], dtype=np.int64)
_JPLL = np.array([1, 3, 5, 7, 0, 2, 4, 6, 1, 3, 5, 7], dtype=np.int64)

TWOTHIRDS = 2.0 / 3.0


def nside2npix(nside):
    return 12 * nside * nside


def npix2nside(npix):
    nside = int(round(np.sqrt(npix / 12)))
    if 12 * nside * nside != npix:
        raise ValueError(f"{npix} is not a valid HEALPix map size")
    return nside


def check_nside(nside):
    n = int(nside)
    if n < 1 or (n & (n - 1)) != 0:
        raise ValueError(f"nside must be a power of two, got {nside}")
    return n


def nside2resol_rad(nside):
    """Approximate pixel size (sqrt of pixel area) in radians."""
    return np.sqrt(4.0 * np.pi / nside2npix(nside))


# ---------------------------------------------------------------------------
# bit interleave helpers
# ---------------------------------------------------------------------------


def _spread_bits(v):
    """Spread lower 16 bits of v into even bit positions (numpy int64)."""
    v = v & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def _compress_bits(v):
    """Gather even bits of v into the low 16 bits (numpy int64)."""
    v = v & 0x55555555
    v = (v | (v >> 1)) & 0x33333333
    v = (v | (v >> 2)) & 0x0F0F0F0F
    v = (v | (v >> 4)) & 0x00FF00FF
    v = (v | (v >> 8)) & 0x0000FFFF
    return v


def _xy2pix(ix, iy):
    return _spread_bits(ix) | (_spread_bits(iy) << 1)


def _pix2xy(pix):
    return _compress_bits(pix), _compress_bits(pix >> 1)


# ---------------------------------------------------------------------------
# numpy implementations
# ---------------------------------------------------------------------------


def ang2vec(theta, phi):
    st = np.sin(theta)
    return np.stack([st * np.cos(phi), st * np.sin(phi), np.cos(theta)], axis=-1)


def vec2ang(vec):
    vec = np.asarray(vec)
    r = np.sqrt(np.sum(vec**2, axis=-1))
    theta = np.arccos(np.clip(vec[..., 2] / r, -1.0, 1.0))
    phi = np.arctan2(vec[..., 1], vec[..., 0]) % (2.0 * np.pi)
    return theta, phi


def _zphi2ring(nside, z, s, phi):
    """(z, sin(theta) [or <0 if unknown], phi) -> RING pixel (numpy)."""
    nside = check_nside(nside)
    z = np.asarray(z, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    za = np.abs(z)
    tt = (phi % (2.0 * np.pi)) * (2.0 / np.pi)  # in [0, 4)
    ncap = 2 * nside * (nside - 1)
    npix = nside2npix(nside)

    # equatorial
    temp1 = nside * (0.5 + tt)
    temp2 = nside * z * 0.75
    jp = np.floor(temp1 - temp2).astype(np.int64)
    jm = np.floor(temp1 + temp2).astype(np.int64)
    ir = nside + 1 + jp - jm  # in {1, 2nside+1}
    kshift = 1 - (ir & 1)
    ip = (jp + jm - nside + kshift + 1) >> 1
    ip = ip % (4 * nside)
    pix_eq = ncap + (ir - 1) * 4 * nside + ip

    # polar caps
    tp = tt - np.floor(tt)
    with np.errstate(invalid="ignore"):
        tmp = np.where(
            np.asarray(s) >= 0.0,
            nside * np.asarray(s) / np.sqrt((1.0 + za) / 3.0),
            nside * np.sqrt(3.0 * (1.0 - za)),
        )
    jp_p = (tp * tmp).astype(np.int64)
    jm_p = ((1.0 - tp) * tmp).astype(np.int64)
    irp = jp_p + jm_p + 1
    ip_p = (tt * irp).astype(np.int64)
    ip_p = ip_p % (4 * irp)
    pix_north = 2 * irp * (irp - 1) + ip_p
    pix_south = npix - 2 * irp * (irp + 1) + ip_p
    pix_polar = np.where(z > 0, pix_north, pix_south)

    return np.where(za <= TWOTHIRDS, pix_eq, pix_polar)


def _zphi2nest(nside, z, s, phi):
    nside = check_nside(nside)
    z = np.asarray(z, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    za = np.abs(z)
    tt = (phi % (2.0 * np.pi)) * (2.0 / np.pi)

    # equatorial
    temp1 = nside * (0.5 + tt)
    temp2 = nside * z * 0.75
    jp = np.floor(temp1 - temp2).astype(np.int64)
    jm = np.floor(temp1 + temp2).astype(np.int64)
    ifp = jp >> int(np.log2(nside)) if nside > 1 else jp
    ifm = jm >> int(np.log2(nside)) if nside > 1 else jm
    face_eq = np.where(
        ifp == ifm, (ifp & 3) + 4, np.where(ifp < ifm, ifp & 3, (ifm & 3) + 8)
    )
    ix_eq = jm & (nside - 1)
    iy_eq = nside - (jp & (nside - 1)) - 1

    # polar
    ntt = np.minimum(np.floor(tt).astype(np.int64), 3)
    tp = tt - ntt
    with np.errstate(invalid="ignore"):
        tmp = np.where(
            np.asarray(s) >= 0.0,
            nside * np.asarray(s) / np.sqrt((1.0 + za) / 3.0),
            nside * np.sqrt(3.0 * (1.0 - za)),
        )
    jp_p = np.minimum((tp * tmp).astype(np.int64), nside - 1)
    jm_p = np.minimum(((1.0 - tp) * tmp).astype(np.int64), nside - 1)
    north = z >= 0
    face_p = np.where(north, ntt, ntt + 8)
    ix_p = np.where(north, nside - jm_p - 1, jp_p)
    iy_p = np.where(north, nside - jp_p - 1, jm_p)

    eq = za <= TWOTHIRDS
    face = np.where(eq, face_eq, face_p)
    ix = np.where(eq, ix_eq, ix_p)
    iy = np.where(eq, iy_eq, iy_p)
    return face * nside * nside + _xy2pix(ix, iy)


def ang2ring(nside, theta, phi):
    theta = np.asarray(theta, dtype=np.float64)
    return _zphi2ring(nside, np.cos(theta), np.sin(theta), phi)


def ang2nest(nside, theta, phi):
    theta = np.asarray(theta, dtype=np.float64)
    return _zphi2nest(nside, np.cos(theta), np.sin(theta), phi)


def vec2ring(nside, vec):
    vec = np.asarray(vec, dtype=np.float64)
    r = np.sqrt(np.sum(vec**2, axis=-1))
    z = vec[..., 2] / r
    s = np.sqrt(vec[..., 0] ** 2 + vec[..., 1] ** 2) / r
    phi = np.arctan2(vec[..., 1], vec[..., 0])
    return _zphi2ring(nside, z, s, phi)


def vec2nest(nside, vec):
    vec = np.asarray(vec, dtype=np.float64)
    r = np.sqrt(np.sum(vec**2, axis=-1))
    z = vec[..., 2] / r
    s = np.sqrt(vec[..., 0] ** 2 + vec[..., 1] ** 2) / r
    phi = np.arctan2(vec[..., 1], vec[..., 0])
    return _zphi2nest(nside, z, s, phi)


def _isqrt(x):
    """Exact integer sqrt for int64 inputs via corrected float sqrt."""
    s = np.floor(np.sqrt(np.asarray(x, dtype=np.float64))).astype(np.int64)
    s = np.where((s + 1) * (s + 1) <= x, s + 1, s)
    s = np.where(s * s > x, s - 1, s)
    return s


def _ring_info(nside, pix):
    """RING pixel -> (iring from north pole 1..4nside-1, iphi 1-based, ringpix, startpix, shifted)."""
    nside = check_nside(nside)
    pix = np.asarray(pix, dtype=np.int64)
    ncap = 2 * nside * (nside - 1)
    npix = nside2npix(nside)
    north = pix < ncap
    eq = (pix >= ncap) & (pix < npix - ncap)

    # north cap
    iring_n = (1 + _isqrt(1 + 2 * pix)) >> 1
    iphi_n = pix + 1 - 2 * iring_n * (iring_n - 1)

    # equatorial
    ip = pix - ncap
    iring_e = ip // (4 * nside) + nside
    iphi_e = ip % (4 * nside) + 1

    # south cap
    ip_s = npix - pix
    iring_s_fromS = (1 + _isqrt(2 * ip_s - 1)) >> 1
    iring_s = 4 * nside - iring_s_fromS
    iphi_s = 4 * iring_s_fromS + 1 - (ip_s - 2 * iring_s_fromS * (iring_s_fromS - 1))

    iring = np.where(north, iring_n, np.where(eq, iring_e, iring_s))
    iphi = np.where(north, iphi_n, np.where(eq, iphi_e, iphi_s))
    return iring, iphi


def ring2ang(nside, pix):
    """RING pixel -> (theta, phi) of pixel center."""
    nside = check_nside(nside)
    iring, iphi = _ring_info(nside, pix)
    npix_f = float(nside2npix(nside))
    nl2 = 2 * nside
    north_cap = iring < nside
    south_cap = iring > 3 * nside
    # cap z
    z_n = 1.0 - (iring.astype(np.float64) ** 2) * 4.0 / npix_f
    ir_s = (4 * nside - iring).astype(np.float64)
    z_s = -1.0 + (ir_s**2) * 4.0 / npix_f
    z_e = (nl2 - iring).astype(np.float64) * 2.0 / (3.0 * nside)
    z = np.where(north_cap, z_n, np.where(south_cap, z_s, z_e))
    # phi: caps use (iphi - 0.5) * pi / (2 nr); equatorial rings use
    # (iphi - fodd) * pi / (2 nside) with fodd = 0.5 * (1 + (iring+nside) mod 2)
    phi_cap_n = (iphi.astype(np.float64) - 0.5) * np.pi / (2.0 * np.maximum(iring, 1))
    irs = np.maximum(4 * nside - iring, 1)
    phi_cap_s = (iphi.astype(np.float64) - 0.5) * np.pi / (2.0 * irs)
    fodd = 0.5 * (1 + ((iring + nside) % 2)).astype(np.float64)
    phi_eq = (iphi.astype(np.float64) - fodd) * np.pi / (2.0 * nside)
    phi = np.where(north_cap, phi_cap_n, np.where(south_cap, phi_cap_s, phi_eq))
    theta = np.arccos(np.clip(z, -1.0, 1.0))
    return theta, phi % (2.0 * np.pi)


def ring2vec(nside, pix):
    theta, phi = ring2ang(nside, pix)
    return ang2vec(theta, phi)


def nest2ang(nside, pix):
    return ring2ang(nside, nest2ring(nside, pix))


def nest2vec(nside, pix):
    return ring2vec(nside, nest2ring(nside, pix))


def nest2ring(nside, pix):
    """NESTED -> RING pixel index (numpy int64)."""
    nside = check_nside(nside)
    pix = np.asarray(pix, dtype=np.int64)
    npface = nside * nside
    ncap = 2 * nside * (nside - 1)
    npix = 12 * npface
    face = pix // npface
    ix, iy = _pix2xy(pix % npface)
    jr = _JRLL[face] * nside - ix - iy - 1  # ring index from north, 1..4nside-1

    north_cap = jr < nside
    south_cap = jr > 3 * nside
    # number of pixels per quadrant in this ring, and shift
    nr = np.where(north_cap, jr, np.where(south_cap, 4 * nside - jr, nside))
    kshift = np.where(north_cap | south_cap, 0, (jr - nside) & 1)
    n_before = np.where(
        north_cap,
        2 * nr * (nr - 1),
        np.where(
            south_cap,
            npix - 2 * (nr + 1) * nr,
            ncap + (jr - nside) * 4 * nside,
        ),
    )
    jp = (_JPLL[face] * nr + ix - iy + 1 + kshift) // 2
    jp = np.where(jp > 4 * nr, jp - 4 * nr, jp)
    jp = np.where(jp < 1, jp + 4 * nr, jp)
    return n_before + jp - 1


def ring2nest(nside, pix):
    """RING -> NESTED pixel index (numpy int64)."""
    nside = check_nside(nside)
    pix = np.asarray(pix, dtype=np.int64)
    ncap = 2 * nside * (nside - 1)
    npix = nside2npix(nside)
    iring, iphi = _ring_info(nside, pix)
    north_cap = iring < nside
    south_cap = iring > 3 * nside
    nr = np.where(north_cap, iring, np.where(south_cap, 4 * nside - iring, nside))
    kshift = np.where(north_cap | south_cap, 0, (iring - nside) & 1)

    ire = iring - nside + 1  # equatorial ring number, 1..2nside+1
    irm = 2 * nside + 2 - ire
    ifm = (iphi - ire // 2 + nside - 1) // nside
    ifp = (iphi - irm // 2 + nside - 1) // nside
    face_eq = np.where(ifp == ifm, (ifp & 3) + 4, np.where(ifp < ifm, ifp, ifm + 8))

    # polar cap faces
    face_n = (iphi - 1) // nr  # 0..3
    face_s = (iphi - 1) // nr + 8

    face = np.where(north_cap, face_n, np.where(south_cap, face_s, face_eq))

    irt = iring - _JRLL[face] * nside + 1  # in [-4nside, 0]
    ipt = 2 * iphi - _JPLL[face] * nr - kshift - 1
    ipt = np.where(ipt >= 2 * nside, ipt - 8 * nside, ipt)
    ix = (ipt - irt) >> 1
    iy = (-ipt - irt) >> 1
    del ncap, npix
    return face * nside * nside + _xy2pix(ix, iy)


# ---------------------------------------------------------------------------
# JAX device implementations (float32 / int32, nside <= 8192)
# ---------------------------------------------------------------------------


def _spread_bits_jax(v):
    v = v & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def vec2pix_ring_jax(nside, vec):
    """Unit vectors (..., 3) -> RING pixels, int32, traceable under jit."""
    return vec2pix_ring_xyz(nside, vec[..., 0], vec[..., 1], vec[..., 2])


def vec2pix_ring_xyz(nside, x, y, z, phi=None):
    """Component-plane variant of :func:`vec2pix_ring_jax` (same math;
    callable from Pallas kernels where stacked (..., 3) layouts are
    lane-hostile; those pass ``phi`` computed with their own arctan2,
    which Pallas cannot lower)."""
    nside = check_nside(nside)
    za = jnp.abs(z)
    if phi is None:
        phi = jnp.arctan2(y, x)
    tt = (phi % (2.0 * jnp.pi)) * (2.0 / jnp.pi)
    ncap = 2 * nside * (nside - 1)
    npix = 12 * nside * nside

    temp1 = nside * (0.5 + tt)
    temp2 = nside * 0.75 * z
    jp = jnp.floor(temp1 - temp2).astype(jnp.int32)
    jm = jnp.floor(temp1 + temp2).astype(jnp.int32)
    ir = nside + 1 + jp - jm
    kshift = 1 - (ir & 1)
    ip = ((jp + jm - nside + kshift + 1) >> 1) % (4 * nside)
    pix_eq = ncap + (ir - 1) * (4 * nside) + ip

    tp = tt - jnp.floor(tt)
    s = jnp.sqrt(jnp.maximum(x * x + y * y, 0.0))
    # sin(theta)/sqrt((1+|z|)/3) is more accurate near poles than
    # nside*sqrt(3(1-za)) in float32
    tmp = nside * s / jnp.sqrt((1.0 + za) / 3.0)
    jp_p = (tp * tmp).astype(jnp.int32)
    jm_p = ((1.0 - tp) * tmp).astype(jnp.int32)
    irp = jp_p + jm_p + 1
    ip_p = (tt * irp.astype(tt.dtype)).astype(jnp.int32) % (4 * irp)
    pix_polar = jnp.where(
        z > 0,
        2 * irp * (irp - 1) + ip_p,
        npix - 2 * irp * (irp + 1) + ip_p,
    )
    return jnp.where(za <= TWOTHIRDS, pix_eq, pix_polar).astype(jnp.int32)


def vec2pix_nest_jax(nside, vec):
    """Unit vectors (..., 3) -> NESTED pixels, int32, traceable under jit."""
    return vec2pix_nest_xyz(nside, vec[..., 0], vec[..., 1], vec[..., 2])


def vec2pix_nest_xyz(nside, x, y, z, phi=None):
    """Component-plane variant of :func:`vec2pix_nest_jax`."""
    nside = check_nside(nside)
    lognside = int(np.log2(nside))
    za = jnp.abs(z)
    if phi is None:
        phi = jnp.arctan2(y, x)
    tt = (phi % (2.0 * jnp.pi)) * (2.0 / jnp.pi)

    temp1 = nside * (0.5 + tt)
    temp2 = nside * 0.75 * z
    jp = jnp.floor(temp1 - temp2).astype(jnp.int32)
    jm = jnp.floor(temp1 + temp2).astype(jnp.int32)
    ifp = jp >> lognside
    ifm = jm >> lognside
    face_eq = jnp.where(
        ifp == ifm, (ifp & 3) + 4, jnp.where(ifp < ifm, ifp & 3, (ifm & 3) + 8)
    )
    ix_eq = jm & (nside - 1)
    iy_eq = nside - (jp & (nside - 1)) - 1

    ntt = jnp.minimum(jnp.floor(tt).astype(jnp.int32), 3)
    tp = tt - ntt.astype(tt.dtype)
    s = jnp.sqrt(jnp.maximum(x * x + y * y, 0.0))
    tmp = nside * s / jnp.sqrt((1.0 + za) / 3.0)
    jp_p = jnp.minimum((tp * tmp).astype(jnp.int32), nside - 1)
    jm_p = jnp.minimum(((1.0 - tp) * tmp).astype(jnp.int32), nside - 1)
    north = z >= 0
    face_p = jnp.where(north, ntt, ntt + 8)
    ix_p = jnp.where(north, nside - jm_p - 1, jp_p)
    iy_p = jnp.where(north, nside - jp_p - 1, jm_p)

    eq = za <= TWOTHIRDS
    face = jnp.where(eq, face_eq, face_p)
    ix = jnp.where(eq, ix_eq, ix_p)
    iy = jnp.where(eq, iy_eq, iy_p)
    return (
        face * (nside * nside)
        + (_spread_bits_jax(ix) | (_spread_bits_jax(iy) << 1))
    ).astype(jnp.int32)
