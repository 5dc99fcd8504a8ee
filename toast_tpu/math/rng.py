"""Counter-based random number generation: Threefry2x64-20.

TPU-native rebuild of the reference RNG subsystem
(``src/libtoast/src/toast_math_rng.cpp`` + vendored Random123, python wrapper
``src/toast/rng.py:23-160``).  Stream identity is two 64-bit keys plus two
64-bit counters; the second counter indexes the sample, so any sub-range of
any stream can be generated independently and reproducibly — this is the
mechanism that makes every simulation re-executable at any distribution
(SURVEY §5 "failure detection").

Two implementations with identical bit output:

* :func:`threefry2x64` — numpy uint64, used host-side and as the oracle.
* :func:`threefry2x64_jax` — JAX, emulating uint64 with (hi, lo) uint32
  pairs so it runs natively on TPU (no int64 support needed) and can be
  fused into jitted simulation kernels.

Distributions (matching the reference samplers):

* ``uniform_uint64`` — raw 64-bit stream (x0 output of each counter).
* ``uniform_01`` / ``uniform_m11`` — built from the **top 24 bits** so the
  float32 device path and float64 host path produce bitwise-identical
  uniforms (24-bit mantissas are exact in float32).
* ``gaussian`` — inverse-CDF transform ``sqrt(2) * erfinv(2u - 1)`` of the
  uniform, like the reference's ``rng_dist_normal``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.special import erfinv as _jerfinv
from scipy.special import erfinv as _serfinv

# Threefry2x64 rotation constants and key-schedule parity constant
_ROTATIONS = (16, 42, 12, 31, 16, 32, 24, 21)
_PARITY = np.uint64(0x1BD11BDAA9FC1A22)
_NROUNDS = 20


# ---------------------------------------------------------------------------
# numpy uint64 implementation (host / oracle)
# ---------------------------------------------------------------------------


def _rotl64(x, r):
    r = np.uint64(r)
    return (x << r) | (x >> np.uint64(64 - r))


def threefry2x64(key, counter):
    """Threefry2x64-20 block cipher.

    Args:
        key: tuple (k0, k1) of uint64 scalars.
        counter: tuple (c0, c1) of uint64 scalars or arrays (broadcast).

    Returns:
        (x0, x1) uint64 arrays.
    """
    ks0 = np.uint64(key[0])
    ks1 = np.uint64(key[1])
    ks2 = _PARITY ^ ks0 ^ ks1
    ks = (ks0, ks1, ks2)
    with np.errstate(over="ignore"):
        x0 = np.asarray(counter[0], dtype=np.uint64) + ks0
        x1 = np.asarray(counter[1], dtype=np.uint64) + ks1
    x0, x1 = np.broadcast_arrays(x0, x1)
    x0 = x0.copy()
    x1 = x1.copy()
    with np.errstate(over="ignore"):
        for i in range(_NROUNDS):
            x0 += x1
            x1 = _rotl64(x1, _ROTATIONS[i % 8])
            x1 ^= x0
            if i % 4 == 3:
                j = i // 4 + 1
                x0 += ks[j % 3]
                x1 += np.uint64((int(ks[(j + 1) % 3]) + j) & 0xFFFFFFFFFFFFFFFF)
    return x0, x1


# ---------------------------------------------------------------------------
# JAX uint32-pair implementation (device)
# ---------------------------------------------------------------------------


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    hi = ah + bh + carry
    return hi, lo


def _rotl64_jax(hi, lo, r):
    # r is a Python int (static per round)
    if r == 32:
        return lo, hi
    if r < 32:
        rh = jnp.uint32(r)
        rl = jnp.uint32(32 - r)
        nhi = (hi << rh) | (lo >> rl)
        nlo = (lo << rh) | (hi >> rl)
        return nhi, nlo
    rr = r - 32
    rh = jnp.uint32(rr)
    rl = jnp.uint32(32 - rr)
    nhi = (lo << rh) | (hi >> rl)
    nlo = (hi << rh) | (lo >> rl)
    return nhi, nlo


def _split64(x):
    x = int(x) & 0xFFFFFFFFFFFFFFFF
    return np.uint32(x >> 32), np.uint32(x & 0xFFFFFFFF)


def threefry2x64_jax(key, counter_hi_lo):
    """Threefry2x64-20 on uint32 pairs, traceable under jit.

    Args:
        key: tuple (k0, k1) of python/numpy uint64 scalars (static).
        counter_hi_lo: tuple (c0_hi, c0_lo, c1_hi, c1_lo) of uint32 arrays.

    Returns:
        (x0_hi, x0_lo, x1_hi, x1_lo) uint32 arrays.
    """
    k0h, k0l = _split64(key[0])
    k1h, k1l = _split64(key[1])
    k2h = np.uint32((int(_PARITY) >> 32)) ^ k0h ^ k1h
    k2l = np.uint32(int(_PARITY) & 0xFFFFFFFF) ^ k0l ^ k1l
    ks = ((k0h, k0l), (k1h, k1l), (k2h, k2l))
    c0h, c0l, c1h, c1l = (jnp.asarray(c, dtype=jnp.uint32) for c in counter_hi_lo)
    x0h, x0l = _add64(c0h, c0l, jnp.uint32(k0h), jnp.uint32(k0l))
    x1h, x1l = _add64(c1h, c1l, jnp.uint32(k1h), jnp.uint32(k1l))
    for i in range(_NROUNDS):
        x0h, x0l = _add64(x0h, x0l, x1h, x1l)
        x1h, x1l = _rotl64_jax(x1h, x1l, _ROTATIONS[i % 8])
        x1h = x1h ^ x0h
        x1l = x1l ^ x0l
        if i % 4 == 3:
            j = i // 4 + 1
            ah, al = ks[j % 3]
            x0h, x0l = _add64(x0h, x0l, jnp.uint32(ah), jnp.uint32(al))
            bh, bl = ks[(j + 1) % 3]
            # add ks[(j+1)%3] + j as a single 64-bit constant
            full = ((int(bh) << 32) | int(bl)) + j
            fh, fl = _split64(full)
            x1h, x1l = _add64(x1h, x1l, jnp.uint32(fh), jnp.uint32(fl))
    return x0h, x0l, x1h, x1l


# ---------------------------------------------------------------------------
# Distribution samplers
# ---------------------------------------------------------------------------

_INV24 = 1.0 / float(1 << 24)


def _u01_from_bits_np(x0):
    """Uniform in (0,1) from the top 24 bits (f32-exact)."""
    top = (x0 >> np.uint64(40)).astype(np.float64)
    return (top + 0.5) * _INV24


def random(samples, key=(0, 0), counter=(0, 0), sampler="gaussian"):
    """Generate ``samples`` values from one stream (host / numpy path).

    API mirrors ``toast.rng.random`` (reference ``src/toast/rng.py:23``).
    """
    c1 = np.uint64(counter[1]) + np.arange(samples, dtype=np.uint64)
    x0, _x1 = threefry2x64(
        (np.uint64(key[0]), np.uint64(key[1])),
        (np.uint64(counter[0]), c1),
    )
    if sampler == "uniform_uint64":
        return x0
    u = _u01_from_bits_np(x0)
    if sampler == "uniform_01":
        return u
    if sampler == "uniform_m11":
        return 2.0 * u - 1.0
    if sampler == "gaussian":
        return np.sqrt(2.0) * _serfinv(2.0 * u - 1.0)
    raise ValueError(f"unknown sampler {sampler!r}")


def random_multi(samples, keys, counters, sampler="gaussian"):
    """Generate from multiple streams (reference ``rng.random_multi``)."""
    return [
        random(n, key=(k1, k2), counter=(c1, c2), sampler=sampler)
        for n, k1, k2, c1, c2 in zip(
            samples, keys[0], keys[1], counters[0], counters[1]
        )
    ]


def _top24_jax(samples, key, counter=(0, 0)):
    """Top 24 bits of the x0 output for each counter, as int32."""
    idx = jnp.arange(samples, dtype=jnp.uint32)
    if isinstance(counter[1], tuple):
        c1h0 = jnp.asarray(counter[1][0], dtype=jnp.uint32)
        c1l0 = jnp.asarray(counter[1][1], dtype=jnp.uint32)
    else:
        c1h0, c1l0 = _split64(int(counter[1]))
    c1l = c1l0 + idx
    wrap = (c1l < idx).astype(jnp.uint32)
    c1h = c1h0 + wrap
    c0h, c0l = _split64(int(counter[0]))
    x0h, _x0l, _x1h, _x1l = threefry2x64_jax(
        key, (jnp.full_like(idx, c0h), jnp.full_like(idx, c0l), c1h, c1l)
    )
    return (x0h >> jnp.uint32(8)).astype(jnp.int32)


def uniform01_jax(samples, key, counter=(0, 0), dtype=jnp.float32):
    """Uniform (0,1) stream on device; bitwise-matches the numpy path.

    ``samples`` must be static under jit.  ``counter[1]`` is either a python
    int or a traced ``(hi, lo)`` uint32 pair (for dynamic sample offsets
    inside jitted kernels).
    """
    top = _top24_jax(samples, key, counter).astype(dtype)
    return (top + dtype(0.5)) * dtype(_INV24)


def gaussian_jax(samples, key, counter=(0, 0), dtype=jnp.float32):
    """Gaussian stream on device via inverse CDF of the shared uniform.

    The erfinv argument is built exactly from the 24-bit integer so it never
    rounds to +-1.0 in float32 (which would produce infinities).
    """
    top = _top24_jax(samples, key, counter)
    x = (2 * top + (1 - (1 << 24))).astype(jnp.float32) * _INV24
    g = jnp.sqrt(jnp.float32(2.0)) * _jerfinv(x)
    return g.astype(dtype)
