"""Tests for the Threefry2x64 counter-based RNG.

Known-answer vectors were generated with the upstream Random123
``r123::Threefry2x64`` (20 rounds) implementation.
"""

import numpy as np
import pytest

from toast_tpu.math import rng

# (ctr0, ctr1, key0, key1) -> (out0, out1), from Random123 Threefry2x64-20
KAT = [
    ((0, 0), (0, 0), (0xC2B6E3A8C2C69865, 0x6F81ED42F350084D)),
    (
        (0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF),
        (0xFFFFFFFFFFFFFFFF, 0xFFFFFFFFFFFFFFFF),
        (0xE02CB7C4D95D277A, 0xD06633D0893B8B68),
    ),
    (
        (0x243F6A8885A308D3, 0x13198A2E03707344),
        (0xA4093822299F31D0, 0x082EFA98EC4E6C89),
        (0x263C7D30BB0F0AF1, 0x56BE8361D3311526),
    ),
    ((0, 1), (2, 3), (0x46A4E714BF7DA3AB, 0xE40AA248BF6A1BFA)),
    ((1234567, 0), (42, 99), (0xF610C24B201AEB65, 0x2F0936F48A953EF6)),
]


@pytest.mark.parametrize("ctr,key,expected", KAT)
def test_threefry_kat_numpy(ctr, key, expected):
    x0, x1 = rng.threefry2x64(key, ctr)
    assert int(x0) == expected[0]
    assert int(x1) == expected[1]


@pytest.mark.parametrize("ctr,key,expected", KAT)
def test_threefry_kat_jax(ctr, key, expected):
    import jax.numpy as jnp

    def split(v):
        return np.uint32(v >> 32), np.uint32(v & 0xFFFFFFFF)

    c0h, c0l = split(ctr[0])
    c1h, c1l = split(ctr[1])
    x0h, x0l, x1h, x1l = rng.threefry2x64_jax(
        key,
        (
            jnp.array([c0h], dtype=jnp.uint32),
            jnp.array([c0l], dtype=jnp.uint32),
            jnp.array([c1h], dtype=jnp.uint32),
            jnp.array([c1l], dtype=jnp.uint32),
        ),
    )
    got0 = (int(x0h[0]) << 32) | int(x0l[0])
    got1 = (int(x1h[0]) << 32) | int(x1l[0])
    assert got0 == expected[0]
    assert got1 == expected[1]


def test_counter_offset_subrange():
    """Generating a sub-range with offset counter must match the full stream."""
    key = (12345, 678)
    full = rng.random(100, key=key, counter=(0, 0), sampler="gaussian")
    tail = rng.random(60, key=key, counter=(0, 40), sampler="gaussian")
    np.testing.assert_array_equal(full[40:], tail)


def test_stream_independence():
    a = rng.random(1000, key=(1, 0), sampler="uniform_uint64")
    b = rng.random(1000, key=(2, 0), sampler="uniform_uint64")
    assert not np.any(a == b)


def test_gaussian_statistics():
    n = 200000
    x = rng.random(n, key=(99, 3), sampler="gaussian")
    assert abs(np.mean(x)) < 0.02
    assert abs(np.std(x) - 1.0) < 0.01
    # higher moments
    assert abs(np.mean(x**3)) < 0.05
    assert abs(np.mean(x**4) - 3.0) < 0.15


def test_uniform_bounds_and_mean():
    u = rng.random(100000, key=(7, 7), sampler="uniform_01")
    assert np.all(u > 0.0) and np.all(u < 1.0)
    assert abs(np.mean(u) - 0.5) < 0.005
    m = rng.random(100000, key=(7, 7), sampler="uniform_m11")
    assert np.all(m > -1.0) and np.all(m < 1.0)
    assert abs(np.mean(m)) < 0.01


def test_jax_uniform_bitwise_matches_numpy():
    import jax.numpy as jnp

    key = (314159, 271828)
    host = rng.random(512, key=key, counter=(0, 1000), sampler="uniform_01")
    dev = rng.uniform01_jax(512, key, counter=(0, 1000))
    # both paths use the top 24 bits: float32(host) must equal device exactly
    np.testing.assert_array_equal(np.asarray(host, dtype=np.float32), np.asarray(dev))
    g_host = rng.random(512, key=key, counter=(0, 1000), sampler="gaussian")
    g_dev = rng.gaussian_jax(512, key, counter=(0, 1000))
    np.testing.assert_allclose(np.asarray(g_dev), g_host, atol=2e-4)


def test_jax_counter_wraparound():
    """Low-word counter overflow must carry into the high word."""
    import jax.numpy as jnp

    key = (5, 6)
    start = (1 << 32) - 100
    host = rng.random(300, key=key, counter=(0, start), sampler="uniform_01")
    dev = rng.uniform01_jax(300, key, counter=(0, start))
    np.testing.assert_array_equal(np.asarray(host, dtype=np.float32), np.asarray(dev))


def test_random_multi():
    out = rng.random_multi(
        [10, 20],
        keys=([1, 2], [3, 4]),
        counters=([0, 0], [0, 5]),
        sampler="uniform_01",
    )
    assert len(out) == 2
    assert len(out[0]) == 10 and len(out[1]) == 20
    ref = rng.random(20, key=(2, 4), counter=(0, 5), sampler="uniform_01")
    np.testing.assert_array_equal(out[1], ref)
